// Minimal fmt shim: just enough of fmt::format for the reference's log
// strings ("{}" and "{:.2f}"-style specs). See tools/cpp_oracle/README.md.
#pragma once

#include <cstdio>
#include <sstream>
#include <string>
#include <vector>

namespace fmt {

namespace detail {
inline std::string arg_to_string(const std::string& spec, double v) {
    if (spec.empty()) {
        std::ostringstream os;
        os << v;
        return os.str();
    }
    char buf[64];
    std::string pf = "%" + spec;
    if (pf.back() != 'f' && pf.back() != 'g' && pf.back() != 'e') pf += 'f';
    std::snprintf(buf, sizeof(buf), pf.c_str(), v);
    return buf;
}
inline std::string arg_to_string(const std::string& spec, long long v) {
    (void)spec;
    return std::to_string(v);
}
inline std::string arg_to_string(const std::string& spec, unsigned long long v) {
    (void)spec;
    return std::to_string(v);
}
inline std::string arg_to_string(const std::string& spec, int v) {
    (void)spec;
    return std::to_string(v);
}
inline std::string arg_to_string(const std::string& spec, unsigned v) {
    (void)spec;
    return std::to_string(v);
}
inline std::string arg_to_string(const std::string& spec, long v) {
    (void)spec;
    return std::to_string(v);
}
inline std::string arg_to_string(const std::string& spec, unsigned long v) {
    (void)spec;
    return std::to_string(v);
}
inline std::string arg_to_string(const std::string& spec, const std::string& v) {
    (void)spec;
    return v;
}
inline std::string arg_to_string(const std::string& spec, const char* v) {
    (void)spec;
    return v;
}
inline std::string arg_to_string(const std::string& spec, bool v) {
    (void)spec;
    return v ? "true" : "false";
}

inline void collect(std::vector<std::string>&) {}
template <typename T, typename... Rest>
void collect_with_specs(const std::vector<std::string>& specs, size_t i,
                        std::vector<std::string>& out, const T& v, const Rest&... rest) {
    out.push_back(arg_to_string(i < specs.size() ? specs[i] : "", v));
    if constexpr (sizeof...(rest) > 0) collect_with_specs(specs, i + 1, out, rest...);
}
}  // namespace detail

template <typename... Args>
std::string format(const std::string& f, const Args&... args) {
    // first pass: extract specs from "{...}" placeholders in order
    std::vector<std::string> specs;
    for (size_t i = 0; i < f.size(); ++i) {
        if (f[i] == '{' && i + 1 < f.size() && f[i + 1] == '{') { ++i; continue; }
        if (f[i] == '{') {
            size_t j = f.find('}', i);
            if (j == std::string::npos) break;
            std::string inner = f.substr(i + 1, j - i - 1);
            size_t colon = inner.find(':');
            specs.push_back(colon == std::string::npos ? "" : inner.substr(colon + 1));
            i = j;
        }
    }
    std::vector<std::string> vals;
    if constexpr (sizeof...(args) > 0) detail::collect_with_specs(specs, 0, vals, args...);
    std::string out;
    size_t argi = 0;
    for (size_t i = 0; i < f.size(); ++i) {
        if (f[i] == '{' && i + 1 < f.size() && f[i + 1] == '{') { out += '{'; ++i; continue; }
        if (f[i] == '}' && i + 1 < f.size() && f[i + 1] == '}') { out += '}'; ++i; continue; }
        if (f[i] == '{') {
            size_t j = f.find('}', i);
            if (j == std::string::npos) { out += f.substr(i); break; }
            out += argi < vals.size() ? vals[argi++] : std::string("?");
            i = j;
        } else {
            out += f[i];
        }
    }
    return out;
}

}  // namespace fmt
