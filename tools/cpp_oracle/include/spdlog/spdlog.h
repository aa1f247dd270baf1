// Minimal spdlog shim for the oracle harness build: formats via the fmt
// shim and prints to stderr. See tools/cpp_oracle/README.md.
#pragma once

#include <cstdio>
#include <string>

#include "../fmt/core.h"

#define SPDLOG_LEVEL_TRACE 0
#define SPDLOG_LEVEL_DEBUG 1
#define SPDLOG_LEVEL_INFO 2
#define SPDLOG_LEVEL_WARN 3
#define SPDLOG_LEVEL_ERROR 4

namespace spdlog {

namespace level {
enum level_enum { trace = 0, debug = 1, info = 2, warn = 3, err = 4, critical = 5, off = 6 };
}

inline level::level_enum& _active_level() {
    static level::level_enum lvl = level::info;
    return lvl;
}
inline void set_level(level::level_enum l) { _active_level() = l; }

template <typename... Args>
void log_at(level::level_enum l, const char* tag, const std::string& f, const Args&... args) {
    if (l < _active_level()) return;
    std::fprintf(stderr, "[%s] %s\n", tag, fmt::format(f, args...).c_str());
}
template <typename... Args> void trace(const std::string& f, const Args&... a) {
    log_at(level::trace, "trace", f, a...);
}
template <typename... Args> void debug(const std::string& f, const Args&... a) {
    log_at(level::debug, "debug", f, a...);
}
template <typename... Args> void info(const std::string& f, const Args&... a) {
    log_at(level::info, "info", f, a...);
}
template <typename... Args> void warn(const std::string& f, const Args&... a) {
    log_at(level::warn, "warn", f, a...);
}
template <typename... Args> void error(const std::string& f, const Args&... a) {
    log_at(level::err, "error", f, a...);
}

}  // namespace spdlog

#define SPDLOG_TRACE(...) ::spdlog::trace(__VA_ARGS__)
#define SPDLOG_DEBUG(...) ::spdlog::debug(__VA_ARGS__)
#define SPDLOG_INFO(...) ::spdlog::info(__VA_ARGS__)
#define SPDLOG_WARN(...) ::spdlog::warn(__VA_ARGS__)
#define SPDLOG_ERROR(...) ::spdlog::error(__VA_ARGS__)
