// GlobalConfig implementation for the oracle harness: same public API and
// key schema as the reference's src/global_config.cpp:17-147, but parsed
// with a purpose-built reader for the shipped scenario yamls instead of
// yaml-cpp (absent on this box). The key set, types, and optional-key
// defaults are mirrored line-for-line from the reference's load_file.

// <string>/<stdexcept> first: the reference header assumes yaml-cpp
// pulled them in transitively
#include <any>
#include <cctype>
#include <stdexcept>
#include <string>

#include "global_config.hpp"

#include <fstream>
#include <iostream>
#include <map>
#include <sstream>
#include <stdexcept>
#include <string>
#include <vector>

namespace {

struct YamlLite {
    // flat "a/b/c" -> scalar string, list, or list-of-lists
    std::map<std::string, std::string> scalars;
    std::map<std::string, std::vector<double>> lists;
    std::map<std::string, std::vector<std::vector<double>>> list_lists;

    static std::string strip(const std::string& s) {
        size_t a = s.find_first_not_of(" \t");
        if (a == std::string::npos) return "";
        size_t b = s.find_last_not_of(" \t");
        return s.substr(a, b - a + 1);
    }

    static std::string drop_comment(const std::string& s) {
        // comments start at an unquoted '#'
        bool in_q = false;
        for (size_t i = 0; i < s.size(); ++i) {
            if (s[i] == '"') in_q = !in_q;
            if (s[i] == '#' && !in_q) return s.substr(0, i);
        }
        return s;
    }

    static std::vector<double> parse_flow_list(const std::string& s) {
        std::vector<double> out;
        std::string inner = s.substr(s.find('[') + 1);
        inner = inner.substr(0, inner.rfind(']'));
        std::stringstream ss(inner);
        std::string tok;
        while (std::getline(ss, tok, ',')) {
            tok = strip(tok);
            if (!tok.empty()) out.push_back(std::stod(tok));
        }
        return out;
    }

    void load(const std::string& path) {
        std::ifstream f(path);
        if (!f.is_open()) throw std::runtime_error("cannot open " + path);
        std::vector<std::pair<int, std::string>> stack;  // (indent, key)
        std::string pending_list_key;
        std::string line;
        while (std::getline(f, line)) {
            line = drop_comment(line);
            std::string t = strip(line);
            if (t.empty()) continue;
            int indent = 0;
            while (indent < int(line.size()) && line[indent] == ' ') ++indent;
            if (t[0] == '-') {
                // block-sequence item (list of flow lists)
                list_lists[pending_list_key].push_back(parse_flow_list(t));
                continue;
            }
            size_t colon = t.find(':');
            if (colon == std::string::npos) continue;
            std::string key = strip(t.substr(0, colon));
            std::string val = strip(t.substr(colon + 1));
            while (!stack.empty() && stack.back().first >= indent) stack.pop_back();
            std::string path_key;
            for (auto& [_, k] : stack) path_key += k + "/";
            path_key += key;
            if (val.empty()) {
                stack.push_back({indent, key});
                pending_list_key = path_key;  // may become a block sequence
            } else if (val[0] == '[') {
                lists[path_key] = parse_flow_list(val);
            } else {
                if (val.size() >= 2 && val.front() == '"' && val.back() == '"')
                    val = val.substr(1, val.size() - 2);
                scalars[path_key] = val;
            }
        }
    }

    bool has(const std::string& k) const {
        return scalars.count(k) || lists.count(k) || list_lists.count(k);
    }
    double as_double(const std::string& k, bool opt = false, double dflt = 0) const {
        auto it = scalars.find(k);
        if (it == scalars.end()) {
            if (opt) return dflt;
            throw std::runtime_error("missing key " + k);
        }
        return std::stod(it->second);
    }
    int as_int(const std::string& k) const { return int(as_double(k)); }
    bool as_bool(const std::string& k, bool opt = false, bool dflt = false) const {
        auto it = scalars.find(k);
        if (it == scalars.end()) {
            if (opt) return dflt;
            throw std::runtime_error("missing key " + k);
        }
        return it->second == "true" || it->second == "True" || it->second == "1";
    }
    std::string as_str(const std::string& k, bool opt = false,
                       const std::string& dflt = "") const {
        auto it = scalars.find(k);
        if (it == scalars.end()) {
            if (opt) return dflt;
            throw std::runtime_error("missing key " + k);
        }
        return it->second;
    }
};

}  // namespace

GlobalConfig* GlobalConfig::instance = nullptr;

void GlobalConfig::load_file(const std::string& filePath) {
    YamlLite y;
    try {
        y.load(filePath);

        // mirrored key-for-key from src/global_config.cpp:22-92
        config_map["max_simulation_time"] = y.as_double("max_simulation_time");
        config_map["delta_t"] = y.as_double("delta_t");

        config_map["lqr/N"] = y.as_int("lqr/N");
        config_map["lqr/nx"] = y.as_int("lqr/nx");
        config_map["lqr/nu"] = y.as_int("lqr/nu");
        config_map["lqr/w_pos"] = y.as_double("lqr/w_pos");
        config_map["lqr/w_vel"] = y.as_double("lqr/w_vel");
        config_map["lqr/w_yaw"] = y.as_double("lqr/w_yaw");
        config_map["lqr/w_acc"] = y.as_double("lqr/w_acc");
        config_map["lqr/w_stl"] = y.as_double("lqr/w_stl");
        config_map["lqr/slove_type"] = y.as_str("lqr/slove_type");
        config_map["lqr/alm_rho_init"] = y.as_double("lqr/alm_rho_init", true, 1.0);
        config_map["lqr/alm_gamma"] = y.as_double("lqr/alm_gamma", true, 0.0);
        config_map["lqr/max_rho"] = y.as_double("lqr/max_rho", true, 100.0);
        config_map["lqr/max_mu"] = y.as_double("lqr/max_mu", true, 1000.0);
        config_map["lqr/obstacle_exp_q1"] = y.as_double("lqr/obstacle_exp_q1");
        config_map["lqr/obstacle_exp_q2"] = y.as_double("lqr/obstacle_exp_q2");
        config_map["lqr/state_exp_q1"] = y.as_double("lqr/state_exp_q1");
        config_map["lqr/state_exp_q2"] = y.as_double("lqr/state_exp_q2");
        config_map["lqr/use_last_solution"] = y.as_bool("lqr/use_last_solution");

        config_map["iteration/max_iter"] = y.as_int("iteration/max_iter");
        config_map["iteration/init_lamb"] = y.as_double("iteration/init_lamb");
        config_map["iteration/lamb_decay"] = y.as_double("iteration/lamb_decay");
        config_map["iteration/lamb_amplify"] = y.as_double("iteration/lamb_amplify");
        config_map["iteration/max_lamb"] = y.as_double("iteration/max_lamb");
        config_map["iteration/convergence_threshold"] =
            y.as_double("iteration/convergence_threshold");
        config_map["iteration/accept_step_threshold"] =
            y.as_double("iteration/accept_step_threshold");

        config_map["vehicle/reference_point"] =
            y.as_str("vehicle/reference_point", true, "gravity_center");
        config_map["vehicle/target_velocity"] = y.as_double("vehicle/target_velocity");
        config_map["vehicle/wheelbase"] = y.as_double("vehicle/wheelbase");
        config_map["vehicle/width"] = y.as_double("vehicle/width");
        config_map["vehicle/length"] = y.as_double("vehicle/length");
        config_map["vehicle/velo_max"] = y.as_double("vehicle/velo_max");
        config_map["vehicle/velo_min"] = y.as_double("vehicle/velo_min");
        config_map["vehicle/yaw_lim"] = y.as_double("vehicle/yaw_lim");
        config_map["vehicle/acc_max"] = y.as_double("vehicle/acc_max");
        config_map["vehicle/acc_min"] = y.as_double("vehicle/acc_min");
        config_map["vehicle/stl_lim"] = y.as_double("vehicle/stl_lim");
        config_map["vehicle/d_safe"] = y.as_double("vehicle/d_safe");

        config_map["laneline/reference/x"] = y.lists.at("laneline/reference/x");
        config_map["laneline/reference/y"] = y.lists.at("laneline/reference/y");
        config_map["laneline/border"] = y.lists.at("laneline/border");
        config_map["laneline/center_line"] = y.lists.at("laneline/center_line");

        config_map["initial_condition"] = y.list_lists.at("initial_condition");

        config_map["visualization/show_reference_line"] =
            y.as_bool("visualization/show_reference_line", true, false);
        config_map["visualization/show_obstacle_boundary"] =
            y.as_bool("visualization/show_obstacle_boundary", true, false);
        if (y.lists.count("visualization/x_lim"))
            config_map["visualization/x_lim"] = y.lists.at("visualization/x_lim");
        if (y.lists.count("visualization/y_lim"))
            config_map["visualization/y_lim"] = y.lists.at("visualization/y_lim");
    } catch (const std::exception& e) {
        std::cerr << "Error parsing YAML file: " << e.what() << std::endl;
    }
}

bool GlobalConfig::has_key(std::string key_str) {
    return config_map.find(key_str) != config_map.end();
}

GlobalConfig* GlobalConfig::get_instance(const std::string& filePath /* = "" */) {
    if (instance == nullptr) {
        instance = new GlobalConfig();
        if (!filePath.empty()) {
            instance->load_file(filePath);
        } else {
            std::cerr << "The GlobalConfig singleton class is not initialized before use"
                      << std::endl;
            throw std::runtime_error("GlobalConfig is not initialized!");
        }
    }
    return instance;
}

template <typename T>
T GlobalConfig::get_config(const std::string& key) const {
    auto it = config_map.find(key);
    if (it != config_map.end()) {
        try {
            return std::any_cast<T>(it->second);
        } catch (const std::bad_any_cast&) {
            std::cerr << "Type mismatch for key: " << key << std::endl;
        }
    } else {
        std::cerr << "Configuration key not found: " << key << std::endl;
    }
    return T();
}

void GlobalConfig::destroy_instance() {
    if (instance) {
        delete instance;
        instance = nullptr;
    }
}

template std::vector<double> GlobalConfig::get_config<std::vector<double>>(
    const std::string& key) const;
template std::vector<std::vector<double>>
GlobalConfig::get_config<std::vector<std::vector<double>>>(const std::string& key) const;
template std::string GlobalConfig::get_config<std::string>(const std::string& key) const;
template int GlobalConfig::get_config<int>(const std::string& key) const;
template double GlobalConfig::get_config<double>(const std::string& key) const;
template bool GlobalConfig::get_config<bool>(const std::string& key) const;
