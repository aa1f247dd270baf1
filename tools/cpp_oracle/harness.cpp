// Headless MPC harness around the reference's UNMODIFIED CILQRSolver
// (src/cilqr_solver.cpp), producing C++ golden trajectories for the
// shipped scenario yamls.
//
// Scenario construction mirrors the reference app's main
// (src/motion_planning.cpp:49-197) with the obstacle-noise branch forced
// off (:163-171; noise applies with 50% probability per tick -- parity
// runs disable it, SURVEY.md section 4), which is also exactly what the
// repo's Python scenario builder does (ilqr_tpu/sim/scenario.py
// generate_routing_lines). The MPC update is the reference's
// receding-horizon step ego = new_x.row(1) (:197).
//
// Usage: harness <scenario.yaml> <ticks> <out.txt>
// Output: line 1 = x0; per tick: "u <a> <s>" then "x <x> <y> <v> <yaw>".

#include <cmath>
#include <cstdio>
#include <string>
#include <vector>

#include <spdlog/spdlog.h>

#include "cilqr_solver.hpp"
#include "global_config.hpp"
#include "utils.hpp"

int main(int argc, char** argv) {
    if (argc < 4) {
        std::fprintf(stderr, "usage: %s <yaml> <ticks> <out>\n", argv[0]);
        return 2;
    }
    const std::string yaml = argv[1];
    const int ticks = std::atoi(argv[2]);
    const std::string out_path = argv[3];

    spdlog::set_level(spdlog::level::warn);
    GlobalConfig* config = GlobalConfig::get_instance(yaml);

    double delta_t = config->get_config<double>("delta_t");
    double max_simulation_time = config->get_config<double>("max_simulation_time");
    double target_velocity = config->get_config<double>("vehicle/target_velocity");
    auto reference_x = config->get_config<std::vector<double>>("laneline/reference/x");
    auto reference_y = config->get_config<std::vector<double>>("laneline/reference/y");
    auto border_widths = config->get_config<std::vector<double>>("laneline/border");
    auto center_line_widths = config->get_config<std::vector<double>>("laneline/center_line");
    auto initial_conditions =
        config->get_config<std::vector<std::vector<double>>>("initial_condition");
    size_t vehicle_num = initial_conditions.size();

    // lane lines (src/motion_planning.cpp:91-103)
    std::vector<ReferenceLine> center_lines;
    for (double w : center_line_widths) {
        center_lines.emplace_back(ReferenceLine(reference_x, reference_y, w));
    }
    std::sort(border_widths.begin(), border_widths.end(), std::greater<double>());
    Eigen::Vector2d road_borders;
    road_borders << border_widths[0], border_widths.back();

    // obstacle routing generation, noise branch disabled
    // (src/motion_planning.cpp:121-174)
    std::vector<RoutingLine> routing_lines(vehicle_num);
    for (size_t idx = 0; idx < vehicle_num; ++idx) {
        size_t line_num = 0;
        double start_s = center_lines[line_num].length();
        double min_diff = -1.0;
        for (size_t l = 0; l < center_lines.size(); ++l) {
            for (size_t i = 1; i < center_lines[l].size(); ++i) {
                double last_diff = hypot(center_lines[l].x[i - 1] - initial_conditions[idx][0],
                                         center_lines[l].y[i - 1] - initial_conditions[idx][1]);
                double cur_diff = hypot(center_lines[l].x[i] - initial_conditions[idx][0],
                                        center_lines[l].y[i] - initial_conditions[idx][1]);
                if (cur_diff > last_diff) {
                    if (min_diff < 0 || last_diff < min_diff) {
                        min_diff = last_diff;
                        line_num = l;
                        start_s = center_lines[l].longitude[i - 1];
                    }
                    break;
                }
            }
        }
        for (double t = 0.0; t < max_simulation_time + 10; t += delta_t) {
            double cur_s = 0.;
            Eigen::Vector3d pos;
            if (initial_conditions[idx][3] <= M_PI_2) {
                cur_s = start_s + t * initial_conditions[idx][2];
                cur_s = std::min(cur_s, center_lines[line_num].longitude.back());
                pos = center_lines[line_num].calc_position(cur_s);
            } else {
                cur_s = start_s - t * initial_conditions[idx][2];
                cur_s = std::max(cur_s, center_lines[line_num].longitude.front());
                pos = center_lines[line_num].calc_position(cur_s);
                pos.z() = fmod(pos.z() + M_PI, 2 * M_PI);
            }
            routing_lines[idx].x.push_back(pos.x());
            routing_lines[idx].y.push_back(pos.y());
            routing_lines[idx].yaw.push_back(pos.z());
        }
    }
    std::vector<RoutingLine> obs_prediction(routing_lines.begin() + 1, routing_lines.end());

    Eigen::Vector4d ego_state = {initial_conditions[0][0], initial_conditions[0][1],
                                 initial_conditions[0][2], initial_conditions[0][3]};
    CILQRSolver ilqr_solver = CILQRSolver(config);

    FILE* out = std::fopen(out_path.c_str(), "w");
    if (!out) {
        std::fprintf(stderr, "cannot open %s\n", out_path.c_str());
        return 2;
    }
    std::fprintf(out, "x %.17g %.17g %.17g %.17g\n", ego_state[0], ego_state[1], ego_state[2],
                 ego_state[3]);
    for (int tick = 0; tick < ticks; ++tick) {
        auto [new_u, new_x] =
            ilqr_solver.solve(ego_state, center_lines[0], target_velocity,
                              utils::get_sub_routing_lines(obs_prediction, tick), road_borders);
        ego_state = new_x.row(1).transpose();
        std::fprintf(out, "u %.17g %.17g\n", new_u(0, 0), new_u(0, 1));
        std::fprintf(out, "x %.17g %.17g %.17g %.17g\n", ego_state[0], ego_state[1],
                     ego_state[2], ego_state[3]);
    }
    std::fclose(out);
    GlobalConfig::destroy_instance();
    return 0;
}
