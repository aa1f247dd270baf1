"""Config loader + scenario builder semantics."""

import math
import os

import numpy as np
import pytest

from ilqr_tpu.config import GlobalConfig
from ilqr_tpu.sim.scenario import build_scenario_setup, generate_routing_lines
from ilqr_tpu.types import CILQRConfig, CILQRWeights
from ilqr_tpu.utils.refline import ReferenceLine

from tests.conftest import CONFIG_DIR, REFERENCE_DIR

pytestmark = pytest.mark.quick  # part of the <5-min regression tier

ALL_YAMLS = [
    "scenario_two_straight.yaml",
    "scenario_two_borrow.yaml",
    "scenario_three_straight.yaml",
    "scenario_three_bend.yaml",
]


@pytest.mark.parametrize("name", ALL_YAMLS)
def test_all_scenarios_load(name):
    gc = GlobalConfig.from_file(os.path.join(CONFIG_DIR, name))
    assert gc["lqr/N"] == 30
    assert gc.solve_type in ("barrier", "alm")
    cfg = CILQRConfig.from_global_config(gc)
    w = CILQRWeights.from_global_config(gc)
    assert cfg.num_constraints == 8 + 2 * gc.num_obstacles
    assert abs(float(w.dt) - gc["delta_t"]) < 1e-6  # default weights dtype is f32


def test_slove_type_typo_key_accepted():
    gc = GlobalConfig.from_dict(_minimal_yaml(slove_key="slove_type"))
    assert gc.solve_type == "barrier"
    # and the correct spelling works too
    gc2 = GlobalConfig.from_dict(_minimal_yaml(slove_key="solve_type"))
    assert gc2.solve_type == "barrier"


def test_unknown_solve_type_falls_back_to_barrier():
    raw = _minimal_yaml()
    raw["lqr"]["slove_type"] = "bogus"
    gc = GlobalConfig.from_dict(raw)
    assert gc.solve_type == "barrier"


def test_optional_defaults_match_reference():
    raw = _minimal_yaml()
    raw["lqr"].pop("alm_rho_init", None)
    raw["vehicle"].pop("reference_point", None)
    raw.pop("visualization", None)
    gc = GlobalConfig.from_dict(raw)
    # defaults from reference src/global_config.cpp:34-37,54-55,79-82
    assert gc["lqr/alm_rho_init"] == 1.0
    assert gc["lqr/alm_gamma"] == 0.0
    assert gc["lqr/max_rho"] == 100.0
    assert gc["lqr/max_mu"] == 1000.0
    assert gc["vehicle/reference_point"] == "gravity_center"
    assert gc["visualization/show_reference_line"] is False


@pytest.mark.skipif(not os.path.isdir(REFERENCE_DIR), reason="reference not mounted")
@pytest.mark.parametrize("name", ALL_YAMLS)
def test_repo_configs_match_reference_values(name):
    """Our shipped scenarios carry the same workload numbers as the
    reference's (required for parity benchmarking)."""
    ours = GlobalConfig.from_file(os.path.join(CONFIG_DIR, name))
    ref = GlobalConfig.from_file(os.path.join(REFERENCE_DIR, "config", name))
    assert ours.config_map == ref.config_map


def test_reference_line_offset_geometry():
    # straight line along x, offset w: the offset line sits at y = +w
    line = ReferenceLine([0, 10, 20, 30], [0, 0, 0, 0], width=3.6)
    assert np.allclose(line.y, 3.6, atol=1e-9)
    assert np.allclose(line.yaw, 0.0, atol=1e-9)
    # sampled every 0.1 m, endpoint inclusive
    assert abs(line.longitude[1] - line.longitude[0] - 0.1) < 1e-12
    assert line.longitude[-1] <= line.length + 1e-9


def test_routing_direction_from_initial_yaw():
    gc = GlobalConfig.from_file(os.path.join(CONFIG_DIR, "scenario_two_borrow.yaml"))
    st = build_scenario_setup(gc)
    # agents 3,4 have yaw ~ pi: they drive in -x direction
    oncoming = st.routing_lines[4]
    assert oncoming.x[10] < oncoming.x[0]
    # their yaw is re-wrapped by +pi mod 2pi (src/motion_planning.cpp:157)
    assert abs(abs(oncoming.yaw[0]) - math.pi) < 0.1
    # forward agent advances
    fwd = st.routing_lines[1]
    assert fwd.x[10] > fwd.x[0]


def test_routing_speed_and_clamping():
    gc = GlobalConfig.from_file(os.path.join(CONFIG_DIR, "scenario_two_straight.yaml"))
    st = build_scenario_setup(gc)
    rl = st.routing_lines[1]  # v = 3.0, dt = 0.1
    step = np.hypot(rl.x[1] - rl.x[0], rl.y[1] - rl.y[0])
    assert abs(step - 0.3) < 1e-2
    # advance clamps at the end of the line: last samples repeat
    assert abs(rl.x[-1] - rl.x[-2]) < 1e-9 or rl.x[-1] > rl.x[0]


def test_routing_noise_seeded_and_bounded():
    gc = GlobalConfig.from_file(os.path.join(CONFIG_DIR, "scenario_two_straight.yaml"))
    st = build_scenario_setup(gc)
    noisy1 = generate_routing_lines(gc, st.center_lines, noise=True, seed=7)
    noisy2 = generate_routing_lines(gc, st.center_lines, noise=True, seed=7)
    clean = st.routing_lines
    # deterministic under a fixed seed
    np.testing.assert_array_equal(noisy1[2].x, noisy2[2].x)
    # ego (idx 0) never gets noise
    np.testing.assert_array_equal(noisy1[0].x, clean[0].x)
    # noise bounded by 3 sigma = 0.06
    dev = np.abs(np.asarray(noisy1[1].x) - np.asarray(clean[1].x))
    assert dev.max() <= 0.06 + 1e-12
    assert dev.max() > 0  # some ticks actually got noise


def test_road_borders_max_min_ordering():
    gc = GlobalConfig.from_file(os.path.join(CONFIG_DIR, "scenario_three_straight.yaml"))
    st = build_scenario_setup(gc)
    assert st.road_borders[0] == max(gc["laneline/border"])
    assert st.road_borders[1] == min(gc["laneline/border"])


def _minimal_yaml(slove_key="slove_type"):
    return {
        "max_simulation_time": 10,
        "delta_t": 0.1,
        "lqr": {
            "N": 30, "nx": 4, "nu": 2, "w_pos": 1.0, "w_vel": 1.0,
            "w_yaw": 20.0, "w_acc": 0.5, "w_stl": 20.0, slove_key: "barrier",
            "obstacle_exp_q1": 5.5, "obstacle_exp_q2": 5.75,
            "state_exp_q1": 3.0, "state_exp_q2": 3.5,
            "use_last_solution": False, "alm_rho_init": 20,
        },
        "iteration": {
            "max_iter": 100, "init_lamb": 0, "lamb_decay": 0.5,
            "lamb_amplify": 2.0, "max_lamb": 1000.0,
            "convergence_threshold": 0.01, "accept_step_threshold": 0.5,
        },
        "vehicle": {
            "target_velocity": 8, "wheelbase": 2.8, "width": 2, "length": 4.5,
            "velo_max": 15.0, "velo_min": 0.0, "yaw_lim": 1.57,
            "acc_max": 3.0, "acc_min": -3.0, "stl_lim": 0.12, "d_safe": 1.0,
        },
        "laneline": {
            "reference": {"x": [0, 50, 100], "y": [0, 0, 0]},
            "border": [-1.8, 1.8],
            "center_line": [0],
        },
        "initial_condition": [[0, 0, 8.0, 0], [30, 0, 3.0, 0]],
    }
