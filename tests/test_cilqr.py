"""Full CILQR solve: parity vs the reference-semantics oracle, batching
consistency, warm start, both constraint modes."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ilqr_tpu.config import GlobalConfig
from ilqr_tpu.sim.scenario import build_scenario_setup
from ilqr_tpu.solvers.cilqr import CILQRSolver, solve
from ilqr_tpu.types import CILQRCarry, CILQRConfig, CILQRWeights, Scenario

from tests.conftest import CONFIG_DIR
from tests.oracle_cilqr import OracleCILQR


def _load(name):
    gc = GlobalConfig.from_file(os.path.join(CONFIG_DIR, name))
    return gc, build_scenario_setup(gc)


@pytest.fixture(scope="module")
def two_straight():
    return _load("scenario_two_straight.yaml")


def _oracle_solve(gc, st, tick=0, oracle=None):
    oracle = oracle or OracleCILQR(gc, st.num_obstacles)
    ref_arr = st.center_lines[0].as_array()
    obs = st.obs_preds_array()[:, tick: tick + oracle.N + 1]
    u, x = oracle.solve(st.ego_x0, ref_arr, gc["vehicle/target_velocity"], obs,
                        st.road_borders)
    return u, x, oracle


@pytest.mark.quick  # the quick tier's one solver-level oracle-parity pin
def test_solve_matches_oracle_first_tick(two_straight):
    gc, st = two_straight
    cfg = CILQRConfig.from_global_config(gc)
    w = CILQRWeights.from_global_config(gc, dtype=jnp.float64)
    scenario = st.device_scenario(tick=0, dtype=jnp.float64)
    u, x, stats, _ = jax.jit(solve, static_argnums=0)(
        cfg, w, jnp.asarray(st.ego_x0), scenario, None)
    u_o, x_o, oracle = _oracle_solve(gc, st)
    np.testing.assert_allclose(np.asarray(u), u_o, atol=1e-8)
    np.testing.assert_allclose(np.asarray(x), x_o, atol=1e-8)
    assert bool(stats.converged) == (oracle.status == oracle.CONVERGED)
    # iters: oracle records the 0-based loop index at break
    assert int(stats.iters) == oracle.iters + 1


def test_solve_matches_oracle_alm_mode(two_straight):
    gc, st = two_straight
    cfg = CILQRConfig.from_global_config(gc, solve_type="alm")
    w = CILQRWeights.from_global_config(gc, dtype=jnp.float64)
    scenario = st.device_scenario(tick=0, dtype=jnp.float64)
    u, x, stats, _ = jax.jit(solve, static_argnums=0)(
        cfg, w, jnp.asarray(st.ego_x0), scenario, None)
    oracle = OracleCILQR(gc, st.num_obstacles)
    oracle.solve_type = "alm"
    u_o, x_o, _ = _oracle_solve(gc, st, oracle=oracle)
    np.testing.assert_allclose(np.asarray(u), u_o, atol=1e-8)
    np.testing.assert_allclose(np.asarray(x), x_o, atol=1e-8)


def test_mpc_ticks_match_oracle(two_straight):
    """Receding horizon for a few ticks: apply x[1], re-solve."""
    gc, st = two_straight
    solver = CILQRSolver(gc, dtype=jnp.float64)
    oracle = OracleCILQR(gc, st.num_obstacles)
    ref_arr = st.center_lines[0].as_array()
    obs_full = st.obs_preds_array()
    ego_j = st.ego_x0.copy()
    ego_o = st.ego_x0.copy()
    for tick in range(3):
        window = obs_full[:, tick: tick + oracle.N + 1]
        u_j, x_j = solver.solve(ego_j, st.center_lines[0],
                                gc["vehicle/target_velocity"],
                                window, st.road_borders)
        u_o, x_o = oracle.solve(ego_o, ref_arr, gc["vehicle/target_velocity"],
                                window, st.road_borders)
        np.testing.assert_allclose(u_j, u_o, atol=1e-7)
        np.testing.assert_allclose(x_j, x_o, atol=1e-7)
        ego_j, ego_o = x_j[1], x_o[1]


def test_warm_start_parity():
    """scenario_three_straight uses use_last_solution=true: the shifted
    previous solution and persistent ALM duals must carry across solves."""
    gc, st = _load("scenario_three_straight.yaml")
    solver = CILQRSolver(gc, dtype=jnp.float64)
    assert solver.cfg.use_last_solution
    oracle = OracleCILQR(gc, st.num_obstacles)
    obs_full = st.obs_preds_array()
    ref_arr = st.center_lines[0].as_array()
    ego_j = st.ego_x0.copy()
    ego_o = st.ego_x0.copy()
    for tick in range(2):
        window = obs_full[:, tick: tick + oracle.N + 1]
        u_j, x_j = solver.solve(ego_j, st.center_lines[0],
                                gc["vehicle/target_velocity"],
                                window, st.road_borders)
        u_o, x_o = oracle.solve(ego_o, ref_arr, gc["vehicle/target_velocity"],
                                window, st.road_borders)
        np.testing.assert_allclose(u_j, u_o, atol=1e-7)
        ego_j, ego_o = x_j[1], x_o[1]


def test_vmap_batch_equals_single(two_straight):
    gc, st = two_straight
    cfg = CILQRConfig.from_global_config(gc)
    w = CILQRWeights.from_global_config(gc, dtype=jnp.float64)
    scenario = st.device_scenario(tick=0, dtype=jnp.float64)
    x0 = jnp.asarray(st.ego_x0)
    # batch of 4: same scenario, slightly different initial states
    x0_b = jnp.stack([x0, x0 + jnp.asarray([0.5, 0.1, -0.2, 0.0]),
                      x0 + jnp.asarray([-1.0, 0.0, 0.3, 0.01]), x0])
    scen_b = jax.tree.map(lambda a: jnp.stack([a] * 4), scenario)
    u_b, x_b, stats_b, _ = jax.jit(
        jax.vmap(solve, in_axes=(None, None, 0, 0, None)), static_argnums=0
    )(cfg, w, x0_b, scen_b, None)
    for i in (0, 1, 2):
        u_s, x_s, stats_s, _ = jax.jit(solve, static_argnums=0)(
            cfg, w, x0_b[i], scenario, None)
        np.testing.assert_allclose(np.asarray(u_b[i]), np.asarray(u_s), atol=1e-9)
        np.testing.assert_allclose(np.asarray(x_b[i]), np.asarray(x_s), atol=1e-9)
        assert int(stats_b.iters[i]) == int(stats_s.iters)
    # row 0 and row 3 are identical problems -> identical answers
    np.testing.assert_array_equal(np.asarray(u_b[0]), np.asarray(u_b[3]))


def test_yaml_param_sweep_via_batched_weights(two_straight):
    """Weights are a traced pytree: sweeping config values (here w_yaw and
    stl_lim) batches in one compiled program — the 'initial states x yaml
    params' sweep axis of the north star."""
    gc, st = two_straight
    cfg = CILQRConfig.from_global_config(gc, max_iter=15)
    w = CILQRWeights.from_global_config(gc, dtype=jnp.float64)
    B = 3
    w_b = jax.tree.map(lambda a: jnp.stack([a] * B), w)
    w_b = w_b.replace(w_yaw=jnp.asarray([20.0, 5.0, 80.0]),
                      stl_lim=jnp.asarray([0.12, 0.3, 0.05]))
    scenario = st.device_scenario(tick=0, dtype=jnp.float64)
    scen_b = jax.tree.map(lambda a: jnp.stack([a] * B), scenario)
    x0_b = jnp.stack([jnp.asarray(st.ego_x0)] * B)
    u_b, x_b, stats_b, _ = jax.jit(
        jax.vmap(solve, in_axes=(None, 0, 0, 0, None)), static_argnums=0
    )(cfg, w_b, x0_b, scen_b, None)
    # per-row result equals a single solve with that row's weights
    for i in range(B):
        w_i = jax.tree.map(lambda a: a[i], w_b)
        u_s, _, _, _ = jax.jit(solve, static_argnums=0)(
            cfg, w_i, x0_b[i], scenario, None)
        np.testing.assert_allclose(np.asarray(u_b[i]), np.asarray(u_s),
                                   atol=1e-9)
    # tighter steering limit produces smaller peak steering
    assert float(jnp.abs(u_b[2][:, 1]).max()) <= float(jnp.abs(u_b[1][:, 1]).max()) + 1e-9


def test_solver_reduces_cost_and_respects_bounds(two_straight):
    gc, st = two_straight
    cfg = CILQRConfig.from_global_config(gc)
    w = CILQRWeights.from_global_config(gc, dtype=jnp.float64)
    scenario = st.device_scenario(tick=0, dtype=jnp.float64)
    from ilqr_tpu.ops.cost import total_cost
    from ilqr_tpu.models.bicycle import rollout

    x0 = jnp.asarray(st.ego_x0)
    u0 = jnp.zeros((cfg.N, 2), dtype=jnp.float64)
    x_init = rollout(x0, u0, w.dt, w.wheelbase, cfg.reference_point)
    J0 = float(total_cost(cfg, w, u0, x_init, scenario))
    u, x, stats, _ = jax.jit(solve, static_argnums=0)(cfg, w, x0, scenario, None)
    J = float(stats.final_cost)
    assert J < J0
    # control bounds approximately respected (soft constraints)
    assert float(jnp.max(u[:, 0])) < gc["vehicle/acc_max"] + 0.3
    assert float(jnp.min(u[:, 0])) > gc["vehicle/acc_min"] - 0.3
    assert float(jnp.max(jnp.abs(u[:, 1]))) < gc["vehicle/stl_lim"] + 0.05
    # velocity stays in band
    assert float(jnp.max(x[:, 2])) < gc["vehicle/velo_max"] + 0.5
    assert float(jnp.min(x[:, 2])) > gc["vehicle/velo_min"] - 0.5


def test_float32_solver_close_to_float64(two_straight):
    gc, st = two_straight
    cfg = CILQRConfig.from_global_config(gc)
    w64 = CILQRWeights.from_global_config(gc, dtype=jnp.float64)
    w32 = CILQRWeights.from_global_config(gc, dtype=jnp.float32)
    s64 = st.device_scenario(tick=0, dtype=jnp.float64)
    s32 = st.device_scenario(tick=0, dtype=jnp.float32)
    u64, x64, _, _ = jax.jit(solve, static_argnums=0)(
        cfg, w64, jnp.asarray(st.ego_x0), s64, None)
    u32, x32, st32, _ = jax.jit(solve, static_argnums=0)(
        cfg, w32, jnp.asarray(st.ego_x0, jnp.float32), s32, None)
    assert np.all(np.isfinite(np.asarray(u32)))
    # f32 follows the f64 trajectory to driving accuracy
    np.testing.assert_allclose(np.asarray(x32), np.asarray(x64), atol=0.2)
