"""Cost + derivative assembly vs the reference-semantics numpy oracle and
autodiff."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ilqr_tpu.config import GlobalConfig
from ilqr_tpu.models.bicycle import rollout
from ilqr_tpu.ops.cost import cost_derivatives, total_cost
from ilqr_tpu.sim.scenario import build_scenario_setup
from ilqr_tpu.types import CILQRConfig, CILQRWeights

from tests.conftest import CONFIG_DIR
from tests.oracle_cilqr import OracleCILQR


@pytest.fixture(scope="module")
def setup():
    gc = GlobalConfig.from_file(os.path.join(CONFIG_DIR, "scenario_two_straight.yaml"))
    return gc, build_scenario_setup(gc)


def _mk(gc, setup, solve_type=None):
    cfg = CILQRConfig.from_global_config(
        gc, **({"solve_type": solve_type} if solve_type else {})
    )
    w = CILQRWeights.from_global_config(gc, dtype=jnp.float64)
    scenario = setup.device_scenario(tick=0, dtype=jnp.float64)
    return cfg, w, scenario


def _rand_traj(gc, setup, rng):
    x0 = jnp.asarray(setup.ego_x0)
    u = jnp.asarray(rng.normal(size=(int(gc["lqr/N"]), 2)) * np.array([1.0, 0.05]))
    x = rollout(x0, u, gc["delta_t"], gc["vehicle/wheelbase"],
                gc["vehicle/reference_point"])
    return u, x


def test_total_cost_matches_oracle_barrier(setup, rng):
    gc, st = setup
    cfg, w, scenario = _mk(gc, st)
    oracle = OracleCILQR(gc, st.num_obstacles)
    ref_arr = st.center_lines[0].as_array()
    obs = st.obs_preds_array()[:, : cfg.N + 1]
    for _ in range(3):
        u, x = _rand_traj(gc, st, rng)
        J = float(total_cost(cfg, w, u, x, scenario))
        J_o = oracle.total_cost(np.asarray(u), np.asarray(x), ref_arr,
                                gc["vehicle/target_velocity"], obs,
                                st.road_borders)
        np.testing.assert_allclose(J, J_o, rtol=1e-10)


def test_derivatives_match_oracle_barrier(setup, rng):
    gc, st = setup
    cfg, w, scenario = _mk(gc, st)
    oracle = OracleCILQR(gc, st.num_obstacles)
    ref_arr = st.center_lines[0].as_array()
    obs = st.obs_preds_array()[:, : cfg.N + 1]
    u, x = _rand_traj(gc, st, rng)
    der = cost_derivatives(cfg, w, u, x, scenario)
    l_x_o, l_u_o, l_xx_o, l_uu_o = oracle.derivatives(
        np.asarray(u), np.asarray(x), ref_arr, gc["vehicle/target_velocity"],
        obs, st.road_borders)
    np.testing.assert_allclose(np.asarray(der.l_x), l_x_o, atol=1e-9)
    np.testing.assert_allclose(np.asarray(der.l_u), l_u_o, atol=1e-9)
    np.testing.assert_allclose(np.asarray(der.l_xx), l_xx_o, atol=1e-9)
    np.testing.assert_allclose(np.asarray(der.l_uu), l_uu_o, atol=1e-9)


def test_derivatives_match_oracle_alm(setup, rng):
    gc, st = setup
    cfg, w, scenario = _mk(gc, st, solve_type="alm")
    oracle = OracleCILQR(gc, st.num_obstacles)
    oracle.solve_type = "alm"
    C = 8 + 2 * st.num_obstacles
    oracle.alm_rho = 20.0
    oracle.alm_mu = np.abs(np.random.default_rng(1).normal(size=(cfg.N, C)))
    oracle.alm_mu_next = np.zeros((cfg.N, C))
    ref_arr = st.center_lines[0].as_array()
    obs = st.obs_preds_array()[:, : cfg.N + 1]
    u, x = _rand_traj(gc, st, rng)
    alm_rho = jnp.asarray(20.0)
    alm_mu = jnp.asarray(oracle.alm_mu)
    J = float(total_cost(cfg, w, u, x, scenario, alm_rho, alm_mu))
    J_o = oracle.total_cost(np.asarray(u), np.asarray(x), ref_arr,
                            gc["vehicle/target_velocity"], obs, st.road_borders)
    np.testing.assert_allclose(J, J_o, rtol=1e-10)
    der = cost_derivatives(cfg, w, u, x, scenario, alm_rho, alm_mu)
    l_x_o, l_u_o, l_xx_o, l_uu_o = oracle.derivatives(
        np.asarray(u), np.asarray(x), ref_arr, gc["vehicle/target_velocity"],
        obs, st.road_borders)
    np.testing.assert_allclose(np.asarray(der.l_x), l_x_o, atol=1e-9)
    np.testing.assert_allclose(np.asarray(der.l_u), l_u_o, atol=1e-9)
    np.testing.assert_allclose(np.asarray(der.l_xx), l_xx_o, atol=1e-9)
    np.testing.assert_allclose(np.asarray(der.l_uu), l_uu_o, atol=1e-9)
    np.testing.assert_allclose(np.asarray(der.alm_mu_next), oracle.alm_mu_next,
                               atol=1e-9)


def test_l_x_l_u_match_autodiff_barrier(setup, rng):
    """With the nearest ref point fixed by stop_gradient semantics (integer
    argmin), jax.grad of total_cost equals the analytic l_x / l_u."""
    gc, st = setup
    cfg, w, scenario = _mk(gc, st)
    u, x = _rand_traj(gc, st, rng)
    der = cost_derivatives(cfg, w, u, x, scenario)
    gx = jax.grad(lambda xx: total_cost(cfg, w, u, xx, scenario))(x)
    gu = jax.grad(lambda uu: total_cost(cfg, w, uu, x, scenario))(u)
    np.testing.assert_allclose(np.asarray(der.l_x), np.asarray(gx), atol=1e-8)
    np.testing.assert_allclose(np.asarray(der.l_u), np.asarray(gu), atol=1e-8)
