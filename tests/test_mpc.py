"""MPC drivers: jitted whole-episode scan == host loop."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ilqr_tpu.config import GlobalConfig
from ilqr_tpu.sim.mpc import run_mpc, run_mpc_scan
from ilqr_tpu.sim.scenario import build_scenario_setup
from ilqr_tpu.types import CILQRConfig, CILQRWeights

from tests.conftest import CONFIG_DIR


@pytest.fixture(scope="module")
def problem():
    gc = GlobalConfig.from_file(os.path.join(CONFIG_DIR, "scenario_two_straight.yaml"))
    st = build_scenario_setup(gc)
    cfg = CILQRConfig.from_global_config(gc, max_iter=12)
    w = CILQRWeights.from_global_config(gc, dtype=jnp.float64)
    return gc, st, cfg, w


def test_scan_episode_matches_host_loop(problem):
    gc, st, cfg, w = problem
    ticks = 5
    host = run_mpc(cfg, w, st, dtype=jnp.float64, ticks=ticks)
    obs_full = jnp.asarray(st.obs_preds_array())
    scenario = st.device_scenario(tick=0, dtype=jnp.float64)
    ego, us, stats = jax.jit(
        lambda: run_mpc_scan(cfg, w, jnp.asarray(st.ego_x0), scenario.ref_line,
                             scenario.ref_velo, obs_full, scenario.road_borders,
                             ticks)
    )()
    np.testing.assert_allclose(np.asarray(ego), host["ego"], atol=1e-9)
    np.testing.assert_allclose(np.asarray(us), host["u"], atol=1e-9)
    for t in range(ticks):
        assert int(stats.iters[t]) == int(host["stats"][t].iters)


def test_scan_episode_warm_start_scenario(problem):
    """Episode scan with use_last_solution carries warm start through the
    scan carry."""
    gc, st, _, w = problem
    cfg = CILQRConfig.from_global_config(gc, max_iter=12, use_last_solution=True)
    ticks = 4
    host = run_mpc(cfg, w, st, dtype=jnp.float64, ticks=ticks)
    scenario = st.device_scenario(tick=0, dtype=jnp.float64)
    obs_full = jnp.asarray(st.obs_preds_array())
    ego, us, stats = run_mpc_scan(cfg, w, jnp.asarray(st.ego_x0),
                                  scenario.ref_line, scenario.ref_velo,
                                  obs_full, scenario.road_borders, ticks)
    np.testing.assert_allclose(np.asarray(ego), host["ego"], atol=1e-9)
