"""Recorded-golden regression pins: 5 MPC ticks per shipped scenario.

The goldens (tests/goldens/*.npz) were produced by the float64 solver after
it passed full oracle parity (tests/test_cilqr.py); any future solver change
that shifts trajectories, first controls, or iteration counts trips these.
"""

import os

import numpy as np
import jax.numpy as jnp
import pytest

from ilqr_tpu.config import GlobalConfig
from ilqr_tpu.sim.mpc import run_mpc
from ilqr_tpu.sim.scenario import build_scenario_setup
from ilqr_tpu.types import CILQRConfig, CILQRWeights

from tests.conftest import CONFIG_DIR

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "goldens")

ALL = [
    "scenario_two_straight",
    "scenario_two_borrow",
    "scenario_three_straight",
    "scenario_three_bend",
]


@pytest.mark.parametrize("name", ALL)
def test_five_tick_trajectory_matches_golden(name):
    gc = GlobalConfig.from_file(os.path.join(CONFIG_DIR, f"{name}.yaml"))
    st = build_scenario_setup(gc)
    cfg = CILQRConfig.from_global_config(gc)
    w = CILQRWeights.from_global_config(gc, dtype=jnp.float64)
    h = run_mpc(cfg, w, st, dtype=jnp.float64, ticks=5)
    g = np.load(os.path.join(GOLDEN_DIR, f"{name}.npz"))
    np.testing.assert_allclose(h["ego"], g["ego"], atol=1e-10)
    np.testing.assert_allclose(h["u"][:, 0, :], g["u0"], atol=1e-10)
    np.testing.assert_array_equal(
        np.array([int(s.iters) for s in h["stats"]]), g["iters"])
