"""Nearest-point projection: hierarchical perf path == exact path."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ilqr_tpu.config import GlobalConfig
from ilqr_tpu.ops.projection import nearest_ref_points
from ilqr_tpu.sim.scenario import build_scenario_setup
from ilqr_tpu.solvers.cilqr import solve
from ilqr_tpu.types import CILQRConfig, CILQRWeights

from tests.conftest import CONFIG_DIR

pytestmark = pytest.mark.quick  # part of the <5-min regression tier

ALL_YAMLS = [
    "scenario_two_straight.yaml",
    "scenario_two_borrow.yaml",
    "scenario_three_straight.yaml",
    "scenario_three_bend.yaml",
]


@pytest.mark.parametrize("name", ALL_YAMLS)
def test_hier_matches_exact_on_scenario_lines(name, rng):
    gc = GlobalConfig.from_file(os.path.join(CONFIG_DIR, name))
    st = build_scenario_setup(gc)
    ref = jnp.asarray(st.center_lines[0].as_array())
    # random query points in the road neighborhood
    t = rng.integers(0, len(st.center_lines[0].x), size=500)
    base = np.stack([st.center_lines[0].x[t], st.center_lines[0].y[t]], axis=-1)
    pos = jnp.asarray(base + rng.normal(size=base.shape) * 3.0)
    exact = nearest_ref_points(pos, ref, "exact")
    hier = nearest_ref_points(pos, ref, "hier")
    np.testing.assert_array_equal(np.asarray(exact), np.asarray(hier))


def test_full_solve_same_with_hier_projection():
    gc = GlobalConfig.from_file(os.path.join(CONFIG_DIR, "scenario_two_straight.yaml"))
    st = build_scenario_setup(gc)
    w = CILQRWeights.from_global_config(gc, dtype=jnp.float64)
    scenario = st.device_scenario(tick=0, dtype=jnp.float64)
    outs = {}
    for proj in ("exact", "hier"):
        cfg = CILQRConfig.from_global_config(gc, projection=proj)
        u, x, stats, _ = jax.jit(solve, static_argnums=0)(
            cfg, w, jnp.asarray(st.ego_x0), scenario, None)
        outs[proj] = (np.asarray(u), np.asarray(x), int(stats.iters))
    np.testing.assert_array_equal(outs["exact"][0], outs["hier"][0])
    np.testing.assert_array_equal(outs["exact"][1], outs["hier"][1])
    assert outs["exact"][2] == outs["hier"][2]


def test_padded_rows_never_win():
    gc = GlobalConfig.from_file(os.path.join(CONFIG_DIR, "scenario_two_straight.yaml"))
    st = build_scenario_setup(gc)
    ref = jnp.asarray(st.center_lines[0].as_array(pad_to=4096))
    pos = jnp.asarray([[1000.0, 0.0], [0.0, 0.0], [-50.0, 3.0]])
    for method in ("exact", "hier"):
        got = nearest_ref_points(pos, ref, method)
        assert float(jnp.max(got[:, 0])) < 1e5  # no PAD_COORD row selected
