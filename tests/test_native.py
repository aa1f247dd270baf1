"""Native scenario generator vs the pure-Python implementations."""

import os
import time

import numpy as np
import pytest

from ilqr_tpu import native
from ilqr_tpu.config import GlobalConfig
from ilqr_tpu.sim.scenario import build_scenario_setup
from ilqr_tpu.utils.refline import ReferenceLine

from tests.conftest import CONFIG_DIR

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="no native toolchain")

KX = [-10.0, 0.0, 50.0, 100.0, 150.0, 200.0]
KY = [0.0, 0.0, 0.0, 0.0, 0.0, 0.0]
KX_BEND = [-20.0, -5.0, 10.0, 20.0, 35.0, 70.0, 100.0, 150.0]
KY_BEND = [1.0, 1.0, 1.0, 5.0, 6.5, 0.0, 0.0, 0.0]


def test_refline_matches_python():
    for kx, ky, wdt in ((KX, KY, 3.6), (KX_BEND, KY_BEND, -1.8)):
        nat = native.refline_build(kx, ky, wdt)
        py = ReferenceLine(kx, ky, wdt).as_array()
        assert nat.shape == py.shape
        np.testing.assert_allclose(nat, py, atol=1e-9)


def test_routing_matches_python_noise_off():
    gc = GlobalConfig.from_file(os.path.join(CONFIG_DIR, "scenario_two_borrow.yaml"))
    st = build_scenario_setup(gc)
    kx = [float(v) for v in gc["laneline/reference/x"]]
    ky = [float(v) for v in gc["laneline/reference/y"]]
    # vehicle 4 is oncoming (yaw ~ pi): exercises the reverse-direction path
    for idx in (1, 4):
        cond = gc["initial_condition"][idx]
        # recover the snap the python builder used
        from ilqr_tpu.sim.scenario import _snap_to_center_line
        line_num, start_s = _snap_to_center_line(st.center_lines, cond[0], cond[1])
        nat = native.routing_generate(
            kx, ky, gc["laneline/center_line"][line_num], start_s, cond[2],
            cond[3], gc["delta_t"], gc["max_simulation_time"] + 10)
        py = st.routing_lines[idx].as_array()
        assert nat.shape == py.shape
        np.testing.assert_allclose(nat, py, atol=1e-9)


def test_batch_variants_shapes_and_determinism():
    gc = GlobalConfig.from_file(os.path.join(CONFIG_DIR, "scenario_two_straight.yaml"))
    st = build_scenario_setup(gc)
    kx = np.asarray(gc["laneline/reference/x"], float)
    ky = np.asarray(gc["laneline/reference/y"], float)
    L = len(gc["laneline/center_line"])
    knots = np.stack([np.stack([kx, ky], axis=-1)] * L)
    widths = np.asarray(gc["laneline/center_line"], float)
    from ilqr_tpu.sim.scenario import _snap_to_center_line
    conds = gc["initial_condition"]
    lines, starts = zip(*[_snap_to_center_line(st.center_lines, c[0], c[1]) for c in conds])
    v0s = [c[2] for c in conds]
    yaws = [c[3] for c in conds]
    out1 = native.routing_generate_batch(knots, widths, lines, starts, v0s,
                                         yaws, 0.1, 22.0, n_variants=8, seed=5)
    out2 = native.routing_generate_batch(knots, widths, lines, starts, v0s,
                                         yaws, 0.1, 22.0, n_variants=8, seed=5)
    assert out1.shape == (8, len(conds), 220, 3)
    np.testing.assert_array_equal(out1, out2)  # seeded determinism
    # ego row never noisy: all variants identical for vehicle 0
    np.testing.assert_array_equal(out1[0, 0], out1[5, 0])
    # agent rows differ across variants (noise active)
    assert np.abs(out1[0, 1] - out1[1, 1]).max() > 0
    # noise-off batch equals the python clean routing
    clean = native.routing_generate_batch(knots, widths, lines, starts, v0s,
                                          yaws, 0.1, 22.0, n_variants=1,
                                          noise=False)
    py = st.routing_lines[1].as_array()
    np.testing.assert_allclose(clean[0, 1], py[: clean.shape[2]], atol=1e-9)
