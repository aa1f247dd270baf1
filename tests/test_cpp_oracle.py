"""End-to-end parity vs the COMPILED reference C++ solver.

tools/cpp_oracle builds the reference's unmodified C++ sources
(src/cilqr_solver.cpp + utils.cpp + cubic_spline.cpp) against shim
headers and runs a headless 5-tick MPC per shipped scenario (noise off,
src/motion_planning.cpp:121-174,197 semantics). This test builds it on
demand (cached), runs it, and requires the framework's float64 MPC
trajectories to agree at machine precision.

This is the strongest oracle in the suite: it executes the reference's
own C++ control flow (barrier + ALM, warm start, status machine,
Jacobian quirk at src/utils.cpp:292) rather than a mirror of it.
Skipped when /root/reference is not mounted.
"""

import os
import subprocess
import sys

import numpy as np
import pytest

from tests.conftest import CONFIG_DIR, REFERENCE_DIR

ORACLE_DIR = os.path.join(os.path.dirname(__file__), "..", "tools", "cpp_oracle")
BINARY = os.path.join(ORACLE_DIR, "build", "oracle_harness")

pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REFERENCE_DIR, "src")),
    reason="reference not mounted")

ALL = [
    "scenario_two_straight",
    "scenario_two_borrow",
    "scenario_three_straight",
    "scenario_three_bend",
]


@pytest.fixture(scope="module")
def harness():
    if not os.path.exists(BINARY):
        r = subprocess.run(["bash", os.path.join(ORACLE_DIR, "build.sh")],
                           capture_output=True, text=True)
        assert r.returncode == 0, f"oracle build failed:\n{r.stderr}"
    return BINARY


def _run_harness(binary, yaml_path, ticks):
    out = os.path.join(ORACLE_DIR, "build", "out.txt")
    r = subprocess.run([binary, yaml_path, str(ticks), out],
                       capture_output=True, text=True)
    assert r.returncode == 0, f"harness failed:\n{r.stderr}"
    vals = [float(v) for v in open(out).read().split() if v not in ("x", "u")]
    x0 = np.array(vals[:4])
    rest = np.array(vals[4:]).reshape(ticks, 6)
    return np.vstack([x0, rest[:, 2:]]), rest[:, :2]  # ego (T+1,4), u0 (T,2)


@pytest.mark.parametrize("name", ALL)
def test_five_tick_mpc_matches_reference_cpp(harness, name):
    import jax.numpy as jnp

    from ilqr_tpu.config import GlobalConfig
    from ilqr_tpu.sim.mpc import run_mpc
    from ilqr_tpu.sim.scenario import build_scenario_setup
    from ilqr_tpu.types import CILQRConfig, CILQRWeights

    ego_cpp, u0_cpp = _run_harness(
        harness, os.path.join(CONFIG_DIR, f"{name}.yaml"), 5)

    gc = GlobalConfig.from_file(os.path.join(CONFIG_DIR, f"{name}.yaml"))
    st = build_scenario_setup(gc)
    cfg = CILQRConfig.from_global_config(gc)
    w = CILQRWeights.from_global_config(gc, dtype=jnp.float64)
    h = run_mpc(cfg, w, st, dtype=jnp.float64, ticks=5)

    # measured r5 agreement is <= 7e-15 / 6e-14 (tools/cpp_oracle/README);
    # 1e-10 leaves room for compiler/libm variation while still excluding
    # any semantic difference
    np.testing.assert_allclose(np.asarray(h["ego"]), ego_cpp, atol=1e-10)
    np.testing.assert_allclose(np.asarray(h["u"][:, 0, :]), u0_cpp,
                               atol=1e-10)


def test_full_reference_length_episode_matches_cpp(harness):
    """The COMPLETE reference episode: 120 receding-horizon ticks
    (max_simulation_time / delta_t of scenario_two_straight.yaml, the
    app's full run, src/motion_planning.cpp:180-270) against the
    compiled C++ solver. Measured drift: max 1.8e-12 at tick 12, then
    CONTRACTING (5.6e-16 by tick 100) -- the car-following equilibrium
    is attractive, so the two f64 builds converge to the same closed
    loop. ~15 s of f64 CPU compute."""
    import jax.numpy as jnp

    from ilqr_tpu.config import GlobalConfig
    from ilqr_tpu.sim.mpc import run_mpc
    from ilqr_tpu.sim.scenario import build_scenario_setup
    from ilqr_tpu.types import CILQRConfig, CILQRWeights

    name = "scenario_two_straight"
    ego_cpp, u0_cpp = _run_harness(
        harness, os.path.join(CONFIG_DIR, f"{name}.yaml"), 120)

    gc = GlobalConfig.from_file(os.path.join(CONFIG_DIR, f"{name}.yaml"))
    st = build_scenario_setup(gc)
    cfg = CILQRConfig.from_global_config(gc)
    w = CILQRWeights.from_global_config(gc, dtype=jnp.float64)
    h = run_mpc(cfg, w, st, dtype=jnp.float64, ticks=120)
    np.testing.assert_allclose(np.asarray(h["ego"]), ego_cpp, atol=1e-9)
    np.testing.assert_allclose(np.asarray(h["u"][:, 0, :]), u0_cpp,
                               atol=1e-8)


def test_twenty_tick_episode_matches_reference_cpp(harness):
    """Longer-run drift check on the warm-start scenario
    (scenario_three_straight ships use_last_solution=true,
    src/cilqr_solver.cpp:97-102): 20 receding-horizon ticks keep carrying
    the previous solution and ALM state, so any cross-solve carry
    mismatch compounds visibly."""
    import jax.numpy as jnp

    from ilqr_tpu.config import GlobalConfig
    from ilqr_tpu.sim.mpc import run_mpc
    from ilqr_tpu.sim.scenario import build_scenario_setup
    from ilqr_tpu.types import CILQRConfig, CILQRWeights

    name = "scenario_three_straight"
    ego_cpp, u0_cpp = _run_harness(
        harness, os.path.join(CONFIG_DIR, f"{name}.yaml"), 20)

    gc = GlobalConfig.from_file(os.path.join(CONFIG_DIR, f"{name}.yaml"))
    st = build_scenario_setup(gc)
    cfg = CILQRConfig.from_global_config(gc)
    w = CILQRWeights.from_global_config(gc, dtype=jnp.float64)
    h = run_mpc(cfg, w, st, dtype=jnp.float64, ticks=20)
    np.testing.assert_allclose(np.asarray(h["ego"]), ego_cpp, atol=1e-9)
    np.testing.assert_allclose(np.asarray(h["u"][:, 0, :]), u0_cpp,
                               atol=1e-9)
