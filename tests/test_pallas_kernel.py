"""Fused Pallas CILQR kernel vs the XLA solver (interpret mode on CPU).

Full-size interpret runs are prohibitively slow on CPU, so the parity check
runs the same kernel code at a reduced horizon; the kernel is
shape-polymorphic over N, and the TPU-scale behavior is exercised by
bench.py on hardware.
"""

import dataclasses
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ilqr_tpu.config import GlobalConfig
from ilqr_tpu.ops.pallas.cilqr_kernel import cilqr_solve_pallas
from ilqr_tpu.sim.scenario import build_scenario_setup, perturbed_initial_states
from ilqr_tpu.solvers.cilqr import solve
from ilqr_tpu.types import CILQRConfig, CILQRWeights

from tests.conftest import CONFIG_DIR


@pytest.fixture(scope="module")
def small_problem():
    gc = GlobalConfig.from_file(os.path.join(CONFIG_DIR, "scenario_two_straight.yaml"))
    st = build_scenario_setup(gc)
    cfg = dataclasses.replace(CILQRConfig.from_global_config(gc, max_iter=8), N=6)
    w = CILQRWeights.from_global_config(gc, dtype=jnp.float32)
    scenario = st.device_scenario(tick=0, horizon=cfg.N, dtype=jnp.float32)
    B = 8
    x0_b = jnp.asarray(perturbed_initial_states(st.ego_x0, B, seed=0), jnp.float32)
    scen_b = jax.tree.map(lambda a: jnp.stack([a] * B), scenario)
    return cfg, w, x0_b, scen_b


def test_kernel_matches_xla_solver(small_problem):
    cfg, w, x0_b, scen_b = small_problem
    u_k, x_k, stats_k = cilqr_solve_pallas(cfg, w, x0_b, scen_b, window=256,
                                           interpret=True)
    f = jax.jit(jax.vmap(solve, in_axes=(None, None, 0, 0, None)),
                static_argnums=0)
    u_r, x_r, stats_r, _ = f(cfg, w, x0_b, scen_b, None)
    np.testing.assert_array_equal(np.asarray(stats_k.iters), np.asarray(stats_r.iters))
    np.testing.assert_array_equal(np.asarray(stats_k.status), np.asarray(stats_r.status))
    np.testing.assert_allclose(np.asarray(u_k), np.asarray(u_r), atol=1e-4)
    np.testing.assert_allclose(np.asarray(x_k), np.asarray(x_r), atol=1e-4)
    np.testing.assert_allclose(np.asarray(stats_k.final_cost),
                               np.asarray(stats_r.final_cost), rtol=1e-4)


def test_kernel_matches_xla_gravity_center_many_obstacles():
    """two_borrow: gravity-center dynamics branch + 4 obstacles."""
    gc = GlobalConfig.from_file(os.path.join(CONFIG_DIR, "scenario_two_borrow.yaml"))
    st = build_scenario_setup(gc)
    cfg = dataclasses.replace(CILQRConfig.from_global_config(gc, max_iter=6), N=6)
    assert cfg.reference_point == "gravity_center"
    w = CILQRWeights.from_global_config(gc, dtype=jnp.float32)
    scenario = st.device_scenario(tick=0, horizon=cfg.N, dtype=jnp.float32)
    B = 4
    x0_b = jnp.asarray(perturbed_initial_states(st.ego_x0, B, seed=1), jnp.float32)
    scen_b = jax.tree.map(lambda a: jnp.stack([a] * B), scenario)
    u_k, x_k, stats_k = cilqr_solve_pallas(cfg, w, x0_b, scen_b, window=256,
                                           interpret=True)
    f = jax.jit(jax.vmap(solve, in_axes=(None, None, 0, 0, None)),
                static_argnums=0)
    u_r, x_r, stats_r, _ = f(cfg, w, x0_b, scen_b, None)
    np.testing.assert_array_equal(np.asarray(stats_k.iters), np.asarray(stats_r.iters))
    np.testing.assert_allclose(np.asarray(x_k), np.asarray(x_r), atol=1e-3)


@pytest.mark.parametrize("name,max_iter,B", [
    ("scenario_three_straight", 6, 4),  # 8 obstacles (densest constraint set)
    ("scenario_three_bend", 6, 4),      # curved (S-bend) reference spline
])
def test_kernel_matches_xla_remaining_scenarios(name, max_iter, B):
    """Kernel parity on the two scenario shapes the fixtures above miss:
    M=8 obstacle slabs and a curved reference-line window."""
    gc = GlobalConfig.from_file(os.path.join(CONFIG_DIR, name + ".yaml"))
    st = build_scenario_setup(gc)
    cfg = dataclasses.replace(
        CILQRConfig.from_global_config(gc, max_iter=max_iter),
        N=6, use_last_solution=False)
    w = CILQRWeights.from_global_config(gc, dtype=jnp.float32)
    scenario = st.device_scenario(tick=0, horizon=cfg.N, dtype=jnp.float32)
    x0_b = jnp.asarray(perturbed_initial_states(st.ego_x0, B, seed=2),
                       jnp.float32)
    scen_b = jax.tree.map(lambda a: jnp.stack([a] * B), scenario)
    u_k, x_k, stats_k = cilqr_solve_pallas(cfg, w, x0_b, scen_b, window=256,
                                           interpret=True)
    f = jax.jit(jax.vmap(solve, in_axes=(None, None, 0, 0, None)),
                static_argnums=0)
    u_r, x_r, stats_r, _ = f(cfg, w, x0_b, scen_b, None)
    np.testing.assert_array_equal(np.asarray(stats_k.iters),
                                  np.asarray(stats_r.iters))
    np.testing.assert_array_equal(np.asarray(stats_k.status),
                                  np.asarray(stats_r.status))
    np.testing.assert_allclose(np.asarray(x_k), np.asarray(x_r), atol=1e-3)


def test_kernel_alm_mode_matches_xla(small_problem):
    cfg, w, x0_b, scen_b = small_problem
    cfg_alm = dataclasses.replace(cfg, solve_type="alm")
    u_k, x_k, stats_k = cilqr_solve_pallas(cfg_alm, w, x0_b, scen_b,
                                           window=256, interpret=True)
    f = jax.jit(jax.vmap(solve, in_axes=(None, None, 0, 0, None)),
                static_argnums=0)
    u_r, x_r, stats_r, _ = f(cfg_alm, w, x0_b, scen_b, None)
    np.testing.assert_array_equal(np.asarray(stats_k.iters),
                                  np.asarray(stats_r.iters))
    np.testing.assert_array_equal(np.asarray(stats_k.status),
                                  np.asarray(stats_r.status))
    np.testing.assert_allclose(np.asarray(u_k), np.asarray(u_r), atol=1e-4)
    np.testing.assert_allclose(np.asarray(x_k), np.asarray(x_r), atol=1e-4)


def test_kernel_rejects_alm_with_warm_start(small_problem):
    cfg, w, x0_b, scen_b = small_problem
    cfg_bad = dataclasses.replace(cfg, solve_type="alm", use_last_solution=True)
    with pytest.raises(NotImplementedError):
        cilqr_solve_pallas(cfg_bad, w, x0_b, scen_b, interpret=True)


def test_kernel_warm_start_matches_xla(small_problem):
    """u_init threads through as the initial trajectory (the reference's
    shifted-previous-solution warm start is applied by the caller)."""
    cfg, w, x0_b, scen_b = small_problem
    cfg_ws = dataclasses.replace(cfg, use_last_solution=True)
    # first (cold) solve
    u1, _, _ = cilqr_solve_pallas(cfg_ws, w, x0_b, scen_b, window=256,
                                  interpret=True)
    shifted = jnp.concatenate([u1[:, 1:], u1[:, -1:]], axis=1)
    u2, x2, st2 = cilqr_solve_pallas(cfg_ws, w, x0_b, scen_b, window=256,
                                     interpret=True, u_init=shifted)
    # XLA path with an explicit carry reproducing the same warm start
    from ilqr_tpu.types import CILQRCarry
    f = jax.jit(jax.vmap(solve, in_axes=(None, None, 0, 0, 0)),
                static_argnums=0)
    B = x0_b.shape[0]
    carry = CILQRCarry(
        last_u=u1,
        is_first=jnp.zeros((B,), bool),
        alm_rho=jnp.zeros((B,), jnp.float32),
        alm_mu=jnp.zeros((B, cfg.N, cfg.num_constraints), jnp.float32),
    )
    u_r, x_r, st_r, _ = f(cfg_ws, w, x0_b, scen_b, carry)
    np.testing.assert_array_equal(np.asarray(st2.iters), np.asarray(st_r.iters))
    np.testing.assert_allclose(np.asarray(u2), np.asarray(u_r), atol=1e-4)
    np.testing.assert_allclose(np.asarray(x2), np.asarray(x_r), atol=1e-4)


def test_kernel_mpc_driver(small_problem):
    from ilqr_tpu.sim.mpc import run_mpc_kernel

    cfg, w, x0_b, scen_b = small_problem
    B = x0_b.shape[0]
    T = cfg.N + 1 + 3
    obs_full = jnp.concatenate(
        [scen_b.obs_preds,
         jnp.broadcast_to(scen_b.obs_preds[:, :, -1:],
                          (B, scen_b.obs_preds.shape[1], 3, 3))], axis=2)
    ego, us, stats = run_mpc_kernel(
        cfg, w, x0_b, scen_b.ref_line, scen_b.ref_velo, obs_full,
        scen_b.road_borders, ticks=3, window=256, interpret=True)
    assert ego.shape == (4, B, 4)
    assert us.shape == (3, B, cfg.N, 2)
    # vehicles advance each tick
    assert np.all(np.asarray(ego[-1, :, 0]) > np.asarray(ego[0, :, 0]))


def test_kernel_pads_batch_to_lane_multiple(small_problem):
    cfg, w, x0_b, scen_b = small_problem
    # B=8 is far from a multiple of 128: outputs must still be (8, ...)
    u_k, x_k, stats_k = cilqr_solve_pallas(cfg, w, x0_b, scen_b, window=256,
                                           interpret=True)
    assert u_k.shape == (8, cfg.N, 2)
    assert x_k.shape == (8, cfg.N + 1, 4)
    assert stats_k.iters.shape == (8,)


def test_kernel_straggler_compaction_bitwise_exact(small_problem):
    """Two-phase straggler compaction (capped pass + sorted resume) must be
    bitwise identical to the single-pass kernel: the resume carry is exact
    (trajectory = deterministic rollout of the carried controls)."""
    cfg, w, x0_b, scen_b = small_problem
    u1, x1, st1 = cilqr_solve_pallas(cfg, w, x0_b, scen_b, window=256,
                                     interpret=True)
    # cap below max_iter (8) so phase 2 genuinely resumes mid-solve
    u2, x2, st2 = cilqr_solve_pallas(cfg, w, x0_b, scen_b, window=256,
                                     interpret=True, straggler_cap=3)
    np.testing.assert_array_equal(np.asarray(u1), np.asarray(u2))
    np.testing.assert_array_equal(np.asarray(x1), np.asarray(x2))
    np.testing.assert_array_equal(np.asarray(st1.iters), np.asarray(st2.iters))
    np.testing.assert_array_equal(np.asarray(st1.status), np.asarray(st2.status))
    np.testing.assert_array_equal(np.asarray(st1.final_cost),
                                  np.asarray(st2.final_cost))
    np.testing.assert_array_equal(np.asarray(st1.final_lamb),
                                  np.asarray(st2.final_lamb))


def test_kernel_straggler_compaction_rejects_alm(small_problem):
    cfg, w, x0_b, scen_b = small_problem
    cfg_alm = dataclasses.replace(cfg, solve_type="alm")
    with pytest.raises(NotImplementedError):
        cilqr_solve_pallas(cfg_alm, w, x0_b, scen_b, window=256,
                           interpret=True, straggler_cap=3)


def test_kernel_straggler_multiphase_bitwise_exact(small_problem):
    cfg, w, x0_b, scen_b = small_problem
    u1, x1, st1 = cilqr_solve_pallas(cfg, w, x0_b, scen_b, window=256,
                                     interpret=True)
    u3, x3, st3 = cilqr_solve_pallas(cfg, w, x0_b, scen_b, window=256,
                                     interpret=True, straggler_cap=(2, 5))
    np.testing.assert_array_equal(np.asarray(u1), np.asarray(u3))
    np.testing.assert_array_equal(np.asarray(x1), np.asarray(x3))
    np.testing.assert_array_equal(np.asarray(st1.iters), np.asarray(st3.iters))
    np.testing.assert_array_equal(np.asarray(st1.status), np.asarray(st3.status))


def test_kernel_projection_bound_generous_is_exact(small_problem):
    """A generous per-step search bound never binds, so results must be
    bitwise identical to the full-window scan."""
    cfg, w, x0_b, scen_b = small_problem
    u1, x1, st1 = cilqr_solve_pallas(cfg, w, x0_b, scen_b, window=256,
                                     interpret=True)
    u2, x2, st2 = cilqr_solve_pallas(cfg, w, x0_b, scen_b, window=256,
                                     interpret=True, proj_rows_per_step=23)
    np.testing.assert_array_equal(np.asarray(u1), np.asarray(u2))
    np.testing.assert_array_equal(np.asarray(x1), np.asarray(x2))
    np.testing.assert_array_equal(np.asarray(st1.iters), np.asarray(st2.iters))
    np.testing.assert_array_equal(np.asarray(st1.status), np.asarray(st2.status))


def test_kernel_groups8_matches_groups1(small_problem):
    """Group-interleaved layout (groups=8, full-vreg per-step rows) vs the
    replicated-row layout. Fold-based reduction orders differ in f32
    rounding, so unconverged oscillator rows may take different paths; the
    validation criteria are the hardware ones (tools/validate_kernel_tpu.py):
    identical iteration counts/statuses on this margin-comfortable problem
    and tight solution agreement on converged rows."""
    cfg, w, x0_b, scen_b = small_problem
    u1, x1, st1 = cilqr_solve_pallas(cfg, w, x0_b, scen_b, window=64,
                                     interpret=True)
    u8, x8, st8 = cilqr_solve_pallas(cfg, w, x0_b, scen_b, window=64,
                                     interpret=True, groups=8)
    np.testing.assert_array_equal(np.asarray(st1.iters), np.asarray(st8.iters))
    np.testing.assert_array_equal(np.asarray(st1.status),
                                  np.asarray(st8.status))
    conv = np.asarray(st1.converged)
    assert conv.any()
    np.testing.assert_allclose(np.asarray(u8)[conv], np.asarray(u1)[conv],
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(x8)[conv], np.asarray(x1)[conv],
                               atol=1e-4)


def test_kernel_groups8_straggler_resume_bitwise(small_problem):
    """Straggler compaction at groups=8 must still be an exact resume:
    capped-pass + sorted-resume == single pass, bitwise."""
    cfg, w, x0_b, scen_b = small_problem
    u1, x1, st1 = cilqr_solve_pallas(cfg, w, x0_b, scen_b, window=64,
                                     interpret=True, groups=8)
    u2, x2, st2 = cilqr_solve_pallas(cfg, w, x0_b, scen_b, window=64,
                                     interpret=True, groups=8,
                                     straggler_cap=3)
    np.testing.assert_array_equal(np.asarray(u1), np.asarray(u2))
    np.testing.assert_array_equal(np.asarray(x1), np.asarray(x2))
    np.testing.assert_array_equal(np.asarray(st1.iters), np.asarray(st2.iters))
    np.testing.assert_array_equal(np.asarray(st1.status),
                                  np.asarray(st2.status))
