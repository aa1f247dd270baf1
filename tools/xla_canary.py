"""On-hardware canary for the two known XLA/Mosaic miscompile families.

This stack (v5e + remote-relay XLA) miscompiles two program shapes that
are otherwise valid JAX (full investigations: docs/PERFORMANCE.md
"groups=8 + straggler compaction" and "Second instance of the same bug
family"; minimal repros: tools/debug/):

  1. scan-loop family: a pallas_call looped by ``lax.scan`` returns
     correct results on iteration 1 and silently wrong ones from
     iteration 2 on. Guarded by ``run_mpc_kernel_scan(unroll=True)``.
  2. G8 multi-call family: the two-phase straggler-compaction program
     (capped kernel -> argsort/gather -> resume kernel) returns garbage
     from its first call at groups>1, though each piece is individually
     correct. Guarded by a NotImplementedError in cilqr_solve_pallas.

Both guards rest on one observed stack version. This canary re-checks
each family cheaply (tiny shapes, reduced max_iter) so a toolchain
upgrade that fixes *or re-breaks* them is caught by one command instead
of a re-debug. Known-good answers come from the same kernel in the
proven-correct program shape (straight-line chaining / single-pass),
both run on hardware in the same process.

Usage:  python tools/xla_canary.py [--batch 256] [--skip-g8]

Exit codes:
  0  status quo: both miscompiles still PRESENT -> existing guards valid.
  2  the stack CHANGED (a family now ABSENT): good news, but re-evaluate
     the guards -- flipping ``unroll=False`` re-enables compile-time
     scaling for long episodes, and lifting the G8 guard re-opens the
     group-interleaved layout.
  1  a proven-good shape now MISgives wrong answers (new regression), or
     the canary itself failed.
"""

import argparse
import dataclasses
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _setup(batch, N, max_iter, seed=0):
    import jax
    import jax.numpy as jnp

    from ilqr_tpu.config import GlobalConfig
    from ilqr_tpu.sim.scenario import (build_scenario_setup,
                                       perturbed_initial_states)
    from ilqr_tpu.types import CILQRConfig, CILQRWeights

    gc = GlobalConfig.from_file(
        os.path.join(REPO, "configs", "scenario_two_straight.yaml"))
    st = build_scenario_setup(gc)
    cfg = dataclasses.replace(
        CILQRConfig.from_global_config(gc, max_iter=max_iter), N=N,
        use_last_solution=True)
    w = CILQRWeights.from_global_config(gc, dtype=jnp.float32)
    x0_b = jnp.asarray(
        perturbed_initial_states(st.ego_x0, batch, seed=seed), jnp.float32)
    return gc, st, cfg, w, x0_b


def check_scan_loop(batch: int) -> str:
    """Family 1: episode driver with lax.scan-looped kernel vs the
    bitwise-proven straight-line chaining (tools/results/
    mpc_unroll_check.log). 2 ticks suffice: the bug fires by tick 2 (and
    at small shapes can corrupt even tick 1's stacked outputs -- observed
    on the 2026-08 stack, tools/results/xla_canary.log). The host-loop
    driver (one dispatch per tick, no scan anywhere) is the known-good
    answer both forms are judged against."""
    import jax
    import jax.numpy as jnp

    from ilqr_tpu.sim.mpc import run_mpc_kernel, run_mpc_kernel_scan

    ticks, N, window = 2, 30, 256
    gc, st, cfg, w, x0_b = _setup(batch, N, max_iter=12)
    scenario = st.device_scenario(tick=0, dtype=jnp.float32)
    obs_full = jnp.asarray(st.obs_preds_array(), jnp.float32)
    need = ticks + N + 1
    if obs_full.shape[1] < need:
        pad = jnp.broadcast_to(obs_full[:, -1:],
                               (obs_full.shape[0], need - obs_full.shape[1], 3))
        obs_full = jnp.concatenate([obs_full, pad], axis=1)
    B = batch
    args = (w, x0_b,
            jnp.stack([scenario.ref_line] * B),
            jnp.stack([jnp.asarray(scenario.ref_velo, jnp.float32)] * B),
            jnp.stack([obs_full] * B),
            jnp.stack([scenario.road_borders] * B))
    kw = dict(ticks=ticks, window=window, straggler_cap=0,
              proj_rows_per_step=0)
    # known-good: host loop, no scan in the program at all
    ego_h, us_h, _ = run_mpc_kernel(cfg, *args, **kw)
    ego_h, us_h = np.asarray(ego_h), np.asarray(us_h)
    ego_u, us_u, _ = run_mpc_kernel_scan(cfg, *args, unroll=True, **kw)
    ego_u, us_u = np.asarray(ego_u), np.asarray(us_u)
    ego_s, us_s, _ = run_mpc_kernel_scan(cfg, *args, unroll=False, **kw)
    ego_s, us_s = np.asarray(ego_s), np.asarray(us_s)
    # the production (unrolled) form must match the host loop bitwise --
    # if not, the known-good shape itself regressed
    if not (np.array_equal(ego_u, ego_h) and np.array_equal(us_u, us_h)):
        return "REGRESSION"
    equal = (np.array_equal(ego_s, ego_h) and np.array_equal(us_s, us_h))
    return "ABSENT" if equal else "PRESENT"


def check_g8_multicall(batch: int) -> str:
    """Family 2: groups=8 + straggler compaction (two pallas calls with an
    argsort/gather between) vs the single-pass groups=8 solve, which is
    validated correct on hardware (tools/results/val_g8_b.log). The
    compaction resume is bitwise-exact by construction (proven at G=1 on
    hardware, g1_resume_tpu.log), so any mismatch here is the miscompile.
    Repro scale from round 2: N=6, cap 3, tiny max_iter."""
    import jax
    import jax.numpy as jnp

    from ilqr_tpu.ops.pallas.cilqr_kernel import cilqr_solve_pallas

    N, W, max_iter, cap, G = 6, 64, 8, 3, 8
    gc, st, cfg, w, x0_b = _setup(batch, N, max_iter=max_iter)
    scenario = st.device_scenario(tick=0, horizon=N, dtype=jnp.float32)
    scen_b = jax.tree.map(lambda a: jnp.stack([a] * batch), scenario)
    kw = dict(window=W, interpret=False, groups=G, proj_rows_per_step=0)
    u1, _, s1 = cilqr_solve_pallas(cfg, w, x0_b, scen_b, straggler_cap=0,
                                   **kw)
    u1, i1 = np.asarray(u1), np.asarray(s1.iters)
    os.environ["ILQR_UNSAFE_ALLOW_G8_CAP"] = "1"
    try:
        u2, _, s2 = cilqr_solve_pallas(cfg, w, x0_b, scen_b,
                                       straggler_cap=cap, **kw)
    finally:
        del os.environ["ILQR_UNSAFE_ALLOW_G8_CAP"]
    u2, i2 = np.asarray(u2), np.asarray(s2.iters)
    equal = np.array_equal(u1, u2) and np.array_equal(i1, i2)
    return "ABSENT" if equal else "PRESENT"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=256,
                    help="rows per check (G8 check pads to 1024 internally)")
    ap.add_argument("--skip-g8", action="store_true")
    args = ap.parse_args()

    import jax
    print(f"backend={jax.default_backend()}", flush=True)
    if jax.default_backend() == "cpu":
        print("canary is only meaningful on TPU hardware "
              "(interpret/CPU paths are exact); exiting 0", flush=True)
        return 0

    changed = regressed = False
    r = check_scan_loop(args.batch)
    print(f"scan_loop_family: {r}", flush=True)
    regressed |= r == "REGRESSION"
    changed |= r == "ABSENT"
    if not args.skip_g8:
        r = check_g8_multicall(args.batch)
        print(f"g8_multicall_family: {r}", flush=True)
        changed |= r == "ABSENT"

    if regressed:
        print("CANARY: the proven-good program shape itself regressed -- "
              "do not trust current numbers", flush=True)
        return 1
    if changed:
        print("CANARY: stack behavior CHANGED -- re-evaluate the unroll/G8 "
              "guards (see module docstring)", flush=True)
        return 2
    print("CANARY: status quo (both miscompiles present; guards valid)",
          flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
