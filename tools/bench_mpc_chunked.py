"""Reference-length MPC episodes on the fused-kernel chunked driver.

The reference's actual workload is a 120-150-tick receding-horizon episode
(max_simulation_time in each yaml / src/motion_planning.cpp:180). The
single-program driver must unroll its tick loop (lax.scan miscompile) and
cannot compile at 120 ticks; run_mpc_kernel_chunked dispatches ONE
compiled chunk program repeatedly with device-resident carries.

Modes:
  --check  20-tick chunked vs host-loop drivers, tick-for-tick bitwise
  (default)  full-length episode benchmark (ticks from the yaml)

Usage:
  python tools/bench_mpc_chunked.py [--batch 1024] [--chunk 10]
      [--ticks 0 = yaml length] [--cap 8,16,32] [--warm] [--check]
"""

import argparse
import dataclasses
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=1024)
    ap.add_argument("--chunk", type=int, default=10)
    ap.add_argument("--ticks", type=int, default=0,
                    help="0 = the yaml's max_simulation_time / delta_t")
    ap.add_argument("--cap", default="8,16,32")
    ap.add_argument("--cap-warm", default="",
                    help="straggler schedule for warm ticks (all but the "
                    "episode's first); empty = same as --cap")
    ap.add_argument("--window", type=int, default=384)
    ap.add_argument("--warm", action="store_true",
                    help="use_last_solution shifted-u warm start")
    ap.add_argument("--scenario", default="scenario_two_straight")
    ap.add_argument("--check", action="store_true",
                    help="20-tick bitwise check vs the host-loop driver")
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from ilqr_tpu.config import GlobalConfig
    from ilqr_tpu.sim.mpc import run_mpc_kernel, run_mpc_kernel_chunked
    from ilqr_tpu.sim.scenario import (build_scenario_setup,
                                       perturbed_initial_states)
    from ilqr_tpu.types import CILQRConfig, CILQRWeights

    gc = GlobalConfig.from_file(
        os.path.join(REPO, "configs", args.scenario + ".yaml"))
    st = build_scenario_setup(gc)
    cfg = CILQRConfig.from_global_config(gc)
    if args.warm:
        cfg = dataclasses.replace(cfg, use_last_solution=True)
    w = CILQRWeights.from_global_config(gc, dtype=jnp.float32)
    scenario = st.device_scenario(tick=0, dtype=jnp.float32)
    interpret = jax.default_backend() == "cpu"

    ticks = args.ticks or (20 if args.check else st.num_ticks)
    ticks -= ticks % args.chunk
    B = args.batch
    cap_s = str(args.cap)
    cap = (tuple(int(c) for c in cap_s.split(",") if c) if "," in cap_s
           else int(cap_s))
    capw = None
    if args.cap_warm:
        capw = (tuple(int(c) for c in args.cap_warm.split(",") if c)
                if "," in args.cap_warm else int(args.cap_warm))
    proj_rows = int(np.ceil(1.5 * float(gc["vehicle/velo_max"])
                            * float(gc["delta_t"]) / 0.1))

    x0_b = jnp.asarray(perturbed_initial_states(st.ego_x0, B, seed=0),
                       jnp.float32)
    obs_full = jnp.asarray(st.obs_preds_array(), jnp.float32)
    need = ticks + cfg.N + 1
    assert obs_full.shape[1] >= need, \
        f"routing lines too short: {obs_full.shape[1]} < {need}"
    common = (jnp.stack([scenario.ref_line] * B),
              jnp.stack([jnp.asarray(scenario.ref_velo, jnp.float32)] * B),
              jnp.stack([obs_full] * B),
              jnp.stack([scenario.road_borders] * B))
    kw = dict(window=args.window, interpret=interpret, straggler_cap=cap,
              proj_rows_per_step=proj_rows)
    ckw = dict(kw, straggler_cap_warm=capw)
    print(f"backend={jax.default_backend()} scenario={args.scenario} "
          f"B={B} ticks={ticks} chunk={args.chunk} cap={cap} "
          f"cap_warm={capw} "
          f"warm={args.warm}", flush=True)

    if args.check:
        t0 = time.perf_counter()
        ego_c, us_c, st_c = run_mpc_kernel_chunked(
            cfg, w, x0_b, *common, ticks=ticks, chunk=args.chunk, **ckw)
        ego_c, us_c = np.asarray(ego_c), np.asarray(us_c)
        it_c = np.asarray(st_c.iters)
        t_c = time.perf_counter() - t0
        t0 = time.perf_counter()
        ego_h, us_h, st_h = run_mpc_kernel(
            cfg, w, x0_b, *common, ticks=ticks, **kw)
        ego_h, us_h = np.asarray(ego_h), np.asarray(us_h)
        it_h = np.asarray(st_h.iters)
        t_h = time.perf_counter() - t0
        ok = (np.array_equal(ego_c, ego_h) and np.array_equal(us_c, us_h)
              and np.array_equal(it_c, it_h))
        print(f"ego equal={np.array_equal(ego_c, ego_h)} "
              f"u equal={np.array_equal(us_c, us_h)} "
              f"iters equal={np.array_equal(it_c, it_h)} "
              f"max|ego diff|={np.abs(ego_c - ego_h).max():.3g}")
        print(f"ego x per tick (chunked): "
              f"{np.diff(ego_c[:, :, 0].mean(axis=1))[:5].round(3)}...")
        print(f"{'PASS' if ok else 'FAIL'} chunked-vs-host {ticks}-tick bitwise "
              f"(t_chunked={t_c:.1f}s t_host={t_h:.1f}s incl compile)",
              flush=True)
        sys.exit(0 if ok else 1)

    # full-length episode benchmark
    def run():
        ego, us, stats = run_mpc_kernel_chunked(
            cfg, w, x0_b, *common, ticks=ticks, chunk=args.chunk, **ckw)
        return stats.iters, ego[-1, :, 0]

    t0 = time.perf_counter()
    it, final_x = run()
    final_x = np.asarray(final_x)  # forced fetch (relay sync)
    t_compile = time.perf_counter() - t0
    samples = []
    for _ in range(args.reps):
        t0 = time.perf_counter()
        it, final_x = run()
        final_x = np.asarray(final_x)
        samples.append(time.perf_counter() - t0)
    dt = float(np.median(samples))
    solves = B * ticks
    print(f"first-call (incl compile): {t_compile:.1f}s", flush=True)
    print(f"median episode-batch: {dt*1e3:.1f} ms  "
          f"{solves/dt:,.0f} solves/s  "
          f"({dt/ticks*1e3:.1f} ms/tick)  mean_iters="
          f"{float(np.mean(np.asarray(it))):.2f}  "
          f"final_ego_x mean={final_x.mean():.2f}", flush=True)


if __name__ == "__main__":
    main()
