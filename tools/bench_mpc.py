"""MPC episode throughput: host-loop kernel driver vs whole-episode scan.

Measures batched receding-horizon episodes (scenario_two_straight unless
overridden) with the fused kernel under (a) the per-tick host loop
(``run_mpc_kernel``: one dispatch + obstacle-window regather per tick) and
(b) the single-program scan driver (``run_mpc_kernel_scan``). Reports
ticks/sec and solves/sec (= ticks/sec * batch).

Usage: python tools/bench_mpc.py [--batch 1024] [--ticks 10] [--reps 3]
"""

import argparse
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=1024)
    ap.add_argument("--ticks", type=int, default=10)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--window", type=int, default=384)
    ap.add_argument("--cap", type=int, default=24)
    ap.add_argument("--groups", type=int, default=1)
    ap.add_argument("--scenario", default="scenario_two_straight")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from ilqr_tpu.config import GlobalConfig
    from ilqr_tpu.sim.mpc import run_mpc_kernel, run_mpc_kernel_scan
    from ilqr_tpu.sim.scenario import build_scenario_setup, perturbed_initial_states
    from ilqr_tpu.types import CILQRConfig, CILQRWeights

    gc = GlobalConfig.from_file(
        os.path.join(REPO, "configs", args.scenario + ".yaml"))
    st = build_scenario_setup(gc)
    cfg = CILQRConfig.from_global_config(gc)
    w = CILQRWeights.from_global_config(gc, dtype=jnp.float32)
    scenario = st.device_scenario(tick=0, dtype=jnp.float32)
    B, T = args.batch, args.ticks
    proj_rows = int(np.ceil(1.5 * float(gc["vehicle/velo_max"])
                            * float(gc["delta_t"]) / 0.1))
    x0_b = jnp.asarray(perturbed_initial_states(st.ego_x0, B, seed=0),
                       jnp.float32)
    obs_full = jnp.asarray(st.obs_preds_array(), jnp.float32)
    need = T + cfg.N + 1
    if obs_full.shape[1] < need:  # extend by holding the last sample
        pad = jnp.broadcast_to(obs_full[:, -1:],
                               (obs_full.shape[0],
                                need - obs_full.shape[1], 3))
        obs_full = jnp.concatenate([obs_full, pad], axis=1)
    ref_b = jnp.stack([scenario.ref_line] * B)
    rv_b = jnp.stack([jnp.asarray(scenario.ref_velo, jnp.float32)] * B)
    rb_b = jnp.stack([scenario.road_borders] * B)
    obs_b = jnp.stack([obs_full] * B)

    def timed(fn):
        out = fn()  # warmup/compile
        np.asarray(out[0])  # axon relay: fetch to synchronize
        ts = []
        for _ in range(args.reps):
            t0 = time.perf_counter()
            out = fn()
            np.asarray(out[0])
            ts.append(time.perf_counter() - t0)
        return float(np.median(ts))

    common = dict(ticks=T, window=args.window, straggler_cap=args.cap,
                  groups=args.groups, proj_rows_per_step=proj_rows)
    t_host = timed(lambda: run_mpc_kernel(
        cfg, w, x0_b, ref_b, rv_b, obs_b, rb_b, **common))
    t_scan = timed(lambda: run_mpc_kernel_scan(
        cfg, w, x0_b, ref_b, rv_b, obs_b, rb_b, **common))
    for nm, t in [("host_loop", t_host), ("episode_scan", t_scan)]:
        print(f"{nm}: {t*1e3:.1f} ms/episode  {T/t:.1f} ticks/s  "
              f"{B*T/t:.0f} solves/s", flush=True)
    print(f"speedup episode_scan vs host_loop: {t_host/t_scan:.2f}x",
          flush=True)


if __name__ == "__main__":
    main()
