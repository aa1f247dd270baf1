"""On-hardware bitwise check: chunked packed-alpha line search vs serial.

The packed line search (ls_chunk, ops/pallas/cilqr_kernel.py) is bitwise-
identical to the serial trial loop by construction and verified so in
interpret mode (tests/test_pallas_kernel.py). This tool proves the same on
the real TPU at full bench shapes -- the check that catches the Mosaic/XLA
miscompile failure modes this stack has produced before (see
docs/PERFORMANCE.md "Second instance of the same bug family").

Usage: python tools/check_ls_chunk_tpu.py [--batch 2048] [--chunk 8]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=2048)
    ap.add_argument("--chunk", type=int, default=8)
    ap.add_argument("--cap", default="8,16,32")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from ilqr_tpu.config import GlobalConfig
    from ilqr_tpu.ops.pallas.cilqr_kernel import cilqr_solve_pallas
    from ilqr_tpu.sim.scenario import build_scenario_setup, perturbed_initial_states
    from ilqr_tpu.types import CILQRConfig, CILQRWeights

    here = os.path.dirname(os.path.abspath(__file__))
    gc = GlobalConfig.from_file(
        os.path.join(here, "..", "configs", "scenario_two_straight.yaml"))
    st = build_scenario_setup(gc)
    cfg = CILQRConfig.from_global_config(gc)
    w = CILQRWeights.from_global_config(gc, dtype=jnp.float32)
    scen = st.device_scenario(tick=0, dtype=jnp.float32)
    B = args.batch
    x0 = jnp.asarray(perturbed_initial_states(st.ego_x0, B, seed=0),
                     jnp.float32)
    sb = jax.tree.map(lambda a: jnp.stack([a] * B), scen)
    cap = tuple(int(c) for c in args.cap.split(",") if c)
    kw = dict(window=384, straggler_cap=cap, proj_rows_per_step=18,
              interpret=jax.default_backend() == "cpu")

    outs = {}
    for chunk in (0, args.chunk):
        t0 = time.perf_counter()
        u, x, s = cilqr_solve_pallas(cfg, w, x0, sb, ls_chunk=chunk, **kw)
        r = tuple(np.asarray(a) for a in
                  (u, x, s.iters, s.status, s.final_cost, s.final_lamb))
        print(f"ls_chunk={chunk}: first call {time.perf_counter()-t0:.1f}s "
              f"(compile+run) mean_iters={r[2].mean():.2f} "
              f"conv={np.mean(s.converged):.3f}", flush=True)
        # steady-state timing
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            u, x, s = cilqr_solve_pallas(cfg, w, x0, sb, ls_chunk=chunk, **kw)
            np.asarray(s.final_cost)  # real sync through the relay
            ts.append(time.perf_counter() - t0)
        dt = float(np.median(ts))
        print(f"ls_chunk={chunk}: median step {dt*1e3:.1f}ms = "
              f"{B/dt:.0f} solves/s", flush=True)
        outs[chunk] = r

    names = ("u", "x", "iters", "status", "final_cost", "final_lamb")
    ok = True
    for n, a, b in zip(names, outs[0], outs[args.chunk]):
        eq = np.array_equal(a, b)
        ok &= eq
        if not eq:
            d = np.max(np.abs(a.astype(np.float64) - b.astype(np.float64)))
            frac = np.mean(a != b)
            print(f"MISMATCH {n}: max|diff|={d:.3e} frac_diff={frac:.4f}")
    print("BITWISE_OK" if ok else "BITWISE_FAIL")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
