"""Benchmark: batched CILQR throughput (full 30-step scenario solves / sec).

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "solves/s", "vs_baseline": R}

The north star (BASELINE.md) is >= 1e5 full 30-step scenario solves/sec on a
v5e-8; this harness runs on however many chips are visible (normally one),
so vs_baseline is measured against the per-chip share of the north star:
12_500 solves/sec/chip * n_devices.

Default workload (BENCH_MODE=mpc): the reference's own workload -- batched
receding-horizon episodes at the yaml's full length (120 ticks x batch
full 30-step solves per run, src/motion_planning.cpp:180-270 +
max_simulation_time in scenario_two_straight.yaml), scenario_two_straight
(3 obstacles, N=30, nx=4, nu=2), perturbed initial states, full solver
semantics (max_iter=100, line search, status machine) in float32, with the
reference's use_last_solution shifted-u warm start between ticks
(src/cilqr_solver.cpp:163-180; BENCH_WARM=0 disables). Episodes run on the
chunked fused-kernel driver, verified tick-for-tick bitwise against the
plain host-loop driver on hardware (docs/PERFORMANCE.md
"Reference-length episodes"; measured 148.2k solves/s on one v5e chip
at the round-5 defaults). Metric: "cilqr_mpc_solves_per_sec".

BENCH_MODE=cold benches independent single cold solves instead (metric
"cilqr_solves_per_sec"; 56.1k solves/s on one v5e chip). Historical note:
round-2's 99.5k/104k MPC figures were artifacts of the lax.scan
miscompile (docs/PERFORMANCE.md "Second instance of the same bug
family") and were retracted; today's episode numbers come from the
bitwise-verified drivers only.
"""

import json
import os
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp


def build_mpc(batch: int, ticks: int, dtype=jnp.float32):
    """BENCH_MODE=mpc: batched receding-horizon episodes -- the reference's
    own workload shape (120-150 MPC solves per scenario,
    src/motion_planning.cpp:180-270). Counts batch*ticks full 30-step
    solves per episode run.

    ticks <= 20 runs the single-program unrolled driver
    (run_mpc_kernel_scan); longer episodes use the chunked driver
    (run_mpc_kernel_chunked: one compiled 10-tick chunk program dispatched
    repeatedly with device-resident carries -- tick-for-tick identical to
    the host loop, tests/test_pallas_kernel.py), which is how the
    reference-length 120-tick episode measures 148.2k solves/s on one v5e
    chip at batch 8192 (docs/PERFORMANCE.md "Reference-length episodes")."""
    from ilqr_tpu.config import GlobalConfig
    from ilqr_tpu.sim.mpc import run_mpc_kernel_chunked, run_mpc_kernel_scan
    from ilqr_tpu.sim.scenario import build_scenario_setup, perturbed_initial_states
    from ilqr_tpu.types import CILQRConfig, CILQRWeights

    here = os.path.dirname(os.path.abspath(__file__))
    gc = GlobalConfig.from_file(os.path.join(here, "configs", "scenario_two_straight.yaml"))
    st = build_scenario_setup(gc)
    cfg = CILQRConfig.from_global_config(gc)
    if os.environ.get("BENCH_WARM", "1") == "1":
        # shifted-previous-u warm start between ticks (the reference's
        # use_last_solution mode, src/cilqr_solver.cpp:163-180)
        import dataclasses
        cfg = dataclasses.replace(cfg, use_last_solution=True)
    w = CILQRWeights.from_global_config(gc, dtype=dtype)
    scenario = st.device_scenario(tick=0, dtype=dtype)
    B = batch
    # per-step projection search bound; -1 derives 1.1x the target
    # velocity (see cilqr_kernel.derive_proj_rows -- with slack 16,
    # +25.4% cold / +14.7% episodes over the legacy 1.5x-speed-limit
    # bound, anchor-validated with bound-never-binds statistics),
    # 0 disables
    proj_rows = int(os.environ.get("BENCH_PROJ", "-1"))
    if proj_rows < 0:
        from ilqr_tpu.ops.pallas.cilqr_kernel import derive_proj_rows
        proj_rows = derive_proj_rows(gc["vehicle/target_velocity"],
                                     gc["delta_t"])
    # multi-phase straggler schedule, same default as the cold bench:
    # 51.2k solves/s vs 29.1k at the round-2 single cap 24
    # (tools/results/bench_mpc_cap81632.log vs bench_mode_mpc_unrolled.log)
    cap_s = os.environ.get("BENCH_CAP", "8,16,32")
    cap = tuple(int(c) for c in cap_s.split(",") if c) if "," in cap_s \
        else int(cap_s)
    # warm ticks converge in ~5-6 iters, so a lower straggler schedule
    # pays there. Round-5 sweep (bench_mpc_r5_capw*.log): 4,8,16 ->
    # 129.0k, 5,10,20 -> 144.3k, 6,12,24 -> 148.2k (peak), 7,14,28 ->
    # 145.3k, same-as-cold 8,16,32 -> 142.2k; two-phase 8,16 -> 126.6k.
    # Episodes are bitwise-identical across schedules (compaction+exact
    # resume), so this is a pure perf knob. "" = use the cold schedule.
    capw_s = os.environ.get("BENCH_CAP_WARM", "6,12,24")
    capw = None
    if capw_s:
        capw = (tuple(int(c) for c in capw_s.split(",") if c)
                if "," in capw_s else int(capw_s))
    window = int(os.environ.get("BENCH_WINDOW", "384"))
    # back-window rows behind the initial projection: 24 measured +3.3%
    # over the kernel's 64 default with identical full-size validation
    # results on all four scenarios (docs/PERFORMANCE.md, the w_back
    # paragraph; tools/results/val_r4_wback24_anchored.log)
    w_back = int(os.environ.get("BENCH_WBACK", "24"))
    interpret = jax.default_backend() == "cpu"  # smoke-test path only
    x0_b = jnp.asarray(perturbed_initial_states(st.ego_x0, B, seed=0), dtype)
    obs_full = jnp.asarray(st.obs_preds_array(), dtype)
    need = ticks + cfg.N + 1
    if obs_full.shape[1] < need:
        pad = jnp.broadcast_to(obs_full[:, -1:],
                               (obs_full.shape[0], need - obs_full.shape[1], 3))
        obs_full = jnp.concatenate([obs_full, pad], axis=1)
    ref_b = jnp.stack([scenario.ref_line] * B)
    rv_b = jnp.stack([jnp.asarray(scenario.ref_velo, dtype)] * B)
    rb_b = jnp.stack([scenario.road_borders] * B)
    obs_b = jnp.stack([obs_full] * B)
    n_dev = len(jax.devices())
    if n_dev > 1 and ticks > 20:
        # reference-length episodes over the mesh: sharded chunked driver
        # (tick-for-tick equal to the single-device one, tests/
        # test_sharding.py)
        from ilqr_tpu.parallel import make_mesh, run_mpc_chunked_sharded

        mesh = make_mesh(n_dev)
        chunk = int(os.environ.get("BENCH_CHUNK", "10"))

        def run():
            ego, us, stats = run_mpc_chunked_sharded(
                mesh, cfg, w, x0_b, ref_b, rv_b, obs_b, rb_b, ticks=ticks,
                chunk=chunk, window=window, straggler_cap=cap,
                straggler_cap_warm=capw, proj_rows_per_step=proj_rows,
                interpret=interpret)
            return stats.iters, jnp.mean(ego[-1, :, 0])

        return run, n_dev
    if n_dev > 1:
        from functools import partial

        from jax.sharding import PartitionSpec as P

        from ilqr_tpu.parallel import make_mesh, shard_batch
        from ilqr_tpu.parallel.sharding import replicate

        mesh = make_mesh(n_dev)
        episode = partial(run_mpc_kernel_scan, cfg, ticks=ticks,
                          window=window, straggler_cap=cap,
                          straggler_cap_warm=capw,
                          proj_rows_per_step=proj_rows, interpret=interpret)

        @partial(jax.shard_map, mesh=mesh,
                 in_specs=(P(), P("data"), P("data"), P("data"), P("data"),
                           P("data")),
                 out_specs=(P(None, "data"), P(None, "data"), P(None, "data")),
                 check_vma=False)
        def _ep(w_, x0, rl, rv, ob, rb):
            ego, us, stats = episode(w_, x0, rl, rv, ob, rb)
            return ego, us, stats.iters

        w_d = replicate(mesh, w)
        args_d = tuple(shard_batch(mesh, a)
                       for a in (x0_b, ref_b, rv_b, obs_b, rb_b))

        def run():
            ego, us, iters = _ep(w_d, *args_d)
            return iters, jnp.mean(ego[-1, :, 0])
    elif ticks > 20:
        # reference-length episodes: the unrolled single program cannot
        # compile at 120 ticks (remote-compile budget, docs/PERFORMANCE.md);
        # the chunked driver is bitwise-equal to the host loop
        chunk = int(os.environ.get("BENCH_CHUNK", "10"))

        def run():
            ego, us, stats = run_mpc_kernel_chunked(
                cfg, w, x0_b, ref_b, rv_b, obs_b, rb_b, ticks=ticks,
                chunk=chunk, window=window, straggler_cap=cap,
                straggler_cap_warm=capw, proj_rows_per_step=proj_rows,
                interpret=interpret, w_back=w_back)
            return stats.iters, jnp.mean(ego[-1, :, 0])
    else:
        def run():
            ego, us, stats = run_mpc_kernel_scan(
                cfg, w, x0_b, ref_b, rv_b, obs_b, rb_b, ticks=ticks,
                window=window, straggler_cap=cap, straggler_cap_warm=capw,
                proj_rows_per_step=proj_rows, interpret=interpret,
                w_back=w_back)
            return stats.iters, jnp.mean(ego[-1, :, 0])

    return run, n_dev


def build(batch: int, dtype=jnp.float32):
    from ilqr_tpu.config import GlobalConfig
    from ilqr_tpu.sim.scenario import build_scenario_setup, perturbed_initial_states
    from ilqr_tpu.solvers.cilqr import solve
    from ilqr_tpu.types import CILQRConfig, CILQRWeights

    impl = os.environ.get("BENCH_IMPL", "kernel")  # "kernel" | "xla"
    here = os.path.dirname(os.path.abspath(__file__))
    gc = GlobalConfig.from_file(os.path.join(here, "configs", "scenario_two_straight.yaml"))
    st = build_scenario_setup(gc)
    cfg = CILQRConfig.from_global_config(gc)
    w = CILQRWeights.from_global_config(gc, dtype=dtype)
    scenario = st.device_scenario(tick=0, dtype=dtype)
    x0_b = jnp.asarray(perturbed_initial_states(st.ego_x0, batch, seed=0), dtype=dtype)
    scen_b = jax.tree.map(lambda a: jnp.stack([a] * batch), scenario)

    n_dev = len(jax.devices())
    use_kernel = impl == "kernel" and jax.default_backend() != "cpu"
    if use_kernel:
        # 384-sample window validated on this workload: convergence stats
        # identical to the full reference line (see kernel docstring)
        window = int(os.environ.get("BENCH_WINDOW", "384"))
        # straggler compaction: capped pass(es) + sorted exact resume of the
        # unconverged rows (bitwise-identical results; see kernel docstring);
        # comma-separated caps run a multi-phase schedule. 8,16,32 measured
        # best at G=1 on v5e: 36.1k solves/s vs 25.1k at the round-1
        # single cap 24 (tools/results/bench_g1_cap*.log)
        cap_s = os.environ.get("BENCH_CAP", "8,16,32")
        cap = tuple(int(c) for c in cap_s.split(",") if c) if "," in cap_s \
            else int(cap_s)
        # per-step projection search bound; -1 derives 1.1x the target
        # velocity (see cilqr_kernel.derive_proj_rows -- with slack 16,
        # +25.4% cold / +14.7% episodes over the legacy 1.5x-speed-limit
        # bound, anchor-validated with bound-never-binds statistics),
        # 0 disables
        proj_rows = int(os.environ.get("BENCH_PROJ", "-1"))
        if proj_rows < 0:
            from ilqr_tpu.ops.pallas.cilqr_kernel import derive_proj_rows
            proj_rows = derive_proj_rows(gc["vehicle/target_velocity"],
                                         gc["delta_t"])
        # window rows behind the initial projection (see kernel docstring):
        # 24 measured +3.3% over the kernel's 64 default with identical
        # full-size validation results on all four scenarios
        # (tools/results/val_r4_wback24_anchored.log, bench_cold_wback24_projdot.log)
        w_back = int(os.environ.get("BENCH_WBACK", "24"))
        # scenario groups per kernel tile (1 = replicated per-step rows,
        # 8 = full-vreg rows; see cilqr_kernel._build_kernel)
        groups = int(os.environ.get("BENCH_GROUPS", "1"))
    if use_kernel and n_dev > 1:
        # fused kernel per shard, batch row-partitioned over the mesh
        from ilqr_tpu.parallel import make_mesh, shard_batch, sharded_kernel_solve_fn
        from ilqr_tpu.parallel.sharding import replicate

        mesh = make_mesh(n_dev)
        fn = sharded_kernel_solve_fn(
            mesh, cfg, window=window, straggler_cap=cap,
            proj_rows_per_step=proj_rows, groups=groups)
        w_d = replicate(mesh, w)
        x0_d = shard_batch(mesh, x0_b)
        scen_d = shard_batch(mesh, scen_b)

        def run():
            u, x, stats, summary = fn(w_d, x0_d, scen_d)
            return stats.iters, summary["converged_frac"]
    elif n_dev > 1:
        from ilqr_tpu.parallel import make_mesh, shard_batch, sharded_solve_fn
        from ilqr_tpu.parallel.sharding import replicate

        mesh = make_mesh(n_dev)
        fn = sharded_solve_fn(mesh, cfg)
        w_d = replicate(mesh, w)
        x0_d = shard_batch(mesh, x0_b)
        scen_d = shard_batch(mesh, scen_b)

        def run():
            u, x, stats, summary = fn(w_d, x0_d, scen_d)
            return stats.iters, summary["converged_frac"]
    elif use_kernel:
        from ilqr_tpu.ops.pallas.cilqr_kernel import cilqr_solve_pallas

        def run():
            u, x, stats = cilqr_solve_pallas(cfg, w, x0_b, scen_b,
                                             window=window, straggler_cap=cap,
                                             proj_rows_per_step=proj_rows,
                                             groups=groups, w_back=w_back)
            return stats.iters, jnp.mean(stats.converged.astype(jnp.float32))
    else:
        cfg = CILQRConfig.from_global_config(gc, line_search_width=4)
        vsolve = jax.jit(
            jax.vmap(solve, in_axes=(None, None, 0, 0, None)), static_argnums=0
        )

        def run():
            u, x, stats, _ = vsolve(cfg, w, x0_b, scen_b, None)
            return stats.iters, jnp.mean(stats.converged.astype(jnp.float32))

    return run, n_dev


def main():
    iters = int(os.environ.get("BENCH_ITERS", "10"))
    # default = the reference's workload shape (full-length MPC episodes)
    # on accelerators; CPU keeps the cold XLA path (the kernel only runs
    # in interpret mode there -- a test vehicle, not a performance path)
    default_mode = "cold" if jax.default_backend() == "cpu" else "mpc"
    mode = os.environ.get("BENCH_MODE", default_mode)  # "mpc" | "cold"
    # per-mode batch defaults (round 5): cold solves amortize dispatch
    # further at 16384 (59.5k vs 56.1k, bench_cold_r5_b16384.log) while
    # 120-tick episodes regress there (130.1k vs 142.2k -- chunk-carry
    # locality), so each mode defaults to its measured-best batch; the
    # CPU smoke keeps a small batch (the XLA fallback path is ~1000x
    # slower per solve)
    if jax.default_backend() == "cpu":
        default_batch = "64"
    else:
        default_batch = "16384" if mode == "cold" else "8192"
    batch = int(os.environ.get("BENCH_BATCH", default_batch))
    ticks = int(os.environ.get("BENCH_TICKS", "120"))
    if mode == "mpc":
        run, n_dev = build_mpc(batch, ticks)
        solves_per_run = batch * ticks
        metric = "cilqr_mpc_solves_per_sec"
    else:
        run, n_dev = build(batch)
        solves_per_run = batch
        metric = "cilqr_solves_per_sec"

    # warmup / compile; NOTE: on the axon remote backend block_until_ready
    # does not actually synchronize, so every timed step fetches a (small)
    # output to host (np.asarray) to bound the real completion time.
    out = run()
    np.asarray(out[1])

    samples = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = run()
        np.asarray(out[1])  # scalar converged-fraction: minimal fetch
        samples.append(time.perf_counter() - t0)
    dt = float(np.median(samples))
    solves_per_sec = solves_per_run / dt

    baseline_per_chip = 1e5 / 8.0  # north-star v5e-8 target, per chip
    result = {
        "metric": metric,
        "value": round(solves_per_sec, 1),
        "unit": "solves/s",
        "vs_baseline": round(solves_per_sec / (baseline_per_chip * n_dev), 4),
    }
    print(json.dumps(result))
    aux = ("final_ego_x_mean" if mode == "mpc" else "converged")
    print(
        f"# mode={mode} batch={batch} devices={n_dev} "
        f"median_step={dt*1e3:.1f}ms "
        f"mean_iters={float(jnp.mean(out[0])):.1f} {aux}={float(out[1]):.2f}",
        file=sys.stderr,
    )


if __name__ == "__main__":
    main()
