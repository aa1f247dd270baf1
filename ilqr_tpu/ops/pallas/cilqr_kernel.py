"""Fused CILQR solver as a single Pallas TPU kernel.

The XLA-composed solver (ilqr_tpu/solvers/cilqr.py) is launch-bound on TPU:
one solver iteration is ~2,500 small HLO executions (scanned Riccati steps,
rollouts, constraint assembly), each microseconds of overhead for nanoseconds
of math. This kernel runs the *entire* solve -- projection, cost +
derivative assembly, the 30-step backward Riccati recursion, line-search
rollouts, the lambda/status state machine -- inside one ``pallas_call``:
zero dispatch per iteration, everything resident in VMEM/registers.

Layout (TPU-native, structure-of-slabs):
- batch tile of 128 scenarios on the *lane* dimension;
- horizon on the sublane dimension: every per-step quantity is a
  (32, 128) slab (N=30 padded to 32 sublanes), e.g. PX[k, b] = x position
  of scenario b at step k;
- the 4x4/4x2 Riccati algebra is unrolled with the bicycle Jacobians'
  sparsity (A = I + 5 entries, B = 4 entries -- reference
  src/utils.cpp:285-342), so each backward step is ~100 fused
  multiply-adds on (1, 128) rows;
- the nearest-reference-point projection works on a per-scenario window of
  the dense lane line ((W, 128) slabs, gathered once per solve outside the
  kernel) with a min + first-index one-hot reduction instead of a gather;
- the projection of the *accepted* trajectory is carried across iterations,
  so each iteration pays projections only for its line-search trials;
- per-tile early exit: the outer ``lax.while_loop`` stops when every lane
  in the tile is done (converged / lambda overflow -- reference
  src/cilqr_solver.cpp:110-142).

Semantics match the reference C++ solver in both constraint modes:
barrier (the mode of all four shipped scenarios) and ALM, whose dual
state (mu, rho) is kernel I/O since round 2 (``alm_mu0``/``alm_rho0`` in
:func:`cilqr_solve_pallas`, ``return_alm`` to carry duals across MPC
ticks). Warm starting is kernel I/O too: pass ``u_init`` (the shifted
previous solution, reference src/cilqr_solver.cpp:163-180).
"""

from __future__ import annotations

import functools


import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ilqr_tpu.types import CILQRConfig, CILQRWeights, Scenario, SolveStats, SolveStatus

LANES = 128
NH = 32  # horizon slab sublanes (N = 30 -> rows 0..30 used)
W_BACK = 64  # window rows behind the ego's initial projection

# perf-attribution probe (results are WRONG when set; timing only):
#   CILQR_KERNEL_PROBE=noproj  -- skip line-search trial projections
import os as _os
_PROBE = _os.environ.get("CILQR_KERNEL_PROBE", "")
# resume-state debug probe (results are WRONG when set): the resume-variant
# kernel reports what it READ from the resume slab -- final_cost slot gets
# lamb0, final_lamb slot gets active0 + 10*status0 + 1000*iters0
_RESUME_PROBE = _os.environ.get("CILQR_RESUME_PROBE", "") == "1"

# weight vector layout (rows of the (32, 1) SMEM input)
(_DT, _WB, _WIDTH, _LENGTH, _DSAFE, _VMAX, _VMIN, _AMAX, _AMIN, _STL,
 _WPOS, _WVEL, _WYAW, _WACC, _WSTL, _SQ1, _SQ2, _OQ1, _OQ2,
 _ILAMB, _LDECAY, _LAMP, _LMAX, _CONV, _ACCEPT, _ECLIP,
 _ALM_GAMMA, _MAX_RHO, _MAX_MU, _RHO_INIT) = range(30)
_NWTS = 32


def _alpha_count(min_alpha: float) -> int:
    n, a = 0, 1.0
    while a > min_alpha:
        n += 1
        a *= 0.5
    return n


def _build_kernel(N: int, M: int, W: int, max_iter: int, n_alphas: int,
                  rear_center: bool, use_alm: bool,
                  resume: bool = False, it0: int = 0,
                  row_limits=None, G: int = 1, ls_chunk: int = 0,
                  proj_dot: bool = False, proj_fold: bool = False):
    """Returns the kernel body function (closed over static shapes).

    In ALM mode the per-constraint dual state (mu slabs, one per constraint
    column in the reference's layout, plus the scalar rho) lives in the
    iteration carry; duals update on line-search exhaustion exactly like
    the reference (src/cilqr_solver.cpp:377-379, 622-676). The dual state
    is kernel I/O: an extra input slab seeds (mu, rho) -- zeros + rho_init
    reproduces the reference's cold reset (:88-93), a previous solve's
    output is a warm-start carry (:94-102) -- and an extra output slab
    returns the final duals, so ALM composes with MPC warm starts and with
    straggler compaction.

    ``resume``: the kernel takes one extra (8, 128) input in the stats_out
    layout and restarts the solver loop mid-flight from it at lockstep
    iteration ``it0``. This is exact because the full iteration carry is
    reconstructible: the trajectory is the deterministic rollout of the
    carried controls from x0 (forward() produces exactly that rollout),
    its projection is a pure function of the trajectory, and the remaining
    scalars (lambda, status, converged/overflow flags, iteration counts)
    ride the stats slab; in ALM mode the dual slabs ride the ALM I/O slab.
    Used for straggler compaction (see ``cilqr_solve_pallas``).

    ``G`` (group-interleaved layout): each tile carries G*128 scenarios.
    Slab row k*G+g holds step k of scenario group g, so every per-step
    quantity is a (G, 128) value -- a *full vector register* at G=8
    instead of the 1/8-utilized replicated (1, 128) rows of the G=1
    layout, and per-step row extraction becomes an aligned slice instead
    of a masked slab reduction. Horizon reductions become log-depth
    aligned-halves folds and the projection argmin a single
    first-match-wins pair fold (see ``project``); fold order differs from
    jnp reductions, so G>1 matches G=1 statistically (same convergence
    behavior), not bitwise. G=1 preserves the original code paths exactly.

    ``ls_chunk`` (chunked line search, G=1 only): evaluate line-search
    trials in chunks of this many alphas, with ALL of a chunk's trial
    rollouts packed into one (ls_chunk, 128) sublane chain
    (``forward_packed``). The serial early-exit loop pays its N-step
    dependent rollout chain once per *trial*, and the whole tile waits for
    its straggliest lane -- measured on the bench workload
    (tools/measure_ls_trials.py): 28.7% of solver iterations exhaust all
    20 alphas (the reference's line-search failure path,
    src/cilqr_solver.cpp:340-380) and the 128-lane lockstep max averages
    ~13 trials/iteration. Chunking caps that at ceil(20/ls_chunk) chains.
    Projection, cost, and the accept/converge updates run per alpha
    through the SAME code as the serial loop on sublane-extracted rows,
    and alphas are exact powers of two, so results are bitwise-identical
    to ls_chunk=0 -- modulo sign of zero: the masked-sum sublane
    extraction (``_sub``) maps -0.0 to +0.0, which no downstream
    comparison distinguishes (round-3 advisor note; the equality tests
    use array_equal, where -0.0 == +0.0). 0 = the serial early-exit loop.

    ``proj_dot`` (G=1 only): score the nearest-point search with the
    expanded dot form ``c_r' - 2 (rx' x' + ry' y')`` in coordinates
    centered on window row 0 (primes; c_r' and the -2-scaled centered
    window slabs hoisted once per solve) instead of the squared distance
    ``(x-rx)^2 + (y-ry)^2`` -- 2 FMAs per window row instead of 5 ops,
    on the largest single term of kernel time (trial projections, ~29%
    -- docs/PERFORMANCE.md "Where the kernel time goes"). Centering
    keeps the score's f32 error proportional to the window extent
    rather than |coords|^2, so the mode stays sound for reference lines
    far from the origin (round-4 advisor finding). The two forms share
    the same exact-arithmetic argmin but round differently in f32, so
    near-ties can pick different window rows; like groups=8 this mode
    matches the default statistically (validated per-scenario on
    hardware), not bitwise.

    ``proj_fold`` (G=1 only): replace the min + first-index one-hot +
    masked-sum projection reduction with the G>1-style pair fold
    carrying (score, x, y, yaw) -- one log-depth fold instead of ~7
    full passes over the (R, 128) window. Tournament tie-breaking
    (see the G>1 comment in ``project``), so also a statistical mode;
    composes with ``proj_dot``.
    """
    f32 = jnp.float32
    C = 8 + 2 * M  # constraint columns (ALM dual layout)
    NHG = NH * G
    assert G == 1 or G == 8, "G must be 1 (replicated rows) or 8 (vreg rows)"
    assert ls_chunk == 0 or G == 1, "chunked line search is G=1 only"
    assert not (proj_dot and G > 1), "proj_dot is G=1 only"
    assert not (proj_fold and G > 1), "proj_fold is G=1 only"

    def kernel(*refs):
        (wts_ref, x0_ref, uinit_ref, rx_ref, ry_ref, ryaw_ref,
         ox_ref, oy_ref, oyaw_ref) = refs[:9]
        i = 9
        resume_ref = None
        if resume:
            resume_ref = refs[i]
            i += 1
        alm_ref = None
        if use_alm:
            # ALM dual-state input: C mu slabs + a trailing 8-step-row block
            # whose first row is rho (see _pack_alm in cilqr_solve_pallas).
            # Zero mu + rho_init == the reference's cold reset
            # (src/cilqr_solver.cpp:88-93); nonzero input is a warm-start /
            # straggler-resume carry.
            alm_ref = refs[i]
            i += 1
        u_out, x_out, stats_out = refs[i:i + 3]
        alm_out = refs[i + 3] if use_alm else None
        row_iota = lax.broadcasted_iota(jnp.int32, (NHG, LANES), 0)
        step_iota = row_iota // G if G > 1 else row_iota
        state_mask = (step_iota >= 1) & (step_iota <= N)  # steps 1..N
        ctrl_mask = step_iota <= N - 1  # steps 0..N-1
        quad_mask = step_iota <= N  # steps 0..N

        def _row(S, k):
            """Extract step k of a slab as a (G, 128) value.

            G=1: masked reduce producing a *replicated* sublane layout
            (Mosaic cannot relayout offset row slices to the replicated
            layout broadcasts need, so the reduce -- which is born
            replicated -- stands in for ``S[k:k+1]``).
            G=8: rows k*G..(k+1)*G are a sublane-aligned full-vreg slice;
            no relayout is needed because every per-step value is (8, 128)
            and all arithmetic between them is elementwise."""
            if G > 1:
                return S[k * G:(k + 1) * G]
            ri = lax.broadcasted_iota(jnp.int32, S.shape, 0)
            return jnp.sum(jnp.where(ri == k, S, 0.0), axis=0, keepdims=True)

        def _tile_rows(p, n):
            """(G, 128) -> (n*G, 128) with row w*G+g = p[g] (doubling
            concats: log2(n) copies instead of a broadcast relayout)."""
            out, m = p, 1
            while m * 2 <= n:
                out = jnp.concatenate([out, out], axis=0)
                m *= 2
            if m < n:
                out = jnp.concatenate([out, out[:(n - m) * G]], axis=0)
            return out

        def _fold_sum(S):
            """Sum over steps: (n*G, 128) -> (G, 128) by aligned-halves
            folding (every slice boundary is a multiple of G=8 sublanes)."""
            n = S.shape[0] // G
            while n > 1:
                h = n // 2
                top = S[h * G:2 * h * G]
                S = S[:h * G] + top if n % 2 == 0 else jnp.concatenate(
                    [S[:h * G] + top, S[2 * h * G:]], axis=0)
                n = n - h
            return S

        def _hsum(S):
            """Horizon reduction of a masked slab -> per-scenario row."""
            if G > 1:
                return _fold_sum(S)
            return jnp.sum(S, axis=0, keepdims=True)
        w = lambda i: wts_ref[i, 0]
        dt, wb = w(_DT), w(_WB)
        width, length, d_safe = w(_WIDTH), w(_LENGTH), w(_DSAFE)
        sq1, sq2, oq1, oq2 = w(_SQ1), w(_SQ2), w(_OQ1), w(_OQ2)
        eclip = w(_ECLIP)
        # inflated ellipse axes (reference src/utils.cpp:387-393, with the
        # ego disc radius = width / 2 from src/cilqr_solver.cpp:330)
        ell_a = 0.5 * length + 6.0 * d_safe + 0.5 * width
        ell_b = 0.5 * width + d_safe + 0.5 * width
        inv_a2 = 1.0 / (ell_a * ell_a)
        inv_b2 = 1.0 / (ell_b * ell_b)

        x0s = x0_ref[:, :]  # (8*G, 128)
        x0 = [_row(x0s, i) for i in range(4)]  # rows (G, 128)
        rb_hi = _row(x0s, 4)
        rb_lo = _row(x0s, 5)
        ref_velo = _row(x0s, 6)
        up_bound = rb_hi - width * 0.5
        lo_bound = rb_lo + width * 0.5

        # slab-shaped copies of per-scenario rows used against (NHG, 128)
        # slabs (G=1 rows broadcast for free; G>1 needs explicit tiling)
        if G > 1:
            ref_velo_s = _tile_rows(ref_velo, NH)
            up_bound_s = _tile_rows(up_bound, NH)
            lo_bound_s = _tile_rows(lo_bound, NH)
        else:
            ref_velo_s, up_bound_s, lo_bound_s = ref_velo, up_bound, lo_bound

        rx, ry, ryaw = rx_ref[:, :], ry_ref[:, :], ryaw_ref[:, :]  # (W*G, 128)
        widx = lax.broadcasted_iota(jnp.int32, (W * G, LANES), 0)
        if G > 1:
            widx = widx // G  # window-sample index per interleaved row
        if proj_dot:
            # hoisted once per solve (loop-invariant): nearest-point score
            # in CENTERED coordinates, c_r' - 2(rx' x' + ry' y') with
            # r' = r - r0, p' = p - r0 and r0 = window row 0 per lane.
            # Centering restores translation invariance (round-4 advisor):
            # the raw dot form's f32 score error grows as |coords|^2 * eps,
            # so far-from-origin reference lines (~1e3-1e4 m) would drown
            # near-minimum gaps in rounding noise; after centering the
            # error scales with the ~40 m window extent instead. The
            # ordering is unchanged in exact arithmetic: score'(r) =
            # |r - p|^2 - |p - r0|^2, a per-(step, lane) constant offset.
            # Inner loop still 2 FMAs per row; the p' shift is 2 subs per
            # step outside the row loop.
            cx0 = rx[:1]  # (1, LANES); proj_dot is G=1 so rx is (W, LANES)
            cy0 = ry[:1]
            rxc = rx - cx0
            ryc = ry - cy0
            p_cr = rxc * rxc + ryc * ryc
            p_nx = -2.0 * rxc
            p_ny = -2.0 * ryc
        OX = ox_ref[:, :]  # (M * NHG, 128)
        OY = oy_ref[:, :]
        OTH = oyaw_ref[:, :]

        # -- primitives ---------------------------------------------------
        def _beta_trig(us):
            """sin/cos of beta = arctan(tan(us)/2) without atan (Mosaic has
            no atan lowering): sin = (t/2)/sqrt(1+t^2/4), cos = 1/sqrt(...).
            This is the DYNAMICS beta (src/utils.cpp:265)."""
            t = jnp.tan(us)
            inv = lax.rsqrt(1.0 + 0.25 * t * t)
            return 0.5 * t * inv, inv

        def _beta_jac_trig(us):
            """sin/cos of the JACOBIAN's beta = arctan(tan(us / 2)) -- the
            reference quirk at src/utils.cpp:292 (`(u/2).tan().atan()`),
            deliberately different from the dynamics beta; atan-free via
            sin = t/sqrt(1+t^2), cos = 1/sqrt(1+t^2) with t = tan(us/2)."""
            t = jnp.tan(0.5 * us)
            inv = lax.rsqrt(1.0 + t * t)
            return t * inv, inv

        def propagate(px, py, pv, pyaw, ua, us):
            if rear_center:
                nx = px + pv * jnp.cos(pyaw) * dt
                ny = py + pv * jnp.sin(pyaw) * dt
                nv = pv + ua * dt
                nyaw = pyaw + pv * jnp.tan(us) * dt / wb
            else:
                sinb, cosb = _beta_trig(us)
                cy_, sy_ = jnp.cos(pyaw), jnp.sin(pyaw)
                cby = cosb * cy_ - sinb * sy_  # cos(beta + yaw)
                sby = sinb * cy_ + cosb * sy_  # sin(beta + yaw)
                nx = px + pv * cby * dt
                ny = py + pv * sby * dt
                nv = pv + ua * dt
                nyaw = pyaw + 2.0 * pv * sinb * dt / wb
            return nx, ny, nv, nyaw

        def _stack(rows):
            """(G, 128) per-step rows -> (NHG, 128) slab (zero-padded)."""
            pad = NHG - len(rows) * G
            if pad:
                rows = rows + [jnp.zeros((pad, LANES), f32)]
            return jnp.concatenate(rows, axis=0)

        def rollout(UA, US):
            rxs, rys, rvs, rhs = [x0[0]], [x0[1]], [x0[2]], [x0[3]]
            cx, cy, cv, ch = x0
            for k in range(N):
                cx, cy, cv, ch = propagate(cx, cy, cv, ch,
                                           _row(UA, k), _row(US, k))
                rxs.append(cx)
                rys.append(cy)
                rvs.append(cv)
                rhs.append(ch)
            return _stack(rxs), _stack(rys), _stack(rvs), _stack(rhs), rxs, rys

        def project(pxr, pyr):
            """Nearest window row per (step, lane): first-min one-hot.

            Takes per-step (1, 128) position rows (length N+1 lists) so
            rollout/forward outputs feed in without slab re-extraction.

            With ``row_limits`` the search for step k only scans window rows
            [0, row_limits[k]): the initial projection sits at row <=
            W_BACK (window-gather invariant), and step k cannot progress
            more than ~k * v * dt / 0.1 samples along the line, so a bound
            of W_BACK + slack + k * rows_per_step covers every reachable
            nearest row. Restricting the scan can only *raise* a trial's
            tracking/border cost (min over a subset), so a bound that never
            binds on accepted trajectories leaves solutions unchanged
            (validated on all four scenarios, tools/validate_kernel_tpu.py).
            """
            kxs, kys, khs = [], [], []
            for k in range(N + 1):
                R = W if row_limits is None else row_limits[k]
                if proj_dot:
                    # centered ego query (see the p_cr hoist comment)
                    pxk = pxr[k] - cx0
                    pyk = pyr[k] - cy0
                if proj_fold and G == 1:
                    # G=1 variant of the G>1 pair fold below: one
                    # log-depth fold carrying (score, x, y, yaw) replaces
                    # the min + first-index one-hot + 3 masked sums (~7
                    # full passes over the (R, 128) window). Tournament
                    # tie-breaking instead of first-match (see the G>1
                    # comment) -> statistical mode like proj_dot.
                    if proj_dot:
                        s0 = p_cr[:R] + p_nx[:R] * pxk + p_ny[:R] * pyk
                    else:
                        dxf = rx[:R] - pxr[k]
                        dyf = ry[:R] - pyr[k]
                        s0 = dxf * dxf + dyf * dyf
                    vals = (s0, rx[:R], ry[:R], ryaw[:R])
                    n = R
                    while n > 1:
                        h = n // 2
                        lo = tuple(v[:h] for v in vals)
                        hi = tuple(v[h:2 * h] for v in vals)
                        better = hi[0] < lo[0]
                        merged = tuple(jnp.where(better, b, a)
                                       for a, b in zip(lo, hi))
                        if n % 2:
                            merged = tuple(
                                jnp.concatenate([m_, v[2 * h:]], axis=0)
                                for m_, v in zip(merged, vals))
                        vals = merged
                        n = n - h
                    kxs.append(vals[1])
                    kys.append(vals[2])
                    khs.append(vals[3])
                    continue
                if G > 1:
                    # argmin as one pair fold carrying (d2, x, y, yaw).
                    # Strict less-than keeps the lower slot on ties at each
                    # level, but slot order stops tracking original window-
                    # row order after the first level, so tie-breaking is
                    # tournament-order, NOT first-match. This is exact for
                    # the ties this kernel actually produces (repeated tail
                    # window rows carry identical x/y/yaw, so any winner
                    # yields the same projected values); do not rely on
                    # first-match index semantics here.
                    rxk, ryk, rhk = rx[:R * G], ry[:R * G], ryaw[:R * G]
                    dx = rxk - _tile_rows(pxr[k], R)
                    dy = ryk - _tile_rows(pyr[k], R)
                    vals = (dx * dx + dy * dy, rxk, ryk, rhk)
                    n = R
                    while n > 1:
                        h = n // 2
                        lo = tuple(v[:h * G] for v in vals)
                        hi = tuple(v[h * G:2 * h * G] for v in vals)
                        better = hi[0] < lo[0]
                        merged = tuple(jnp.where(better, b, a)
                                       for a, b in zip(lo, hi))
                        if n % 2:
                            merged = tuple(
                                jnp.concatenate([m_, v[2 * h * G:]], axis=0)
                                for m_, v in zip(merged, vals))
                        vals = merged
                        n = n - h
                    kxs.append(vals[1])
                    kys.append(vals[2])
                    khs.append(vals[3])
                    continue
                rxk, ryk, rhk, wk = rx[:R], ry[:R], ryaw[:R], widx[:R]
                if proj_dot:
                    d2 = p_cr[:R] + p_nx[:R] * pxk + p_ny[:R] * pyk
                else:
                    dx = rxk - pxr[k]
                    dy = ryk - pyr[k]
                    d2 = dx * dx + dy * dy
                m = jnp.min(d2, axis=0, keepdims=True)
                sel = jnp.where(d2 <= m, wk, jnp.int32(2**30))
                i0 = jnp.min(sel, axis=0, keepdims=True)
                hot = (wk == i0).astype(f32)
                kxs.append(jnp.sum(hot * rxk, axis=0, keepdims=True))
                kys.append(jnp.sum(hot * ryk, axis=0, keepdims=True))
                khs.append(jnp.sum(hot * rhk, axis=0, keepdims=True))
            return _stack(kxs), _stack(kys), _stack(khs)

        def barrier(c, q1, q2):
            return q1 * jnp.exp(jnp.minimum(q2 * c, eclip))

        def pen_val(c, q1, q2, mu, rho):
            """Penalty value for one constraint column (barrier or ALM,
            include/cilqr_solver.hpp:80-83)."""
            if use_alm:
                shifted = c + mu / rho
                return jnp.where(shifted > 0, 0.5 * rho * shifted * shifted, 0.0)
            return barrier(c, q1, q2)

        def pen3(c, q1, q2, mu, rho):
            """(value, gamma, eta): gradient = gamma * c', Hessian =
            eta * c' c'^T (src/cilqr_solver.cpp:692-713)."""
            if use_alm:
                shifted = c + mu / rho
                act = shifted > 0
                gam = jnp.where(act, rho * shifted, 0.0)
                val = jnp.where(act, 0.5 * rho * shifted * shifted, 0.0)
                return val, gam, gam
            b = barrier(c, q1, q2)
            return b, q2 * b, q2 * q2 * b

        def front_rear(PX, PY, PH):
            cph, sph = jnp.cos(PH), jnp.sin(PH)
            if rear_center:
                return (PX + wb * cph, PY + wb * sph, PX, PY, cph, sph)
            return (PX + 0.5 * wb * cph, PY + 0.5 * wb * sph,
                    PX - 0.5 * wb * cph, PY - 0.5 * wb * sph, cph, sph)

        def lateral(PX, PY, RKX, RKY, RKH):
            dx = PX - RKX
            dy = PY - RKY
            d_sign = dy * jnp.cos(RKH) - dx * jnp.sin(RKH)
            sgn = jnp.where(d_sign < 0, f32(-1.0), f32(1.0))
            h = jnp.sqrt(dx * dx + dy * dy)
            return sgn * h, d_sign, dx, dy, h

        def obs_margins(FX, FY, RXc, RYc, with_grads=True):
            """(margin, grad_x, grad_y) per obstacle x {front, rear} point;
            grads skipped (None) for value-only cost evaluations."""
            outs = []
            for j in range(M):
                cxj = OX[j * NHG:(j + 1) * NHG]
                cyj = OY[j * NHG:(j + 1) * NHG]
                thj = OTH[j * NHG:(j + 1) * NHG]
                ct, st = jnp.cos(thj), jnp.sin(thj)
                for (PXp, PYp) in ((FX, FY), (RXc, RYc)):
                    ddx = PXp - cxj
                    ddy = PYp - cyj
                    xs = ct * ddx + st * ddy
                    ys = -st * ddx + ct * ddy
                    c = 1.0 - (xs * xs * inv_a2 + ys * ys * inv_b2)
                    if with_grads:
                        gxs = -2.0 * xs * inv_a2
                        gys = -2.0 * ys * inv_b2
                        gx = ct * gxs - st * gys
                        gy = st * gxs + ct * gys
                        outs.append((c, gx, gy))
                    else:
                        outs.append((c, None, None))
            return outs

        def _constraint_slabs(UA, US, PX, PY, PV, PH, RKX, RKY, RKH,
                              with_grads=True):
            """Constraint value slabs in ALM column order
            (src/cilqr_solver.cpp:622-676); also returns lateral geometry.
            Value-only callers (line-search cost evals) skip the obstacle
            gradient slabs."""
            lat = lateral(PX, PY, RKX, RKY, RKH)
            cur_d = lat[0]
            cs = [
                UA - w(_AMAX), w(_AMIN) - UA, US - w(_STL), -w(_STL) - US,
                PV - w(_VMAX), w(_VMIN) - PV,
                cur_d - up_bound_s, lo_bound_s - cur_d,
            ]
            fr = front_rear(PX, PY, PH)
            obs = obs_margins(fr[0], fr[1], fr[2], fr[3], with_grads)
            cs.extend(c for (c, _, _) in obs)
            return cs, obs, lat, fr

        def _mu_of(mus, i):
            return mus[i] if use_alm else None

        def total_cost(UA, US, PX, PY, PV, PH, RKX, RKY, RKH,
                       rho=None, mus=None):
            dx = PX - RKX
            dy = PY - RKY
            dv = PV - ref_velo_s
            dh = PH - RKH
            quad = _hsum(
                jnp.where(quad_mask,
                          w(_WPOS) * (dx * dx + dy * dy)
                          + w(_WVEL) * dv * dv + w(_WYAW) * dh * dh, 0.0))
            quad = quad + _hsum(
                jnp.where(ctrl_mask,
                          w(_WACC) * UA * UA + w(_WSTL) * US * US, 0.0))
            cs, _, _, _ = _constraint_slabs(UA, US, PX, PY, PV, PH,
                                            RKX, RKY, RKH, with_grads=False)
            # control-bound columns live on rows r = k-1, state/obstacle
            # columns on rows k = 1..N
            jb = _hsum(
                jnp.where(ctrl_mask,
                          sum(pen_val(cs[i], sq1, sq2, _mu_of(mus, i), rho)
                              for i in range(4)), 0.0))
            jb = jb + _hsum(
                jnp.where(state_mask,
                          sum(pen_val(cs[i], sq1, sq2, _mu_of(mus, i), rho)
                              for i in range(4, 8))
                          + sum(pen_val(cs[i], oq1, oq2, _mu_of(mus, i), rho)
                                for i in range(8, C)), 0.0))
            return quad + jb

        def cost_and_derivs(UA, US, PX, PY, PV, PH, RKX, RKY, RKH,
                            rho=None, mus=None):
            """J plus l_x (4 slabs), l_u (2), l_xx (10 sym), l_uu (3 sym),
            and (ALM) the dual precompute mu_next.

            Mirrors reference src/cilqr_solver.cpp:463-690; l_ux == 0.
            """
            dx = PX - RKX
            dy = PY - RKY
            dv = PV - ref_velo_s
            dh = PH - RKH

            lx = [2.0 * w(_WPOS) * dx, 2.0 * w(_WPOS) * dy,
                  2.0 * w(_WVEL) * dv, 2.0 * w(_WYAW) * dh]
            lu = [2.0 * w(_WACC) * UA, 2.0 * w(_WSTL) * US]
            zero = jnp.zeros((NHG, LANES), f32)
            # l_xx upper-triangle components; the (0,2)/(1,2)/(2,3) couplings
            # and l_uu (0,1) are structurally zero (no constraint touches
            # them, reference src/cilqr_solver.cpp:463-690) and are omitted:
            # the backward pass treats missing keys as exact zeros, which
            # skips their per-step row extraction entirely
            lxx = {(0, 0): jnp.full((NHG, LANES), 2.0 * w(_WPOS)),
                   (1, 1): jnp.full((NHG, LANES), 2.0 * w(_WPOS)),
                   (2, 2): jnp.full((NHG, LANES), 2.0 * w(_WVEL)),
                   (3, 3): jnp.full((NHG, LANES), 2.0 * w(_WYAW)),
                   (0, 1): zero, (0, 3): zero, (1, 3): zero}
            luu = {(0, 0): jnp.full((NHG, LANES), 2.0 * w(_WACC)),
                   (1, 1): jnp.full((NHG, LANES), 2.0 * w(_WSTL))}

            sm = state_mask.astype(f32)
            cm = ctrl_mask.astype(f32)
            cs, obs, lat, fr = _constraint_slabs(UA, US, PX, PY, PV, PH,
                                                 RKX, RKY, RKH)
            q12 = lambda i: (sq1, sq2) if i < 8 else (oq1, oq2)
            vgh = [pen3(cs[i], *q12(i), _mu_of(mus, i), rho) for i in range(C)]

            # J from the shared values (== total_cost on this trajectory)
            quad = _hsum(
                jnp.where(quad_mask,
                          w(_WPOS) * (dx * dx + dy * dy)
                          + w(_WVEL) * dv * dv + w(_WYAW) * dh * dh, 0.0)
            ) + _hsum(
                jnp.where(ctrl_mask,
                          w(_WACC) * UA * UA + w(_WSTL) * US * US, 0.0))
            J = quad + _hsum(
                jnp.where(ctrl_mask, sum(vgh[i][0] for i in range(4)), 0.0)
            ) + _hsum(
                jnp.where(state_mask, sum(vgh[i][0] for i in range(4, C)), 0.0))

            # control bound columns: gradients are +-e0 / +-e1
            g_au, h_au = vgh[0][1] * cm, vgh[0][2] * cm
            g_al, h_al = vgh[1][1] * cm, vgh[1][2] * cm
            g_su, h_su = vgh[2][1] * cm, vgh[2][2] * cm
            g_sl, h_sl = vgh[3][1] * cm, vgh[3][2] * cm
            lu[0] = lu[0] + (g_au - g_al)
            lu[1] = lu[1] + (g_su - g_sl)
            luu[(0, 0)] = luu[(0, 0)] + (h_au + h_al)
            luu[(1, 1)] = luu[(1, 1)] + (h_su + h_sl)

            # velocity bounds: gradient +-e2
            lx[2] = lx[2] + (vgh[4][1] - vgh[5][1]) * sm
            lxx[(2, 2)] = lxx[(2, 2)] + (vgh[4][2] + vgh[5][2]) * sm

            # road borders: gradient (+-gx, +-gy, 0, 0)
            cur_d, d_sign, ddx, ddy, h = lat
            hs = jnp.where(h > 0, h, f32(1.0))
            flip = jnp.where(d_sign < 0, f32(-1.0), f32(1.0))
            gpx = jnp.where(h > 0, flip * ddx / hs, 0.0)
            gpy = jnp.where(h > 0, flip * ddy / hs, 0.0)
            gsum = (vgh[6][1] - vgh[7][1]) * sm  # lower negates the gradient
            hsum = (vgh[6][2] + vgh[7][2]) * sm
            lx[0] = lx[0] + gsum * gpx
            lx[1] = lx[1] + gsum * gpy
            lxx[(0, 0)] = lxx[(0, 0)] + hsum * gpx * gpx
            lxx[(0, 1)] = lxx[(0, 1)] + hsum * gpx * gpy
            lxx[(1, 1)] = lxx[(1, 1)] + hsum * gpy * gpy

            # obstacle ellipses: chain through front/rear point jacobians
            cph, sph = fr[4], fr[5]
            if rear_center:
                f_yx, f_yy = -wb * sph, wb * cph
                r_yx = jnp.zeros_like(sph)
                r_yy = jnp.zeros_like(sph)
            else:
                f_yx, f_yy = -0.5 * wb * sph, 0.5 * wb * cph
                r_yx, r_yy = 0.5 * wb * sph, -0.5 * wb * cph
            for idx, (c, gx, gy) in enumerate(obs):
                is_front = (idx % 2) == 0
                jyx = f_yx if is_front else r_yx
                jyy = f_yy if is_front else r_yy
                gcoef = vgh[8 + idx][1] * sm
                hcoef = vgh[8 + idx][2] * sm
                g3 = jyx * gx + jyy * gy  # d c / d yaw
                lx[0] = lx[0] + gcoef * gx
                lx[1] = lx[1] + gcoef * gy
                lx[3] = lx[3] + gcoef * g3
                lxx[(0, 0)] = lxx[(0, 0)] + hcoef * gx * gx
                lxx[(0, 1)] = lxx[(0, 1)] + hcoef * gx * gy
                lxx[(0, 3)] = lxx[(0, 3)] + hcoef * gx * g3
                lxx[(1, 1)] = lxx[(1, 1)] + hcoef * gy * gy
                lxx[(1, 3)] = lxx[(1, 3)] + hcoef * gy * g3
                lxx[(3, 3)] = lxx[(3, 3)] + hcoef * g3 * g3

            if use_alm:
                # dual precompute (src/cilqr_solver.cpp:622-676); valid rows
                # only, pads keep the old value
                mu_next = []
                for i in range(C):
                    valid = ctrl_mask if i < 4 else state_mask
                    mn = jnp.clip(mus[i] + rho * cs[i], 0.0, w(_MAX_MU))
                    mu_next.append(jnp.where(valid, mn, mus[i]))
                mu_next = tuple(mu_next)
            else:
                mu_next = ()
            return J, lx, lu, lxx, luu, mu_next

        def backward(us_rows, pv_rows, ph_rows, lx, lu, lxx, luu, lamb):
            """Unrolled sparse Riccati recursion
            (reference src/cilqr_solver.cpp:383-440).

            Trajectory rows (per-step (1, 128) values) come pre-extracted
            from the iteration body so line-search trials share them; lxx /
            luu keys absent from the dicts are structurally zero and their
            contributions are skipped (exact: adding 0.0 is the identity
            for every value the recursion produces)."""
            r = _row
            # jacobian pieces per step k (0..N-1) use state k, control k
            # terminal value
            Vx = [r(lx[i], N) for i in range(4)]
            zrow = jnp.zeros((G, LANES), f32)
            Vxx = {(i, j): zrow for i in range(4) for j in range(i, 4)}
            for (i, j), S in lxx.items():
                Vxx[(i, j)] = r(S, N)
            sym = lambda Vm, i, j: Vm[(i, j)] if (i, j) in Vm else Vm[(j, i)]
            dV1 = jnp.zeros((G, LANES), f32)
            dV2 = jnp.zeros((G, LANES), f32)
            fail = jnp.zeros((G, LANES), jnp.bool_)
            d_rows = [None] * N
            K_rows = [None] * N
            for k in range(N - 1, -1, -1):
                v = pv_rows[k]
                yaw = ph_rows[k]
                stl = us_rows[k]
                if rear_center:
                    cy_, sy_ = jnp.cos(yaw), jnp.sin(yaw)
                    a02 = cy_ * dt
                    a03 = -v * sy_ * dt
                    a12 = sy_ * dt
                    a13 = v * cy_ * dt
                    a32 = jnp.tan(stl) * dt / wb
                    b01 = jnp.zeros_like(v)
                    b11 = jnp.zeros_like(v)
                    cs2 = jnp.cos(stl)
                    b31 = (v * dt / wb) / (cs2 * cs2)
                else:
                    sinb, cosb = _beta_jac_trig(stl)  # quirk beta (see def)
                    t2 = jnp.tan(stl) ** 2
                    dbds = 0.5 * (1.0 + t2) / (1.0 + 0.25 * t2)
                    cy_, sy_ = jnp.cos(yaw), jnp.sin(yaw)
                    cby = cosb * cy_ - sinb * sy_
                    sby = sinb * cy_ + cosb * sy_
                    a02 = cby * dt
                    a03 = -v * sby * dt
                    a12 = sby * dt
                    a13 = v * cby * dt
                    a32 = 2.0 * sinb * dt / wb
                    b01 = -v * sby * dt * dbds
                    b11 = v * cby * dt * dbds
                    b31 = (2.0 * v * dt / wb) * cosb * dbds

                V = lambda i, j: sym(Vxx, i, j)
                # M1 = Vxx @ A (A = I + sparse); columns 2,3 modified
                M1 = {}
                for i in range(4):
                    M1[(i, 0)] = V(i, 0)
                    M1[(i, 1)] = V(i, 1)
                    M1[(i, 2)] = a02 * V(i, 0) + a12 * V(i, 1) + V(i, 2) + a32 * V(i, 3)
                    M1[(i, 3)] = a03 * V(i, 0) + a13 * V(i, 1) + V(i, 3)
                # Qxx = lxx + A^T M1
                Qxx = {}
                for j in range(4):
                    Qxx[(0, j)] = M1[(0, j)]
                    Qxx[(1, j)] = M1[(1, j)]
                    Qxx[(2, j)] = a02 * M1[(0, j)] + a12 * M1[(1, j)] + M1[(2, j)] + a32 * M1[(3, j)]
                    Qxx[(3, j)] = a03 * M1[(0, j)] + a13 * M1[(1, j)] + M1[(3, j)]
                lxx_rows = {key: r(S, k) for key, S in lxx.items()}
                for i in range(4):
                    for j in range(4):
                        key = (min(i, j), max(i, j))
                        if key in lxx_rows:
                            Qxx[(i, j)] = Qxx[(i, j)] + lxx_rows[key]

                Qx = [r(lx[0], k) + Vx[0],
                      r(lx[1], k) + Vx[1],
                      r(lx[2], k) + a02 * Vx[0] + a12 * Vx[1] + Vx[2] + a32 * Vx[3],
                      r(lx[3], k) + a03 * Vx[0] + a13 * Vx[1] + Vx[3]]
                Qu = [r(lu[0], k) + dt * Vx[2],
                      r(lu[1], k) + b01 * Vx[0] + b11 * Vx[1] + b31 * Vx[3]]
                # M2 = Vxx @ B
                M2 = {}
                for i in range(4):
                    M2[(i, 0)] = dt * V(i, 2)
                    M2[(i, 1)] = b01 * V(i, 0) + b11 * V(i, 1) + b31 * V(i, 3)
                Quu00 = r(luu[(0, 0)], k) + dt * M2[(2, 0)] + lamb
                Quu01 = dt * M2[(2, 1)]  # l_uu (0,1) structurally zero
                Quu11 = r(luu[(1, 1)], k) + b01 * M2[(0, 1)] + b11 * M2[(1, 1)] + b31 * M2[(3, 1)] + lamb
                Qux = [[dt * M1[(2, j)] for j in range(4)],
                       [b01 * M1[(0, j)] + b11 * M1[(1, j)] + b31 * M1[(3, j)]
                        for j in range(4)]]

                det = Quu00 * Quu11 - Quu01 * Quu01
                pd = (Quu00 > 0) & (det > 0)
                fail = fail | ~pd
                dets = jnp.where(pd, det, f32(1.0))
                i00 = Quu11 / dets
                i01 = -Quu01 / dets
                i11 = Quu00 / dets
                d0 = -(i00 * Qu[0] + i01 * Qu[1])
                d1 = -(i01 * Qu[0] + i11 * Qu[1])
                Kr = [[-(i00 * Qux[0][j] + i01 * Qux[1][j]) for j in range(4)],
                      [-(i01 * Qux[0][j] + i11 * Qux[1][j]) for j in range(4)]]
                d_rows[k] = (d0, d1)
                K_rows[k] = Kr

                # V updates (reference src/cilqr_solver.cpp:427-432)
                Qud = [Quu00 * d0 + Quu01 * d1, Quu01 * d0 + Quu11 * d1]
                newVx = []
                for j in range(4):
                    newVx.append(Qx[j]
                                 + Kr[0][j] * (Qud[0] + Qu[0])
                                 + Kr[1][j] * (Qud[1] + Qu[1])
                                 + Qux[0][j] * d0 + Qux[1][j] * d1)
                Vx = newVx
                newVxx = {}
                for i in range(4):
                    for j in range(i, 4):
                        KQuuK = (Kr[0][i] * (Quu00 * Kr[0][j] + Quu01 * Kr[1][j])
                                 + Kr[1][i] * (Quu01 * Kr[0][j] + Quu11 * Kr[1][j]))
                        KQux = Kr[0][i] * Qux[0][j] + Kr[1][i] * Qux[1][j]
                        QuxK = Qux[0][i] * Kr[0][j] + Qux[1][i] * Kr[1][j]
                        newVxx[(i, j)] = Qxx[(i, j)] + KQuuK + KQux + QuxK
                Vxx = newVxx
                dV1 = dV1 + 0.5 * (d0 * Qud[0] + d1 * Qud[1])
                dV2 = dV2 + d0 * Qu[0] + d1 * Qu[1]

            # gains stay as per-step (G, 128) row lists: forward consumes
            # them by index, so packing them into slabs (and re-extracting
            # with masked reduces) would only add parasitic VPU work
            return d_rows, K_rows, dV1, dV2, fail

        def forward(ua_rows, us_rows, px_rows, py_rows, pv_rows, ph_rows,
                    d_rows, K_rows, alpha):
            """Closed-loop trial rollout (reference src/cilqr_solver.cpp:442-461).

            The reference trajectory arrives as per-step (G, 128) rows,
            extracted once per solver iteration and shared by every
            line-search trial (extraction is a masked slab reduce -- see
            ``_row`` -- so hoisting it out of the trial loop matters)."""
            uas, uss = [], []
            cx, cy, cv, ch = x0
            nxs, nys, nvs, nhs = [cx], [cy], [cv], [ch]
            for k in range(N):
                e0 = cx - px_rows[k]
                e1 = cy - py_rows[k]
                e2 = cv - pv_rows[k]
                e3 = ch - ph_rows[k]
                Kr = K_rows[k]
                na = (ua_rows[k] + Kr[0][0] * e0 + Kr[0][1] * e1
                      + Kr[0][2] * e2 + Kr[0][3] * e3
                      + alpha * d_rows[k][0])
                ns = (us_rows[k] + Kr[1][0] * e0 + Kr[1][1] * e1
                      + Kr[1][2] * e2 + Kr[1][3] * e3
                      + alpha * d_rows[k][1])
                uas.append(na)
                uss.append(ns)
                cx, cy, cv, ch = propagate(cx, cy, cv, ch, na, ns)
                nxs.append(cx)
                nys.append(cy)
                nvs.append(cv)
                nhs.append(ch)
            return (_stack(uas), _stack(uss), _stack(nxs), _stack(nys),
                    _stack(nvs), _stack(nhs), nxs, nys)

        if ls_chunk:
            CW = ls_chunk
            n_chunks = -(-n_alphas // CW)
            ci = lax.broadcasted_iota(jnp.int32, (CW, LANES), 0)
            x0c = [_tile_rows(p, CW) for p in x0]

            def _sub(p, a):
                """(CW, 128) packed trial rows -> trial a's (1, 128) row
                (masked reduce, born replicated -- the same layout class as
                the serial forward()'s outputs)."""
                return jnp.sum(jnp.where(ci == a, p, 0.0), axis=0,
                               keepdims=True)

            def forward_packed(ua_rows, us_rows, px_rows, py_rows, pv_rows,
                               ph_rows, d_rows, K_rows, AL):
                """One chunk's CW trial rollouts as ONE (CW, 128) chain.

                Sublane a carries the alpha = AL[a] trial. Every operation
                is elementwise and AL holds exact powers of two, so sublane
                a is bitwise-identical to forward() at that scalar alpha;
                the N-step dependent chain (the line search's latency
                bottleneck) is paid once per chunk instead of once per
                alpha. Semantics: reference src/cilqr_solver.cpp:442-461.
                """
                uas, uss = [], []
                cx, cy, cv, ch = x0c
                nxs, nys, nvs, nhs = [cx], [cy], [cv], [ch]
                for k in range(N):
                    e0 = cx - px_rows[k]
                    e1 = cy - py_rows[k]
                    e2 = cv - pv_rows[k]
                    e3 = ch - ph_rows[k]
                    Kr = K_rows[k]
                    na = (ua_rows[k] + Kr[0][0] * e0 + Kr[0][1] * e1
                          + Kr[0][2] * e2 + Kr[0][3] * e3
                          + AL * d_rows[k][0])
                    ns = (us_rows[k] + Kr[1][0] * e0 + Kr[1][1] * e1
                          + Kr[1][2] * e2 + Kr[1][3] * e3
                          + AL * d_rows[k][1])
                    uas.append(na)
                    uss.append(ns)
                    cx, cy, cv, ch = propagate(cx, cy, cv, ch, na, ns)
                    nxs.append(cx)
                    nys.append(cy)
                    nvs.append(cv)
                    nhs.append(ch)
                return uas, uss, nxs, nys, nvs, nhs

        # -- solve --------------------------------------------------------
        # while_loop carries must not be constant-folded values: Mosaic pins
        # the carry layout to the (fully replicated) constant layout and
        # cannot relayout the body's lane-varying outputs back into it.
        # Anchor every carried init to lane-varying data instead.
        lane0 = x0[0] * 0.0  # (G, 128) zeros, lane-offset layout
        # warm-start initial controls (zeros for a cold start); input reads
        # have materialized layouts, so they are safe as carried values
        UA0 = uinit_ref[0:NHG, :]
        US0 = uinit_ref[NHG:2 * NHG, :]
        PX0, PY0, PV0, PH0, pxr0, pyr0 = rollout(UA0, US0)
        RKX0, RKY0, RKH0 = project(pxr0, pyr0)

        def iter_cond(st):
            it = st[0]
            active_f = st[1]
            return (it < max_iter) & (jnp.max(active_f) > 0.5)

        def iter_body(st):
            if _PROBE:
                (it, active_f, lamb, status, conv_ff, ovf_ff, iters,
                 UA, US, PX, PY, PV, PH, RKX, RKY, RKH, rho, mus,
                 probe_acc) = st
            else:
                (it, active_f, lamb, status, conv_ff, ovf_ff, iters,
                 UA, US, PX, PY, PV, PH, RKX, RKY, RKH, rho, mus) = st
                probe_acc = None
            # carried masks travel as f32 rows (Mosaic cannot yield i1
            # vectors from scf loops); rehydrate to bool locally
            active = active_f > 0.5
            conv_f = conv_ff > 0.5
            ovf_f = ovf_ff > 0.5
            ori_J, lx, lu, lxx, luu, mu_next = cost_and_derivs(
                UA, US, PX, PY, PV, PH, RKX, RKY, RKH, rho, mus)
            # one row-extraction pass shared by the backward recursion and
            # every line-search trial rollout
            ua_rows = [_row(UA, k) for k in range(N)]
            us_rows = [_row(US, k) for k in range(N)]
            px_rows = [_row(PX, k) for k in range(N)]
            py_rows = [_row(PY, k) for k in range(N)]
            pv_rows = [_row(PV, k) for k in range(N)]
            ph_rows = [_row(PH, k) for k in range(N)]
            d_rows, K_rows, dV1, dV2, bp_fail = backward(
                us_rows, pv_rows, ph_rows, lx, lu, lxx, luu, lamb)
            probe_add = None
            if _PROBE == "2rows":
                r2 = [_row(S + lane0, k) for S in (UA, US, PX, PY, PV, PH)
                      for k in range(N)]
                probe_add = sum(r2) * 1e-30
            elif _PROBE == "2back":
                b2 = backward(us_rows, pv_rows, ph_rows, lx, lu, lxx, luu,
                              lamb + lane0)
                probe_add = (b2[2] + b2[3]) * 1e-30
            elif _PROBE == "2derivs":
                c2 = cost_and_derivs(UA + lane0, US, PX, PY, PV, PH,
                                     RKX, RKY, RKH, rho, mus)
                probe_add = (c2[0] + sum(
                    jnp.sum(s * 1e-30, axis=0, keepdims=True)
                    for s in c2[1] + c2[2])) * 1e-30

            # line search: early-exit while over trials
            def ls_cond(ls):
                t = ls[0]
                ls_done_f = ls[1]
                return (t < n_alphas) & (jnp.min(ls_done_f) < 0.5)

            def ls_body(ls):
                (t, ls_done_f, acc_f2, convf_f2, small_f2, j_hit,
                 BUA, BUS, BPX, BPY, BPV, BPH, BRX, BRY, BRH) = ls
                ls_done = ls_done_f > 0.5
                acc = acc_f2 > 0.5
                convf = convf_f2 > 0.5
                small = small_f2 > 0.5
                alpha = jnp.exp2(-t.astype(f32))
                NUA, NUS, NPX, NPY, NPV, NPH, npxr, npyr = forward(
                    ua_rows, us_rows, px_rows, py_rows, pv_rows, ph_rows,
                    d_rows, K_rows, alpha)
                if _PROBE == "noproj":  # timing probe: results are WRONG
                    TRX, TRY, TRH = RKX, RKY, RKH
                else:
                    TRX, TRY, TRH = project(npxr, npyr)
                nJ = total_cost(NUA, NUS, NPX, NPY, NPV, NPH, TRX, TRY, TRH,
                                rho, mus)
                # marginal-cost probes: evaluate a component a SECOND time on
                # a +0.0-perturbed input (lane0 is runtime zeros, so CSE
                # cannot merge the two calls) and fold the result at 1e-30
                # into the carried accumulator so it cannot be DCE'd.
                # Results stay exact; only timing changes.
                if _PROBE == "2cost":
                    nJ2 = total_cost(NUA + lane0, NUS, NPX, NPY, NPV, NPH,
                                     TRX, TRY, TRH, rho, mus)
                    j_hit = j_hit + nJ2 * 1e-30
                elif _PROBE == "2fwd":
                    f2 = forward(ua_rows, us_rows, px_rows, py_rows, pv_rows,
                                 ph_rows, d_rows, K_rows, alpha * (1.0 + lane0))
                    j_hit = j_hit + f2[6][N] * 1e-30
                elif _PROBE == "2proj":
                    T2 = project([p + lane0 for p in npxr], npyr)
                    j_hit = j_hit + jnp.sum(T2[0] * 1e-30, axis=0,
                                            keepdims=True)
                decay = ori_J - nJ
                is_first = t == 0
                conv_now = is_first & (jnp.abs(decay) < w(_CONV)) & ~ls_done
                approx = -(alpha * alpha * dV1 + alpha * dV2)
                ratio = jnp.where(approx != 0, decay / approx, f32(jnp.inf))
                acc_now = (~conv_now) & ~ls_done & (decay > 0) & (
                    (approx < 0) | (ratio > w(_ACCEPT)))
                take = acc_now if G == 1 else _tile_rows(acc_now, NH)
                BUA = jnp.where(take, NUA, BUA)
                BUS = jnp.where(take, NUS, BUS)
                BPX = jnp.where(take, NPX, BPX)
                BPY = jnp.where(take, NPY, BPY)
                BPV = jnp.where(take, NPV, BPV)
                BPH = jnp.where(take, NPH, BPH)
                BRX = jnp.where(take, TRX, BRX)
                BRY = jnp.where(take, TRY, BRY)
                BRH = jnp.where(take, TRH, BRH)
                small = small | (acc_now & ~is_first)
                return (t + 1, (ls_done | conv_now | acc_now).astype(f32),
                        (acc | acc_now).astype(f32),
                        (convf | conv_now).astype(f32), small.astype(f32),
                        j_hit,
                        BUA, BUS, BPX, BPY, BPV, BPH, BRX, BRY, BRH)

            # chunked line search (see _build_kernel docstring): the while
            # loop advances one CW-alpha chunk at a time; within a chunk the
            # CW trial rollouts are one packed sublane chain and the
            # per-alpha projection/cost/accept updates replay the serial
            # loop's code (and exact fp behavior) on extracted rows.
            def ls_cond_p(ls):
                t = ls[0]
                ls_done_f = ls[1]
                return (t < n_chunks) & (jnp.min(ls_done_f) < 0.5)

            def ls_body_p(ls):
                (t, ls_done_f, acc_f2, convf_f2, small_f2, j_hit,
                 BUA, BUS, BPX, BPY, BPV, BPH, BRX, BRY, BRH) = ls
                ls_done = ls_done_f > 0.5
                acc = acc_f2 > 0.5
                convf = convf_f2 > 0.5
                small = small_f2 > 0.5
                t0 = t * CW
                AL = jnp.exp2(-(t0 + ci).astype(f32))
                pua, pus, pxs, pys, pvs, phs = forward_packed(
                    ua_rows, us_rows, px_rows, py_rows, pv_rows, ph_rows,
                    d_rows, K_rows, AL)
                for a in range(CW):
                    te = t0 + a
                    alpha = jnp.exp2(-te.astype(f32))
                    nua_r = [_sub(p, a) for p in pua]
                    nus_r = [_sub(p, a) for p in pus]
                    npxr = [_sub(p, a) for p in pxs]
                    npyr = [_sub(p, a) for p in pys]
                    npvr = [_sub(p, a) for p in pvs]
                    nphr = [_sub(p, a) for p in phs]
                    NUA, NUS = _stack(nua_r), _stack(nus_r)
                    NPX, NPY = _stack(npxr), _stack(npyr)
                    NPV, NPH = _stack(npvr), _stack(nphr)
                    TRX, TRY, TRH = project(npxr, npyr)
                    nJ = total_cost(NUA, NUS, NPX, NPY, NPV, NPH,
                                    TRX, TRY, TRH, rho, mus)
                    decay = ori_J - nJ
                    is_first = te == 0
                    conv_now = (is_first & (jnp.abs(decay) < w(_CONV))
                                & ~ls_done)
                    approx = -(alpha * alpha * dV1 + alpha * dV2)
                    ratio = jnp.where(approx != 0, decay / approx,
                                      f32(jnp.inf))
                    # (te < n_alphas) masks the dummy trailing alphas of the
                    # last chunk (n_alphas is not a CW multiple)
                    acc_now = ((te < n_alphas) & (~conv_now) & ~ls_done
                               & (decay > 0)
                               & ((approx < 0) | (ratio > w(_ACCEPT))))
                    BUA = jnp.where(acc_now, NUA, BUA)
                    BUS = jnp.where(acc_now, NUS, BUS)
                    BPX = jnp.where(acc_now, NPX, BPX)
                    BPY = jnp.where(acc_now, NPY, BPY)
                    BPV = jnp.where(acc_now, NPV, BPV)
                    BPH = jnp.where(acc_now, NPH, BPH)
                    BRX = jnp.where(acc_now, TRX, BRX)
                    BRY = jnp.where(acc_now, TRY, BRY)
                    BRH = jnp.where(acc_now, TRH, BRH)
                    small = small | (acc_now & ~is_first)
                    ls_done = ls_done | conv_now | acc_now
                    acc = acc | acc_now
                    convf = convf | conv_now
                return (t + 1, ls_done.astype(f32), acc.astype(f32),
                        convf.astype(f32), small.astype(f32), j_hit,
                        BUA, BUS, BPX, BPY, BPV, BPH, BRX, BRY, BRH)

            fz = lane0  # lane-anchored 0.0 row (False as f32)
            ls0 = (jnp.asarray(0, jnp.int32),
                   (bp_fail | ~active).astype(f32), fz, fz, fz, fz,
                   UA, US, PX, PY, PV, PH, RKX, RKY, RKH)
            (_, _, ls_acc_f, ls_conv_f, ls_small_f, ls_probe,
             BUA, BUS, BPX, BPY, BPV, BPH, BRX, BRY, BRH) = lax.while_loop(
                ls_cond_p if ls_chunk else ls_cond,
                ls_body_p if ls_chunk else ls_body, ls0)
            if _PROBE:
                probe_acc = probe_acc + ls_probe
                if probe_add is not None:
                    probe_acc = probe_acc + probe_add
            ls_acc = ls_acc_f > 0.5
            ls_conv = ls_conv_f > 0.5
            ls_small = ls_small_f > 0.5

            accepted = active & ~bp_fail & ls_acc
            converged_now = active & ~bp_fail & ls_conv
            exhausted = active & ~bp_fail & ~ls_acc & ~ls_conv
            bp_failed = active & bp_fail

            acc_s = accepted if G == 1 else _tile_rows(accepted, NH)
            sel = lambda n, o: jnp.where(acc_s, n, o)
            UA2, US2 = sel(BUA, UA), sel(BUS, US)
            PX2, PY2, PV2, PH2 = sel(BPX, PX), sel(BPY, PY), sel(BPV, PV), sel(BPH, PH)
            RKX2, RKY2, RKH2 = sel(BRX, RKX), sel(BRY, RKY), sel(BRH, RKH)

            status2 = jnp.where(
                bp_failed, f32(SolveStatus.BACKWARD_PASS_FAIL),
                jnp.where(converged_now, f32(SolveStatus.CONVERGED),
                          jnp.where(exhausted, f32(SolveStatus.FORWARD_PASS_FAIL),
                                    jnp.where(ls_small & accepted,
                                              f32(SolveStatus.FORWARD_PASS_SMALL_STEP),
                                              f32(SolveStatus.RUNNING)))))
            status2 = jnp.where(active, status2, status)
            is_fail = bp_failed | exhausted
            lamb2 = jnp.where(
                is_fail, jnp.maximum(w(_LAMP), lamb * w(_LAMP)),
                jnp.where(active & (status2 == f32(SolveStatus.RUNNING)),
                          lamb * w(_LDECAY), lamb))
            overflow_now = active & (lamb2 > w(_LMAX))
            done_now = overflow_now | converged_now
            iters2 = iters + active.astype(f32)
            if use_alm:
                # dual update only on line-search exhaustion
                # (src/cilqr_solver.cpp:377-379)
                exh_s = exhausted if G == 1 else _tile_rows(exhausted, NH)
                mus2 = tuple(jnp.where(exh_s, mn, m)
                             for mn, m in zip(mu_next, mus))
                rho2 = jnp.where(
                    exhausted,
                    jnp.minimum((1.0 + w(_ALM_GAMMA)) * rho, w(_MAX_RHO)),
                    rho)
            else:
                mus2, rho2 = mus, rho
            out = (it + 1, (active & ~done_now).astype(f32), lamb2, status2,
                   (conv_f | converged_now).astype(f32),
                   (ovf_f | overflow_now).astype(f32), iters2,
                   UA2, US2, PX2, PY2, PV2, PH2, RKX2, RKY2, RKH2,
                   rho2, mus2)
            return out + (probe_acc,) if _PROBE else out

        ones = lane0 + 1.0  # lane-anchored 1.0 row (True as f32)
        if use_alm:
            # mu slabs and rho arrive as data (lane-varying, so the loop
            # carries are layout-anchored for free); constraint i's slab is
            # an NH-step chunk at a sublane-aligned offset, so the slices
            # keep the native slab layout
            A0 = alm_ref[:, :]  # ((C*NH + 8)*G, 128)
            mus0 = tuple(A0[i * NHG:(i + 1) * NHG] for i in range(C))
            rho0 = _row(A0, C * NH)
        else:
            rho0 = lane0 + w(_RHO_INIT)
            mus0 = ()
        if resume:
            res = resume_ref[:, :]  # (8*G, 128), stats_out layout
            iters0 = _row(res, 0)
            status0 = _row(res, 1)
            conv0 = _row(res, 2)
            ovf0 = _row(res, 3)
            lamb0 = _row(res, 5)
            # rows exit only via converged/overflow, so active == ~(conv|ovf)
            active0 = ((conv0 < 0.5) & (ovf0 < 0.5)).astype(f32)
            st0 = (jnp.asarray(it0, jnp.int32), active0, lamb0,
                   status0, conv0, ovf0, iters0,
                   UA0, US0, PX0, PY0, PV0, PH0, RKX0, RKY0, RKH0,
                   rho0, mus0)
        else:
            st0 = (jnp.asarray(0, jnp.int32), ones, lane0 + w(_ILAMB),
                   lane0, lane0, lane0,
                   lane0, UA0, US0, PX0, PY0, PV0, PH0, RKX0, RKY0, RKH0,
                   rho0, mus0)
        if _PROBE:
            st0 = st0 + (lane0,)
        stf = lax.while_loop(iter_cond, iter_body, st0)
        (_, _, lambf, statusf, convf, ovff, itersf,
         UAf, USf, PXf, PYf, PVf, PHf, RKXf, RKYf, RKHf, rhof, musf) = stf[:18]
        probef = stf[18] if _PROBE else None

        final_J = total_cost(UAf, USf, PXf, PYf, PVf, PHf, RKXf, RKYf, RKHf,
                             rhof, musf)

        u_out[0:NHG, :] = UAf
        u_out[NHG:2 * NHG, :] = USf
        x_out[0:NHG, :] = PXf
        x_out[NHG:2 * NHG, :] = PYf
        x_out[2 * NHG:3 * NHG, :] = PVf
        x_out[3 * NHG:4 * NHG, :] = PHf
        stats_out[0:G, :] = itersf
        stats_out[G:2 * G, :] = statusf
        stats_out[2 * G:3 * G, :] = convf
        stats_out[3 * G:4 * G, :] = ovff
        if _RESUME_PROBE and resume:
            stats_out[4 * G:5 * G, :] = lamb0
            stats_out[5 * G:6 * G, :] = (active0 + 10.0 * status0
                                         + 1000.0 * iters0)
            # echo the raw resume block through unused u_out rows (steps
            # 8..15 of the accel slab are pads at N <= 8)
            u_out[8 * G:16 * G, :] = res
        else:
            stats_out[4 * G:5 * G, :] = final_J
            stats_out[5 * G:6 * G, :] = lambf
        if _RESUME_PROBE:
            # operand-integrity probe: per-column checksum of the window
            # slab + an SMEM weights echo (see _RESUME_PROBE)
            stats_out[6 * G:7 * G, :] = _hsum(rx) + _hsum(ry)
            stats_out[7 * G:8 * G, :] = (lane0 + w(_CONV)
                                         + 1000.0 * w(_WPOS)
                                         + x0[0] + 100.0 * x0[2])
        else:
            stats_out[6 * G:7 * G, :] = (probef if _PROBE
                                         else jnp.zeros((G, LANES), f32))
            stats_out[7 * G:8 * G, :] = jnp.zeros((G, LANES), f32)
        if use_alm:
            for i in range(C):
                alm_out[i * NHG:(i + 1) * NHG, :] = musf[i]
            alm_out[C * NHG:C * NHG + G, :] = rhof
            alm_out[C * NHG + G:C * NHG + 8 * G, :] = jnp.zeros(
                (7 * G, LANES), f32)

    return kernel


# Extra window rows above the per-step search bound (row_limits[k] =
# round8(w_back + slack + k * proj_rows)). Round-5 sweep at the shipped
# target-velocity bound: 48 -> 52.5k, 32 -> 54.1k, 24 -> 54.3k,
# 16 -> 56.1k cold solves/s with bench conv/iters unchanged
# (tools/results/bench_cold_r5_slack*.log), and the four-scenario
# f64-anchor validation at 16 is bit-identical to the unbounded window
# (val_r5_slack16.log) -- the bound still never binds. 16 rows (1.6 m)
# remains enough because the k=0 nearest row sits at <= w_back by the
# window-gather invariant and per-step overshoot above 1.1x target is
# transient on these workloads; ILQR_PROJ_SLACK overrides per process.
_PROJ_SLACK = 16


def derive_proj_rows(target_velocity, dt, factor: float = 1.1):
    """Per-step projection search-bound derivation (rows per horizon step).

    Step k's nearest-row scan is bounded by w_back + slack + k * rows
    (see ``cilqr_solve_pallas``). Rows advance 0.1 m apart (the
    reference line's sample spacing, src/utils.cpp:21-35), so the ego
    consumes ``v * dt / 0.1`` rows per step. Round 5 changed the speed
    basis from the SPEED LIMIT (1.5 * velo_max -- guaranteed to never
    bind, but 2-3x looser than any realized trajectory) to a headroom
    factor over the TARGET velocity the tracking cost actually pulls
    toward. Measured (cold batch 8192): factor 1.3 -> 50.0k solves/s
    (+11.8%), factor 1.1 -> 51.8k (+15.9%); MPC episodes 133.0k / 137.0k
    (tools/results/bench_{cold,mpc}_r5_proj{11,9}.log). A trial that
    transiently overshoots the bound only scans a subset and can only
    see a HIGHER cost for that trial (min over fewer rows), so this is
    a statistical mode like proj_dot -- and at BOTH factors the four-
    scenario f64-anchor validation is green with statistics identical
    to the unbounded window, i.e. the bound never binds on the
    validation batches (tools/results/val_r5_projtarget{,11}.log).
    Default 1.1 = the validated aggressive setting; the 48-row slack in
    row_limits absorbs transient overshoot above target speed."""
    import math

    return int(math.ceil(factor * float(target_velocity) * float(dt) / 0.1))


def cilqr_solve_pallas(cfg: CILQRConfig, w: CILQRWeights, x0_b, scenario_b,
                       window: int = 512, interpret: bool = False,
                       u_init=None, straggler_cap: int = 0,
                       proj_rows_per_step: int = 0, groups: int = 1,
                       alm_mu0=None, alm_rho0=None, return_alm: bool = False,
                       w_back: int = W_BACK, ls_chunk: int | None = None,
                       proj_dot: bool | None = None,
                       proj_fold: bool | None = None):
    """Batched CILQR solve via the fused kernel.

    Args mirror :func:`ilqr_tpu.solvers.cilqr.solve_batch`. x0_b: (B, 4);
    scenario_b: Scenario with leading batch axis. B is padded to a
    multiple of 128 internally.

    Returns (u (B, N, 2), x (B, N+1, 4), SolveStats), plus
    (alm_mu (B, N, C), alm_rho (B,)) when ``return_alm``.

    ALM warm starts: ``alm_mu0`` (B, N, C) / ``alm_rho0`` (B,) seed the
    dual state (None = the reference's cold reset, zero mu + rho_init,
    src/cilqr_solver.cpp:88-93). The warm-start *policy* -- when to reuse
    the previous solve's duals vs reset (:88-102) -- lives in the caller,
    exactly as :func:`ilqr_tpu.solvers.cilqr.solve` takes it from the
    carry; pass the previous solve's ``return_alm`` outputs to carry.

    ``window`` is the per-scenario reference-line span (0.1 m samples: 64
    behind the ego's initial projection, window-64 ahead) every projection
    searches. It must cover everything the planned trajectories can reach
    (~ realized speed x N x dt / 0.1 m + margin); too-small windows
    silently distort the road-border/tracking costs -- on all four shipped
    scenarios, 384 reproduces the full-line solutions and convergence
    statistics (window=768 is bit-identical, tools/validate_kernel_tpu.py)
    while 256 does not, so the default keeps a safety margin above 384.

    ``straggler_cap``: straggler compaction. Lockstep tiles
    pay the *max* iteration count over their 128 lanes (p50 is ~9 but rare
    rows run the full max_iter budget -- docs/PERFORMANCE.md "Lockstep
    economics"). With a cap K, phase 1 runs every row for at most K
    lockstep iterations; rows still unconverged are then stably sorted to
    the front (one argsort + column gathers, O(bytes) on XLA), packed into
    dense tiles, and resumed exactly where they stopped for the remaining
    max_iter - K budget; all-done tiles exit their solver loop immediately.
    Bitwise-identical results to a single-pass solve (the resume carry is
    exact -- see ``_build_kernel``); 0 disables. A tuple of strictly
    increasing caps runs a multi-phase schedule (re-sorting at each cap),
    which additionally isolates never-converging oscillator rows into
    their own tiles.

    ``proj_rows_per_step``: per-step projection search bound. Step k's
    nearest-point scan is limited to the first W_BACK + 48 + k * this many
    window rows (0 disables = full window every step). Exactness holds as
    long as trajectories advance at most this many 0.1 m samples per step;
    set to ceil(1.5 * velo_max * dt / 0.1) for headroom over the speed
    limit (trial rollouts can transiently exceed velo_max; a too-tight
    bound can only raise a trial's cost, i.e. reject near-marginal steps,
    never accept new ones -- see project()).

    ``w_back``: window rows kept behind the ego's initial projection
    (default 64 = 6.4 m). Every per-step search bound includes these rows,
    so shrinking it cuts projection work (the largest single cost in the
    kernel, docs/PERFORMANCE.md "Where the kernel time goes") at the risk
    of clipping trajectories whose nearest point regresses behind the
    start; with v >= 0 dynamics the regression is bounded by lateral
    excursions (validate on-hardware before changing the default).

    ``groups``: scenario groups per kernel tile (see ``_build_kernel``).
    groups=8 packs 1024 scenarios per tile so every per-step quantity is
    a full (8, 128) vector register; fold-based reduction orders differ
    from groups=1 in f32 rounding, so per-row iteration paths can diverge
    near accept thresholds while solution statistics agree (the same
    criteria as TPU-vs-CPU validation, tools/validate_kernel_tpu.py).

    ``ls_chunk``: chunked line search width (see ``_build_kernel``) --
    bitwise-identical results to the serial loop, fewer trial-rollout
    chains per solver iteration. None resolves to the ILQR_LS_CHUNK env
    var at G=1; forced to the serial loop (0) at G>1 and under the perf
    probes (which instrument the serial loop's body).

    ``proj_dot``: dot-form nearest-point scoring (see ``_build_kernel``)
    -- statistically equivalent, not bitwise (f32 argmin near-ties can
    resolve differently). None resolves to the ILQR_PROJ_DOT env var:
    default ON for hardware (measured +5.9% cold solves with all four
    scenarios inside the f64-anchor validation bands --
    tools/results/bench_cold_projdot.log, val_r4_projdot.log), OFF in
    interpret mode so the CPU test vehicle keeps the squared-distance
    form the bitwise parity tests pin down. Forced off at G>1.

    ``proj_fold``: pair-fold projection reduction (see ``_build_kernel``)
    -- experimental statistical mode, None resolves to the
    ILQR_PROJ_FOLD env var (default off everywhere). Forced off at G>1.
    """
    if proj_dot is None:
        proj_dot = _os.environ.get(
            "ILQR_PROJ_DOT", "0" if interpret else "1") == "1"
    if proj_fold is None:
        # experimental (see _build_kernel); off by default everywhere
        proj_fold = _os.environ.get("ILQR_PROJ_FOLD", "0") == "1"
    if groups > 1:
        proj_dot = False
        proj_fold = False
    if ls_chunk is None:
        # width 4 measured best on hardware: +13% cold solves, +15%
        # 10-tick warm MPC, noise-neutral on 120-tick episodes; width 8
        # loses 4-5% (docs/PERFORMANCE.md "Chunked packed-alpha line
        # search"). Interpret mode (the CPU test vehicle) defaults to the
        # serial loop: the packed while-body is ~4x larger and XLA:CPU's
        # compile of the sharded ALM interpret variant segfaults on it;
        # explicit ls_chunk (tests) is still honored. Resolved HERE, in
        # the non-jitted wrapper, so the effective width is always part
        # of the jit cache key -- changing ILQR_LS_CHUNK mid-process
        # takes effect for DIRECT (eager) calls instead of being baked in
        # at first trace (round-3 advisor finding). Caveat (round-4
        # advisor): when this wrapper is itself traced inside an outer jit
        # (run_mpc_kernel_scan, the chunked episode driver), the env value
        # read at the outer program's first trace is baked into THAT
        # cache; restart the process (or change the outer cache key) to
        # re-resolve there.
        default = "0" if interpret else "4"
        ls_chunk = int(_os.environ.get("ILQR_LS_CHUNK", default))
    if groups > 1 or _PROBE:
        ls_chunk = 0
    # experiment knob (direct calls only, same caveat as ILQR_LS_CHUNK):
    # extra window rows above the per-step search bound; buffers sustained
    # over-target speeds under the round-5 target-velocity bound
    proj_slack = int(_os.environ.get("ILQR_PROJ_SLACK", str(_PROJ_SLACK)))
    return _cilqr_solve_pallas_jit(
        cfg, w, x0_b, scenario_b, window=window, interpret=interpret,
        u_init=u_init, straggler_cap=straggler_cap,
        proj_rows_per_step=proj_rows_per_step, groups=groups,
        alm_mu0=alm_mu0, alm_rho0=alm_rho0, return_alm=return_alm,
        w_back=w_back, ls_chunk=ls_chunk, proj_dot=proj_dot,
        proj_fold=proj_fold, proj_slack=proj_slack)


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "window", "interpret", "straggler_cap",
                     "proj_rows_per_step", "groups", "return_alm",
                     "w_back", "ls_chunk", "proj_dot", "proj_fold",
                     "proj_slack"),
)
def _cilqr_solve_pallas_jit(cfg: CILQRConfig, w: CILQRWeights, x0_b,
                            scenario_b, window: int, interpret: bool,
                            u_init, straggler_cap, proj_rows_per_step: int,
                            groups: int, alm_mu0, alm_rho0,
                            return_alm: bool, w_back: int, ls_chunk: int,
                            proj_dot: bool, proj_fold: bool,
                            proj_slack: int = _PROJ_SLACK):
    """Jitted body of :func:`cilqr_solve_pallas` (ls_chunk already
    resolved to an int by the wrapper)."""
    N, M = cfg.N, max(cfg.num_obstacles, 1)
    assert N + 1 <= NH
    G = groups
    assert not (_PROBE and G > 1), "perf probes are groups=1 only"
    f32 = jnp.float32
    x0_b = jnp.asarray(x0_b, f32)
    B = x0_b.shape[0]
    Bp = -(-B // (LANES * G)) * (LANES * G)
    W = window

    def _ilv(a):
        """(R, Bp) scenario-major -> (R*G, Bp/G) group-interleaved: packed
        row r*G+g, col t*128+l holds a[r, (t*G+g)*128+l]."""
        if G == 1:
            return a
        R = a.shape[0]
        return (a.reshape(R, Bp // (G * LANES), G, LANES)
                .transpose(0, 2, 1, 3).reshape(R * G, Bp // G))

    def _unilv(a):
        """Inverse of :func:`_ilv`."""
        if G == 1:
            return a
        RG = a.shape[0]
        return (a.reshape(RG // G, G, Bp // (G * LANES), LANES)
                .transpose(0, 2, 1, 3).reshape(RG // G, Bp))

    ref = jnp.asarray(scenario_b.ref_line, f32)  # (B, P, 4)
    P = ref.shape[1]
    # per-row window: center on the ego's initial nearest index. The start
    # is NOT clamped to P - W: near the line end the tail rows repeat the
    # last sample (ties resolve to the first copy, whose values are
    # identical), which pins the ego's initial projection at row <= W_BACK
    # -- the invariant the per-step search bounds below rely on.
    d2 = (ref[:, :, 0] - x0_b[:, None, 0]) ** 2 + (ref[:, :, 1] - x0_b[:, None, 1]) ** 2
    c = jnp.argmin(d2, axis=1)
    start = jnp.maximum(c - w_back, 0)
    gidx = start[:, None] + jnp.arange(W)[None, :]
    gidx = jnp.minimum(gidx, P - 1)
    win = jnp.take_along_axis(ref, gidx[:, :, None], axis=1)  # (B, W, 4)

    obs = jnp.asarray(scenario_b.obs_preds, f32)  # (B, M0, N+1, 3)
    if cfg.num_obstacles == 0:
        obs = jnp.full((B, 1, N + 1, 3), 1e6, f32)
    # pad horizon rows to NH
    obs = jnp.pad(obs, ((0, 0), (0, 0), (0, NH - (N + 1)), (0, 0)),
                  constant_values=1e6)

    def pad_b(a):
        # Batch pads to a LANES*G multiple (1024 rows at G=8). Padded lanes
        # replicate the last real scenario (mode="edge") rather than zeros:
        # a zero scenario never converges, so zero-padding would make every
        # tile containing pad lanes run to max_iter and re-sort the pads as
        # stragglers each compaction phase. Edge copies converge exactly
        # when their source row does. Results are sliced back to [:B].
        return jnp.pad(a, ((0, Bp - B),) + ((0, 0),) * (a.ndim - 1),
                       mode="edge")

    x0_in = jnp.concatenate(
        [x0_b, jnp.broadcast_to(scenario_b.road_borders, (B, 2)).astype(f32),
         jnp.broadcast_to(jnp.asarray(scenario_b.ref_velo, f32).reshape(B, -1)[:, :1], (B, 1)),
         jnp.zeros((B, 1), f32)], axis=1)  # (B, 8)
    x0_in = pad_b(x0_in).T  # (8, Bp)
    if u_init is None:
        uinit = jnp.zeros((2 * NH, Bp), f32)
    else:
        u_init = jnp.asarray(u_init, f32)  # (B, N, 2): warm-start controls
        ui = jnp.zeros((B, 2 * NH), f32)
        ui = ui.at[:, :N].set(u_init[:, :, 0]).at[:, NH:NH + N].set(u_init[:, :, 1])
        uinit = pad_b(ui).T
    rx = pad_b(win[:, :, 0]).T  # (W, Bp)
    ry = pad_b(win[:, :, 1]).T
    ryaw = pad_b(win[:, :, 2]).T
    ox = pad_b(obs[:, :, :, 0].reshape(B, M * NH)).T  # (M*NH, Bp)
    oy = pad_b(obs[:, :, :, 1].reshape(B, M * NH)).T
    oyaw = pad_b(obs[:, :, :, 2].reshape(B, M * NH)).T

    alm = cfg.solve_type == "alm"
    C_k = 8 + 2 * M  # kernel dual columns (incl. the inert fake obstacle)
    if alm:
        # dual-state input slab: C_k mu slabs + an 8-row tail whose first
        # row is rho (see _build_kernel). Column k of the (N, C0) carry
        # maps to slab step rows k (control cols 0-3) / k+1 (state and
        # obstacle cols), mirroring the kernel's ctrl_mask/state_mask rows.
        slab = jnp.zeros((B, C_k, NH), f32)
        if alm_mu0 is not None:
            mu_t = jnp.moveaxis(jnp.asarray(alm_mu0, f32), -1, 1)  # (B,C0,N)
            C0 = mu_t.shape[1]
            slab = slab.at[:, :4, 0:N].set(mu_t[:, :4])
            slab = slab.at[:, 4:C0, 1:N + 1].set(mu_t[:, 4:])
        rho_in = (jnp.broadcast_to(jnp.asarray(alm_rho0, f32), (B,))
                  if alm_rho0 is not None
                  else jnp.broadcast_to(jnp.asarray(w.alm_rho_init, f32), (B,)))
        tail = jnp.zeros((B, 8), f32).at[:, 0].set(rho_in)
        alm_in = pad_b(
            jnp.concatenate([slab.reshape(B, C_k * NH), tail], axis=1)).T
    else:
        alm_in = None

    wt = jnp.zeros((_NWTS, 1), f32)
    vals = {
        _DT: w.dt, _WB: w.wheelbase, _WIDTH: w.width, _LENGTH: w.length,
        _DSAFE: w.d_safe, _VMAX: w.velo_max, _VMIN: w.velo_min,
        _AMAX: w.acc_max, _AMIN: w.acc_min, _STL: w.stl_lim,
        _WPOS: w.w_pos, _WVEL: w.w_vel, _WYAW: w.w_yaw, _WACC: w.w_acc,
        _WSTL: w.w_stl, _SQ1: w.state_exp_q1, _SQ2: w.state_exp_q2,
        _OQ1: w.obstacle_exp_q1, _OQ2: w.obstacle_exp_q2,
        _ILAMB: w.init_lamb, _LDECAY: w.lamb_decay, _LAMP: w.lamb_amplify,
        _LMAX: w.max_lamb, _CONV: w.convergence_threshold,
        _ACCEPT: w.accept_step_threshold, _ECLIP: w.exp_clip,
        _ALM_GAMMA: w.alm_gamma, _MAX_RHO: w.max_rho, _MAX_MU: w.max_mu,
        _RHO_INIT: w.alm_rho_init,
    }
    for i, v in vals.items():
        wt = wt.at[i, 0].set(jnp.asarray(v, f32))

    n_alphas = _alpha_count(cfg.min_alpha)
    rear = cfg.reference_point == "rear_center"

    grid = (Bp // (LANES * G),)
    bspec = lambda rows: pl.BlockSpec((rows, LANES), lambda i: (0, i),
                                      memory_space=pltpu.VMEM)

    if proj_rows_per_step > 0:
        # per-step static search bounds (see project() docstring); rounded
        # to vreg sublane multiples
        row_limits = tuple(
            min(W, -(-(w_back + proj_slack + k * proj_rows_per_step) // 8) * 8)
            for k in range(N + 1))
    else:
        row_limits = None

    def call_kernel(uinit_s, x0_s, rx_s, ry_s, ryaw_s, ox_s, oy_s, oyaw_s,
                    resume_rows, max_iter_k, it0_k, alm_s=None):
        # args arrive scenario-major; the kernel sees them group-interleaved
        kernel = _build_kernel(N, M, W, max_iter_k, n_alphas, rear, alm,
                               resume=resume_rows is not None, it0=it0_k,
                               row_limits=row_limits, G=G, ls_chunk=ls_chunk,
                               proj_dot=proj_dot, proj_fold=proj_fold)
        in_specs = [
            pl.BlockSpec((_NWTS, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
            bspec(8 * G), bspec(2 * NH * G), bspec(W * G), bspec(W * G),
            bspec(W * G), bspec(M * NH * G), bspec(M * NH * G),
            bspec(M * NH * G),
        ]
        args = [wt] + [_ilv(a) for a in
                       (x0_s, uinit_s, rx_s, ry_s, ryaw_s, ox_s, oy_s, oyaw_s)]
        if resume_rows is not None:
            in_specs.append(bspec(8 * G))
            args.append(_ilv(resume_rows))
        out_specs = [bspec(2 * NH * G), bspec(4 * NH * G), bspec(8 * G)]
        out_shape = [
            jax.ShapeDtypeStruct((2 * NH * G, Bp // G), f32),
            jax.ShapeDtypeStruct((4 * NH * G, Bp // G), f32),
            jax.ShapeDtypeStruct((8 * G, Bp // G), f32),
        ]
        if alm:
            in_specs.append(bspec((C_k * NH + 8) * G))
            args.append(_ilv(alm_s))
            out_specs.append(bspec((C_k * NH + 8) * G))
            out_shape.append(
                jax.ShapeDtypeStruct(((C_k * NH + 8) * G, Bp // G), f32))
        # At G>1 the kernel's live values are ~8x the G=1 case (full-vreg
        # per-step rows), far beyond Mosaic's default 16 MiB scoped-vmem
        # budget: measured stack demands on v5e at G=8/W=384 are 67.1M
        # (M=4 main variant) and 87.9M (resume variant). v5e has 128 MiB
        # VMEM and the double-buffered block I/O is ~15 MiB, so a 100 MiB
        # scoped budget fits.
        compiler_params = (
            pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)
            if G > 1 else None)
        outs = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=in_specs,
            out_specs=out_specs,
            out_shape=out_shape,
            interpret=interpret,
            compiler_params=compiler_params,
        )(*args)
        outs = tuple(_unilv(o) for o in outs)
        return outs if alm else outs + (None,)

    caps = (straggler_cap if isinstance(straggler_cap, tuple)
            else ((straggler_cap,) if straggler_cap else ()))
    caps = tuple(c for c in caps if 0 < c < cfg.max_iter)
    if (caps and G > 1 and not interpret
            and _os.environ.get("ILQR_UNSAFE_ALLOW_G8_CAP") != "1"):
        # KNOWN MISCOMPILE (v5e, jax 0.9/Mosaic): in a multi-pallas_call
        # program (capped phase + sorted resume) at G>1, the phase-1 call
        # returns catastrophically wrong results even though (a) the same
        # MLIR standalone is correct, (b) in-kernel checksums show every
        # operand arrives intact, (c) interpret mode is bitwise-exact, and
        # (d) minimal echo/carry/zero-trip/gather-dataflow repros all
        # pass. optimization_barrier on operands does not help, implicating
        # XLA buffer assignment around the inter-phase gathers. See
        # docs/PERFORMANCE.md "groups=8" for the full investigation and
        # tools/results/g8_resume_tpu.log for the failure signature.
        # groups>1 also measures ~2.3x slower than groups=1 uncapped, so
        # the combination has no use case; refuse rather than return
        # silently wrong results. ILQR_UNSAFE_ALLOW_G8_CAP=1 bypasses the
        # guard -- for tools/xla_canary.py ONLY, which runs the known-bad
        # shape on purpose to detect toolchain changes.
        raise NotImplementedError(
            "groups>1 + straggler_cap miscompiles on TPU (XLA multi-call "
            "buffer bug, docs/PERFORMANCE.md); use groups=1 (default, "
            "faster) or straggler_cap=0")
    assert all(a < b for a, b in zip(caps, caps[1:])), \
        "straggler_cap phases must be strictly increasing"
    schedule = caps + (cfg.max_iter,)
    u_out, x_out, stats_out, alm_out = call_kernel(
        uinit, x0_in, rx, ry, ryaw, ox, oy, oyaw, None, schedule[0], 0,
        alm_in)
    if len(schedule) > 1:
        # order[j] = original column of current column j (composed perms)
        order = jnp.arange(Bp)
        ins = [x0_in, rx, ry, ryaw, ox, oy, oyaw]
        for i in range(1, len(schedule)):
            done = ((stats_out[2] > 0.5) | (stats_out[3] > 0.5)).astype(jnp.int32)
            perm = jnp.argsort(done)  # stable: stragglers first, order kept
            order = order[perm]
            ins = [a[:, perm] for a in ins]
            u_out, x_out, stats_out, alm_out = call_kernel(
                u_out[:, perm], *ins, stats_out[:, perm],
                schedule[i], schedule[i - 1],
                alm_out[:, perm] if alm else None)
        inv = jnp.argsort(order)
        u_out = u_out[:, inv]
        x_out = x_out[:, inv]
        stats_out = stats_out[:, inv]
        if alm:
            alm_out = alm_out[:, inv]

    u = jnp.stack([u_out[0:N, :B], u_out[NH:NH + N, :B]], axis=-1)
    u = jnp.moveaxis(u, 1, 0)  # (B, N, 2)
    xs = jnp.stack([x_out[0:N + 1, :B], x_out[NH:NH + N + 1, :B],
                    x_out[2 * NH:2 * NH + N + 1, :B],
                    x_out[3 * NH:3 * NH + N + 1, :B]], axis=-1)
    xs = jnp.moveaxis(xs, 1, 0)  # (B, N+1, 4)
    stats = SolveStats(
        iters=stats_out[0, :B].astype(jnp.int32),
        status=stats_out[1, :B].astype(jnp.int32),
        converged=stats_out[2, :B] > 0.5,
        lamb_overflow=stats_out[3, :B] > 0.5,
        final_cost=stats_out[4, :B],
        final_lamb=stats_out[5, :B],
    )
    if _RESUME_PROBE:
        # raw slabs: u_out rows 8..16 echo the resume block (resume
        # variant); stats_out rows 6..8 carry operand checksums
        return u, xs, stats, (u_out, stats_out)
    if not return_alm:
        return u, xs, stats
    # unpack the final duals into the (B, N, C0) carry layout of
    # types.CILQRCarry (C0 = 8 + 2*num_obstacles; the fake-obstacle
    # columns of an obstacle-free config are dropped)
    C0 = 8 + 2 * cfg.num_obstacles
    slab_f = alm_out[:C_k * NH].reshape(C_k, NH, Bp)
    mu_f = jnp.concatenate(
        [slab_f[:4, 0:N], slab_f[4:C0, 1:N + 1]], axis=0)  # (C0, N, Bp)
    mu_f = jnp.transpose(mu_f, (2, 1, 0))[:B]  # (B, N, C0)
    rho_f = alm_out[C_k * NH, :B]
    return u, xs, stats, (mu_f, rho_f)
