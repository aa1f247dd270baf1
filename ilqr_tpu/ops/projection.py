"""Nearest-reference-point projection.

The reference has two semantics for "exact reference point":
- C++: a greedy monotone local walk with a persistent start index
  (src/cilqr_solver.cpp:289-314);
- Python: a global brute-force argmin (scripts/utils/kinematic.py:69-75).

On the shipped scenarios (monotone progress along the lane) both agree; we
implement the *global argmin* because it is embarrassingly parallel over
(batch, horizon) with no sequential dependency -- the TPU-native choice
(SURVEY.md section 7 "Hard parts"). The fused TPU kernel additionally
windows its candidate set (see ops/pallas/cilqr_kernel.py).

Padded reference-line rows (x = y = PAD_COORD) never win the argmin.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


HIER_STRIDE = 8


def nearest_ref_points(pos, ref_line, method: str = "exact"):
    """For query positions pos (..., 2) against ref_line (P, 4) [x,y,yaw,s],
    return the nearest rows as (..., 4).

    method:
      "exact" -- squared-difference distances against every sample
        (bitwise the reference's ordering; the float64 parity path). The
        broadcast + argmin fuses in XLA, so nothing (Q, P)-shaped is
        materialized, but the VPU still touches Q*P elements;
      "hier" -- two-stage coarse->fine argmin: stride-8 coarse sweep, then
        an exact argmin over the +-stride neighborhood of the coarse
        winner. ~7.5x fewer distance evaluations; identical result
        whenever the lane line is locally smooth at the 0.8 m scale
        (holds for every shipped scenario; validated against "exact" in
        tests). Perf option for the XLA-composed solver only (pick via
        CILQRConfig.projection); the fused TPU kernel has its own slab
        windowing and does not use this module.
    """
    if method == "hier":
        return _nearest_hier(pos, ref_line, HIER_STRIDE)
    dx = pos[..., 0:1] - ref_line[:, 0]
    dy = pos[..., 1:2] - ref_line[:, 1]
    d2 = dx * dx + dy * dy
    idx = jnp.argmin(d2, axis=-1)
    return ref_line[idx]


def _nearest_hier(pos, ref_line, stride: int):
    P = ref_line.shape[0]
    coarse = ref_line[::stride]  # (Pc, 4)
    dx = pos[..., 0:1] - coarse[:, 0]
    dy = pos[..., 1:2] - coarse[:, 1]
    cidx = jnp.argmin(dx * dx + dy * dy, axis=-1)  # (...,)
    offs = jnp.arange(-stride, stride + 1)
    cand = jnp.clip(cidx[..., None] * stride + offs, 0, P - 1)  # (..., 2S+1)
    cxy = ref_line[cand]  # (..., 2S+1, 4)
    ddx = pos[..., None, 0] - cxy[..., 0]
    ddy = pos[..., None, 1] - cxy[..., 1]
    best = jnp.argmin(ddx * ddx + ddy * ddy, axis=-1)
    idx = jnp.take_along_axis(cand, best[..., None], axis=-1)[..., 0]
    return ref_line[idx]


# (a windowed-argmin helper once lived here; it never gained a consumer --
# the fused TPU kernel implements its own slab windowing
# (ops/pallas/cilqr_kernel.py) -- and was removed rather than kept as
# untested exported surface)
