"""Nearest-reference-point projection.

The reference has two semantics for "exact reference point":
- C++: a greedy monotone local walk with a persistent start index
  (src/cilqr_solver.cpp:289-314);
- Python: a global brute-force argmin (scripts/utils/kinematic.py:69-75).

On the shipped scenarios (monotone progress along the lane) both agree; we
implement the *global argmin* because it is embarrassingly parallel over
(batch, horizon) with no sequential dependency -- the TPU-native choice
(SURVEY.md section 7 "Hard parts"). A windowed variant cuts the candidate
set using the arc-length ordering for long reference lines.

Padded reference-line rows (x = y = PAD_COORD) never win the argmin.
"""

from __future__ import annotations

import jax.numpy as jnp


def nearest_ref_points(pos, ref_line):
    """For query positions pos (..., 2) against ref_line (P, 4) [x,y,yaw,s],
    return the nearest rows as (..., 4).

    The distance computation lowers to a broadcast + argmin reduce that XLA
    fuses without materializing when the trailing dims are small.
    """
    dx = pos[..., 0:1] - ref_line[:, 0]
    dy = pos[..., 1:2] - ref_line[:, 1]
    d2 = dx * dx + dy * dy
    idx = jnp.argmin(d2, axis=-1)
    return ref_line[idx]


def nearest_ref_points_windowed(pos, ref_line, center_idx, window: int):
    """Argmin restricted to ``window`` points around ``center_idx``.

    pos (..., 2), center_idx (...,) int32. Exploits MPC temporal coherence:
    the nearest index moves slowly between solver iterations, so a small
    window (e.g. 128 of 2000 points) gives the same argmin at a fraction of
    the bandwidth. Used by the performance path; the parity path uses the
    global argmin.
    """
    P = ref_line.shape[0]
    start = jnp.clip(center_idx - window // 2, 0, max(P - window, 0))
    offs = jnp.arange(window)
    idxs = start[..., None] + offs  # (..., window)
    cand = ref_line[idxs]  # (..., window, 4)
    dx = pos[..., 0:1] - cand[..., 0]
    dy = pos[..., 1:2] - cand[..., 1]
    d2 = dx * dx + dy * dy
    best = jnp.argmin(d2, axis=-1)
    gidx = jnp.take_along_axis(idxs, best[..., None], axis=-1)[..., 0]
    return ref_line[gidx], gidx
