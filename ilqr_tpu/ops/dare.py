"""Discrete-time algebraic Riccati equation (DARE) by fixed-point iteration.

Semantics of the reference demos (scripts/0-lqr-demo.py:5-20 and
scripts/1-lqr-pathtracking.py:147-160): iterate
  P <- A^T P A - A^T P B (R + B^T P B)^{-1} B^T P A + Q
up to ``max_iter`` times, stopping early when max|P_next - P| < eps.

Expressed as a bounded ``lax.while_loop`` so the early exit survives jit and
the whole solve batches under ``vmap`` (each batch row runs lockstep until
all rows converge -- JAX's batched-while masking keeps converged rows
frozen).
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax


def solve_dare(A, B, Q, R, max_iter: int = 150, eps: float = 0.01):
    A = jnp.asarray(A)
    B = jnp.asarray(B)
    Q = jnp.asarray(Q)
    R = jnp.asarray(R)

    def step(P):
        BtP = B.T @ P
        return A.T @ P @ A - A.T @ P @ B @ jnp.linalg.solve(R + BtP @ B, BtP @ A) + Q

    def cond(carry):
        _, it, done = carry
        return (~done) & (it < max_iter)

    def body(carry):
        P, it, _ = carry
        P_next = step(P)
        done = jnp.max(jnp.abs(P_next - P)) < eps
        return P_next, it + 1, done

    P, _, _ = lax.while_loop(cond, body, (Q, jnp.asarray(0), jnp.asarray(False)))
    return P


def lqr_gain(A, B, Q, R, P=None):
    """K* = (R + B^T P B)^{-1} B^T P A  (scripts/0-lqr-demo.py:59)."""
    if P is None:
        P = solve_dare(A, B, Q, R)
    BtP = B.T @ P
    return jnp.linalg.solve(R + BtP @ B, BtP @ A)
