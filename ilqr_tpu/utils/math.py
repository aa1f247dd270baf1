"""Small math helpers (reference: template utils in include/utils.hpp:108-232).

All jnp-based, shape-polymorphic, dtype-preserving.
"""

from __future__ import annotations

import jax.numpy as jnp


def sign(x):
    """+1 for x >= 0, -1 for x < 0 (reference include/utils.hpp:110-117 --
    note sign(0) = +1, unlike jnp.sign)."""
    x = jnp.asarray(x)
    return jnp.where(x < 0, -1, 1).astype(x.dtype if jnp.issubdtype(x.dtype, jnp.floating) else jnp.int32)


def pi_2_pi(theta):
    """Wrap angle to (-pi, pi] ... matching the modulo form the reference
    demos use (scripts/1-lqr-pathtracking.py:143-144)."""
    return (theta + jnp.pi) % (2.0 * jnp.pi) - jnp.pi


def rotation_matrix2d(theta):
    """(..., 2, 2) CCW rotation (reference include/utils.hpp:127-133)."""
    c, s = jnp.cos(theta), jnp.sin(theta)
    return jnp.stack([jnp.stack([c, -s], axis=-1),
                      jnp.stack([s, c], axis=-1)], axis=-2)


def transformation_matrix2d(x, y, theta):
    """(..., 3, 3) SE(2) transform (reference include/utils.hpp:119-125)."""
    c, s = jnp.cos(theta), jnp.sin(theta)
    z = jnp.zeros_like(c)
    o = jnp.ones_like(c)
    return jnp.stack([
        jnp.stack([c, -s, x * o], axis=-1),
        jnp.stack([s, c, y * o], axis=-1),
        jnp.stack([z, z, o], axis=-1),
    ], axis=-2)


def diff(v, axis=-1):
    return jnp.diff(jnp.asarray(v), axis=axis)


def cumsum(v, axis=-1):
    return jnp.cumsum(jnp.asarray(v), axis=axis)


def variance(v):
    """Population variance (reference include/utils.hpp:217-232)."""
    v = jnp.asarray(v)
    return jnp.mean((v - jnp.mean(v)) ** 2)
