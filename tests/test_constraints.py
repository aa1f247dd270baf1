"""Constraint geometry + penalty kernels vs autodiff / closed forms."""

import numpy as np
import jax
import jax.numpy as jnp

from ilqr_tpu.models.bicycle import GRAVITY_CENTER
from ilqr_tpu.ops import constraints as C
import pytest

pytestmark = pytest.mark.quick  # part of the <5-min regression tier

WB, WIDTH, LENGTH, D_SAFE = 2.8, 2.0, 4.5, 1.0


def test_ellipsoid_scales_inflation_quirk():
    # keep the reference's 6x d_safe major-axis inflation
    # (src/utils.cpp:387-393)
    a, b = C.ellipsoid_scales(WIDTH, LENGTH, D_SAFE, ego_pnt_radius=0.5 * WIDTH)
    assert np.isclose(a, 0.5 * LENGTH + 6 * D_SAFE + 1.0)
    assert np.isclose(b, 0.5 * WIDTH + D_SAFE + 1.0)


def test_safety_margin_sign_convention():
    ab = (3.0, 2.0)
    obs = jnp.asarray([0.0, 0.0, 0.0])
    inside = C.ellipsoid_safety_margin(jnp.asarray([0.5, 0.0]), obs, ab)
    outside = C.ellipsoid_safety_margin(jnp.asarray([10.0, 0.0]), obs, ab)
    boundary = C.ellipsoid_safety_margin(jnp.asarray([3.0, 0.0]), obs, ab)
    assert float(inside) > 0  # violation
    assert float(outside) < 0
    assert abs(float(boundary)) < 1e-12


def test_safety_margin_rotation(rng):
    # rotated obstacle: point on the rotated major axis at distance a
    theta = 0.7
    ab = (3.0, 2.0)
    center = jnp.asarray([1.0, -2.0])
    pnt = center + 3.0 * jnp.asarray([np.cos(theta), np.sin(theta)])
    obs = jnp.concatenate([center, jnp.asarray([theta])])
    assert abs(float(C.ellipsoid_safety_margin(pnt, obs, ab))) < 1e-12


def test_safety_margin_grad_vs_autodiff(rng):
    ab = (3.3, 2.1)
    for _ in range(5):
        pnt = jnp.asarray(rng.normal(size=2) * 3)
        obs = jnp.asarray(rng.normal(size=3))
        g = C.ellipsoid_safety_margin_grad(pnt, obs, ab)
        g_ad = jax.grad(lambda p: C.ellipsoid_safety_margin(p, obs, ab))(pnt)
        np.testing.assert_allclose(np.asarray(g), np.asarray(g_ad), atol=1e-10)


def test_obstacle_constraint_grads_vs_autodiff(rng):
    for _ in range(5):
        ego = jnp.asarray(rng.normal(size=4) * jnp.asarray([5, 3, 2, 0.5]))
        obs = jnp.asarray(rng.normal(size=3) * jnp.asarray([5, 3, 0.5]))
        gf, gr = C.obstacle_avoidance_constr_grads(
            ego, obs, WB, WIDTH, LENGTH, D_SAFE, GRAVITY_CENTER
        )
        f_fn = lambda s: C.obstacle_avoidance_constr(
            s, obs, WB, WIDTH, LENGTH, D_SAFE, GRAVITY_CENTER
        )[0]
        r_fn = lambda s: C.obstacle_avoidance_constr(
            s, obs, WB, WIDTH, LENGTH, D_SAFE, GRAVITY_CENTER
        )[1]
        np.testing.assert_allclose(np.asarray(gf), np.asarray(jax.grad(f_fn)(ego)), atol=1e-10)
        np.testing.assert_allclose(np.asarray(gr), np.asarray(jax.grad(r_fn)(ego)), atol=1e-10)


def test_exp_barrier_coeffs_vs_autodiff():
    q1, q2 = 3.0, 3.5
    c = jnp.asarray(0.3)
    b, gamma, eta = C.exp_barrier_coeffs(c, q1, q2)
    # b' = gamma, b'' = eta for a scalar constraint direction of 1
    f = lambda cc: C.exp_barrier(cc, q1, q2)
    np.testing.assert_allclose(float(gamma), float(jax.grad(f)(c)), rtol=1e-12)
    np.testing.assert_allclose(float(eta), float(jax.grad(jax.grad(f))(c)), rtol=1e-12)


def test_exp_barrier_clip_keeps_f32_finite():
    c = jnp.asarray(100.0, jnp.float32)
    b = C.exp_barrier(c, jnp.float32(5.5), jnp.float32(5.75), exp_clip=60.0)
    assert np.isfinite(float(b))


def test_alm_coeffs_active_inactive():
    rho, mu = 20.0, 4.0
    # active: c + mu/rho > 0
    c = jnp.asarray(0.5)
    v, g, h = C.alm_coeffs(c, rho, mu)
    shifted = 0.5 + 4.0 / 20.0
    np.testing.assert_allclose(float(v), 0.5 * rho * shifted**2, rtol=1e-12)
    np.testing.assert_allclose(float(g), rho * shifted, rtol=1e-12)
    np.testing.assert_allclose(float(h), rho * shifted, rtol=1e-12)
    # inactive
    v, g, h = C.alm_coeffs(jnp.asarray(-1.0), rho, mu)
    assert float(v) == 0.0 and float(g) == 0.0 and float(h) == 0.0


def test_alm_grad_vs_autodiff_active_region():
    rho, mu = 20.0, 4.0
    c = jnp.asarray(0.5)
    _, g, _ = C.alm_coeffs(c, rho, mu)
    g_ad = jax.grad(lambda cc: C.alm_item(cc, rho, mu))(c)
    np.testing.assert_allclose(float(g), float(g_ad), rtol=1e-12)


def test_alm_mu_next_clip():
    got = C.alm_mu_next(jnp.asarray([10.0, -10.0, 0.1]), 20.0, jnp.asarray([5.0, 5.0, 5.0]), 120.0)
    np.testing.assert_allclose(np.asarray(got), [120.0, 0.0, 7.0], atol=1e-12)


def test_lateral_offset_sign_and_magnitude():
    # reference line along +x at origin; point above the line => positive d
    ref = jnp.asarray([0.0, 0.0, 0.0])
    above = jnp.asarray([1.0, 2.0, 5.0, 0.0])
    below = jnp.asarray([1.0, -2.0, 5.0, 0.0])
    d_above, _ = C.lateral_offset(above, ref)
    d_below, _ = C.lateral_offset(below, ref)
    np.testing.assert_allclose(float(d_above), np.hypot(1, 2), rtol=1e-12)
    np.testing.assert_allclose(float(d_below), -np.hypot(1, 2), rtol=1e-12)


def test_lateral_offset_grad_vs_autodiff(rng):
    for _ in range(5):
        ref = jnp.asarray(rng.normal(size=3))
        xk = jnp.asarray(rng.normal(size=4) * 3 + jnp.asarray([1, 1, 0, 0]))
        g = C.lateral_offset_grad(xk, ref)
        g_ad = jax.grad(lambda s: C.lateral_offset(s, ref)[0])(xk)
        np.testing.assert_allclose(np.asarray(g), np.asarray(g_ad), atol=1e-9)
