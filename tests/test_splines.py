"""Natural cubic spline unit tests (vs dense-solve oracle + spline axioms)."""

import numpy as np
import jax.numpy as jnp

import pytest

from ilqr_tpu.utils.splines import (
    CubicSpline1D,
    CubicSpline2D,
    calc_spline_course,
    fit_natural_cubic,
    eval_spline,
)

pytestmark = pytest.mark.quick  # part of the <5-min regression tier


def _dense_natural_coeffs(x, y):
    """Oracle: assemble the same tridiagonal system the reference builds
    (src/cubic_spline.cpp:41-68) and solve it densely."""
    n = len(x)
    h = np.diff(x)
    A = np.zeros((n, n))
    B = np.zeros(n)
    A[0, 0] = 1.0
    for i in range(n - 1):
        if i != n - 2:
            A[i + 1, i + 1] = 2.0 * (h[i] + h[i + 1])
        A[i + 1, i] = h[i]
        A[i, i + 1] = h[i]
    A[0, 1] = 0.0
    A[n - 1, n - 2] = 0.0
    A[n - 1, n - 1] = 1.0
    for i in range(n - 2):
        B[i + 1] = 3.0 * (y[i + 2] - y[i + 1]) / h[i + 1] - 3.0 * (y[i + 1] - y[i]) / h[i]
    return np.linalg.solve(A, B)


def test_thomas_matches_dense_solve(rng):
    x = np.sort(rng.uniform(0, 10, 12))
    y = rng.normal(size=12)
    sp = CubicSpline1D(x, y)
    c_oracle = _dense_natural_coeffs(x, y)
    np.testing.assert_allclose(sp.c, c_oracle, atol=1e-10)


def test_interpolates_knots(rng):
    x = np.sort(rng.uniform(0, 10, 8))
    y = rng.normal(size=8)
    sp = CubicSpline1D(x, y)
    np.testing.assert_allclose(sp.calc_position(x[:-1]), y[:-1], atol=1e-12)
    # endpoint evaluates through the last segment polynomial
    np.testing.assert_allclose(sp.calc_position(x[-1]), y[-1], atol=1e-9)


def test_natural_boundary_conditions(rng):
    x = np.sort(rng.uniform(0, 10, 9))
    y = rng.normal(size=9)
    sp = CubicSpline1D(x, y)
    assert abs(sp.calc_second_derivative(x[0])) < 1e-10
    assert abs(sp.calc_second_derivative(x[-1])) < 1e-9


def test_c1_c2_continuity():
    # well-spaced knots: near-duplicate knots make the continuity check
    # ill-conditioned without being wrong
    r = np.random.default_rng(42)
    x = np.arange(7) * 1.5 + r.uniform(0, 0.5, 7)
    y = r.normal(size=7)
    sp = CubicSpline1D(x, y)
    for xi in x[1:-1]:
        eps = 1e-7
        for dd in (0, 1, 2):
            left = sp(xi - eps, dd)
            right = sp(xi + eps, dd)
            assert abs(left - right) < 1e-4, (dd, xi)


def test_derivatives_vs_finite_difference(rng):
    x = np.sort(rng.uniform(0, 10, 10))
    y = rng.normal(size=10)
    sp = CubicSpline1D(x, y)
    ts = np.linspace(x[0] + 0.1, x[-1] - 0.1, 23)
    eps = 1e-6
    d1_fd = (sp.calc_position(ts + eps) - sp.calc_position(ts - eps)) / (2 * eps)
    np.testing.assert_allclose(sp.calc_first_derivative(ts), d1_fd, atol=1e-5)
    eps2 = 1e-4  # larger step: central 2nd difference loses ~8 digits to cancellation
    d2_fd = (
        sp.calc_position(ts + eps2) - 2 * sp.calc_position(ts) + sp.calc_position(ts - eps2)
    ) / eps2**2
    np.testing.assert_allclose(sp.calc_second_derivative(ts), d2_fd, rtol=1e-3, atol=1e-4)


def test_jax_fit_matches_host_fit(rng):
    x = np.sort(rng.uniform(0, 10, 11))
    y = rng.normal(size=11)
    sp = CubicSpline1D(x, y)
    a, b, c, d = fit_natural_cubic(jnp.asarray(x), jnp.asarray(y))
    np.testing.assert_allclose(np.asarray(c), sp.c, atol=1e-9)
    np.testing.assert_allclose(np.asarray(b), sp.b, atol=1e-9)
    ts = np.linspace(x[0], x[-1] - 1e-9, 17)
    got = eval_spline(jnp.asarray(x), a, b, c, d, jnp.asarray(ts))
    np.testing.assert_allclose(np.asarray(got), sp.calc_position(ts), atol=1e-9)


def test_spline2d_yaw_curvature_straight_line():
    sp = CubicSpline2D([0.0, 10.0, 20.0, 30.0], [0.0, 0.0, 0.0, 0.0])
    s = np.linspace(0, 29.9, 50)
    assert np.allclose(sp.calc_yaw(s), 0.0, atol=1e-12)
    assert np.allclose(sp.calc_curvature(s), 0.0, atol=1e-12)


def test_spline2d_circle_curvature():
    # quarter-ish circle of radius 20: curvature magnitude ~ 1/20
    th = np.linspace(0, np.pi / 2, 20)
    sp = CubicSpline2D(20 * np.cos(th), 20 * np.sin(th))
    s_mid = np.linspace(sp.s[2], sp.s[-3], 10)
    np.testing.assert_allclose(np.abs(sp.calc_curvature(s_mid)), 1 / 20, rtol=8e-2)


def test_calc_spline_course_shapes():
    rx, ry, ryaw, rk, s = calc_spline_course(
        [0.0, 15.0, 31.25, 25.0], [0.0, -7.5, -12.25, 16.25], ds=0.1
    )
    assert len(rx) == len(ry) == len(ryaw) == len(rk) == len(s)
    assert s[0] == 0.0 and np.all(np.diff(s) > 0)
