"""Bicycle dynamics + analytic Jacobians vs autodiff and numpy oracles."""

import numpy as np
import jax
import jax.numpy as jnp

import pytest

from ilqr_tpu.models.bicycle import (
    GRAVITY_CENTER,
    REAR_CENTER,
    const_velo_prediction,
    front_rear_center_jacobians,
    front_rear_centers,
    kinematic_jacobians,
    kinematic_propagate,
    rollout,
)

pytestmark = pytest.mark.quick  # part of the <5-min regression tier

DT = 0.1
WB = 2.8


def _oracle_propagate_gc(x, u):
    beta = np.arctan(np.tan(u[1]) / 2)
    return np.array(
        [
            x[0] + x[2] * np.cos(beta + x[3]) * DT,
            x[1] + x[2] * np.sin(beta + x[3]) * DT,
            x[2] + u[0] * DT,
            x[3] + 2 * x[2] * np.sin(beta) * DT / WB,
        ]
    )


def _oracle_propagate_rc(x, u):
    return np.array(
        [
            x[0] + x[2] * np.cos(x[3]) * DT,
            x[1] + x[2] * np.sin(x[3]) * DT,
            x[2] + u[0] * DT,
            x[3] + x[2] * np.tan(u[1]) * DT / WB,
        ]
    )


def test_propagate_matches_oracle(rng):
    for _ in range(10):
        x = rng.normal(size=4) * np.array([10, 5, 3, 0.5]) + np.array([0, 0, 5, 0])
        u = rng.normal(size=2) * np.array([2, 0.1])
        got_gc = np.asarray(kinematic_propagate(jnp.asarray(x), jnp.asarray(u), DT, WB, GRAVITY_CENTER))
        np.testing.assert_allclose(got_gc, _oracle_propagate_gc(x, u), atol=1e-12)
        got_rc = np.asarray(kinematic_propagate(jnp.asarray(x), jnp.asarray(u), DT, WB, REAR_CENTER))
        np.testing.assert_allclose(got_rc, _oracle_propagate_rc(x, u), atol=1e-12)


def test_jacobians_vs_autodiff(rng):
    # REAR_CENTER: the reference's analytic Jacobian is the exact
    # derivative of the dynamics -> match autodiff to 1e-10.
    # GRAVITY_CENTER: the reference Jacobian uses the quirk slip angle
    # atan(tan(stl/2)) (src/utils.cpp:292) while the dynamics use
    # atan(tan(stl)/2) (src/utils.cpp:265), so the analytic form deviates
    # from the true derivative at O(stl^3); with |stl| <= ~0.3 here the
    # beta gap is <= stl^3/8 ~ 3.4e-3, entering A/B scaled by v*dt. The
    # loose band checks we stay NEAR the true derivative while
    # tests/test_reference_oracle.py pins the exact quirk form against the
    # reference's own numpy implementation.
    for ref_point, atol in ((GRAVITY_CENTER, 5e-3), (REAR_CENTER, 1e-10)):
        x = jnp.asarray(rng.normal(size=(5, 4)) + jnp.asarray([0, 0, 6, 0]))
        u = jnp.asarray(rng.normal(size=(5, 2)) * jnp.asarray([2, 0.1]))
        A, B = kinematic_jacobians(x, u, DT, WB, ref_point)
        f = lambda xx, uu: kinematic_propagate(xx, uu, DT, WB, ref_point)
        for i in range(5):
            A_ad = jax.jacfwd(f, argnums=0)(x[i], u[i])
            B_ad = jax.jacfwd(f, argnums=1)(x[i], u[i])
            np.testing.assert_allclose(np.asarray(A[i]), np.asarray(A_ad), atol=atol)
            np.testing.assert_allclose(np.asarray(B[i]), np.asarray(B_ad), atol=atol)


def test_jacobians_match_reference_quirk_formula(rng):
    """The gravity-center Jacobian must use beta = atan(tan(stl/2)) --
    the reference quirk (src/utils.cpp:292, scripts/utils/kinematic.py:20)
    -- with dbds the exact derivative of the DYNAMICS beta (:293)."""
    x = jnp.asarray(rng.normal(size=(4, 4)) + jnp.asarray([0, 0, 6, 0]))
    u = jnp.asarray(rng.normal(size=(4, 2)) * jnp.asarray([2, 0.3]))
    A, B = kinematic_jacobians(x, u, DT, WB, GRAVITY_CENTER)
    for i in range(4):
        v, yaw, stl = float(x[i, 2]), float(x[i, 3]), float(u[i, 1])
        beta = np.arctan(np.tan(stl / 2))  # quirk form
        dbds = 0.5 * (1 + np.tan(stl) ** 2) / (1 + 0.25 * np.tan(stl) ** 2)
        np.testing.assert_allclose(float(A[i, 0, 2]), np.cos(beta + yaw) * DT,
                                   atol=1e-12)
        np.testing.assert_allclose(float(A[i, 3, 2]),
                                   2 * np.sin(beta) * DT / WB, atol=1e-12)
        np.testing.assert_allclose(float(B[i, 0, 1]),
                                   -v * np.sin(beta + yaw) * DT * dbds,
                                   atol=1e-12)
        np.testing.assert_allclose(float(B[i, 3, 1]),
                                   (2 * v * DT / WB) * np.cos(beta) * dbds,
                                   atol=1e-12)


def test_jacobian_steer_column_gc_nonzero(rng):
    # gravity-center model: x,y rows depend on steering via beta
    x = jnp.asarray([[1.0, 2.0, 5.0, 0.3]])
    u = jnp.asarray([[1.0, 0.1]])
    _, B = kinematic_jacobians(x, u, DT, WB, GRAVITY_CENTER)
    assert abs(float(B[0, 0, 1])) > 0
    assert abs(float(B[0, 1, 1])) > 0
    # rear-center model: x,y rows do not depend on steering
    _, B_rc = kinematic_jacobians(x, u, DT, WB, REAR_CENTER)
    assert float(B_rc[0, 0, 1]) == 0.0
    assert float(B_rc[0, 1, 1]) == 0.0


def test_rollout_matches_sequential(rng):
    x0 = np.array([0.0, 0.0, 5.0, 0.1])
    u_seq = rng.normal(size=(12, 2)) * np.array([1.0, 0.05])
    xs = np.asarray(rollout(jnp.asarray(x0), jnp.asarray(u_seq), DT, WB, GRAVITY_CENTER))
    cur = x0
    for i in range(12):
        cur = _oracle_propagate_gc(cur, u_seq[i])
        np.testing.assert_allclose(xs[i + 1], cur, atol=1e-12)


def test_const_velo_prediction_zero_control():
    x0 = np.array([1.0, 2.0, 4.0, 0.2])
    xs = np.asarray(const_velo_prediction(jnp.asarray(x0), 10, DT, WB))
    # zero steering, zero acc: v and yaw constant, straight-line motion
    np.testing.assert_allclose(xs[:, 2], 4.0, atol=1e-12)
    np.testing.assert_allclose(xs[:, 3], 0.2, atol=1e-12)
    np.testing.assert_allclose(np.diff(xs[:, 0]), 4.0 * np.cos(0.2) * DT, atol=1e-12)


def test_front_rear_centers_and_jacobians(rng):
    for ref_point in (GRAVITY_CENTER, REAR_CENTER):
        state = jnp.asarray([3.0, -1.0, 5.0, 0.7])
        f, r = front_rear_centers(state, WB, ref_point)
        if ref_point == GRAVITY_CENTER:
            np.testing.assert_allclose(
                np.asarray(f),
                np.asarray(state[:2]) + 0.5 * WB * np.array([np.cos(0.7), np.sin(0.7)]),
                atol=1e-12,
            )
            np.testing.assert_allclose(np.asarray(f + r) / 2, np.asarray(state[:2]), atol=1e-12)
        else:
            np.testing.assert_allclose(np.asarray(r), np.asarray(state[:2]), atol=1e-12)
            np.testing.assert_allclose(np.linalg.norm(np.asarray(f - r)), WB, atol=1e-12)
        # jacobian layout: (4, 2), rows = state dims, cols = point coords;
        # check against autodiff of the centers
        jf, jr = front_rear_center_jacobians(state[3], WB, ref_point)
        f_fn = lambda s: front_rear_centers(s, WB, ref_point)[0]
        r_fn = lambda s: front_rear_centers(s, WB, ref_point)[1]
        np.testing.assert_allclose(
            np.asarray(jf), np.asarray(jax.jacfwd(f_fn)(state)).T, atol=1e-10
        )
        np.testing.assert_allclose(
            np.asarray(jr), np.asarray(jax.jacfwd(r_fn)(state)).T, atol=1e-10
        )
