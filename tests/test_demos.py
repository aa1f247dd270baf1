"""Demo capabilities: linear LQR (demo 0) and LQR path tracking (demo 1)."""

import numpy as np
import jax
import jax.numpy as jnp

from ilqr_tpu.ops.dare import lqr_gain, solve_dare
from ilqr_tpu.solvers.lqr import closed_loop_rollout, lqr_demo, open_loop_rollout
from ilqr_tpu.solvers.lqr_tracking import (
    calc_speed_profile,
    default_params,
    make_demo_course,
    nearest_index,
    simulate,
)

# the demo-0 system (reference scripts/0-lqr-demo.py:24-27)
A0 = np.array([[1.95, -0.025, -1.6], [1.6, 1.1, -3.2], [0.425, 0.185, 0.3]])
B0 = np.array([[0.0, 1.0], [1.0, 1.0], [0.0, 1.0]])


def _oracle_dare(A, B, Q, R, max_iter=150, eps=0.01):
    p = Q
    for _ in range(max_iter):
        p_next = A.T @ p @ A - A.T @ p @ B @ np.linalg.inv(R + B.T @ p @ B) @ B.T @ p @ A + Q
        if np.abs(p_next - p).max() < eps:
            return p_next
        p = p_next
    return p_next


def test_dare_matches_fixed_point_oracle():
    Q, R = np.eye(3), np.eye(2)
    P = np.asarray(solve_dare(A0, B0, Q, R))
    P_o = _oracle_dare(A0, B0, Q, R)
    np.testing.assert_allclose(P, P_o, atol=1e-6)
    # Riccati residual small at the fixed point's tolerance scale
    K = np.asarray(lqr_gain(A0, B0, Q, R))
    resid = A0.T @ P @ A0 - A0.T @ P @ B0 @ np.linalg.inv(R + B0.T @ P @ B0) @ B0.T @ P @ A0 + Q - P
    assert np.abs(resid).max() < 0.02


def test_open_loop_diverges_closed_loop_stabilizes():
    Q, R = np.eye(3), np.eye(2)
    x0 = jnp.asarray([1.0, 2.0, 3.0])
    P, K, ol, cl = lqr_demo(A0, B0, Q, R, x0, steps=50)
    assert float(jnp.abs(ol.x[-1]).max()) > 1e3  # unstable plant blows up
    assert float(jnp.abs(cl.x[-1]).max()) < 1e-2  # regulator drives to zero
    assert float(cl.u_norm[0]) > 0


def test_closed_loop_rollout_matches_numpy():
    Q, R = np.eye(3), np.eye(2)
    K = np.asarray(lqr_gain(A0, B0, Q, R))
    x0 = np.array([1.0, 2.0, 3.0])
    roll = closed_loop_rollout(A0, B0, K, x0, 20)
    x = x0
    for i in range(20):
        np.testing.assert_allclose(np.asarray(roll.x[i]), x, atol=1e-9)
        u = -K @ x
        x = A0 @ x + B0 @ u
    assert np.asarray(roll.x).shape == (20, 3)


def test_speed_profile_semantics():
    # straight yaw: constant target, with slow-down tail
    cyaw = np.zeros(300)
    sp = calc_speed_profile(cyaw, 10.0)
    # reference quirk: the slow-down loop's i=0 writes sp[-0] == sp[0]
    # (scripts/1-lqr-pathtracking.py:332-335), clamped to the 1/3.6 floor
    np.testing.assert_allclose(sp[0], 1.0 / 3.6)
    assert np.all(sp[1:200] == 10.0)
    assert sp[-1] <= sp[-40]
    assert np.min(sp) >= 1.0 / 3.6 - 1e-12


def test_nearest_index_sign():
    cx = jnp.linspace(0, 10, 101)
    cy = jnp.zeros(101)
    cyaw = jnp.zeros(101)
    # point left of the path (positive y): positive error
    _, e_left = nearest_index(jnp.asarray([5.0, 1.0, 0.0, 0.0]), cx, cy, cyaw)
    _, e_right = nearest_index(jnp.asarray([5.0, -1.0, 0.0, 0.0]), cx, cy, cyaw)
    assert float(e_left) > 0 and float(e_right) < 0


def test_tracking_simulation_reaches_goal():
    course, goal = make_demo_course()
    p = default_params()
    states, controls, reached = jax.jit(
        lambda: simulate(p, course, goal, max_ticks=5000)
    )()
    assert bool(reached[-1]), "tracker did not reach the goal"
    final = np.asarray(states[-1])
    assert np.hypot(final[0] - goal[0], final[1] - goal[1]) <= 0.35
    # steering stayed within limits
    assert float(jnp.abs(controls[:, 1]).max()) <= float(p.max_steer) + 1e-9
