"""Parity tests that EXECUTE the reference's own Python implementations.

Every other parity test in this suite compares against builder-written
oracles (tests/oracle_cilqr.py, goldens produced by this repo). These
tests close the independent-verification loop: they importlib-load the
reference's pure-numpy demo scripts from /root/reference and run the
reference's *own code* as the oracle against this repo's demo solvers.

  - demo 0: reference ``solve_dare`` (scripts/0-lqr-demo.py:5-20) vs
    ilqr_tpu.ops.dare.solve_dare on the script's exact A, B, Q, R
    (scripts/0-lqr-demo.py:24-29,55-59).
  - demo 1: the reference's ``lqr_speed_steering_control`` / ``update``
    driven through the do_simulation loop (scripts/1-lqr-pathtracking.py:
    248-290, plotting elided) vs ilqr_tpu.solvers.lqr_tracking.simulate.
  - demo 2: the reference ``CILQR`` class solve
    (scripts/2-cilqr-motionplanning.py:44-393) on the shipped scenario vs
    ilqr_tpu.solvers.cilqr_demo.solve.
  - kernel level: reference scripts/utils/{kinematic,constraint}.py
    functions vs ilqr_tpu.models.bicycle / ilqr_tpu.ops.constraints on
    random states.

All tests skip when /root/reference is not mounted. The scripts' main()
bodies are never executed (plots); module import only loads sprites,
which works headless under the Agg backend.
"""

import importlib.util
import math
import os
import sys

import numpy as np
import pytest

import matplotlib

matplotlib.use("Agg")

from tests.conftest import REFERENCE_DIR  # noqa: E402

SCRIPTS = os.path.join(REFERENCE_DIR, "scripts")

pytestmark = pytest.mark.skipif(
    not os.path.isdir(SCRIPTS), reason="reference not mounted")


def _load(relpath: str, name: str):
    """importlib-load a reference script (their filenames start with
    digits, so a plain import is impossible)."""
    path = os.path.join(SCRIPTS, relpath)
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def ref0():
    return _load("0-lqr-demo.py", "ref_demo0")


@pytest.fixture(scope="module")
def ref1():
    mod = _load("1-lqr-pathtracking.py", "ref_demo1")
    mod.show_animation = False
    return mod


@pytest.fixture(scope="module")
def ref2():
    return _load("2-cilqr-motionplanning.py", "ref_demo2")


@pytest.fixture(scope="module")
def ref_kinematic():
    # the scripts self-append their dir to sys.path and import
    # `utils.kinematic` (scripts/2-cilqr-motionplanning.py:8-10); load the
    # same module directly for kernel-level checks
    return _load(os.path.join("utils", "kinematic.py"), "ref_kinematic")


@pytest.fixture(scope="module")
def ref_constraint():
    return _load(os.path.join("utils", "constraint.py"), "ref_constraint")


# ---------------------------------------------------------------- demo 0


def test_dare_matches_reference_demo0(ref0):
    """P and K* from the reference's own solve_dare
    (scripts/0-lqr-demo.py:5-20; A,B,Q,R from main :24-29,55-59)."""
    from ilqr_tpu.ops.dare import lqr_gain, solve_dare

    A = np.array([[1.95, -0.025, -1.6],
                  [1.6, 1.1, -3.2],
                  [0.425, 0.185, 0.3]])
    B = np.array([[0.0, 1.0], [1.0, 1.0], [0.0, 1.0]])
    Q, R = np.eye(3), np.eye(2)

    # np.mat was removed in numpy 2.0; the reference's solve_dare only
    # uses @-products, so plain ndarrays are equivalent inputs
    P_ref = np.asarray(ref0.solve_dare(A, B, Q, R))
    K_ref = np.asarray(
        np.linalg.inv(R + B.T @ P_ref @ B) @ B.T @ P_ref @ A)

    P = np.asarray(solve_dare(A, B, Q, R))
    K = lqr_gain(A, B, Q, R)
    np.testing.assert_allclose(P, P_ref, rtol=0, atol=1e-9)
    np.testing.assert_allclose(np.asarray(K), K_ref, rtol=0, atol=1e-9)


# ---------------------------------------------------------------- demo 1


def _reference_tracking_episode(ref1, cx, cy, cyaw, ck, sp, goal):
    """The do_simulation loop (scripts/1-lqr-pathtracking.py:248-290)
    driven over the reference's own control/update functions, with the
    plotting calls elided; returns the (T, 4) state history exactly as
    the reference accumulates it (goal-reaching state excluded, :280-288)."""
    state = ref1.VehicleState(x=0.0, y=0.0, yaw=0.0, v=0.0)
    t, e, e_th, last_dl = 0.0, 0.0, 0.0, 0.0
    hist = [[state.x, state.y, state.yaw, state.v]]
    while t <= 500.0:
        dl, _, e, e_th, acc = ref1.lqr_speed_steering_control(
            state, cx, cy, cyaw, ck, e, e_th, sp, ref1.lqr_Q, ref1.lqr_R)
        dl = max(-ref1.max_steer, min(dl, ref1.max_steer))
        acc = max(-ref1.max_acc, min(acc, ref1.max_acc))
        steering = dl * 0.75 + last_dl * 0.25  # low-pass (:269-271)
        last_dl = steering
        state = ref1.update(state, acc, steering)
        t += ref1.dt
        if math.hypot(state.x - goal[0], state.y - goal[1]) <= 0.3:
            break
        hist.append([state.x, state.y, state.yaw, state.v])
    return np.asarray(hist)


def test_tracking_episode_matches_reference_demo1(ref1):
    """Full demo-1 episode: reference control/update loop vs
    solvers/lqr_tracking.simulate on the same course
    (scripts/1-lqr-pathtracking.py:340-349)."""
    import jax.numpy as jnp

    from ilqr_tpu.solvers.lqr_tracking import (default_params,
                                               make_demo_course, simulate)

    course, goal = make_demo_course(jnp.float64)
    cx, cy, cyaw, ck, sp = (np.asarray(a) for a in course)
    ref_hist = _reference_tracking_episode(
        ref1, list(cx), list(cy), list(cyaw), list(ck), list(sp), goal)

    states, _, reached = simulate(default_params(jnp.float64), course, goal,
                                  max_ticks=len(ref_hist) + 64)
    states = np.asarray(states)
    assert bool(np.asarray(reached).any()), "ours must also reach the goal"
    T = len(ref_hist)
    # identical math at f64 -- only solve-vs-inv orderings differ; any
    # controller-semantics mismatch diverges to meters within a few ticks
    np.testing.assert_allclose(states[:T], ref_hist, rtol=0, atol=1e-6)


def test_control_step_matches_reference_demo1_pointwise(ref1, rng):
    """Single-tick controller parity on randomized off-course states
    (scripts/1-lqr-pathtracking.py:163-226)."""
    import jax.numpy as jnp

    from ilqr_tpu.solvers.lqr_tracking import (control_step, default_params,
                                               make_demo_course)

    course, _ = make_demo_course(jnp.float64)
    cx, cy, cyaw, ck, sp = (np.asarray(a) for a in course)
    p = default_params(jnp.float64)
    for _ in range(5):
        i = int(rng.integers(0, len(cx)))
        st = np.array([cx[i] + rng.normal(0, 0.5), cy[i] + rng.normal(0, 0.5),
                       cyaw[i] + rng.normal(0, 0.1), abs(rng.normal(4, 1))])
        pe, pth = float(rng.normal(0, 0.1)), float(rng.normal(0, 0.05))
        dl_r, _, e_r, the_r, acc_r = ref1.lqr_speed_steering_control(
            ref1.VehicleState(*st[[0, 1]], yaw=st[2], v=st[3]),
            list(cx), list(cy), list(cyaw), list(ck), pe, pth, list(sp),
            ref1.lqr_Q, ref1.lqr_R)
        dl, acc, _, e, th_e = control_step(p, jnp.asarray(st), course,
                                           jnp.asarray(pe), jnp.asarray(pth))
        np.testing.assert_allclose(float(dl), dl_r, rtol=0, atol=1e-8)
        np.testing.assert_allclose(float(acc), acc_r, rtol=0, atol=1e-8)
        np.testing.assert_allclose(float(e), e_r, rtol=0, atol=1e-10)
        np.testing.assert_allclose(float(th_e), the_r, rtol=0, atol=1e-10)


def test_speed_profile_matches_reference_demo1(ref1):
    """calc_speed_profile incl. the sp[-0] quirk
    (scripts/1-lqr-pathtracking.py:311-337)."""
    from ilqr_tpu.solvers.lqr_tracking import calc_speed_profile
    from ilqr_tpu.utils.splines import calc_spline_course

    ax = [0.0, 15.0, 31.25, 25.0, 18.75, 7.5, -2.5]
    ay = [0.0, -7.5, -12.25, 16.25, 7.5, 12.5, -5.0]
    _, _, cyaw, _, _ = calc_spline_course(ax, ay, ds=0.1)
    ref_sp = np.asarray(ref1.calc_speed_profile(list(cyaw), 20.0 / 3.6))
    np.testing.assert_allclose(calc_speed_profile(np.asarray(cyaw),
                                                  20.0 / 3.6),
                               ref_sp, rtol=0, atol=1e-12)


def test_spline_course_matches_reference(ref1):
    """utils/cubic_spline.calc_spline_course vs ours on the demo-1 course
    (scripts/utils/cubic_spline.py:244-256)."""
    ref_cs = sys.modules.get("utils.cubic_spline")
    if ref_cs is None:  # ref1 fixture imported it under the scripts' path
        ref_cs = _load(os.path.join("utils", "cubic_spline.py"),
                       "ref_cubic_spline")
    from ilqr_tpu.utils.splines import calc_spline_course

    ax = [0.0, 15.0, 31.25, 25.0, 18.75, 7.5, -2.5]
    ay = [0.0, -7.5, -12.25, 16.25, 7.5, 12.5, -5.0]
    r = ref_cs.calc_spline_course(ax, ay, ds=0.1)
    o = calc_spline_course(ax, ay, ds=0.1)
    for got, want in zip(o, r):
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=0, atol=1e-9)


# ---------------------------------------------------------------- demo 2


def test_cilqr_demo_iter_steps_match_reference_demo2(ref2):
    """Teacher-forced single-iteration parity along the REFERENCE's own
    solve path (scripts/2-cilqr-motionplanning.py:346-393).

    Why not end-to-end 1e-8: the backward Riccati recursion on this
    barrier-heavy problem amplifies f64 roundoff by ~10x every ~3 horizon
    steps -- measured: two pure-numpy evaluations of the SAME recursion
    differing only in 2x2-inverse op order start 1e-16 apart at i=59 and
    end 2.3e-3 apart at i=0. So iterates of any two distinct builds
    diverge chaotically, and only teacher-forcing (feeding both
    implementations the reference's accepted (u, x, J, lamb) each
    iteration) isolates semantics from conditioning. Each single step must
    agree within the one-pass amplification envelope, and every accept
    decision must match."""
    import jax.numpy as jnp

    from ilqr_tpu.solvers.cilqr_demo import demo_scenario, iter_step

    p, x0, ref, ref_velo, obs_attrs, obs_preds = demo_scenario(jnp.float64)
    ref_T = np.asarray(ref).T  # reference is dim-major (2, 1000)
    obs_T = np.asarray(obs_preds).transpose(0, 2, 1)  # (n_obs, 4, N+1)

    planner = ref2.CILQR()
    u, x = planner.get_init_traj([0.0, 0.0, 5.0, 0.0])
    J = planner.get_total_cost(u, x, ref_T, np.array(6.0),
                               np.asarray(obs_attrs), obs_T)
    lamb = planner.init_lamb
    n_eff = 0
    for itr in range(12):
        nu_r, nx_r, nJ_r, eff_r = planner.iter_step(
            u, x, J, lamb, ref_T, np.array(6.0), np.asarray(obs_attrs),
            obs_T)
        nu, nx, nJ, eff = iter_step(
            p, jnp.asarray(u.T), jnp.asarray(x.T), jnp.asarray(float(J)),
            jnp.asarray(float(lamb)), ref, ref_velo, obs_attrs, obs_preds)
        assert bool(eff) == bool(eff_r), f"accept decision differs at {itr}"
        if eff_r:
            n_eff += 1
            np.testing.assert_allclose(np.asarray(nu).T, nu_r, rtol=0,
                                       atol=5e-3)
            np.testing.assert_allclose(np.asarray(nx).T, nx_r, rtol=0,
                                       atol=5e-3)
            np.testing.assert_allclose(float(nJ), nJ_r, rtol=1e-6)
            u, x, J = nu_r, nx_r, nJ_r
            lamb *= planner.lamb_decay
        else:
            lamb *= planner.lamb_amplify
    assert n_eff >= 8, "the reference path should accept most iterations"


def test_cilqr_demo_solution_matches_reference_demo2(ref2):
    """End-to-end demo-2 solve: both implementations must land in the
    same cost basin (J within 0.2%) with trajectories within the measured
    f64 path-chaos envelope (see the teacher-forced test above for why
    tighter bounds are unattainable between distinct builds)."""
    import jax.numpy as jnp

    from ilqr_tpu.solvers.cilqr_demo import demo_scenario, solve

    p, x0, ref, ref_velo, obs_attrs, obs_preds = demo_scenario(jnp.float64)
    ref_T = np.asarray(ref).T
    obs_T = np.asarray(obs_preds).transpose(0, 2, 1)

    planner = ref2.CILQR()
    u_ref, x_ref = planner.solve([0.0, 0.0, 5.0, 0.0], ref_T, np.array(6.0),
                                 np.asarray(obs_attrs), obs_T)
    J_ref = planner.get_total_cost(u_ref, x_ref, ref_T, np.array(6.0),
                                   np.asarray(obs_attrs), obs_T)

    res = solve(p, x0, ref, ref_velo, obs_attrs, obs_preds,
                max_iter=planner.max_iter)
    assert abs(float(res.J) - float(J_ref)) / float(J_ref) < 2e-3
    np.testing.assert_allclose(np.asarray(res.u), np.asarray(u_ref).T,
                               rtol=0, atol=0.3)
    np.testing.assert_allclose(np.asarray(res.x), np.asarray(x_ref).T,
                               rtol=0, atol=0.3)


def test_demo_cost_matches_reference_demo2(ref2):
    """total_cost on the init trajectory
    (scripts/2-cilqr-motionplanning.py:91-156)."""
    import jax.numpy as jnp

    from ilqr_tpu.models.bicycle import GRAVITY_CENTER, rollout
    from ilqr_tpu.solvers.cilqr_demo import demo_scenario, total_cost

    p, x0, ref, ref_velo, obs_attrs, obs_preds = demo_scenario(jnp.float64)
    planner = ref2.CILQR()
    u0_ref, x0_ref = planner.get_init_traj([0.0, 0.0, 5.0, 0.0])
    J_ref = planner.get_total_cost(
        u0_ref, x0_ref, np.asarray(ref).T, np.array(6.0),
        np.asarray(obs_attrs), np.asarray(obs_preds).transpose(0, 2, 1))

    N = obs_preds.shape[-2] - 1
    u0 = jnp.zeros((N, 2), jnp.float64)
    x_init = rollout(x0, u0, p.dt, p.wheelbase, GRAVITY_CENTER)
    np.testing.assert_allclose(np.asarray(x_init), np.asarray(x0_ref).T,
                               rtol=0, atol=1e-12)
    J = total_cost(p, u0, x_init, ref, ref_velo, obs_attrs, obs_preds)
    np.testing.assert_allclose(float(J), float(J_ref), rtol=1e-12)


# ------------------------------------------------------- kernel parity


def test_kinematic_kernels_match_reference(ref_kinematic, rng):
    """scripts/utils/kinematic.py propagate/Jacobians/const-velo vs
    models/bicycle on random states (gravity-center variant, :3-51)."""
    import jax.numpy as jnp

    from ilqr_tpu.models.bicycle import (GRAVITY_CENTER, const_velo_prediction,
                                         kinematic_jacobians,
                                         kinematic_propagate)

    wb, dt = 3.6, 0.1
    for _ in range(5):
        x = rng.normal(0, 3, 4)
        x[2] = abs(x[2])  # plausible speed
        u = rng.normal(0, 0.3, 2)
        nxt_ref = np.asarray(ref_kinematic.kinematic_propagate(
            x.reshape(4, 1), u.reshape(2, 1), dt, wb)).ravel()
        nxt = np.asarray(kinematic_propagate(
            jnp.asarray(x), jnp.asarray(u), dt, wb, GRAVITY_CENTER))
        np.testing.assert_allclose(nxt, nxt_ref, rtol=0, atol=1e-12)

        # reference returns time-innermost (4, 4, N) / (4, 2, N)
        # (scripts/utils/kinematic.py:49-51)
        A_ref, B_ref = ref_kinematic.get_kinematic_model_derivatives(
            np.tile(x.reshape(4, 1), (1, 2)), u.reshape(2, 1), dt, wb, 1)
        A, B = kinematic_jacobians(jnp.asarray(x)[None], jnp.asarray(u)[None],
                                   dt, wb, GRAVITY_CENTER)
        np.testing.assert_allclose(np.asarray(A)[0], np.asarray(A_ref)[..., 0],
                                   rtol=0, atol=1e-12)
        np.testing.assert_allclose(np.asarray(B)[0], np.asarray(B_ref)[..., 0],
                                   rtol=0, atol=1e-12)

    # 1-D x0: the reference vstacks per-step (4,) rows then transposes to
    # (4, steps+1) (scripts/utils/kinematic.py:57-66)
    pred_ref = np.asarray(ref_kinematic.const_velo_prediction(
        np.array([6.5, -0.2, 3.0, 0.0]), 60, dt, wb))
    pred = np.asarray(const_velo_prediction(
        jnp.asarray([6.5, -0.2, 3.0, 0.0]), 60, dt, wb))
    np.testing.assert_allclose(pred, pred_ref.T, rtol=0, atol=1e-12)


def test_constraint_kernels_match_reference(ref_kinematic, ref_constraint,
                                            rng):
    """scripts/utils/{constraint,kinematic}.py barrier + ellipsoid margin
    vs ops/constraints (:8-21, kinematic.py:107-145)."""
    import jax.numpy as jnp

    from ilqr_tpu.ops.constraints import (ellipsoid_safety_margin,
                                          exp_barrier_coeffs)

    q1, q2 = 5.5, 5.75
    for c in [-1.2, -0.1, 0.0, 0.3, 1.7]:
        b_ref = float(ref_constraint.exp_barrier(c, q1, q2))
        b, db_dc, _ = (np.asarray(t) for t in exp_barrier_coeffs(
            jnp.asarray(c, jnp.float64), q1, q2))
        np.testing.assert_allclose(b, b_ref, rtol=1e-12)
        # derivative coefficient: b' = q2 * b (constraint.py:14-21)
        np.testing.assert_allclose(db_dc, q2 * b_ref, rtol=1e-12)

    for _ in range(5):
        pnt = rng.normal(0, 5, 2)
        ctr = rng.normal(0, 5, 2)
        theta = rng.normal(0, 1)
        a, b_ax = abs(rng.normal(4, 1)) + 1, abs(rng.normal(2, 0.5)) + 0.5
        m_ref = float(ref_kinematic.ellipsoid_safety_margin(
            pnt, ctr, theta, a, b_ax))
        m = float(ellipsoid_safety_margin(
            jnp.asarray(pnt), jnp.asarray([ctr[0], ctr[1], theta]),
            (a, b_ax)))
        np.testing.assert_allclose(m, m_ref, rtol=0, atol=1e-10)
