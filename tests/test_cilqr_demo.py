"""Python-demo CILQR variant (scripts/2 semantics)."""

import numpy as np
import jax
import jax.numpy as jnp

from ilqr_tpu.solvers.cilqr_demo import (
    DemoCILQRParams,
    cost_derivatives,
    demo_scenario,
    solve,
    total_cost,
)


def test_demo_scenario_solves_and_avoids_obstacles():
    p, x0, ref, ref_velo, obs_attrs, obs_preds = demo_scenario()
    res = jax.jit(lambda: solve(p, x0, ref, ref_velo, obs_attrs, obs_preds))()
    assert bool(res.converged) or int(res.iters) == 50
    x = np.asarray(res.x)
    # forward progress along the straight reference with bounded velocity
    assert x[-1, 0] > 15.0
    assert np.all(x[:, 2] <= 10.0 + 0.3)
    assert np.all(x[:, 2] >= -0.3)
    # cost strictly below the zero-control initial trajectory's cost
    u0 = jnp.zeros_like(res.u)
    from ilqr_tpu.models.bicycle import rollout
    x_init = rollout(x0, u0, p.dt, p.wheelbase, "gravity_center")
    J0 = float(total_cost(p, u0, x_init, ref, ref_velo, obs_attrs, obs_preds))
    assert float(res.J) < J0
    # keeps clear of the slow lead car's inflated ellipse at every step
    from ilqr_tpu.solvers.cilqr_demo import _obs_margins
    cf, cr = _obs_margins(p, res.x[1:], obs_attrs, obs_preds[:, 1:])
    assert float(jnp.max(cf)) < 0.3 and float(jnp.max(cr)) < 0.3


def test_demo_cost_gradient_vs_autodiff(rng):
    p, x0, ref, ref_velo, obs_attrs, obs_preds = demo_scenario()
    N = obs_preds.shape[-2] - 1
    u = jnp.asarray(rng.normal(size=(N, 2)) * np.array([0.5, 0.1]))
    from ilqr_tpu.models.bicycle import rollout
    x = rollout(x0, u, p.dt, p.wheelbase, "gravity_center")
    l_x, l_u, l_xx, l_uu = cost_derivatives(p, u, x, ref, ref_velo, obs_attrs,
                                            obs_preds)
    gu = jax.grad(lambda uu: total_cost(p, uu, x, ref, ref_velo, obs_attrs,
                                        obs_preds))(u)
    np.testing.assert_allclose(np.asarray(l_u), np.asarray(gu), atol=1e-8)
    # state gradient matches at rows 1..N (the demo adds barrier terms at
    # row 0 that its cost does not contain -- a replicated quirk)
    gx = jax.grad(lambda xx: total_cost(p, u, xx, ref, ref_velo, obs_attrs,
                                        obs_preds))(x)
    np.testing.assert_allclose(np.asarray(l_x)[1:], np.asarray(gx)[1:], atol=1e-8)


def test_demo_solver_batches_consistently():
    p, x0, ref, ref_velo, obs_attrs, obs_preds = demo_scenario()
    x0_b = jnp.stack([x0, x0 + jnp.asarray([0.0, 0.2, -0.5, 0.0]), x0])
    # NOTE: batched and single lowerings of the 60-step Riccati recursion
    # differ by ulps that its conditioning amplifies (measured ~2e-4
    # relative after one backward pass, float64), so batch-vs-single is
    # compared statistically; within one lowering results are deterministic.
    vsolve = jax.vmap(lambda xx: solve(p, xx, ref, ref_velo, obs_attrs,
                                       obs_preds, max_iter=6))
    res_b = jax.jit(lambda: vsolve(x0_b))()
    res_s = jax.jit(lambda: solve(p, x0, ref, ref_velo, obs_attrs,
                                  obs_preds, max_iter=6))()
    np.testing.assert_allclose(float(res_b.J[0]), float(res_s.J), rtol=5e-3)
    np.testing.assert_allclose(np.asarray(res_b.x[0]), np.asarray(res_s.x),
                               atol=0.05)
    # identical problems inside one batch are bitwise identical
    np.testing.assert_array_equal(np.asarray(res_b.u[0]), np.asarray(res_b.u[2]))
