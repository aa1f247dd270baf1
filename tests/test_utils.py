"""Utility modules: math helpers, debug aids, timing, checkpoint."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ilqr_tpu.utils.math import (
    cumsum,
    diff,
    pi_2_pi,
    rotation_matrix2d,
    sign,
    transformation_matrix2d,
    variance,
)

pytestmark = pytest.mark.quick  # part of the <5-min regression tier


def test_sign_zero_is_positive():
    # reference quirk: sign(0) == +1 (include/utils.hpp:110-117)
    assert int(sign(jnp.asarray(0.0))) == 1
    np.testing.assert_array_equal(
        np.asarray(sign(jnp.asarray([-2.0, 0.0, 3.0]))), [-1.0, 1.0, 1.0])


def test_pi_2_pi_wraps():
    vals = jnp.asarray([0.0, np.pi + 0.1, -np.pi - 0.1, 7 * np.pi])
    out = np.asarray(pi_2_pi(vals))
    assert np.all(out > -np.pi - 1e-12) and np.all(out <= np.pi + 1e-12)
    np.testing.assert_allclose(out[1], -np.pi + 0.1, atol=1e-12)


def test_rotation_and_transform(rng):
    th = 0.7
    R = np.asarray(rotation_matrix2d(jnp.asarray(th)))
    v = rng.normal(size=2)
    np.testing.assert_allclose(R @ v, [np.cos(th) * v[0] - np.sin(th) * v[1],
                                       np.sin(th) * v[0] + np.cos(th) * v[1]],
                               atol=1e-12)
    T = np.asarray(transformation_matrix2d(1.0, 2.0, jnp.asarray(th)))
    np.testing.assert_allclose(T[:2, :2], R, atol=1e-12)
    np.testing.assert_allclose(T[:2, 2], [1.0, 2.0], atol=1e-12)
    np.testing.assert_allclose(T[2], [0, 0, 1], atol=1e-12)


def test_diff_cumsum_variance(rng):
    v = rng.normal(size=10)
    np.testing.assert_allclose(np.asarray(diff(v)), np.diff(v), atol=1e-12)
    np.testing.assert_allclose(np.asarray(cumsum(v)), np.cumsum(v), atol=1e-12)
    np.testing.assert_allclose(float(variance(v)), np.var(v), atol=1e-12)


def test_nan_checking_context():
    from ilqr_tpu.utils.debug import nan_checking

    with nan_checking():
        with pytest.raises(FloatingPointError):
            jnp.log(jnp.asarray(-1.0)) + 0.0  # noqa: B018
    # config restored
    assert not jax.config.jax_debug_nans


def test_checkpoint_roundtrip(tmp_path):
    from ilqr_tpu.utils.checkpoint import restore_state, save_state

    state = {"u": jnp.arange(6.0).reshape(2, 3), "step": jnp.asarray(4)}
    save_state(str(tmp_path / "ck"), state)
    back = restore_state(str(tmp_path / "ck"))
    np.testing.assert_array_equal(np.asarray(back["u"]), np.asarray(state["u"]))
    assert int(back["step"]) == 4


def test_tictoc_and_time_jax():
    from ilqr_tpu.utils.timing import TicToc, time_jax

    t = TicToc()
    assert t.toc() >= 0.0
    assert t.toc_ms() >= 0.0
    f = jax.jit(lambda x: (x * 2).sum())
    dt = time_jax(f, jnp.ones(16), warmup=1, iters=3)
    assert dt > 0
