"""Repro 2: offset sublane slices of an input block as while_loop carries."""
import os, sys
import numpy as np
import jax, jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

G = 8
LANES = 128
Bp = 2048
grid = (Bp // (LANES * G),)
bspec = lambda rows: pl.BlockSpec((rows, LANES), lambda i: (0, i),
                                  memory_space=pltpu.VMEM)

def kernel(x0_ref, res_ref, out_ref):
    res = res_ref[:, :]          # (64, 128)
    x0s = x0_ref[:, :]
    lane0 = x0s[0:G] * 0.0       # lane-varying zeros, like the real kernel
    rows = [res[k * G:(k + 1) * G] for k in range(6)]  # offset slices

    def cond(st):
        return st[0] < 2

    def body(st):
        it, a, b, c, d, e, f = st
        # touch each carry with lane-varying work so nothing folds
        return (it + 1, a + lane0, b + lane0, c + lane0, d + lane0,
                e + lane0, f + lane0)

    st = lax.while_loop(cond, body,
                        (jnp.asarray(0, jnp.int32), *rows))
    for k in range(6):
        out_ref[k * G:(k + 1) * G, :] = st[1 + k]
    out_ref[6 * G:8 * G, :] = jnp.zeros((2 * G, LANES), jnp.float32)

rng = np.random.default_rng(0)
x0 = jnp.asarray(rng.normal(size=(8 * G, Bp // G)), jnp.float32)
res = jnp.asarray(rng.normal(size=(8 * G, Bp // G)), jnp.float32)
out = pl.pallas_call(
    kernel, grid=grid, in_specs=[bspec(8 * G), bspec(8 * G)],
    out_specs=bspec(8 * G),
    out_shape=jax.ShapeDtypeStruct((8 * G, Bp // G), jnp.float32),
    compiler_params=pltpu.CompilerParams(
        vmem_limit_bytes=100 * 1024 * 1024),
)(x0, res)
out = np.asarray(out)
want = np.asarray(res)[:6 * G]
got = out[:6 * G]
print(f"carry roundtrip equal: {np.array_equal(got, want)} "
      f"max|diff|={np.abs(got - want).max()}")
if not np.array_equal(got, want):
    for k in range(6):
        g_, w_ = out[k*G:(k+1)*G], want[k*G:(k+1)*G]
        print(f"  row-group {k}: equal={np.array_equal(g_, w_)} "
              f"max|diff|={np.abs(g_-w_).max()}")
