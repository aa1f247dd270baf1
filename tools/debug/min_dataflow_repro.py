"""Repro 4: kernel1 output -> _unilv -> column permute -> _ilv -> kernel2
input, all in ONE jitted program (the real inter-phase dataflow at G=8)."""
import functools
import numpy as np
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

G, LANES, Bp = 8, 128, 2048
NH = 32
grid = (Bp // (LANES * G),)
bspec = lambda rows: pl.BlockSpec((rows, LANES), lambda i: (0, i),
                                  memory_space=pltpu.VMEM)

def _ilv(a):
    R = a.shape[0]
    return (a.reshape(R, Bp // (G * LANES), G, LANES)
            .transpose(0, 2, 1, 3).reshape(R * G, Bp // G))

def _unilv(a):
    RG = a.shape[0]
    return (a.reshape(RG // G, G, Bp // (G * LANES), LANES)
            .transpose(0, 2, 1, 3).reshape(RG // G, Bp))

def k1(x_ref, u_out, s_out):
    x = x_ref[:, :]
    # deterministic "solver": u = 2x+1 rows tiled, stats = 3x-5
    u_out[0:8 * G, :] = 2.0 * x + 1.0
    u_out[8 * G:2 * NH * G, :] = jnp.zeros((2 * NH * G - 8 * G, LANES),
                                           jnp.float32)
    s_out[:, :] = 3.0 * x - 5.0

def k2(u_ref, s_ref, out_ref):
    out_ref[:, :] = s_ref[:, :] + u_ref[0:8 * G, :]

@jax.jit
def flow(x, done):
    u1, s1 = pl.pallas_call(
        k1, grid=grid, in_specs=[bspec(8 * G)],
        out_specs=[bspec(2 * NH * G), bspec(8 * G)],
        out_shape=[jax.ShapeDtypeStruct((2 * NH * G, Bp // G), jnp.float32),
                   jax.ShapeDtypeStruct((8 * G, Bp // G), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(_ilv(x))
    u1, s1 = _unilv(u1), _unilv(s1)
    perm = jnp.argsort(done)
    u1p, s1p = u1[:, perm], s1[:, perm]
    out = pl.pallas_call(
        k2, grid=grid, in_specs=[bspec(2 * NH * G), bspec(8 * G)],
        out_specs=bspec(8 * G),
        out_shape=jax.ShapeDtypeStruct((8 * G, Bp // G), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(_ilv(u1p), _ilv(s1p))
    out = _unilv(out)
    inv = jnp.argsort(perm)
    return out[:, inv], u1, s1

rng = np.random.default_rng(0)
x = jnp.asarray(rng.normal(size=(8, Bp)), jnp.float32)
done = jnp.asarray(rng.integers(0, 2, size=(Bp,)), jnp.int32)
out, u1, s1 = jax.tree.map(np.asarray, flow(x, done))
xn = np.asarray(x)
want_u = 2.0 * xn + 1.0
want_s = 3.0 * xn - 5.0
want_out = want_s + want_u
print("u1 ok:", np.array_equal(u1[:8], want_u),
      " s1 ok:", np.array_equal(s1, want_s),
      " out ok:", np.array_equal(out, want_out))
if not np.array_equal(out, want_out):
    bad = np.abs(out - want_out).max(axis=0)
    cols = np.flatnonzero(bad > 0)
    print(f"bad cols: {cols.size}/{Bp} first {cols[:8]} "
          f"max|diff|={bad.max()}")
