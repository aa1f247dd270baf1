"""Minimal repro: does a 10th VMEM input block read correctly at G=8 shapes?"""
import os, sys
import numpy as np
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

G = int(os.environ.get("RG", "8"))
LANES = 128
NH = 32
W = 384
M = 3
Bp = 2048
grid = (Bp // (LANES * G),)
bspec = lambda rows: pl.BlockSpec((rows, LANES), lambda i: (0, i),
                                  memory_space=pltpu.VMEM)

def kernel(wts_ref, x0_ref, uinit_ref, rx_ref, ry_ref, ryaw_ref,
           ox_ref, oy_ref, oyaw_ref, resume_ref, out_ref):
    res = resume_ref[:, :]
    # echo + a touch of the other inputs so nothing is DCE'd
    out_ref[:, :] = res + 0.0 * x0_ref[0:8 * G, :] \
        + 0.0 * uinit_ref[0:8 * G, :] + 0.0 * rx_ref[0:8 * G, :] \
        + 0.0 * ry_ref[0:8 * G, :] + 0.0 * ryaw_ref[0:8 * G, :] \
        + 0.0 * ox_ref[0:8 * G, :] + 0.0 * oy_ref[0:8 * G, :] \
        + 0.0 * oyaw_ref[0:8 * G, :]

rng = np.random.default_rng(0)
args = [jnp.zeros((32, 1), jnp.float32)]
shapes = [8, 2 * NH, W, W, W, M * NH, M * NH, M * NH, 8]
for r in shapes:
    args.append(jnp.asarray(rng.normal(size=(r * G, Bp // G)), jnp.float32))
in_specs = [pl.BlockSpec((32, 1), lambda i: (0, 0), memory_space=pltpu.SMEM)] \
    + [bspec(r * G) for r in shapes]
out = pl.pallas_call(
    kernel, grid=grid, in_specs=in_specs,
    out_specs=bspec(8 * G),
    out_shape=jax.ShapeDtypeStruct((8 * G, Bp // G), jnp.float32),
    compiler_params=pltpu.CompilerParams(
        vmem_limit_bytes=100 * 1024 * 1024) if G > 1 else None,
)(*args)
out = np.asarray(out)
want = np.asarray(args[-1])
print(f"G={G} roundtrip equal: {np.array_equal(out, want)} "
      f"max|diff|={np.abs(out - want).max()}")
