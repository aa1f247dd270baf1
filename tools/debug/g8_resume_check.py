import dataclasses, os, sys
import numpy as np
import jax, jax.numpy as jnp
sys.path.insert(0, "/root/repo")
from ilqr_tpu.config import GlobalConfig
from ilqr_tpu.ops.pallas.cilqr_kernel import cilqr_solve_pallas
from ilqr_tpu.sim.scenario import build_scenario_setup, perturbed_initial_states
from ilqr_tpu.types import CILQRConfig, CILQRWeights

B = int(os.environ.get("CHK_B", "2048"))
N = int(os.environ.get("CHK_N", "6"))
W = int(os.environ.get("CHK_W", "64"))
MI = int(os.environ.get("CHK_MI", "8"))
CAP = int(os.environ.get("CHK_CAP", "3"))
PROJ = int(os.environ.get("CHK_PROJ", "0"))
INTERP = os.environ.get("CHK_INTERP", "1") == "1"

gc = GlobalConfig.from_file("/root/repo/configs/scenario_two_straight.yaml")
st = build_scenario_setup(gc)
cfg = dataclasses.replace(CILQRConfig.from_global_config(gc, max_iter=MI), N=N)
w = CILQRWeights.from_global_config(gc, dtype=jnp.float32)
scenario = st.device_scenario(tick=0, horizon=N, dtype=jnp.float32)
x0_b = jnp.asarray(perturbed_initial_states(st.ego_x0, B, seed=0), jnp.float32)
scen_b = jax.tree.map(lambda a: jnp.stack([a] * B), scenario)

G = int(os.environ.get("CHK_G", "8"))
kw = dict(window=W, interpret=INTERP, groups=G, proj_rows_per_step=PROJ)
u1, x1, s1 = cilqr_solve_pallas(cfg, w, x0_b, scen_b, straggler_cap=0, **kw)
u1, s1c, s1i = np.asarray(u1), np.asarray(s1.converged), np.asarray(s1.iters)
u2, x2, s2 = cilqr_solve_pallas(cfg, w, x0_b, scen_b, straggler_cap=CAP, **kw)
u2, s2c, s2i = np.asarray(u2), np.asarray(s2.converged), np.asarray(s2.iters)
print(f"B={B} N={N} W={W} mi={MI} cap={CAP} proj={PROJ} interp={INTERP}")
print(f"cap0:  conv={s1c.mean():.4f} mean_iters={s1i.mean():.2f}")
print(f"cap:   conv={s2c.mean():.4f} mean_iters={s2i.mean():.2f}")
print(f"u bitwise equal: {np.array_equal(u1, u2)}  "
      f"iters equal: {np.array_equal(s1i, s2i)}  "
      f"conv equal: {np.array_equal(s1c, s2c)}")
if not np.array_equal(s1i, s2i):
    bad = np.flatnonzero(s1i != s2i)
    print(f"mismatch rows: {bad.size} first: {bad[:10]}")
    print("iters cap0:", s1i[bad[:10]], "cap:", s2i[bad[:10]])
