import dataclasses, os, sys
import numpy as np
import jax, jax.numpy as jnp
sys.path.insert(0, "/root/repo")
from ilqr_tpu.config import GlobalConfig
from ilqr_tpu.ops.pallas.cilqr_kernel import cilqr_solve_pallas
from ilqr_tpu.sim.scenario import build_scenario_setup, perturbed_initial_states
from ilqr_tpu.types import CILQRConfig, CILQRWeights

B, N, W, MI, CAP, PROJ = 2048, 6, 64, 8, 3, 10
INTERP = os.environ.get("CHK_INTERP", "0") == "1"
gc = GlobalConfig.from_file("/root/repo/configs/scenario_two_straight.yaml")
st = build_scenario_setup(gc)
cfg = dataclasses.replace(CILQRConfig.from_global_config(gc, max_iter=MI), N=N)
w = CILQRWeights.from_global_config(gc, dtype=jnp.float32)
scenario = st.device_scenario(tick=0, horizon=N, dtype=jnp.float32)
x0_b = jnp.asarray(perturbed_initial_states(st.ego_x0, B, seed=0), jnp.float32)
scen_b = jax.tree.map(lambda a: jnp.stack([a] * B), scenario)
kw = dict(window=W, interpret=INTERP, groups=8, proj_rows_per_step=PROJ)

cfg1 = dataclasses.replace(cfg, max_iter=CAP)
_, _, s1, _ = cilqr_solve_pallas(cfg1, w, x0_b, scen_b, straggler_cap=0, **kw)
exp = np.stack([
    np.asarray(s1.iters, np.float32),
    np.asarray(s1.status, np.float32),
    np.asarray(s1.converged, np.float32),
    np.asarray(s1.lamb_overflow, np.float32),
    np.asarray(s1.final_cost, np.float32),
    np.asarray(s1.final_lamb, np.float32),
])  # (6, B)

_, _, s2, u_raw = cilqr_solve_pallas(cfg, w, x0_b, scen_b,
                                     straggler_cap=CAP, **kw)
got = np.asarray(u_raw)[8:16]  # (8, Bp) echo of the resume block, unpermuted
print("row-by-row match of phase-2 res readback vs standalone capped stats:")
names = ["iters", "status", "conv", "ovf", "cost", "lamb", "spare6", "spare7"]
for r in range(8):
    if r < 6:
        m = float(np.mean(got[r, :B] == exp[r]))
        print(f"  row {r} ({names[r]}): match={m:.4f} "
              f"got[:6]={got[r, :6]} exp[:6]={exp[r][:6]}")
    else:
        print(f"  row {r} ({names[r]}): got[:6]={got[r, :6]} "
              f"(expect zeros) nonzero={int((got[r] != 0).sum())}")
