import dataclasses, os, sys
import numpy as np
import jax, jax.numpy as jnp
sys.path.insert(0, "/root/repo")
from ilqr_tpu.config import GlobalConfig
from ilqr_tpu.ops.pallas.cilqr_kernel import cilqr_solve_pallas
from ilqr_tpu.sim.scenario import build_scenario_setup, perturbed_initial_states
from ilqr_tpu.types import CILQRConfig, CILQRWeights

B, N, W, MI, CAP, PROJ = 2048, 6, 64, 8, 3, 10
gc = GlobalConfig.from_file("/root/repo/configs/scenario_two_straight.yaml")
st = build_scenario_setup(gc)
cfg = dataclasses.replace(CILQRConfig.from_global_config(gc, max_iter=MI), N=N)
w = CILQRWeights.from_global_config(gc, dtype=jnp.float32)
scenario = st.device_scenario(tick=0, horizon=N, dtype=jnp.float32)
x0_b = jnp.asarray(perturbed_initial_states(st.ego_x0, B, seed=0), jnp.float32)
scen_b = jax.tree.map(lambda a: jnp.stack([a] * B), scenario)
kw = dict(window=W, interpret=False, groups=8, proj_rows_per_step=PROJ)

cfg1 = dataclasses.replace(cfg, max_iter=CAP)
u1, x1, s1 = cilqr_solve_pallas(cfg1, w, x0_b, scen_b, straggler_cap=0, **kw)
exp_iters = np.asarray(s1.iters).astype(float)
exp_stat = np.asarray(s1.status).astype(float)
exp_conv = np.asarray(s1.converged); exp_ovf = np.asarray(s1.lamb_overflow)
exp_active = (~(exp_conv | exp_ovf)).astype(float)

u2, x2, s2 = cilqr_solve_pallas(cfg, w, x0_b, scen_b, straggler_cap=CAP, **kw)
code = np.asarray(s2.final_lamb)
got_iters0 = np.round(code / 1000.0)
rem = code - 1000.0 * got_iters0
got_status0 = np.round(rem / 10.0)
got_active0 = rem - 10.0 * got_status0

done = (exp_conv | exp_ovf).astype(np.int32)
perm = np.argsort(done, kind="stable")
print("straggler count:", int((done == 0).sum()),
      " got_active0 sum:", int(got_active0.sum()))
print("got_active0 is sorted-desc prefix:",
      bool((np.diff(got_active0) <= 0).all()))
for nm, g, e in [("iters0", got_iters0, exp_iters),
                 ("status0", got_status0, exp_stat),
                 ("active0", got_active0, exp_active)]:
    direct = np.mean(g == e)
    sorted_h = np.mean(g == e[perm])
    print(f"  {nm}: match direct={direct:.4f}  match exp[perm]={sorted_h:.4f}")
