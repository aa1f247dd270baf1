import dataclasses, os, sys
import numpy as np
import jax, jax.numpy as jnp
sys.path.insert(0, "/root/repo")
from ilqr_tpu.config import GlobalConfig
from ilqr_tpu.ops.pallas.cilqr_kernel import cilqr_solve_pallas
from ilqr_tpu.sim.scenario import build_scenario_setup, perturbed_initial_states
from ilqr_tpu.types import CILQRConfig, CILQRWeights

B, N, W, MI, PROJ = 2048, 6, 64, 3, 10
G = int(os.environ.get("CHK_G", "8"))
gc = GlobalConfig.from_file("/root/repo/configs/scenario_two_straight.yaml")
st = build_scenario_setup(gc)
cfg = dataclasses.replace(CILQRConfig.from_global_config(gc, max_iter=MI), N=N)
w = CILQRWeights.from_global_config(gc, dtype=jnp.float32)
scenario = st.device_scenario(tick=0, horizon=N, dtype=jnp.float32)
x0_b = jnp.asarray(perturbed_initial_states(st.ego_x0, B, seed=0), jnp.float32)
scen_b = jax.tree.map(lambda a: jnp.stack([a] * B), scenario)
kw = dict(window=W, interpret=False, groups=G, proj_rows_per_step=PROJ)

runs = []
for r in range(4):
    u, x, s = cilqr_solve_pallas(cfg, w, x0_b, scen_b, straggler_cap=0, **kw)
    runs.append((np.asarray(u), np.asarray(s.iters), np.asarray(s.status)))
for r in range(1, 4):
    print(f"run{r} vs run0: u equal={np.array_equal(runs[r][0], runs[0][0])} "
          f"iters equal={np.array_equal(runs[r][1], runs[0][1])} "
          f"status equal={np.array_equal(runs[r][2], runs[0][2])} "
          f"iters diff rows={np.sum(runs[r][1] != runs[0][1])}")
