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
_, _, _, (uA, sA) = cilqr_solve_pallas(cfg1, w, x0_b, scen_b,
                                       straggler_cap=0, **kw)
sA = np.asarray(sA)
_, _, _, (uB, sB) = cilqr_solve_pallas(cfg, w, x0_b, scen_b,
                                       straggler_cap=CAP, **kw)
sB = np.asarray(sB)
for r, nm in [(6, "window checksum"), (7, "wt+x0 echo")]:
    a, b = sA[r], sB[r]
    eq = np.array_equal(a, b)
    print(f"row {r} ({nm}): A==B {eq}  "
          f"A[:4]={a[:4]}  B[:4]={b[:4]}  "
          f"reldiff_med={np.median(np.abs(a-b)/np.maximum(np.abs(a),1e-6)):.2e}")
