"""Probe: per-candidate iteration stats under the fixed vs the
weight-scale-invariant DDP gate (VERDICT r3 item 4)."""
import sys

sys.path.insert(0, ".")

import jax

jax.config.update("jax_platforms", "cpu")

import dataclasses

import jax.numpy as jnp
import numpy as np

from mpc_ros_tpu.config import MPCParams, SolverConfig, gate_scale
from mpc_ros_tpu.engine.sweep import sample_weight_candidates, tuning_sweep

n_weights, n_scen = 8, 1024
cands = sample_weight_candidates(jax.random.PRNGKey(3), n_weights, MPCParams())
print("weight sums / 470:",
      np.round(np.asarray(gate_scale(cands)), 3))

base = SolverConfig(n_steps=30, max_sqp_iters=12, ls_iters=4, ddp=True,
                    tol_grad=1e-4)
for label, cfg in [("fixed gate 2.5", dataclasses.replace(base, ddp_gate=2.5)),
                   ("scaled auto   ", base),
                   ("GN            ", dataclasses.replace(base, ddp=False,
                                                          ls_iters=5))]:
    sw = tuning_sweep(jax.random.PRNGKey(4), cands, n_scen, cfg)
    print(f"{label}: best={sw.best_index} "
          f"cte_best={float(sw.mean_terminal_cte[sw.best_index]):.4f} "
          f"iters={np.round(np.asarray(sw.mean_iters), 2)} "
          f"conv={np.round(np.asarray(sw.converged_frac), 4)}")
