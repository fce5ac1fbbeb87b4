"""Probe 2: globally-scaled weight vectors (all 7 weights x c) — where a
fixed gate is maximally scale-wrong in both directions."""
import sys

sys.path.insert(0, ".")

import jax

jax.config.update("jax_platforms", "cpu")

import dataclasses

import jax.numpy as jnp
import numpy as np

from mpc_ros_tpu.config import MPCParams, SolverConfig
from mpc_ros_tpu.solver.batch_lane import batch_solve_lane
from mpc_ros_tpu.engine import make_random_scenarios

B = 1024
z0s, coeffs = make_random_scenarios(jax.random.PRNGKey(0), B, jnp.float32)
base = SolverConfig(n_steps=30, max_sqp_iters=25, ls_iters=4, ddp=True,
                    tol_grad=1e-4)
names = ["w_cte", "w_etheta", "w_vel", "w_angvel", "w_accel",
         "w_angvel_d", "w_accel_d"]
for c in [0.05, 0.2, 1.0, 5.0, 20.0]:
    p = MPCParams(**{n: getattr(MPCParams(), n) * c for n in names}
                  ).astype(jnp.float32)
    row = [f"c={c:5}"]
    for label, cfg in [("fixed", dataclasses.replace(base, ddp_gate=2.5)),
                       ("scaled", base),
                       ("GN", dataclasses.replace(base, ddp=False,
                                                  ls_iters=5))]:
        r = batch_solve_lane(z0s, coeffs, p, cfg)
        it = np.asarray(r.n_iters, np.float64)
        row.append(f"{label}: it={it.mean():.2f}/max{int(it.max())} "
                   f"conv={float(np.mean(np.asarray(r.converged))):.4f}")
    print("  ".join(row))
