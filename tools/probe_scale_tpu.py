"""On-chip confirmation of the round-5 weight-scale equivariance
(SolverConfig.scale_adaptive) at the census operating point: N=60/100,
weights uniformly x5, megakernel, B=32k. Expect adaptive=True to restore
the c=1 convergence (CPU census: N=60 0.9961 -> 1.0000, N=100 0.9980 ->
0.9990) at equal-or-fewer iterations and ~unchanged throughput (the
per-tile scale math is ~10 VPU ops).

Run ALONE (single-tenant tunnel): python tools/probe_scale_tpu.py
"""
import dataclasses
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from mpc_ros_tpu.config import MPCParams, SolverConfig
from mpc_ros_tpu.engine import make_random_scenarios
from mpc_ros_tpu.solver.batch_lane import batch_solve_lane

B = 32768
dtype = jnp.float32
W = {"w_cte", "w_etheta", "w_vel", "w_angvel", "w_accel", "w_angvel_d",
     "w_accel_d"}
p1 = MPCParams().astype(dtype)
p5 = MPCParams(**{f.name: (getattr(p1, f.name) * 5.0 if f.name in W
                           else getattr(p1, f.name))
                  for f in dataclasses.fields(MPCParams)})
z0s, coeffs = make_random_scenarios(jax.random.PRNGKey(0), B, dtype)
print("backend:", jax.default_backend(), jax.devices()[0])

for N in (60, 100):
    cap = round(0.45 * N)
    for label, pp, ad in (("c=1 base", p1, True),
                          ("c=5 adaptive", p5, True),
                          ("c=5 fixed", p5, False)):
        cfg = SolverConfig(n_steps=N, max_sqp_iters=cap, ls_iters=4,
                           ddp=True, tol_grad=1e-4, scale_adaptive=ad)
        t0 = time.time()
        r = batch_solve_lane(z0s, coeffs, pp, cfg)
        float(jnp.sum(r.us))
        compile_s = time.time() - t0
        best = np.inf
        for _ in range(3):
            t0 = time.time()
            acc = None
            for _ in range(4):
                v = jnp.sum(batch_solve_lane(z0s, coeffs, pp, cfg).us)
                acc = v if acc is None else acc + v
            float(acc)
            best = min(best, (time.time() - t0) / 4)
        print(f"N={N} cap={cap} {label:13s}: "
              f"conv={float(jnp.mean(r.converged.astype(jnp.float32))):.4f}"
              f" mean_it={float(jnp.mean(r.n_iters.astype(jnp.float32))):.2f}"
              f" {B/best:,.0f} solves/s compile={compile_s:.0f}s",
              flush=True)
