"""On-chip census of the round-5 long-horizon coupled auto policy
(gate 1.5 + mu floor 1e-2 — SolverConfig._long_horizon_pair) vs the
round-4 (0.75, 1e-6) policy, under the production compact schedule at
the bench horizons/caps. Pass criterion: >= round-4 throughput at conv
within the 0.999 band (compact's straggler budget rescues the tail).

Run ALONE (single-tenant tunnel): python tools/probe_pair_tpu.py
"""
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from mpc_ros_tpu.config import MPCParams, SolverConfig
from mpc_ros_tpu.engine import make_random_scenarios
from mpc_ros_tpu.solver.batch_lane import batch_solve_lane

dtype = jnp.float32
p = MPCParams().astype(dtype)
print("backend:", jax.default_backend(), jax.devices()[0])

for N, B in ((48, 131072), (60, 131072), (100, 16384)):
    cap = round(0.45 * N)
    z0s, coeffs = make_random_scenarios(jax.random.PRNGKey(0), B, dtype)
    for label, kw in (("pair (auto)", {}),
                      ("r4 (0.75/1e-6)", {"mu_init": 1e-6})):
        cfg = SolverConfig(n_steps=N, max_sqp_iters=cap, ls_iters=4,
                           ddp=True, tol_grad=1e-4, **kw)
        t0 = time.time()
        r = batch_solve_lane(z0s, coeffs, p, cfg)
        float(jnp.sum(r.us))
        compile_s = time.time() - t0
        n_pipe = 8
        best = np.inf
        for _ in range(3):
            t0 = time.time()
            acc = None
            for _ in range(n_pipe):
                v = jnp.sum(batch_solve_lane(z0s, coeffs, p, cfg).us)
                acc = v if acc is None else acc + v
            float(acc)
            best = min(best, (time.time() - t0) / n_pipe)
        conv = float(jnp.mean(r.converged.astype(jnp.float32)))
        ppm = int(round(1e6 * (1.0 - conv)))
        print(f"N={N} cap={cap} {label:15s}: {B/best:,.0f} solves/s "
              f"({best*1e3:.2f} ms/batch) conv={conv:.4f} ({ppm} ppm) "
              f"mean_it={float(jnp.mean(r.n_iters.astype(jnp.float32))):.2f}"
              f" compile={compile_s:.0f}s", flush=True)
