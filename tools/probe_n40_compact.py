"""Census the compact-schedule crossover inside the 33-47 horizon band
(ADVICE r4 #4). Run twice in round 5: first at the round-4 policy
(compact won every probed point, confirming the >32 flip), then with
the long-horizon pair active — which collapsed the N<=36 tail and moved
the measured crossover into (36, 40] (single wins N=36 at 7.21M @
1.0000; compact wins N=40 at 5.86M @ 1.0000) — `auto` now flips at
n_steps > 36. Real-TPU steady-state timing, the bench's pipelined
recipe (sync once per n_pipe batches).

Run ALONE (single-tenant tunnel): python tools/probe_n40_compact.py
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

B = 131072
dtype = jnp.float32
p = MPCParams().astype(dtype)
z0s, coeffs = make_random_scenarios(jax.random.PRNGKey(0), B, dtype)
print("backend:", jax.default_backend(), jax.devices()[0])

for N in (36, 40, 44):
    cap = round(0.45 * N)
    for sched in ("single", "compact"):
        cfg = SolverConfig(n_steps=N, max_sqp_iters=cap, ls_iters=4,
                           ddp=True, tol_grad=1e-4, schedule=sched)
        t0 = time.time()
        r = batch_solve_lane(z0s, coeffs, p, cfg)
        s = float(jnp.sum(r.us))  # scalar fetch = true sync on the tunnel
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
        print(f"N={N} cap={cap} {sched:7s}: {B/best:,.0f} solves/s "
              f"({best*1e3:.2f} ms/batch) conv={conv:.4f} "
              f"mean_it={float(jnp.mean(r.n_iters.astype(jnp.float32))):.2f}"
              f" compile={compile_s:.0f}s", flush=True)
