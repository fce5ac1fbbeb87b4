"""Fleet serving: receding-horizon MPC for thousands of robots on one chip.

    python examples/fleet_serving.py --fleet 4096
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# the session boot shim pins the TPU tunnel platform; honor JAX_PLATFORMS=cpu
if os.environ.get("JAX_PLATFORMS", "").lower() == "cpu":
    import jax

    jax.config.update("jax_platforms", "cpu")

import argparse
import time

import jax
import jax.numpy as jnp

from mpc_ros_tpu import MPCParams, SolverConfig
from mpc_ros_tpu.engine import make_random_scenarios
from mpc_ros_tpu.engine.receding import receding_horizon_rollout

ap = argparse.ArgumentParser()
ap.add_argument("--fleet", type=int, default=1024)
ap.add_argument("--cycles", type=int, default=20)
args = ap.parse_args()

dtype = jnp.float32
z0s, coeffs = make_random_scenarios(jax.random.PRNGKey(0), args.fleet, dtype)
p = MPCParams(w_cte=300.0).astype(dtype)
cfg = SolverConfig(n_steps=30, max_sqp_iters=12, tol_grad=1e-4)

tr = receding_horizon_rollout(z0s, coeffs, p, cfg, n_cycles=args.cycles)
float(jnp.sum(tr.us))  # sync (incl. compile)
t0 = time.time()
tr = receding_horizon_rollout(z0s, coeffs, p, cfg, n_cycles=args.cycles)
float(jnp.sum(tr.us))
wall = time.time() - t0
rate = args.fleet * args.cycles / wall
print(f"{args.fleet} robots x {args.cycles} cycles in {wall*1e3:.1f} ms "
      f"=> {rate:.0f} control cycles/s "
      f"(warm-start iters: {float(jnp.mean(tr.iters[1:].astype(jnp.float32))):.2f})")
