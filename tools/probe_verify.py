"""One-off probe: megakernel vs XLA lane solver ON HARDWARE at the bench
config — calibrates the tolerances for bench.py --verify."""
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

dtype = jnp.float32
B = 1024
dev = jax.devices()[0]
print("device:", dev)
z0s, coeffs = make_random_scenarios(jax.random.PRNGKey(0), B, dtype)
z0s = jax.device_put(z0s, dev)
coeffs = jax.device_put(coeffs, dev)
p = MPCParams().astype(dtype)

base = SolverConfig(n_steps=30, max_sqp_iters=12, ls_iters=4, ddp=True,
                    tol_grad=1e-4)

for trig in ("exact", "fast"):
    cfg_m = dataclasses.replace(base, backward="mega", trig=trig)
    cfg_x = dataclasses.replace(base, backward="xla")
    t0 = time.time()
    r_m = batch_solve_lane(z0s, coeffs, p, cfg_m)
    float(jnp.sum(r_m.us))
    t_m = time.time() - t0
    t0 = time.time()
    r_x = batch_solve_lane(z0s, coeffs, p, cfg_x)
    float(jnp.sum(r_x.us))
    t_x = time.time() - t0
    us_m = np.asarray(r_m.us)
    us_x = np.asarray(r_x.us)
    du = float(np.max(np.abs(us_m - us_x)))
    cost_m = np.asarray(r_m.cost, np.float64)
    cost_x = np.asarray(r_x.cost, np.float64)
    dc = float(np.max(np.abs(cost_m - cost_x) / (1.0 + np.abs(cost_x))))
    conv_m = np.asarray(r_m.converged, np.float32)
    conv_x = np.asarray(r_x.converged, np.float32)
    it_m = np.asarray(r_m.n_iters, np.float32)
    it_x = np.asarray(r_x.n_iters, np.float32)
    print(f"trig={trig}: du={du:.3e} dcost_rel={dc:.3e} "
          f"conv_eq={float(np.mean(conv_m == conv_x)):.6f} "
          f"(m={conv_m.mean():.4f} x={conv_x.mean():.4f}) "
          f"iters_eq={float(np.mean(it_m == it_x)):.6f} "
          f"(mean m={it_m.mean():.2f} x={it_x.mean():.2f}) "
          f"[compile+run mega {t_m:.1f}s xla {t_x:.1f}s]")
