"""Oracle experiment: host-side input pre-sort by difficulty.

The megakernel pays mean-over-tiles(max-in-tile) iterations; at N=30/ddp
that is 5.38 vs the 3.57 per-lane mean (roofline gap 1.5x). The round-2
sorted schedule lost 2x to ON-DEVICE permutation gathers; a HOST-side
pre-sort of the inputs (batch-major numpy take before upload) costs the
device nothing. This probes the ORACLE upper bound: sort by the true
n_iters of an identical prior solve, then time the one-pass solve on the
sorted batch. If even the oracle sort wins little, drop the idea.
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

dev = jax.devices()[0]
B = 524288
dtype = jnp.float32
cfg = SolverConfig(n_steps=30, max_sqp_iters=12, ls_iters=4, ddp=True,
                   tol_grad=1e-4)
p = MPCParams().astype(dtype)
z0s_h, coeffs_h = jax.device_get(
    make_random_scenarios(jax.random.PRNGKey(0), B, dtype))
z0s_h = np.asarray(z0s_h)
coeffs_h = np.asarray(coeffs_h)


def steady(z0s, coeffs, n_pipe=16, reps=3):
    z0s = jax.device_put(jnp.asarray(z0s), dev)
    coeffs = jax.device_put(jnp.asarray(coeffs), dev)
    r = batch_solve_lane(z0s, coeffs, p, cfg)
    float(jnp.sum(r.us))
    ts = []
    for _ in range(reps):
        t0 = time.time()
        acc = None
        for _ in range(n_pipe):
            s = jnp.sum(batch_solve_lane(z0s, coeffs, p, cfg).us)
            acc = s if acc is None else acc + s
        float(acc)
        ts.append((time.time() - t0) / n_pipe)
    it = np.asarray(r.n_iters)
    tile = 1024
    tmax = it.reshape(B // tile, tile).max(1).mean()
    return min(ts) * 1e3, it, tmax


ms0, iters, tmax0 = steady(z0s_h, coeffs_h)
print(f"unsorted: {ms0:.2f} ms/batch ({B/ms0*1000:,.0f}/s), "
      f"mean {iters.mean():.2f}, mean tile-max {tmax0:.2f}")

perm = np.argsort(iters, kind="stable")
ms1, it1, tmax1 = steady(z0s_h[perm], coeffs_h[perm])
print(f"oracle-sorted: {ms1:.2f} ms/batch ({B/ms1*1000:,.0f}/s), "
      f"mean {it1.mean():.2f}, mean tile-max {tmax1:.2f}")

# cheap static predictor: the census class is |etheta| at speed on curved
# references — rank correlation check + timing
pred = (np.abs(z0s_h[:, 5]) * (0.3 + z0s_h[:, 3])
        + 0.5 * np.abs(coeffs_h[:, 2]))
from scipy.stats import spearmanr

rho = spearmanr(pred, iters).statistic
perm2 = np.argsort(pred, kind="stable")
ms2, it2, tmax2 = steady(z0s_h[perm2], coeffs_h[perm2])
print(f"predictor-sorted (spearman {rho:.3f}): {ms2:.2f} ms/batch "
      f"({B/ms2*1000:,.0f}/s), mean tile-max {tmax2:.2f}")
