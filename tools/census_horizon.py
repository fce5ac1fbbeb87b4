"""Census of the long-horizon unconverged tail (VERDICT r3 item 2).

For N in {48, 60, 100}: solve the bench ensemble at the bench caps/gate,
pull the unconverged lanes, then probe each with (a) a much larger budget
to find the iterations it actually needs, and (b) the cost it reaches —
is the residual genuine (real further cost decrease) or a certificate
artifact (cost-converged but pg can't fire)?

CPU, f32 lane path (same math as the megakernel; equality pinned in CI).
"""
import sys

sys.path.insert(0, ".")

import jax

jax.config.update("jax_platforms", "cpu")

import dataclasses

import jax.numpy as jnp
import numpy as np

from mpc_ros_tpu.config import MPCParams, SolverConfig
from mpc_ros_tpu.engine import make_random_scenarios
from mpc_ros_tpu.solver.batch_lane import batch_solve_lane

B = 32768
dtype = jnp.float32
p = MPCParams().astype(dtype)
z0s, coeffs = make_random_scenarios(jax.random.PRNGKey(0), B, dtype)

for N in (48, 60, 100):
    cap = round(0.45 * N)
    cfg = SolverConfig(n_steps=N, max_sqp_iters=cap, ls_iters=4, ddp=True,
                       tol_grad=1e-4)
    r = batch_solve_lane(z0s, coeffs, p, cfg)
    conv = np.asarray(r.converged)
    it = np.asarray(r.n_iters)
    bad = np.where(~conv)[0]
    print(f"\nN={N} cap={cap}: conv={conv.mean():.4f} "
          f"({bad.size}/{B} unconverged = {1e6*bad.size/B:.0f} ppm) "
          f"iters p50/p99/max={np.percentile(it,50):.0f}/"
          f"{np.percentile(it,99):.0f}/{it.max()}")
    if not bad.size:
        continue
    # characterize the bad lanes
    z_b, c_b = np.asarray(z0s)[bad], np.asarray(coeffs)[bad]
    v0, cte, eth = z_b[:, 3], z_b[:, 4], z_b[:, 5]
    curv = np.abs(c_b[:, 2])
    print(f"  bad-lane stats: |cte| mean={np.abs(cte).mean():.3f} "
          f"(ens {np.abs(np.asarray(z0s)[:,4]).mean():.3f}), "
          f"|etheta| mean={np.abs(eth).mean():.3f} "
          f"(ens {np.abs(np.asarray(z0s)[:,5]).mean():.3f}), "
          f"v0 mean={v0.mean():.3f} (ens {np.asarray(z0s)[:,3].mean():.3f}), "
          f"|c2| mean={curv.mean():.3f} "
          f"(ens {np.abs(np.asarray(coeffs)[:,2]).mean():.3f})")
    # pad the subset to a multiple of 128 for the lane path
    n_pad = (-bad.size) % 128
    zb = jnp.asarray(np.concatenate([z_b, z_b[:1].repeat(n_pad, 0)]))
    cb = jnp.asarray(np.concatenate([c_b, c_b[:1].repeat(n_pad, 0)]))
    cost_cap = np.asarray(r.cost)[bad]
    for big_cap in (2 * cap, 6 * cap):
        cfg_big = dataclasses.replace(cfg, max_sqp_iters=big_cap)
        rb = batch_solve_lane(zb, cb, p, cfg_big)
        conv_b = np.asarray(rb.converged)[:bad.size]
        it_b = np.asarray(rb.n_iters)[:bad.size]
        cost_b = np.asarray(rb.cost)[:bad.size]
        rel = (cost_cap - cost_b) / (1.0 + np.abs(cost_b))
        print(f"  cap {big_cap}: conv={conv_b.mean():.3f}, "
              f"iters-of-converged p50/max="
              f"{np.percentile(it_b[conv_b],50) if conv_b.any() else -1:.0f}/"
              f"{it_b[conv_b].max() if conv_b.any() else -1}, "
              f"further cost decrease rel p50/max="
              f"{np.percentile(rel,50):.2e}/{rel.max():.2e}")
