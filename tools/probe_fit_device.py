"""On-chip cost of the batched device costmap->Gaussians fit
(fit_gaussians_to_maps) at fleet scale — the VERDICT r3 item 3 number.

Measures, at B maps of 64x64 f32:
  upload   — host->device transfer of the (B, 64, 64) grid stack
  fit      — the jitted greedy K=4 fit, steady-state chained dispatch
             (compute only; the transfer is amortized/pipelined)
  fit+sync — single dispatch incl. the tunnel-RTT sync
"""
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from mpc_ros_tpu.models.obstacles import ObstacleMap, fit_gaussians_to_maps

dev = jax.devices()[0]
print("device:", dev)

fit = jax.jit(fit_gaussians_to_maps, static_argnames=("n_blobs",))

for B in (1024, 4096, 8192):
    cells, extent = 64, 4.0
    xs = np.linspace(-extent / 2, extent / 2, cells)
    X, Y = np.meshgrid(xs, xs)
    rng = np.random.default_rng(0)
    cx = rng.uniform(-1, 1, (B, 1, 1))
    cy = rng.uniform(-1, 1, (B, 1, 1))
    grids = np.exp(-((X[None] - cx) ** 2 + (Y[None] - cy) ** 2)
                   / (2 * 0.3**2)).astype(np.float32)
    omaps = ObstacleMap(
        grid=jnp.asarray(grids),
        origin=jnp.broadcast_to(jnp.asarray([-2.0, -2.0], jnp.float32),
                                (B, 2)),
        resolution=jnp.full((B,), extent / (cells - 1), jnp.float32),
        weight=jnp.full((B,), 50.0, jnp.float32))

    # upload timing
    t0 = time.time()
    gd = jax.device_put(omaps.grid, dev)
    float(jnp.sum(gd[:, 0, 0]))
    t_up = time.time() - t0
    omaps_d = jax.device_put(omaps, dev)
    float(jnp.sum(omaps_d.grid[:, 0, 0]))

    bl = fit(omaps_d, 4)
    float(jnp.sum(bl.w))     # compile + warm

    # single-dispatch with sync
    ts = []
    for _ in range(5):
        t0 = time.time()
        bl = fit(omaps_d, 4)
        float(jnp.sum(bl.w))
        ts.append(time.time() - t0)
    t_single = min(ts)

    # steady-state chained dispatch (8 fits, one sync)
    ts = []
    for _ in range(3):
        t0 = time.time()
        acc = None
        for _ in range(8):
            s = jnp.sum(fit(omaps_d, 4).w)
            acc = s if acc is None else acc + s
        float(acc)
        ts.append(time.time() - t0)
    t_steady = min(ts) / 8

    mb = grids.nbytes / 1e6
    print(f"B={B}: upload {t_up*1e3:.1f} ms ({mb:.1f} MB), "
          f"fit steady {t_steady*1e3:.2f} ms/batch "
          f"({B/t_steady:,.0f} maps/s), fit+sync {t_single*1e3:.1f} ms")
