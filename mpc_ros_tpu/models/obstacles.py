"""Costmap-derived obstacle penalty terms.

The reference consumes a costmap only for plan bookkeeping — its NLP has NO
obstacle awareness (the costmap_2d handle is wired in
/root/reference/mpc_ros/src/mpc_planner_ros.cpp:47 but never enters
MPC::Solve). The north-star configs (BASELINE.md: "16k scenarios with
costmap-derived obstacle penalty terms") make obstacle costs a first-class
solver feature here.

Design: a robot-frame occupancy-cost grid (the local costmap snapshot),
bilinearly sampled along the predicted (x, y) horizon. Bilinear sampling is
gather + FMA — cheap on TPU, batchable over scenarios with per-scenario
grids, and differentiable (piecewise-linear; the solver consumes the
analytic gradient, Gauss-Newton curvature handled by the Levenberg
regularizer).
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import struct

Array = Any


@struct.dataclass
class ObstacleMap:
    """Robot/world-frame cost grid. grid[iy, ix] in [0, 1]; world coords:
    x = origin[0] + ix * resolution, y = origin[1] + iy * resolution."""

    grid: Array          # (H, W) float
    origin: Array        # (2,) lower-left corner (x, y)
    resolution: Array    # scalar [m / cell]
    weight: Array        # cost multiplier w_obs

    @staticmethod
    def empty(extent: float = 4.0, cells: int = 64, weight: float = 0.0,
              dtype=jnp.float32) -> "ObstacleMap":
        """Centered empty map of +-extent/2 meters."""
        return ObstacleMap(
            grid=jnp.zeros((cells, cells), dtype),
            origin=jnp.asarray([-extent / 2, -extent / 2], dtype),
            resolution=jnp.asarray(extent / cells, dtype),
            weight=jnp.asarray(weight, dtype),
        )


def bilinear_sample(grid: jnp.ndarray, origin, resolution,
                    xy: jnp.ndarray) -> jnp.ndarray:
    """Bilinearly sample grid at continuous points xy (..., 2).

    Out-of-map points clamp to the border cell (border values should be 0
    so leaving the local map costs nothing, like a costmap's unknown edge).
    """
    H, W = grid.shape
    fx = (xy[..., 0] - origin[0]) / resolution
    fy = (xy[..., 1] - origin[1]) / resolution
    x0 = jnp.clip(jnp.floor(fx).astype(jnp.int32), 0, W - 2)
    y0 = jnp.clip(jnp.floor(fy).astype(jnp.int32), 0, H - 2)
    tx = jnp.clip(fx - x0.astype(fx.dtype), 0.0, 1.0)
    ty = jnp.clip(fy - y0.astype(fy.dtype), 0.0, 1.0)
    g00 = grid[y0, x0]
    g01 = grid[y0, x0 + 1]
    g10 = grid[y0 + 1, x0]
    g11 = grid[y0 + 1, x0 + 1]
    return ((1 - ty) * ((1 - tx) * g00 + tx * g01)
            + ty * ((1 - tx) * g10 + tx * g11))


def obstacle_cost(omap: ObstacleMap, xy: jnp.ndarray) -> jnp.ndarray:
    """Total obstacle penalty over points xy (..., 2) (summed over the
    leading axes)."""
    vals = bilinear_sample(omap.grid, omap.origin, omap.resolution, xy)
    return omap.weight * jnp.sum(vals)


def obstacle_grad_xy(omap: ObstacleMap, xy: jnp.ndarray) -> jnp.ndarray:
    """Analytic d(weight * sample)/d(x, y) per point; shape like xy.

    The bilinear surface's gradient is piecewise linear in each cell:
      d/dx = [(1-ty)(g01-g00) + ty(g11-g10)] / res
      d/dy = [(1-tx)(g10-g00) + tx(g11-g01)] / res
    """
    grid = omap.grid
    H, W = grid.shape
    res = omap.resolution
    fx = (xy[..., 0] - omap.origin[0]) / res
    fy = (xy[..., 1] - omap.origin[1]) / res
    x0 = jnp.clip(jnp.floor(fx).astype(jnp.int32), 0, W - 2)
    y0 = jnp.clip(jnp.floor(fy).astype(jnp.int32), 0, H - 2)
    tx = jnp.clip(fx - x0.astype(fx.dtype), 0.0, 1.0)
    ty = jnp.clip(fy - y0.astype(fy.dtype), 0.0, 1.0)
    g00 = grid[y0, x0]
    g01 = grid[y0, x0 + 1]
    g10 = grid[y0 + 1, x0]
    g11 = grid[y0 + 1, x0 + 1]
    dx = ((1 - ty) * (g01 - g00) + ty * (g11 - g10)) / res
    dy = ((1 - tx) * (g10 - g00) + tx * (g11 - g01)) / res
    return omap.weight * jnp.stack([dx, dy], axis=-1)


def obstacle_cost_grad_bl(omaps: "ObstacleMap", x: jnp.ndarray,
                          y: jnp.ndarray):
    """Lane-major batched sampling: per-scenario grids, batch-last points.

    omaps: batched ObstacleMap (leaves with leading B: grid (B,H,W),
    origin (B,2), resolution (B,), weight (B,)). x, y: (..., B) robot-frame
    points. Returns (cost, dx, dy), each (..., B), already weight-scaled.
    Implemented as four flat gathers per point set (bilinear corners).
    """
    grids = omaps.grid                        # (B, H, W)
    B, H, W = grids.shape
    flat = grids.reshape(B * H * W)
    res = omaps.resolution                    # (B,)
    ox = omaps.origin[:, 0]
    oy = omaps.origin[:, 1]
    wgt = omaps.weight

    fx = (x - ox) / res
    fy = (y - oy) / res
    x0 = jnp.clip(jnp.floor(fx).astype(jnp.int32), 0, W - 2)
    y0 = jnp.clip(jnp.floor(fy).astype(jnp.int32), 0, H - 2)
    tx = jnp.clip(fx - x0.astype(fx.dtype), 0.0, 1.0)
    ty = jnp.clip(fy - y0.astype(fy.dtype), 0.0, 1.0)

    b_idx = jnp.broadcast_to(jnp.arange(B, dtype=jnp.int32), x0.shape)
    base = (b_idx * H + y0) * W + x0
    g00 = jnp.take(flat, base)
    g01 = jnp.take(flat, base + 1)
    g10 = jnp.take(flat, base + W)
    g11 = jnp.take(flat, base + W + 1)

    val = ((1 - ty) * ((1 - tx) * g00 + tx * g01)
           + ty * ((1 - tx) * g10 + tx * g11))
    dx = ((1 - ty) * (g01 - g00) + ty * (g11 - g10)) / res
    dy = ((1 - tx) * (g10 - g00) + tx * (g11 - g01)) / res
    return wgt * val, wgt * dx, wgt * dy


def gaussian_blob_map(center, sigma: float = 0.4, extent: float = 4.0,
                      cells: int = 64, weight: float = 50.0,
                      dtype=jnp.float32) -> ObstacleMap:
    """Synthetic costmap: one Gaussian obstacle blob (benchmarks/tests)."""
    xs = jnp.linspace(-extent / 2, extent / 2, cells, dtype=dtype)
    X, Y = jnp.meshgrid(xs, xs)
    cx, cy = center
    g = jnp.exp(-((X - cx) ** 2 + (Y - cy) ** 2) / (2.0 * sigma**2))
    return ObstacleMap(
        grid=g.astype(dtype),
        origin=jnp.asarray([-extent / 2, -extent / 2], dtype),
        resolution=jnp.asarray(extent / (cells - 1), dtype),
        weight=jnp.asarray(weight, dtype),
    )
