"""Built-in reference trajectory generators: infinity, epitrochoid, square.

The reference README claims tracking of "infinity-shaped, epitrochoid,
square" courses (/root/reference/README.md:43), but the generators live in
the upstream parent repo, not the fork (SURVEY.md §4.3) — so these are
re-derived from the standard curve definitions. Each generator returns
(M, 3) waypoints (x, y, yaw) with yaw = path tangent, ready for
`MPCPlanner.set_plan`.
"""

from __future__ import annotations

import numpy as np


def _with_tangent_yaw(xy: np.ndarray) -> np.ndarray:
    d = np.gradient(xy, axis=0)
    yaw = np.arctan2(d[:, 1], d[:, 0])
    return np.concatenate([xy, yaw[:, None]], axis=1)


def infinity(n_points: int = 600, scale: float = 3.0,
             gap: float = 0.05) -> np.ndarray:
    """Lemniscate of Gerono: (a sin t, a sin t cos t).

    The course is left open by `gap` (fraction of the loop) so start and
    goal are distinct — a goal coincident with the start would satisfy the
    latched xy tolerance immediately. Phase-shifted to start at the right
    lobe apex, keeping the goal away from the self-intersection at the
    origin (which the robot crosses mid-course).
    """
    t0 = np.pi / 2
    t = t0 + np.linspace(0.0, 2.0 * np.pi * (1.0 - gap), n_points)
    xy = np.stack([scale * np.sin(t), scale * np.sin(t) * np.cos(t)], axis=1)
    return _with_tangent_yaw(xy)


def epitrochoid(n_points: int = 900, R: float = 2.0, r: float = 0.667,
                d: float = 0.3, gap: float = 0.04) -> np.ndarray:
    """Epitrochoid with ratio R/r ~ 3 (closes after one revolution); left
    open by `gap` like `infinity`. Defaults are curtate (d < r): the prolate
    form has ~0.13 m-radius cusps, kinematically infeasible for a 0.5 m/s
    robot with |omega| <= 1.5 rad/s; these give min radius ~1 m."""
    t = np.linspace(0.0, 2.0 * np.pi * (1.0 - gap), n_points)
    k = (R + r) / r
    xy = np.stack(
        [(R + r) * np.cos(t) - d * np.cos(k * t),
         (R + r) * np.sin(t) - d * np.sin(k * t)], axis=1)
    return _with_tangent_yaw(xy)


def square(side: float = 4.0, n_per_side: int = 120,
           corner_radius: float = 0.5, gap_points: int = 12) -> np.ndarray:
    """Rounded square course (sharp corners are infeasible for a smooth
    tracking reference; the radius defaults to a small fillet). Left open
    by `gap_points` waypoints so start and goal are distinct."""
    h = side / 2.0
    c = corner_radius
    pts = []
    # corners centers in CCW order starting bottom-right
    centers = [(h - c, -h + c), (h - c, h - c), (-h + c, h - c), (-h + c, -h + c)]
    start_ang = [-np.pi / 2, 0.0, np.pi / 2, np.pi]
    n_arc = max(n_per_side // 6, 4)
    for i in range(4):
        cx, cy = centers[i]
        nx, ny = centers[(i + 1) % 4]
        a0 = start_ang[i]
        arc = np.linspace(a0, a0 + np.pi / 2, n_arc, endpoint=False)
        pts.extend([(cx + c * np.cos(a), cy + c * np.sin(a)) for a in arc])
        # straight edge from end of this corner to start of next corner
        ex = cx + c * np.cos(a0 + np.pi / 2)
        ey = cy + c * np.sin(a0 + np.pi / 2)
        sx = nx + c * np.cos(a0 + np.pi / 2)
        sy = ny + c * np.sin(a0 + np.pi / 2)
        seg = np.linspace(0.0, 1.0, n_per_side, endpoint=False)[1:]
        pts.extend([(ex + s * (sx - ex), ey + s * (sy - ey)) for s in seg])
    xy = np.asarray(pts)
    if gap_points > 0:
        xy = xy[:-gap_points]
    return _with_tangent_yaw(xy)


SHAPES = {
    "infinity": infinity,
    "epitrochoid": epitrochoid,
    "square": square,
}


def get_shape(name: str, **kwargs) -> np.ndarray:
    return SHAPES[name](**kwargs)
