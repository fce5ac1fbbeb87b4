"""Plan pipeline: cutoff, downsampling, heading extraction.

Host-side path logic (runs at control frequency, 10-100 Hz — deliberately
NOT jitted; the hot solve is). Successor of the reference's
`getCutOffPlan` / `downSamplePlan` / `isBelowErrorTheta`
(/root/reference/mpc_ros/src/mpc_planner_ros.cpp:253-395), with the
uninitialized-downsampling-interval bug (quirk Q6) fixed as documented.
"""

from __future__ import annotations

import numpy as np


def cutoff_plan(plan: np.ndarray, robot_xy: np.ndarray) -> np.ndarray:
    """Drop the already-passed prefix: walk waypoints while the distance to
    the robot is still decreasing, erase them, stop at the first increase.

    DELIBERATE deviation from the reference
    (/root/reference/mpc_ros/src/mpc_planner_ros.cpp:266-291, quirk Q12):
    the reference erases THROUGH the nearest waypoint and can consume the
    entire plan when distances decrease monotonically (the whole final
    approach to the goal!), returning failure and leaning on move_base's
    external recovery. Here the nearest waypoint is KEPT, so the cutoff
    plan is never empty while a plan exists — measured closed-loop
    tracking degrades ~3x under the reference-exact rule because every
    near-goal cycle loses its reference path.

    plan: (M, >=2) array of waypoints (x, y[, yaw]); returns a view-like copy.
    """
    if len(plan) == 0:
        return plan
    d2 = np.sum((plan[:, :2] - robot_xy[None, :2]) ** 2, axis=1)
    # index of the nearest waypoint along the still-decreasing prefix:
    # the first distance increase ends the walk (vectorized form of the
    # reference's loop — semantics pinned by tests)
    inc = d2[1:] > d2[:-1]
    k = int(np.argmax(inc)) if inc.any() else len(plan) - 1
    return plan[k:].copy()


def downsample_plan(plan: np.ndarray, segments: int = 10) -> np.ndarray:
    """Subsample the cutoff plan to ~`segments` spans, always keeping the
    final waypoint.

    Reference intent (/root/reference/mpc_ros/src/mpc_planner_ros.cpp:365-395):
    sampling interval = path_length / segments / waypoint_spacing. The
    reference's `_pathLength` is never initialized in that fork (quirk Q6 —
    undefined behavior); here it is computed from the plan itself.
    """
    if len(plan) <= 2:
        return plan.copy()
    seglens = np.hypot(np.diff(plan[:, 0]), np.diff(plan[:, 1]))
    path_length = float(np.sum(seglens))
    waypoints_dist = float(np.hypot(plan[1, 0] - plan[0, 0],
                                    plan[1, 1] - plan[0, 1]))
    if waypoints_dist <= 0.0:
        waypoints_dist = max(path_length / max(len(plan) - 1, 1), 1e-9)
    sampling = max(int(path_length / segments / waypoints_dist), 1)
    out = list(plan[::sampling])
    # reference always appends the back() waypoint
    if not np.array_equal(out[-1], plan[-1]):
        out.append(plan[-1])
    return np.asarray(out)


def truncate_by_length(plan: np.ndarray, max_length: float) -> np.ndarray:
    """Clip the plan to a lookahead window of `max_length` meters of
    cumulative arclength — the stand-in for the reference's
    `planner_util_.getLocalPlan`, which transformed/clipped the global plan
    to the local costmap extent before any fitting
    (/root/reference/mpc_ros/src/mpc_planner_ros.cpp:305). Fitting a cubic
    to an unbounded window of a looping course is ill-posed."""
    if len(plan) <= 1:
        return plan.copy()
    seg = np.hypot(np.diff(plan[:, 0]), np.diff(plan[:, 1]))
    arclen = np.concatenate([[0.0], np.cumsum(seg)])
    k = int(np.searchsorted(arclen, max_length, side="right"))
    return plan[: max(k, 2)].copy()


def path_heading(plan: np.ndarray) -> float:
    """Direction of the leading plan segment (used for the
    rotate-before-tracking decision). Prefers a stored per-waypoint yaw
    (column 2) like the reference's use of pose orientation
    (/root/reference/mpc_ros/src/mpc_planner_ros.cpp:258); falls back to the
    first-segment tangent."""
    if plan.shape[1] >= 3:
        return float(plan[0, 2])
    if len(plan) >= 2:
        return float(np.arctan2(plan[1, 1] - plan[0, 1],
                                plan[1, 0] - plan[0, 0]))
    return 0.0


def lookahead_heading(plan: np.ndarray, frac: float = 0.3) -> tuple[float, bool]:
    """Aggregate path direction over the first `frac` of waypoints — the
    reference's 30%-lookahead heuristic
    (/root/reference/mpc_ros/src/driving_state.cpp:215-221).

    Returns (atan2(gy, gx), valid) where valid mirrors the reference's
    `gx && gy` guard (both displacement sums nonzero).
    """
    n_sample = int(len(plan) * frac)
    gx = 0.0
    gy = 0.0
    for i in range(1, n_sample):
        gx += plan[i, 0] - plan[i - 1, 0]
        gy += plan[i, 1] - plan[i - 1, 1]
    valid = (gx != 0.0) and (gy != 0.0)
    return float(np.arctan2(gy, gx)), valid
