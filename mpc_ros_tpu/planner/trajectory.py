"""Direct trajectory tracking: a reference point that moves in TIME.

Besides the move_base path-tracking plugin, the reference's upstream parent
ships a trajectory-tracking mode — the robot chases a TIME-parameterized
reference ("tracking the trajectory such as infinity-shaped, epitrochoid,
square", /root/reference/README.md:43-46; the launch file
`ref_trajectory_tracking_gazebo.launch` is claimed but absent from the fork,
SURVEY.md §4.3). Path tracking answers "stay on this curve"; trajectory
tracking answers "be HERE at time t" — it must also recover the schedule
after disturbances, not only the geometry.

Here the mode is built on the solver's per-stage reference profiles
(solver/ilqr.py `refs`): each control cycle,

1. sample the timed reference at the horizon knots t_now + k*dt — the
   lookahead window follows the MOVING point, not the robot's progress;
2. fit the solver's cubic to those future reference positions in the robot
   frame (the same error-state NLP as path tracking — FG_eval semantics,
   /root/reference/mpc_ros/src/mpc_planner.cpp:122-147 — so the XLA
   solver path (solver/ilqr.py via tracking._solve_jit) is reused
   unchanged; the Pallas megakernel does not yet take per-stage
   reference profiles, so trajectory mode runs the XLA path);
3. build the per-knot speed profile ref_vel[k] = |dr/dt|(t_now + k*dt) plus
   a proportional catch-up on the longitudinal time lag, so the solver
   speeds up when behind schedule and eases off when ahead;
4. solve with `refs` and emit the first control, exactly like Tracking.

Host-side float64 numpy for the per-cycle sampling/fit (tiny), compiled
fixed-shape solve on device — one program, reused every cycle.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import numpy as np

import jax.numpy as jnp

from ..config import MPCParams, PlannerConfig, SolverConfig
from ..models.base import get_model
from .fsm import normalize_angle
from .tracking import _solve_jit


@dataclasses.dataclass
class TimedTrajectory:
    """A reference trajectory with explicit timestamps.

    xy: (M, 2) world positions; yaw: (M,) tangents; t: (M,) strictly
    increasing times [s]. Build from a geometric path + speed profile with
    `from_path`.
    """

    xy: np.ndarray
    yaw: np.ndarray
    t: np.ndarray

    def __post_init__(self):
        self.xy = np.asarray(self.xy, float)
        self.yaw = np.asarray(self.yaw, float)
        self.t = np.asarray(self.t, float)
        if not np.all(np.diff(self.t) > 0):
            raise ValueError("timestamps must be strictly increasing")
        # unwrapped yaw so interpolation never crosses the +-pi seam
        self._yaw_unwrapped = np.unwrap(self.yaw)

    @property
    def duration(self) -> float:
        return float(self.t[-1] - self.t[0])

    @staticmethod
    def from_path(plan: np.ndarray, speed) -> "TimedTrajectory":
        """Time-parameterize a geometric plan (M, >=2 [x, y[, yaw]]) by a
        speed profile: scalar (constant speed) or (M,) per-waypoint speeds.
        Timestamps follow from arclength: dt_i = ds_i / v_mid_i."""
        plan = np.asarray(plan, float)
        # planner output frequently repeats waypoints; zero-length segments
        # would produce dt=0 and fail the strictly-increasing check
        seg = np.hypot(*np.diff(plan[:, :2], axis=0).T)
        keep = np.concatenate([[True], seg > 1e-9])
        plan = plan[keep]
        xy = plan[:, :2]
        if plan.shape[1] >= 3:
            yaw = plan[:, 2]
        else:
            d = np.gradient(xy, axis=0)
            yaw = np.arctan2(d[:, 1], d[:, 0])
        ds = np.hypot(*np.diff(xy, axis=0).T)
        v = np.broadcast_to(np.asarray(speed, float), (len(xy),))
        v_mid = np.maximum(0.5 * (v[1:] + v[:-1]), 1e-6)
        t = np.concatenate([[0.0], np.cumsum(ds / v_mid)])
        return TimedTrajectory(xy=xy, yaw=yaw, t=t)

    def sample(self, times: np.ndarray):
        """Reference state at arbitrary times (clamped to [t0, tN]).

        Returns (xy (K, 2), yaw (K,), speed (K,)); speed is 0 beyond the
        end — the reference point stops at the goal, and the tracker's
        speed profile decays with it."""
        times = np.asarray(times, float)
        tc = np.clip(times, self.t[0], self.t[-1])
        x = np.interp(tc, self.t, self.xy[:, 0])
        y = np.interp(tc, self.t, self.xy[:, 1])
        yaw = np.interp(tc, self.t, self._yaw_unwrapped)
        # speed of the moving point: |dr/dt| of the linear interpolant, i.e.
        # segment arclength over segment duration
        ds = np.hypot(*np.diff(self.xy, axis=0).T)
        dt = np.diff(self.t)
        v_seg = ds / dt
        k = np.clip(np.searchsorted(self.t, tc, side="right") - 1,
                    0, len(v_seg) - 1)
        v = v_seg[k]
        v = np.where(times > self.t[-1], 0.0, v)
        v = np.where(times < self.t[0], 0.0, v)
        return np.stack([x, y], axis=-1), yaw, v


@dataclasses.dataclass
class TrajectoryDebug:
    """Per-cycle observability record for the trajectory mode."""

    coeffs: np.ndarray
    state: np.ndarray       # solver z0 (error state)
    refs: np.ndarray        # (N, 3) per-knot setpoint profile
    ref_point: np.ndarray   # (2,) where the reference is NOW
    lag: float              # longitudinal lag behind the reference [m] (>0 = behind)
    solve: object
    cost: float


class TrajectoryTracker:
    """Tracks a `TimedTrajectory` with the per-stage-profile NMPC solve.

    The direct analog of the upstream `ref_trajectory_tracking` node; owns
    the same cross-cycle actuation state as the Tracking driving state
    (/root/reference/mpc_ros/include/driving_state.h:64-98)."""

    def __init__(self, params: MPCParams, solver_cfg: SolverConfig,
                 planner_cfg: PlannerConfig = PlannerConfig(),
                 dtype=None, catchup_gain: float = 0.8):
        if dtype is None:
            import jax

            dtype = (jnp.float64 if jax.config.jax_enable_x64
                     else jnp.float32)
        self.params = params.astype(dtype)
        self.solver_cfg = solver_cfg
        self.planner_cfg = planner_cfg
        self.dtype = dtype
        # proportional speed catch-up on the longitudinal time lag [1/s]:
        # ref_vel[k] += gain * lag. 0 disables schedule recovery (pure
        # feedforward speed profile).
        self.catchup_gain = float(catchup_gain)
        self.model = get_model(solver_cfg.model)
        self.traj: Optional[TimedTrajectory] = None
        self.w = 0.0
        self.speed = 0.0
        self._warm_us: Optional[np.ndarray] = None

    def set_trajectory(self, traj: TimedTrajectory) -> None:
        self.traj = traj
        self.w = 0.0
        self.speed = 0.0
        self._warm_us = None

    def finished(self, t_now: float, pose: np.ndarray) -> bool:
        """Past the schedule end AND inside the xy goal tolerance of the
        final reference point (latched goal logic belongs to the FSM; the
        trajectory mode's stop rule is explicit)."""
        if self.traj is None:
            return True
        done_t = t_now >= float(self.traj.t[-1])
        d = float(np.hypot(pose[0] - self.traj.xy[-1, 0],
                           pose[1] - self.traj.xy[-1, 1]))
        return done_t and d <= self.planner_cfg.limits.xy_goal_tolerance

    def compute(self, t_now: float, pose: np.ndarray, feedback_v: float):
        """One control cycle at wall/sim time `t_now`.

        pose: (x, y, yaw); returns ((v_cmd, w_cmd), TrajectoryDebug)."""
        assert self.traj is not None, "set_trajectory first"
        cfg = self.solver_cfg
        N = cfg.n_steps
        dt = float(np.asarray(self.params.dt))
        px, py, theta = float(pose[0]), float(pose[1]), float(pose[2])
        v = float(feedback_v)

        times = t_now + dt * np.arange(N)
        pts, yaws, speeds = self.traj.sample(times)

        # world -> robot frame (same rotation as the Tracking state,
        # /root/reference/mpc_ros/src/driving_state.cpp:196-207) of the
        # FUTURE reference positions
        ct, st = np.cos(theta), np.sin(theta)
        dx = pts[:, 0] - px
        dy = pts[:, 1] - py
        x_veh = dx * ct + dy * st
        y_veh = dy * ct - dx * st

        # the cubic needs spatial spread; near the schedule end sample()
        # clamps trailing knots onto the final waypoint, so cap the degree
        # by the number of DISTINCT abscissae (not just the total span) to
        # keep the fit well-conditioned (no RankWarning cubics on 2 points)
        n_distinct = int(np.sum(np.abs(np.diff(np.sort(x_veh))) > 1e-6)) + 1
        order = min(cfg.poly_order, N - 1, max(n_distinct - 1, 0))
        if float(np.ptp(x_veh)) < 1e-3:
            order = 0
        c = np.polyfit(x_veh, y_veh, order)[::-1]
        coeffs = np.zeros(cfg.n_coeffs)
        coeffs[: len(c)] = c
        cte = float(np.polyval(coeffs[::-1], 0.0))
        # heading error vs the reference tangent NOW, wrapped (quirk Q13
        # fixed — the trajectory mode has no legacy formula to preserve)
        etheta = normalize_angle(theta - float(yaws[0]))

        # longitudinal lag: signed projection of (ref_now - robot) onto the
        # reference tangent. >0 = behind schedule -> speed up.
        hx, hy = np.cos(yaws[0]), np.sin(yaws[0])
        lag = float(dx[0] * hx + dy[0] * hy)

        v_ref = speeds + self.catchup_gain * lag
        v_ref = np.clip(v_ref, 0.0, self.planner_cfg.max_speed)
        refs = np.stack(
            [np.zeros(N), np.zeros(N), v_ref], axis=-1)

        state = np.array([0.0, 0.0, 0.0, v, cte, etheta])
        z0 = jnp.asarray(state, self.dtype)
        cj = jnp.asarray(coeffs, self.dtype)
        rj = jnp.asarray(refs, self.dtype)

        warm = self._warm_us is not None
        solve = _solve_jit(self.solver_cfg, warm, False, False, True)
        if not warm:
            res = solve(z0, cj, self.params, refs=rj)
        else:
            u_init = jnp.asarray(
                np.concatenate([self._warm_us[1:], self._warm_us[-1:]]),
                self.dtype)
            res = solve(z0, cj, self.params, u_init=u_init, refs=rj)
        import jax

        res = jax.device_get(res)   # one transfer for all host reads
        us = np.asarray(res.us)
        self._warm_us = us

        self.w = float(us[0, 0])
        throttle = float(us[0, 1])
        self.speed = float(np.clip(v + throttle * dt, 0.0,
                                   self.planner_cfg.max_speed))

        dbg = TrajectoryDebug(
            coeffs=coeffs, state=state, refs=refs, ref_point=pts[0],
            lag=lag, solve=res, cost=float(res.cost))
        return (self.speed, self.w), dbg
