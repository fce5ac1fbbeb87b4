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
   /root/reference/mpc_ros/src/mpc_planner.cpp:122-147 — so the whole
   solver stack is reused: the single-robot tracker runs the XLA path via
   tracking._solve_jit, and the fleet tracker's batched solve runs the
   Pallas megakernel's native per-stage setpoint profiles on TPU
   (kernels/solve_pallas.py `refs`));
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


class FleetTrajectoryTracker:
    """B robots chasing B timed references with ONE batched solve/cycle.

    The fleet twin of `TrajectoryTracker` (same per-cycle math,
    vectorized): trajectories live in padded (B, M) buffers, the horizon
    sampling is one flat searchsorted over all robots, the cubic fits are
    batched normal equations, and the per-stage setpoint profiles go
    through `batch_solve_lane(refs=...)` in a single program (the Pallas
    megakernel path on TPU). Extends
    the upstream ref_trajectory_tracking capability
    (/root/reference/README.md:43-46) to fleet serving.
    """

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
        self.catchup_gain = float(catchup_gain)
        self.model = get_model(solver_cfg.model)
        self.B = 0
        self._warm_us: Optional[np.ndarray] = None

    def set_trajectories(self, trajs: list) -> None:
        """Install B `TimedTrajectory` objects (padded internally)."""
        B = len(trajs)
        self.B = B
        M = max(len(tr.t) for tr in trajs)
        self._xy = np.zeros((B, M, 2))
        self._yawu = np.zeros((B, M))
        self._t = np.full((B, M), np.inf)
        self._len = np.zeros(B, np.int64)
        self._vseg = np.zeros((B, max(M - 1, 1)))
        for i, tr in enumerate(trajs):
            n = len(tr.t)
            self._len[i] = n
            self._xy[i, :n] = tr.xy
            # pad with the final waypoint so clamped samples park there
            self._xy[i, n:] = tr.xy[-1]
            self._yawu[i, :n] = tr._yaw_unwrapped
            self._yawu[i, n:] = tr._yaw_unwrapped[-1]
            self._t[i, :n] = tr.t
            ds = np.hypot(*np.diff(tr.xy, axis=0).T)
            dt_ = np.diff(tr.t)
            self._vseg[i, :n - 1] = ds / dt_
        self._t_end = np.array([tr.t[-1] for tr in trajs])
        self._goal = np.stack([tr.xy[-1] for tr in trajs])
        self._warm_us = None

    def finished(self, t_now: float, poses: np.ndarray) -> np.ndarray:
        """(B,) flags: past the schedule end AND inside the xy tolerance."""
        d = np.hypot(poses[:, 0] - self._goal[:, 0],
                     poses[:, 1] - self._goal[:, 1])
        return ((t_now >= self._t_end)
                & (d <= self.planner_cfg.limits.xy_goal_tolerance))

    def _sample(self, times: np.ndarray):
        """Vectorized TimedTrajectory.sample over the fleet.
        times (B, K) -> (xy (B, K, 2), yaw (B, K), speed (B, K))."""
        B, M = self._t.shape
        K = times.shape[1]
        t0 = self._t[:, 0]
        tN = np.take_along_axis(self._t, (self._len - 1)[:, None], 1)[:, 0]
        tc = np.clip(times, t0[:, None], tN[:, None])
        # one flat searchsorted across all rows: offset each row's (sorted)
        # timeline by i*C with C above every finite time value
        fin = np.isfinite(self._t)
        tmax = float(self._t[fin].max()) if fin.any() else 1.0
        C = tmax + 2.0
        tpad = np.where(fin, self._t, tmax + 1.0)
        base = np.arange(B)[:, None] * C
        flat = (tpad + base).ravel()
        k = np.searchsorted(flat, (tc + base).ravel(), side="right")
        k = (k - (np.arange(B) * M).repeat(K)).reshape(B, K)
        k0 = np.clip(k - 1, 0, M - 2)
        g = lambda a: np.take_along_axis(a, k0, 1)
        t_lo = g(self._t)
        t_hi = np.take_along_axis(self._t, k0 + 1, 1)
        w = np.where(t_hi > t_lo, (tc - t_lo) / np.maximum(t_hi - t_lo,
                                                           1e-12), 0.0)
        w = np.clip(w, 0.0, 1.0)
        x = g(self._xy[..., 0]) * (1 - w) + np.take_along_axis(
            self._xy[..., 0], k0 + 1, 1) * w
        y = g(self._xy[..., 1]) * (1 - w) + np.take_along_axis(
            self._xy[..., 1], k0 + 1, 1) * w
        yaw = g(self._yawu) * (1 - w) + np.take_along_axis(
            self._yawu, k0 + 1, 1) * w
        v = np.take_along_axis(self._vseg,
                               np.clip(k0, 0, self._vseg.shape[1] - 1), 1)
        v = np.where((times > tN[:, None]) | (times < t0[:, None]), 0.0, v)
        return np.stack([x, y], -1), yaw, v

    def compute(self, t_now: float, poses: np.ndarray,
                feedback_v: np.ndarray):
        """One fleet cycle: poses (B, 3), feedback_v (B,).
        Returns (cmds (B, 2) = (v, w), lags (B,))."""
        assert self.B, "set_trajectories first"
        cfg = self.solver_cfg
        N = cfg.n_steps
        B = self.B
        dt = float(np.max(np.asarray(self.params.dt)))
        times = t_now + dt * np.arange(N)[None, :].repeat(B, 0)
        pts, yaws, speeds = self._sample(times)

        th = poses[:, 2]
        ct, st = np.cos(th), np.sin(th)
        dx = pts[..., 0] - poses[:, 0, None]
        dy = pts[..., 1] - poses[:, 1, None]
        x_veh = dx * ct[:, None] + dy * st[:, None]
        y_veh = dy * ct[:, None] - dx * st[:, None]

        # batched cubic fit (normal equations; degree capped by distinct
        # abscissae like the single-robot tracker)
        n_distinct = (np.abs(np.diff(np.sort(x_veh, axis=1), axis=1))
                      > 1e-6).sum(axis=1) + 1
        order = np.minimum(np.minimum(cfg.poly_order, N - 1),
                           np.maximum(n_distinct - 1, 0))
        order = np.where(np.ptp(x_veh, axis=1) < 1e-3, 0, order)
        coeffs = np.zeros((B, cfg.n_coeffs))
        for kk in np.unique(order):
            sel = order == kk
            xs = x_veh[sel]
            V = np.empty((xs.shape[0], N, kk + 1))
            V[:, :, 0] = 1.0
            for q in range(1, kk + 1):
                V[:, :, q] = V[:, :, q - 1] * xs
            Vt = V.transpose(0, 2, 1)
            G = Vt @ V + 1e-12 * np.eye(kk + 1)
            b = Vt @ y_veh[sel][:, :, None]
            coeffs[sel, : kk + 1] = np.linalg.solve(G, b)[..., 0]

        cte = coeffs[:, 0]
        etheta = (th - yaws[:, 0] + np.pi) % (2.0 * np.pi) - np.pi
        hx, hy = np.cos(yaws[:, 0]), np.sin(yaws[:, 0])
        lag = dx[:, 0] * hx + dy[:, 0] * hy

        v_ref = np.clip(speeds + self.catchup_gain * lag[:, None], 0.0,
                        self.planner_cfg.max_speed)
        refs = np.stack([np.zeros((B, N)), np.zeros((B, N)), v_ref], -1)
        z0s = np.stack([np.zeros(B), np.zeros(B), np.zeros(B),
                        np.asarray(feedback_v, float), cte, etheta], -1)

        u_init = None
        if self._warm_us is not None:
            u_init = jnp.asarray(np.concatenate(
                [self._warm_us[:, 1:], self._warm_us[:, -1:]], axis=1),
                self.dtype)
        if cfg.model in ("diff_drive", "bicycle"):
            # lane-major path: the megakernel evaluates the per-stage
            # setpoint profiles natively on TPU (falls back to the vmap
            # path off-kernel)
            from ..solver.batch_lane import batch_solve_lane as _solve
        else:
            from ..engine.batch import batch_solve as _solve
        res = _solve(jnp.asarray(z0s, self.dtype),
                     jnp.asarray(coeffs, self.dtype), self.params,
                     cfg, u_init=u_init,
                     refs=jnp.asarray(refs, self.dtype))
        import jax

        us = np.asarray(jax.device_get(res.us), float)
        self._warm_us = us
        v_cmd = np.clip(np.asarray(feedback_v, float) + us[:, 0, 1] * dt,
                        0.0, self.planner_cfg.max_speed)
        return np.stack([v_cmd, us[:, 0, 0]], -1), lag
