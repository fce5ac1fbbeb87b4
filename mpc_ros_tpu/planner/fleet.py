"""Fleet serving: the full planner lifecycle for B robots, one device solve.

The single-robot `MPCPlanner` mirrors the reference plugin: host-side path
pipeline + one solve per cycle. Production serving is many robots; the
reference's architecture would run one move_base process per robot. Here a
`FleetPlanner` owns B robots' plans, goal latches and FSM states, runs the
whole per-cycle path pipeline (cutoff, window, downsample, robot-frame
transform, polynomial fit, error-state extraction, speed scheduling,
delay-mode prediction) vectorized on the host, and dispatches ONE batched,
warm-started `batch_solve_lane` program per cycle — the megakernel serves
every tracking robot in a single launch (see `bench.py --serving` for the
synthetic-reference upper bound: ~8.5M control cycles/s/chip).

Semantics match `MPCPlanner` robot-by-robot (asserted in tests): the same
cutoff/downsample helpers run per robot; the polynomial fit is the same
least-squares problem solved batched (padded, zero-weighted columns) in
float64; FSM transitions, latched tolerances, quirk fixes (Q12, Q13) and
the deceleration/curvature schedulers apply per lane. Reference parity
pointers are in the single-robot modules (planner.py, tracking.py).

Measured (v5e via the axon tunnel, N=20): 45 ms/cycle p50 at B=128 and
152 ms at B=1024 (~6.7k robot-cycles/s) — dominated by the per-robot host
plan bookkeeping and ONE device round-trip, not the solve (the megakernel
solves 131k scenarios in 19 ms). Host reads of device-resident params are
served from a numpy twin (`_np_params`) — each stray read would cost a
~27 ms tunnel RTT (the first cut of this file paid ~3x for that). This
layer is the real-robot serving surface (plans arrive from the world); for
synthetic/device-resident references use `engine.receding`, which keeps
the whole closed loop on-chip at ~8.5M control cycles/s.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence

import numpy as np

import jax.numpy as jnp

from ..config import MPCParams, PlannerConfig, SolverConfig
from ..models.base import get_model
from . import plan_utils
from .fsm import DrivingState, check_transition, normalize_angle, seed_state

# integer FSM codes for vectorized bookkeeping
_TRACK, _ROT_PRE, _ROT_GOAL, _IDLE = range(4)
_STATE_OF = {
    _TRACK: DrivingState.TRACKING,
    _ROT_PRE: DrivingState.ROTATE_BEFORE_TRACKING,
    _ROT_GOAL: DrivingState.STOP_AND_ROTATE,
    _IDLE: DrivingState.REACHED_AND_IDLE,
}
_CODE_OF = {v: k for k, v in _STATE_OF.items()}


@dataclasses.dataclass
class FleetCycleInfo:
    """Per-cycle fleet observability record."""

    states: np.ndarray           # (B,) int FSM codes (see _STATE_OF)
    cmds: np.ndarray             # (B, 2) applied (v, u0) commands
    ref_vel: np.ndarray          # (B,) scheduled reference speeds
    cte: np.ndarray              # (B,) extracted cross-track errors
    etheta: np.ndarray           # (B,) extracted heading errors
    cost: np.ndarray             # (B,) solve costs (nan for non-tracking)
    converged: np.ndarray        # (B,) solve convergence (False non-tracking)
    n_iters: np.ndarray          # (B,) SQP iterations

    def state_enum(self, i: int) -> DrivingState:
        return _STATE_OF[int(self.states[i])]


class FleetPlanner:
    """B-robot planner with `MPCPlanner` semantics and one batched solve.

    Usage:
        fp = FleetPlanner(params, solver_cfg, planner_cfg)
        fp.initialize(n_robots)
        fp.set_plans(plans, poses)                  # list of (M_i, 3) arrays
        ok, cmds, info = fp.compute_velocity_commands(poses, feedback)
        done = fp.is_goal_reached(poses, feedback)  # (B,) bool

    Commands are (v, omega) for diff_drive and (v, delta) for the bicycle
    family, per `SolverConfig.model` (shared by the whole fleet; per-robot
    numeric parameters like the wheelbase may still vary via (B,)-shaped
    MPCParams leaves).
    """

    def __init__(self, params: MPCParams = MPCParams(),
                 solver_cfg: SolverConfig = SolverConfig(),
                 planner_cfg: PlannerConfig = PlannerConfig(),
                 dtype=jnp.float32):
        self.params = params.astype(dtype)
        self.solver_cfg = solver_cfg
        self.planner_cfg = planner_cfg
        self.dtype = dtype
        self.model = get_model(solver_cfg.model)
        self._initialized = False
        self.world_obstacles = None
        self._refresh_host_params()

    def _refresh_host_params(self) -> None:
        # host-side numpy twin of the (device-resident) params: every
        # per-cycle host read of a device leaf would otherwise cost a
        # device fetch — ~27 ms tunnel RTT each on the axon TPU, which
        # dominated the fleet cycle time before this cache
        import dataclasses as _dc

        self._np_params = MPCParams(**{
            f.name: np.asarray(getattr(self.params, f.name), float)
            for f in _dc.fields(MPCParams)})

    def reconfigure(self, params: MPCParams) -> None:
        """Hot-reload numeric parameters (traced: no recompilation)."""
        self.params = params.astype(self.dtype)
        self._refresh_host_params()

    # -- lifecycle -----------------------------------------------------------

    def initialize(self, n_robots: int) -> None:
        B = int(n_robots)
        self.B = B
        self.plans: list[Optional[np.ndarray]] = [None] * B
        self.states = np.full(B, _IDLE, np.int64)
        self.latch_xy = np.zeros(B, bool)
        self.latch_yaw = np.zeros(B, bool)
        self.set_new_goal = np.zeros(B, bool)
        T = self.solver_cfg.n_controls
        self._warm = np.zeros((B, T, 2))
        self._has_warm = np.zeros(B, bool)
        # cross-cycle actuation state (TrackingController analogs)
        self.speed = np.zeros(B)
        self.w = np.zeros(B)
        self.throttle = np.ones(B)
        self._initialized = True

    def set_obstacles(self, blobs) -> None:
        """World-frame per-robot parametric obstacles
        (models.obstacles.GaussianObstacles with leaves (B, K))."""
        self.world_obstacles = blobs

    def set_plans(self, plans: Sequence[np.ndarray],
                  poses: np.ndarray) -> np.ndarray:
        """Install per-robot global plans. plans[i]: (M_i, 3) world
        waypoints; poses (B, 3). Returns (B,) accept flags."""
        assert self._initialized
        poses = np.asarray(poses, float)
        ok = np.zeros(self.B, bool)
        for i, plan in enumerate(plans):
            plan = np.asarray(plan, float)
            if plan.ndim != 2 or len(plan) == 0:
                continue
            self.plans[i] = plan
            ok[i] = True
            self.set_new_goal[i] = True
            self._has_warm[i] = False
            self.speed[i] = 0.0
            self.w[i] = 0.0
            self.throttle[i] = 1.0
            cut = plan_utils.cutoff_plan(plan, poses[i, :2])
            below = ((not self.model.can_rotate_in_place)
                     or self._below_heading_error(poses[i], cut))
            self.states[i] = _CODE_OF[seed_state(
                position_reached=self._position_reached_one(i, poses[i]),
                below_heading_error=below)]
        return ok

    # -- per-robot scalar helpers (latch semantics match MPCPlanner) ----------

    def _goal(self, i: int) -> Optional[np.ndarray]:
        p = self.plans[i]
        return None if p is None or len(p) == 0 else p[-1]

    def _position_reached_one(self, i: int, pose: np.ndarray) -> bool:
        goal = self._goal(i)
        if goal is None:
            return False
        within = (np.hypot(pose[0] - goal[0], pose[1] - goal[1])
                  <= self.planner_cfg.limits.xy_goal_tolerance)
        if not self.set_new_goal[i] and self.latch_xy[i]:
            return True
        self.set_new_goal[i] = False
        self.latch_xy[i] = bool(within)
        return bool(self.latch_xy[i])

    def _orientation_reached_one(self, i: int, pose, feedback_vel) -> bool:
        goal = self._goal(i)
        if goal is None:
            return False
        angle = normalize_angle(pose[2] - goal[2])
        lim = self.planner_cfg.limits
        if (not self.model.can_rotate_in_place) or (
                abs(angle) <= lim.yaw_goal_tolerance):
            v, w = feedback_vel
            if (abs(v) <= lim.trans_stopped_vel
                    and abs(w) <= lim.theta_stopped_vel):
                self.latch_yaw[i] = True
                return True
        return False

    def _below_heading_error(self, pose, cutoff) -> bool:
        if len(cutoff) == 0:
            return False
        err = normalize_angle(pose[2] - plan_utils.path_heading(cutoff))
        return abs(err) <= self.planner_cfg.heading_yaw_error_threshold

    def is_goal_reached(self, poses: np.ndarray,
                        feedback: np.ndarray) -> np.ndarray:
        """(B,) goal flags with the reference's consume-once latch pair."""
        poses = np.asarray(poses, float)
        feedback = np.asarray(feedback, float)
        out = np.zeros(self.B, bool)
        for i in range(self.B):
            if self._goal(i) is None:
                continue
            if self.latch_xy[i] and self.latch_yaw[i]:
                self.latch_xy[i] = False
                self.latch_yaw[i] = False
                continue
            if (self._position_reached_one(i, poses[i])
                    and self._orientation_reached_one(i, poses[i],
                                                      feedback[i])):
                self.states[i] = _IDLE
                out[i] = True
        return out

    # -- the hot path ----------------------------------------------------------

    def compute_velocity_commands(self, poses: np.ndarray,
                                  feedback: np.ndarray):
        """One fleet control cycle. poses (B, 3); feedback (B, 2) measured
        (v, yaw_rate). Returns (ok (B,), cmds (B, 2), FleetCycleInfo)."""
        assert self._initialized
        poses = np.asarray(poses, float)
        feedback = np.asarray(feedback, float)
        B = self.B
        cfg = self.planner_cfg
        ok = np.zeros(B, bool)
        cmds = np.zeros((B, 2))
        cte_out = np.full(B, np.nan)
        eth_out = np.full(B, np.nan)
        refv_out = np.full(B, np.nan)

        # 1. per-robot plan bookkeeping + FSM transition (host scalar work)
        windows: list[Optional[np.ndarray]] = [None] * B
        refs: list[Optional[np.ndarray]] = [None] * B
        for i in range(B):
            plan = self.plans[i]
            if plan is None:
                continue
            cut = plan_utils.cutoff_plan(plan, poses[i, :2])
            if len(cut) == 0:
                continue
            self.plans[i] = cut
            win = plan_utils.truncate_by_length(cut, cfg.local_plan_length)
            windows[i] = win
            ok[i] = True
            position_reached = self._position_reached_one(i, poses[i])
            goal_reached = False
            below = False
            if position_reached:
                goal_reached = self._orientation_reached_one(
                    i, poses[i], feedback[i])
            else:
                below = ((not self.model.can_rotate_in_place)
                         or self._below_heading_error(poses[i], win))
            self.states[i] = _CODE_OF[check_transition(
                _STATE_OF[int(self.states[i])],
                position_reached=position_reached,
                goal_reached=goal_reached, below_heading_error=below)]
            if self.states[i] == _TRACK:
                refs[i] = plan_utils.downsample_plan(
                    win, cfg.downsample_segments)

        track = np.array([self.states[i] == _TRACK and refs[i] is not None
                          and len(refs[i]) > 0 for i in range(B)])

        # 2. rotation / idle commands (vectorized P-control)
        for i in range(B):
            if not ok[i]:
                continue
            st = int(self.states[i])
            if st == _ROT_GOAL and self.model.can_rotate_in_place:
                err = normalize_angle(float(self._goal(i)[2]) - poses[i, 2])
                cmds[i] = (0.0, cfg.rotate_p_gain * err)
            elif st == _ROT_PRE:
                err = normalize_angle(
                    plan_utils.path_heading(windows[i]) - poses[i, 2])
                cmds[i] = (0.0, cfg.rotate_p_gain * err)
            # _IDLE / non-rotating _ROT_GOAL: zeros

        if not track.any():
            info = self._info(cmds, cte_out, eth_out, refv_out, None, track)
            return ok, cmds, info

        # 3. batched fit + error-state extraction for the tracking robots
        idx = np.nonzero(track)[0]
        z0s, coeffs, refv = self._batched_prepare(idx, poses, feedback,
                                                  refs, windows)
        cte_out[idx] = z0s[:, 4]
        eth_out[idx] = z0s[:, 5]
        refv_out[idx] = refv

        # 4. ONE batched solve for the whole fleet (fixed shape B: robots
        # not tracking get benign zero problems so the jit cache never
        # sees a data-dependent batch size)
        res = self._solve_fleet(idx, z0s, coeffs, refv, poses)

        # ONE device->host transfer for everything the host needs
        import jax

        us, cost_d, conv_d, iters_d = jax.device_get(
            (res.us, res.cost, res.converged, res.n_iters))
        us = np.asarray(us, float)                # (B, T, 2)
        self._warm = us
        self._has_warm[:] = False
        self._has_warm[idx] = True
        dt = self._np_params.dt
        u0 = us[idx, 0, :]
        self.w[idx] = u0[:, 0]
        self.throttle[idx] = u0[:, 1]
        v_meas = feedback[idx, 0]
        self.speed[idx] = np.minimum(v_meas + u0[:, 1] * dt, refv)
        cmds[idx, 0] = self.speed[idx]
        cmds[idx, 1] = self.w[idx]

        info = self._info(cmds, cte_out, eth_out, refv_out,
                          (cost_d, conv_d, iters_d), track)
        return ok, cmds, info

    # -- internals -------------------------------------------------------------

    def _batched_prepare(self, idx, poses, feedback, refs, windows):
        """Vectorized robot-frame transform + weighted LSQ polynomial fit +
        error-state extraction for the tracking subset `idx`."""
        cfg = self.planner_cfg
        n = len(idx)
        n_coeffs = self.solver_cfg.n_coeffs
        S = max(len(refs[i]) for i in idx)
        pts = np.zeros((n, S, 2))
        wts = np.zeros((n, S))
        for j, i in enumerate(idx):
            r = refs[i]
            pts[j, :len(r)] = r[:, :2]
            wts[j, :len(r)] = 1.0

        th = poses[idx, 2]
        ct, st = np.cos(th), np.sin(th)
        dx = pts[:, :, 0] - poses[idx, 0, None]
        dy = pts[:, :, 1] - poses[idx, 1, None]
        x_veh = dx * ct[:, None] + dy * st[:, None]
        y_veh = dy * ct[:, None] - dx * st[:, None]

        # weighted normal equations per robot: same LSQ solution as the
        # single-robot np.polyfit (QR) to ~1e-10 on these tiny, well-scaled
        # windows; degree reduces when a window has too few points
        coeffs = np.zeros((n, n_coeffs))
        npts = wts.sum(axis=1).astype(int)
        order = np.minimum(self.solver_cfg.poly_order, npts - 1)
        for k in np.unique(order):
            sel = order == k
            V = x_veh[sel, :, None] ** np.arange(k + 1)[None, None, :]
            Vw = V * wts[sel][:, :, None]
            G = np.einsum("bsp,bsq->bpq", Vw, V)
            G += 1e-12 * np.eye(k + 1)     # rank guard (degenerate windows)
            b = np.einsum("bsp,bs->bp", Vw, y_veh[sel])
            coeffs[sel, : k + 1] = np.linalg.solve(G, b[..., None])[..., 0]

        cte = coeffs[:, 0]
        etheta = np.arctan(coeffs[:, 1])
        # 30%-lookahead path direction + continuity shim + Q13 wrap
        # (tracking.py:compute, reference driving_state.cpp:214-235)
        traj = np.zeros(n)
        valid = np.zeros(n, bool)
        for j, i in enumerate(idx):
            traj[j], valid[j] = plan_utils.lookahead_heading(refs[i])
        temp = th.copy()
        bump = temp <= (-np.pi + traj)
        temp[bump] += 2.0 * np.pi
        use = valid & ((temp - traj) < 1.8 * np.pi)
        etheta = np.where(use, temp - traj, 0.0)
        if cfg.wrap_etheta:
            etheta = (etheta + np.pi) % (2.0 * np.pi) - np.pi

        # reference-speed scheduling: goal deceleration + curvature cap
        goals = np.stack([self._goal(i) for i in idx])
        dist = np.hypot(poses[idx, 0] - goals[:, 0],
                        poses[idx, 1] - goals[:, 1])
        v = feedback[idx, 0]
        max_thr = float(np.max(self._np_params.max_throttle))
        rv = self._np_params.ref_vel
        ref_vel = np.broadcast_to(rv[idx] if rv.ndim else rv, (n,)).copy()
        brake = dist <= v * v / max_thr
        ref_vel[brake] = np.clip(max_thr * dist[brake], cfg.min_speed,
                                 cfg.max_speed)
        if cfg.curvature_slowdown:
            for j, i in enumerate(idx):
                lim = _curvature_speed_limit(windows[i], cfg.max_lat_accel)
                ref_vel[j] = np.clip(min(ref_vel[j], lim), cfg.min_speed,
                                     cfg.max_speed)

        # delay-mode one-step prediction (tracking.py:compute)
        dt = float(np.max(self._np_params.dt))
        if cfg.delay_mode:
            import types

            sign = self.solver_cfg.cte_vsin_sign
            lfv = self._np_params.lf
            hp = types.SimpleNamespace(
                lf=lfv[idx] if lfv.ndim else lfv)   # per-robot wheelbases
            yaw_rate = np.asarray(
                self.model.yaw_rate(v, self.w[idx], hp), float)
            theta_act = yaw_rate * dt
            z0s = np.stack([
                v * dt,
                np.zeros(n),
                theta_act,
                v + self.throttle[idx] * dt,
                cte + sign * v * np.sin(etheta) * dt,
                etheta - sign * theta_act,
            ], axis=1)
        else:
            z0s = np.stack([np.zeros(n), np.zeros(n), np.zeros(n), v, cte,
                            etheta], axis=1)
        return z0s, coeffs, ref_vel

    def _solve_fleet(self, idx, z0s_sub, coeffs_sub, refv_sub, poses):
        """Full-width batched solve: tracking robots carry their problems,
        the rest benign zeros (converge in O(1) iterations)."""
        from ..solver.batch_lane import batch_solve_lane

        B = self.B
        n_coeffs = self.solver_cfg.n_coeffs
        z0s = np.zeros((B, 6))
        coeffs = np.zeros((B, n_coeffs))
        refv = np.zeros(B)
        z0s[idx] = z0s_sub
        coeffs[idx] = coeffs_sub
        refv[idx] = refv_sub
        p = self.params.replace(
            ref_vel=jnp.asarray(refv, self.dtype))
        warm = np.where(self._has_warm[:, None, None],
                        np.concatenate([self._warm[:, 1:],
                                        self._warm[:, -1:]], axis=1),
                        0.0)
        blobs = None
        if self.world_obstacles is not None:
            blobs = _blobs_to_frames(self.world_obstacles, poses, self.dtype)
        return batch_solve_lane(
            jnp.asarray(z0s, self.dtype), jnp.asarray(coeffs, self.dtype),
            p, self.solver_cfg, u_init=jnp.asarray(warm, self.dtype),
            blobs=blobs)

    def _info(self, cmds, cte, eth, refv, fetched, track):
        """`fetched`: host-side (cost, converged, n_iters) arrays or None."""
        B = self.B
        nan = np.full(B, np.nan)
        false = np.zeros(B, bool)
        zero = np.zeros(B, np.int32)
        if fetched is not None:
            cost_d, conv_d, iters_d = fetched
            cost = np.where(track, np.asarray(cost_d, float), np.nan)
            conv = np.asarray(conv_d, bool) & track
            iters = np.where(track, np.asarray(iters_d, np.int32), 0)
        else:
            cost, conv, iters = nan, false, zero
        return FleetCycleInfo(states=self.states.copy(), cmds=cmds.copy(),
                              ref_vel=refv, cte=cte, etheta=eth, cost=cost,
                              converged=conv, n_iters=iters)


def _curvature_speed_limit(window: np.ndarray, max_lat_accel: float) -> float:
    """sqrt(a_lat / kappa_max) over a raw plan window (tracking.py twin)."""
    if window is None or len(window) < 3:
        return float("inf")
    d = np.diff(window[:, :2], axis=0)
    ds = np.hypot(d[:, 0], d[:, 1])
    keep = ds > 1e-9
    if keep.sum() < 2:
        return float("inf")
    h = np.arctan2(d[keep, 1], d[keep, 0])
    dsk = ds[keep]
    dh = (np.diff(h) + np.pi) % (2.0 * np.pi) - np.pi
    seg = np.maximum(0.5 * (dsk[1:] + dsk[:-1]), 1e-6)
    kappa = float(np.max(np.abs(dh) / seg))
    if kappa <= 1e-9:
        return float("inf")
    return float(np.sqrt(max_lat_accel / kappa))


def _blobs_to_frames(blobs, poses, dtype):
    """World-frame GaussianObstacles (leaves (B, K)) -> each robot's frame
    (batched twin of GaussianObstacles.to_frame)."""
    from ..models.obstacles import GaussianObstacles

    px = jnp.asarray(poses[:, 0:1], dtype)
    py = jnp.asarray(poses[:, 1:2], dtype)
    yaw = jnp.asarray(poses[:, 2:3], dtype)
    ct, st = jnp.cos(yaw), jnp.sin(yaw)
    dx = jnp.asarray(blobs.cx, dtype) - px
    dy = jnp.asarray(blobs.cy, dtype) - py
    return GaussianObstacles(cx=dx * ct + dy * st, cy=dy * ct - dx * st,
                             gamma=jnp.asarray(blobs.gamma, dtype),
                             w=jnp.asarray(blobs.w, dtype))
