"""Planner-layer tests: plan pipeline, FSM transitions, lifecycle."""

import numpy as np

from mpc_ros_tpu.config import MPCParams, PlannerConfig, SolverConfig
from mpc_ros_tpu.planner import plan_utils, MPCPlanner
from mpc_ros_tpu.planner.fsm import (DrivingState, check_transition,
                                     rotate_command, seed_state)


# -- plan utils -------------------------------------------------------------

def test_cutoff_erases_passed_prefix():
    # straight-line plan; robot sits at x=2.3 -> waypoints 0..2 are passed
    plan = np.stack([np.arange(10.0), np.zeros(10)], axis=1)
    out = plan_utils.cutoff_plan(plan, np.array([2.3, 0.0]))
    # distances: 2.3, 1.3, 0.3, 0.7(increase -> stop)
    assert out[0, 0] == 2.0
    assert len(out) == 8


def test_cutoff_keeps_plan_when_first_is_nearest():
    plan = np.stack([np.arange(5.0), np.zeros(5)], axis=1)
    out = plan_utils.cutoff_plan(plan, np.array([-1.0, 0.0]))
    assert len(out) == 5


def test_downsample_keeps_endpoints_and_interval():
    plan = np.stack([np.linspace(0, 9.9, 100), np.zeros(100)], axis=1)
    out = plan_utils.downsample_plan(plan, segments=10)
    assert np.allclose(out[0], plan[0])
    assert np.allclose(out[-1], plan[-1])
    assert 10 <= len(out) <= 12


def test_truncate_by_length():
    plan = np.stack([np.linspace(0, 9.9, 100), np.zeros(100)], axis=1)
    out = plan_utils.truncate_by_length(plan, 2.0)
    seg = np.sum(np.hypot(np.diff(out[:, 0]), np.diff(out[:, 1])))
    assert seg <= 2.1
    assert len(out) >= 2


def test_lookahead_heading():
    plan = np.stack([np.arange(20.0), np.arange(20.0)], axis=1)  # 45 deg
    ang, valid = plan_utils.lookahead_heading(plan)
    assert valid
    np.testing.assert_allclose(ang, np.pi / 4, atol=1e-12)
    # straight +x line: gy == 0 -> invalid, like the reference's gx&&gy guard
    plan2 = np.stack([np.arange(20.0), np.zeros(20)], axis=1)
    _, valid2 = plan_utils.lookahead_heading(plan2)
    assert not valid2


# -- FSM --------------------------------------------------------------------

def test_transition_priorities():
    T, R, S, I = (DrivingState.TRACKING, DrivingState.ROTATE_BEFORE_TRACKING,
                  DrivingState.STOP_AND_ROTATE, DrivingState.REACHED_AND_IDLE)
    for s in (T, R, S, I):
        assert check_transition(s, position_reached=True, goal_reached=True,
                                below_heading_error=False) is I
        assert check_transition(s, position_reached=True, goal_reached=False,
                                below_heading_error=False) is S
        assert check_transition(s, position_reached=False, goal_reached=False,
                                below_heading_error=True) is T
    # heading-error transition only from non-tracking, non-rotating states
    assert check_transition(S, position_reached=False, goal_reached=False,
                            below_heading_error=False) is R
    assert check_transition(I, position_reached=False, goal_reached=False,
                            below_heading_error=False) is R
    assert check_transition(T, position_reached=False, goal_reached=False,
                            below_heading_error=False) is T
    assert check_transition(R, position_reached=False, goal_reached=False,
                            below_heading_error=False) is R


def test_seed_state():
    assert seed_state(position_reached=True, below_heading_error=True) \
        is DrivingState.STOP_AND_ROTATE
    assert seed_state(position_reached=False, below_heading_error=False) \
        is DrivingState.ROTATE_BEFORE_TRACKING
    assert seed_state(position_reached=False, below_heading_error=True) \
        is DrivingState.TRACKING


def test_rotate_command_p_control_and_wrap():
    v, w = rotate_command(0.0, 1.0)
    assert v == 0.0 and np.isclose(w, 0.5)
    # wrapping: target just below -pi relative
    v, w = rotate_command(3.0, -3.0)  # diff = -6 -> wrapped ~ +0.283
    assert np.isclose(w, 0.5 * ((-3.0 - 3.0 + np.pi) % (2 * np.pi) - np.pi))


# -- lifecycle --------------------------------------------------------------

def _mk_planner(**plan_kw):
    p = MPCParams(dt=0.1, ref_vel=0.5, w_cte=300.0)
    planner = MPCPlanner(params=p, solver_cfg=SolverConfig(n_steps=10),
                         planner_cfg=PlannerConfig(**plan_kw))
    planner.initialize()
    return planner


def straight_plan(n=100, length=10.0):
    xs = np.linspace(0, length, n)
    return np.stack([xs, np.zeros(n), np.zeros(n)], axis=1)


def test_set_plan_seeds_tracking_when_aligned():
    pl = _mk_planner()
    ok = pl.set_plan(straight_plan(), np.array([0.0, 0.0, 0.0]))
    assert ok
    assert pl.state is DrivingState.TRACKING


def test_set_plan_seeds_rotate_when_misaligned():
    pl = _mk_planner()
    pl.set_plan(straight_plan(), np.array([0.0, 0.0, 2.0]))
    assert pl.state is DrivingState.ROTATE_BEFORE_TRACKING


def test_set_plan_seeds_stop_and_rotate_at_goal():
    pl = _mk_planner()
    plan = straight_plan(length=0.05, n=5)
    pl.set_plan(plan, np.array([0.0, 0.0, 1.0]))
    assert pl.state is DrivingState.STOP_AND_ROTATE


def test_compute_commands_tracking_moves_forward():
    pl = _mk_planner()
    pl.set_plan(straight_plan(), np.array([0.0, 0.0, 0.0]))
    ok, (v, w), info = pl.compute_velocity_commands(
        np.array([0.0, 0.0, 0.0]), (0.3, 0.0))
    assert ok
    assert v > 0.0
    assert abs(w) < 0.3
    assert info.mpc_trajectory is not None
    assert info.tracking.solve is not None


def test_rotate_before_tracking_command_sign():
    pl = _mk_planner()
    pl.set_plan(straight_plan(), np.array([0.0, 0.0, 2.0]))
    ok, (v, w), info = pl.compute_velocity_commands(
        np.array([0.0, 0.0, 2.0]), (0.0, 0.0))
    assert ok and v == 0.0 and w < 0.0  # rotate right toward path dir 0


def test_goal_reached_latching_forces_extra_cycle():
    pl = _mk_planner()
    plan = straight_plan()
    goal_pose = np.array([10.0, 0.0, 0.0])
    pl.set_plan(plan, np.array([9.95, 0.0, 0.0]))
    # at goal position + orientation + stopped: latches both, returns True
    assert pl.is_goal_reached(goal_pose, (0.0, 0.0))
    assert pl.state is DrivingState.REACHED_AND_IDLE
    # new plan, then immediately at goal again: first query consumes latches
    pl.set_plan(plan, np.array([9.95, 0.0, 0.0]))
    r1 = pl.is_goal_reached(goal_pose, (0.0, 0.0))
    assert isinstance(r1, bool)


def test_hot_reconfigure_changes_behavior_without_error():
    pl = _mk_planner()
    pl.set_plan(straight_plan(), np.array([0.0, 0.5, 0.0]))
    ok1, (v1, w1), _ = pl.compute_velocity_commands(
        np.array([0.0, 0.5, 0.0]), (0.3, 0.0))
    pl.reconfigure(params=MPCParams(dt=0.1, ref_vel=0.2, w_cte=300.0))
    ok2, (v2, w2), _ = pl.compute_velocity_commands(
        np.array([0.1, 0.5, 0.0]), (v1, w1))
    assert ok1 and ok2
    assert v2 <= 0.2 + 1e-9  # new ref speed caps the command


# -- quirk Q13: etheta wrap + curvature-aware speed scheduling ---------------

def _corner_tracker(wrap: bool):
    from mpc_ros_tpu.planner.tracking import TrackingController
    import jax.numpy as jnp

    return TrackingController(
        MPCParams(w_cte=300.0), SolverConfig(n_steps=10),
        PlannerConfig(delay_mode=False, wrap_etheta=wrap),
        dtype=jnp.float32)


def test_wrap_etheta_steers_the_short_way_at_a_left_corner():
    """Quirk Q13: robot heading ~pi approaches a corner whose outgoing
    direction is -pi/2 (a LEFT turn, short way +pi/2). The reference's
    unwrapped etheta (+4.71) steers right, the long way; the wrapped
    extraction commands a positive (left) first control."""
    # the robot sits AT the corner heading ~pi; the local window is the
    # outbound leg heading -pi/2 (exactly the square's top-left corner
    # where the sim measured the wrong-way loop)
    # (slight x-slope: the reference's `gx && gy` validity guard rejects
    # exactly axis-aligned windows)
    ref = np.stack([np.linspace(0.0, -0.02, 12),
                    np.linspace(-0.05, -0.8, 12)], 1)
    pose = np.array([0.0, 0.02, 3.0])
    goal = np.array([0.0, -0.8, -np.pi / 2])

    out = {}
    for wrap in (True, False):
        trk = _corner_tracker(wrap)
        (v, w0), dbg = trk.compute(pose, goal, 0.3, ref)
        out[wrap] = (w0, float(dbg.state[5]))
    w_wrapped, eth_wrapped = out[True]
    w_ref, eth_ref = out[False]
    assert abs(eth_wrapped) <= np.pi + 1e-9
    assert eth_ref > np.pi            # the reference's unwrapped value
    assert abs(eth_wrapped - ((eth_ref + np.pi) % (2 * np.pi) - np.pi)) < 1e-9
    # wrapped: turn left (positive); reference formula: turn right
    assert w_wrapped > 0.0 and w_ref < 0.0


def test_curvature_slowdown_caps_ref_vel():
    """curvature_slowdown caps the scheduled reference speed at
    sqrt(max_lat_accel/kappa) on curved windows and leaves straight
    windows at ref_vel."""
    from mpc_ros_tpu.planner.tracking import TrackingController
    import jax.numpy as jnp

    cfg = PlannerConfig(delay_mode=False, curvature_slowdown=True,
                        max_lat_accel=0.2)
    trk = TrackingController(MPCParams(ref_vel=0.5), SolverConfig(n_steps=10),
                             cfg, dtype=jnp.float32)
    # straight window: no cap
    straight = np.stack([np.linspace(0.1, 2.0, 20), np.zeros(20)], 1)
    assert trk.curvature_speed_limit(straight) == float("inf")
    # quarter circle of radius 0.5 -> kappa = 2 -> cap sqrt(0.2/2) = 0.316
    t = np.linspace(0, np.pi / 2, 30)
    arc = np.stack([0.5 * np.sin(t), 0.5 * (1 - np.cos(t))], 1)
    lim = trk.curvature_speed_limit(arc)
    assert abs(lim - np.sqrt(0.2 / 2.0)) < 0.02, lim
    # through compute(): the commanded speed ramps toward the cap, not 0.5
    pose = np.array([0.0, 0.0, 0.0])
    goal = np.array([0.5, 0.5, np.pi / 2])
    for _ in range(40):
        (v, w0), dbg = trk.compute(pose, goal, lim, arc)
    assert dbg.ref_vel <= lim + 1e-9
    assert v <= lim + 1e-9


def test_square_course_no_wrong_way_loop():
    """Closed loop on the square course: with the Q13 wrap the peak
    geometric excursion stays bounded (the unwrapped reference formula
    loops 270 degrees at the top-left corner: 0.45 m diff-drive / 0.84 m
    bicycle measured)."""
    from mpc_ros_tpu.sim import get_shape
    from mpc_ros_tpu.sim.simulator import run_closed_loop

    plan = get_shape("square")
    p = MPCParams(max_angvel=1.5, w_cte=300.0, w_angvel_d=10.0,
                  w_accel_d=10.0)
    planner = MPCPlanner(params=p, solver_cfg=SolverConfig(n_steps=20),
                         planner_cfg=PlannerConfig(local_plan_length=2.5))
    res = run_closed_loop(planner, plan, max_cycles=1000)
    assert res.reached
    d = np.array([np.min(np.hypot(plan[:, 0] - q[0], plan[:, 1] - q[1]))
                  for q in res.poses])
    assert float(d.max()) < 0.3, float(d.max())
