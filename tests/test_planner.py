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
