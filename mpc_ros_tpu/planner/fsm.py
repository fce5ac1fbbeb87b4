"""Driving state machine: Tracking / RotateBeforeTracking / StopAndRotate /
ReachedAndIdle.

Behavioral port of the reference's State-pattern FSM
(/root/reference/mpc_ros/src/driving_state.cpp,
 /root/reference/mpc_ros/src/mpc_planner_ros.cpp:318-363) as a plain enum +
transition function — control logic at 10-100 Hz, deliberately a thin Python
layer outside jit (SURVEY.md §7.2-4). Deviations from the reference are
quirk fixes, each documented at the site.
"""

from __future__ import annotations

import enum

import numpy as np



class DrivingState(enum.Enum):
    TRACKING = "Tracking"
    ROTATE_BEFORE_TRACKING = "RotateBeforeTracking"
    STOP_AND_ROTATE = "StopAndRotate"
    REACHED_AND_IDLE = "ReachedAndIdle"


def normalize_angle(a: float) -> float:
    """Wrap to [-pi, pi) — host-side twin of ops.frames.normalize_angle
    (reference: /root/reference/mpc_ros/include/driving_state.h:32-40)."""
    return float((a + np.pi) % (2.0 * np.pi) - np.pi)


def check_transition(state: DrivingState, *, position_reached: bool,
                     goal_reached: bool,
                     below_heading_error: bool) -> DrivingState:
    """Priority transition logic of `checkStates`
    (/root/reference/mpc_ros/src/mpc_planner_ros.cpp:335-361):
    goal -> ReachedAndIdle; position -> StopAndRotate; heading error too
    large -> RotateBeforeTracking (unless already rotating or tracking);
    else -> Tracking."""
    if goal_reached:
        return DrivingState.REACHED_AND_IDLE
    if position_reached:
        return DrivingState.STOP_AND_ROTATE
    if not below_heading_error:
        if state in (DrivingState.ROTATE_BEFORE_TRACKING,
                     DrivingState.TRACKING):
            return state
        return DrivingState.ROTATE_BEFORE_TRACKING
    return DrivingState.TRACKING


def seed_state(*, position_reached: bool,
               below_heading_error: bool) -> DrivingState:
    """Initial state on a new plan (`setPlan`,
    /root/reference/mpc_ros/src/mpc_planner_ros.cpp:148-163)."""
    if position_reached:
        return DrivingState.STOP_AND_ROTATE
    if not below_heading_error:
        return DrivingState.ROTATE_BEFORE_TRACKING
    return DrivingState.TRACKING


def rotate_command(current_yaw: float, target_yaw: float,
                   p_gain: float = 0.5) -> tuple[float, float]:
    """P-control rotation command used by both rotate states
    (/root/reference/mpc_ros/src/driving_state.cpp:143-173):
    (v, w) = (0, p_gain * wrapped(target - current))."""
    err = normalize_angle(target_yaw - current_yaw)
    return 0.0, p_gain * err
