from .fsm import DrivingState, check_transition, seed_state, rotate_command
from .planner import MPCPlanner, CycleInfo
from .tracking import TrackingController, TrackingDebug
from . import plan_utils

__all__ = [
    "DrivingState",
    "check_transition",
    "seed_state",
    "rotate_command",
    "MPCPlanner",
    "CycleInfo",
    "TrackingController",
    "TrackingDebug",
    "plan_utils",
]
