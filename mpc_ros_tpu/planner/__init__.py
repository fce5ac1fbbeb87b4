from .fsm import DrivingState, check_transition, seed_state, rotate_command
from .planner import MPCPlanner, CycleInfo
from .tracking import TrackingController, TrackingDebug
from .baselines import (DWAConfig, DWAPlanner, PurePursuitConfig,
                        PurePursuitPlanner)
from .safety import SafetyMonitor, SafetyConfig, SafetyStatus
from .recovery import (RecoveryConfig, RecoveryState, RecoveryStats,
                       RecoverySupervisor)
from .fleet import FleetCycleInfo, FleetPlanner
from .fleet_device import DeviceFleetPlanner
from .trajectory import TimedTrajectory, TrajectoryDebug, TrajectoryTracker
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
    "SafetyMonitor",
    "SafetyConfig",
    "SafetyStatus",
    "RecoverySupervisor",
    "RecoveryConfig",
    "RecoveryState",
    "RecoveryStats",
    "FleetPlanner",
    "DeviceFleetPlanner",
    "FleetCycleInfo",
    "TimedTrajectory",
    "TrajectoryTracker",
    "TrajectoryDebug",
    "plan_utils",
    "PurePursuitPlanner",
    "PurePursuitConfig",
    "DWAPlanner",
    "DWAConfig",
]
