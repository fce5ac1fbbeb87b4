from .metrics import CostBreakdown, cost_breakdown, RunStats
from .timers import PhaseTimers, device_trace
from .checkpoint import save_checkpoint, restore_checkpoint, serving_state, sweep_state

__all__ = [
    "CostBreakdown",
    "cost_breakdown",
    "RunStats",
    "PhaseTimers",
    "device_trace",
    "save_checkpoint",
    "restore_checkpoint",
    "serving_state",
    "sweep_state",
]
