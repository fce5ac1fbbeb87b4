from .metrics import CostBreakdown, cost_breakdown, RunStats
from .timers import PhaseTimers, device_trace

__all__ = [
    "CostBreakdown",
    "cost_breakdown",
    "RunStats",
    "PhaseTimers",
    "device_trace",
]
