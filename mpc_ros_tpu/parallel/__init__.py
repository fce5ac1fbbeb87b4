from .mesh import make_mesh, batch_sharding, replicated, DATA_AXIS, TIME_AXIS
from .sharded import sharded_sweep, SweepStats, time_sharded_riccati
from .multihost import init_multihost, host_local_scenarios, measure_scaling

__all__ = [
    "make_mesh",
    "batch_sharding",
    "replicated",
    "DATA_AXIS",
    "TIME_AXIS",
    "sharded_sweep",
    "SweepStats",
    "time_sharded_riccati",
    "init_multihost",
    "host_local_scenarios",
    "measure_scaling",
]
