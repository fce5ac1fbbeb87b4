from .mesh import make_mesh, batch_sharding, replicated, DATA_AXIS, TIME_AXIS
from .sharded import (SweepStats, sharded_batch_solve,
                      sharded_horizon_solve, sharded_receding_rollout,
                      sharded_sweep, time_sharded_riccati)
from .multihost import init_multihost, host_local_scenarios, measure_scaling

__all__ = [
    "make_mesh",
    "batch_sharding",
    "replicated",
    "DATA_AXIS",
    "TIME_AXIS",
    "sharded_sweep",
    "sharded_batch_solve",
    "SweepStats",
    "time_sharded_riccati",
    "sharded_horizon_solve",
    "sharded_receding_rollout",
    "init_multihost",
    "host_local_scenarios",
    "measure_scaling",
]
