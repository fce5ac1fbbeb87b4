from .mesh import make_mesh, batch_sharding, replicated, DATA_AXIS, TIME_AXIS
from .sharded import sharded_sweep, SweepStats

__all__ = [
    "make_mesh",
    "batch_sharding",
    "replicated",
    "DATA_AXIS",
    "TIME_AXIS",
    "sharded_sweep",
    "SweepStats",
]
