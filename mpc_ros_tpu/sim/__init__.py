from .shapes import infinity, epitrochoid, square, get_shape, SHAPES
from .simulator import (BicyclePlant, ClosedLoopResult, UnicyclePlant,
                        make_plant, run_closed_loop)
from .logger import write_tracking_csv, read_tracking_csv

__all__ = [
    "infinity",
    "epitrochoid",
    "square",
    "get_shape",
    "SHAPES",
    "UnicyclePlant",
    "BicyclePlant",
    "make_plant",
    "run_closed_loop",
    "ClosedLoopResult",
    "write_tracking_csv",
    "read_tracking_csv",
]
