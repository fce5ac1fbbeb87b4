from .types import SolveResult
from .ilqr import solve, solve_jit

__all__ = ["SolveResult", "solve", "solve_jit"]
