from .batch import batch_solve, batch_solve_swept, make_random_scenarios, Scenario

__all__ = ["batch_solve", "batch_solve_swept", "make_random_scenarios", "Scenario"]
