from .batch import (analytic_u_init, batch_solve, batch_solve_swept,
                    make_random_scenarios, Scenario)
from ..solver.batch_lane import batch_solve_lane
from .sweep import tuning_sweep, sample_weight_candidates, SweepResult
from .receding import receding_horizon_rollout, RecedingTrace
from .presort import (PresortedResult, difficulty_features,
                      fit_difficulty_model, predict_difficulty,
                      solve_presorted)

__all__ = [
    "analytic_u_init",
    "batch_solve",
    "batch_solve_swept",
    "batch_solve_lane",
    "make_random_scenarios",
    "PresortedResult",
    "difficulty_features",
    "fit_difficulty_model",
    "predict_difficulty",
    "solve_presorted",
    "Scenario",
    "tuning_sweep",
    "sample_weight_candidates",
    "SweepResult",
    "receding_horizon_rollout",
    "RecedingTrace",
]
