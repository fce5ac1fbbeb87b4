"""Per-solve cost breakdown and run-level statistics.

The reference tracks `cost_cte/cost_etheta/cost_vel` accumulators inside
FG_eval but never reads them out (write-only,
/root/reference/mpc_ros/src/mpc_planner.cpp:40,106-130 — SURVEY.md §5.5).
Here the breakdown is a first-class product computed from any solved
trajectory, plus an aggregator for run-level latency/convergence stats.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import numpy as np

import jax.numpy as jnp

from ..config import MPCParams

Array = Any


@dataclasses.dataclass
class CostBreakdown:
    """The FG_eval objective split by term (floats, host-side)."""

    cte: float
    etheta: float
    vel: float
    angvel: float
    accel: float
    angvel_rate: float
    accel_rate: float

    @property
    def total(self) -> float:
        return (self.cte + self.etheta + self.vel + self.angvel
                + self.accel + self.angvel_rate + self.accel_rate)


def cost_breakdown(zs, us, p: MPCParams) -> CostBreakdown:
    """Split the objective exactly as FG_eval accumulates it
    (/root/reference/mpc_ros/src/mpc_planner.cpp:122-147)."""
    zs = jnp.asarray(zs)
    us = jnp.asarray(us)
    du = us[1:] - us[:-1]
    return CostBreakdown(
        cte=float(jnp.sum(p.w_cte * (zs[:, 4] - p.ref_cte) ** 2)),
        etheta=float(jnp.sum(p.w_etheta * (zs[:, 5] - p.ref_etheta) ** 2)),
        vel=float(jnp.sum(p.w_vel * (zs[:, 3] - p.ref_vel) ** 2)),
        angvel=float(jnp.sum(p.w_angvel * us[:, 0] ** 2)),
        accel=float(jnp.sum(p.w_accel * us[:, 1] ** 2)),
        angvel_rate=float(jnp.sum(p.w_angvel_d * du[:, 0] ** 2)),
        accel_rate=float(jnp.sum(p.w_accel_d * du[:, 1] ** 2)),
    )


@dataclasses.dataclass
class RunStats:
    """Aggregated per-cycle observability over a closed-loop run."""

    n_cycles: int = 0
    n_solves: int = 0
    n_converged: int = 0
    solve_iters: list = dataclasses.field(default_factory=list)
    cycle_times_s: list = dataclasses.field(default_factory=list)
    costs: list = dataclasses.field(default_factory=list)

    def record_cycle(self, info) -> None:
        """Accepts a planner CycleInfo."""
        self.n_cycles += 1
        self.cycle_times_s.append(info.solve_time_s)
        t = info.tracking
        if t is not None and t.solve is not None:
            self.n_solves += 1
            self.n_converged += int(bool(t.solve.converged))
            self.solve_iters.append(int(t.solve.n_iters))
            self.costs.append(float(t.solve.cost))

    def summary(self) -> dict:
        ct = np.asarray(self.cycle_times_s) if self.cycle_times_s else np.zeros(1)
        it = np.asarray(self.solve_iters) if self.solve_iters else np.zeros(1)
        return {
            "n_cycles": self.n_cycles,
            "n_solves": self.n_solves,
            "converged_frac": (self.n_converged / self.n_solves
                               if self.n_solves else float("nan")),
            "cycle_time_p50_ms": float(np.percentile(ct, 50) * 1e3),
            "cycle_time_p99_ms": float(np.percentile(ct, 99) * 1e3),
            "sqp_iters_mean": float(it.mean()),
            "sqp_iters_max": int(it.max()),
            "mean_cost": float(np.mean(self.costs)) if self.costs else float("nan"),
        }
