"""Observability tests: cost breakdown closes the write-only gap."""

import jax.numpy as jnp
import numpy as np

from mpc_ros_tpu.config import MPCParams, SolverConfig, PlannerConfig
from mpc_ros_tpu.models.costs import total_cost
from mpc_ros_tpu.obs import cost_breakdown, RunStats, PhaseTimers


def test_breakdown_sums_to_total():
    rng = np.random.default_rng(0)
    zs = jnp.asarray(rng.normal(size=(12, 6)))
    us = jnp.asarray(rng.normal(size=(11, 2)))
    p = MPCParams(w_cte=100.0, w_etheta=90.0, w_vel=7.0, w_angvel=3.0,
                  w_accel=2.0, w_angvel_d=11.0, w_accel_d=13.0)
    bd = cost_breakdown(zs, us, p)
    np.testing.assert_allclose(bd.total, float(total_cost(zs, us, p)),
                               rtol=1e-9)
    assert bd.cte > 0 and bd.vel > 0


def test_run_stats_aggregates_closed_loop():
    from mpc_ros_tpu.planner import MPCPlanner
    from mpc_ros_tpu.sim import infinity, run_closed_loop

    p = MPCParams(dt=0.1, ref_vel=0.5, w_cte=300.0)
    planner = MPCPlanner(params=p, solver_cfg=SolverConfig(n_steps=10),
                         planner_cfg=PlannerConfig(local_plan_length=2.5))
    stats = RunStats()
    planner.on_cycle = stats.record_cycle
    run_closed_loop(planner, infinity(n_points=300), max_cycles=100)
    s = stats.summary()
    assert s["n_cycles"] == 100 or s["n_cycles"] > 0
    assert s["n_solves"] > 0
    assert s["converged_frac"] > 0.9
    assert s["cycle_time_p99_ms"] > 0


def test_phase_timers():
    t = PhaseTimers()
    with t.phase("a"):
        pass
    with t.phase("a"):
        pass
    with t.phase("b"):
        pass
    s = t.summary()
    assert s["a"]["count"] == 2 and s["b"]["count"] == 1
    assert s["a"]["total_s"] >= 0
