"""Multi-host scaffolding + Monte-Carlo tuning sweep tests (virtual mesh)."""

import jax
import jax.numpy as jnp
import numpy as np

from mpc_ros_tpu.config import MPCParams, SolverConfig
from mpc_ros_tpu.engine.sweep import (sample_weight_candidates, tuning_sweep)
from mpc_ros_tpu.parallel.multihost import (host_local_scenarios,
                                            init_multihost, measure_scaling)


def test_init_multihost_single_process():
    topo = init_multihost()
    assert topo["processes"] == 1
    assert topo["global_devices"] == 8  # virtual CPU mesh


def test_host_local_scenarios_sharded():
    mesh, z0s, coeffs = host_local_scenarios(jax.random.PRNGKey(0), 64,
                                             jnp.float64)
    assert z0s.shape == (64, 6)
    # sharded over the data axis of the 8-device mesh
    assert len(z0s.sharding.device_set) == 8


def test_measure_scaling_runs_and_reports():
    rows = measure_scaling([1, 2, 4], global_batch_per_device=8,
                           n_steps=10, dtype=jnp.float64, repeats=1)
    assert [r["n_devices"] for r in rows] == [1, 2, 4]
    for r in rows:
        assert r["solves_per_s"] > 0
        assert 0 < r["efficiency"] <= 2.0


def test_weight_candidates_shape_and_positivity():
    base = MPCParams()
    cands = sample_weight_candidates(jax.random.PRNGKey(1), 5, base,
                                     dtype=jnp.float64)
    assert cands.w_cte.shape == (5,)
    assert bool(jnp.all(cands.w_cte > 0))
    # non-weight leaves broadcast unchanged
    np.testing.assert_allclose(np.asarray(cands.dt), np.full(5, 0.1))


def test_tuning_sweep_picks_sane_candidate():
    base = MPCParams()
    key = jax.random.PRNGKey(2)
    cands = sample_weight_candidates(key, 6, base, dtype=jnp.float64)
    res = tuning_sweep(key, cands, n_scenarios=8,
                       cfg=SolverConfig(n_steps=10), dtype=jnp.float64)
    assert res.mean_cost.shape == (6,)
    assert 0 <= res.best_index < 6
    best = res.best_params()
    assert best.w_cte.shape == ()
    # the winner must be among the most-converged candidates
    assert float(res.converged_frac[res.best_index]) >= 0.99
