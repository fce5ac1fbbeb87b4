"""Batched receding-horizon serving tests."""

import jax
import jax.numpy as jnp
from mpc_ros_tpu.config import MPCParams, SolverConfig
from mpc_ros_tpu.engine.receding import receding_horizon_rollout


def gentle_scenarios(key, B, dtype):
    """Near-straight references: a fixed robot-frame cubic only represents
    the path near the fit point — the real pipeline refits every cycle
    (planner/tracking.py), so the on-device serving test keeps curvature
    low to stay in the representable region over the run."""
    kk = jax.random.split(key, 3)
    c0 = jax.random.normal(kk[0], (B,), dtype) * 0.15
    c1 = jax.random.normal(kk[1], (B,), dtype) * 0.05
    coeffs = jnp.stack([c0, c1, jnp.zeros((B,), dtype),
                        jnp.zeros((B,), dtype)], axis=-1)
    z0s = jnp.stack([jnp.zeros((B,), dtype)] * 3
                    + [jnp.full((B,), 0.3, dtype), c0, jnp.arctan(c1)],
                    axis=-1)
    return z0s, coeffs


def test_closed_loop_drives_errors_down():
    dtype = jnp.float64
    B = 16
    z0s, coeffs = gentle_scenarios(jax.random.PRNGKey(0), B, dtype)
    p = MPCParams(w_cte=300.0).astype(dtype)
    cfg = SolverConfig(n_steps=15)
    tr = receding_horizon_rollout(z0s, coeffs, p, cfg, n_cycles=60)
    assert tr.zs.shape == (60, B, 6)
    # cross-track error magnitude shrinks to a plateau well below the
    # start (a frozen-frame line reference has a small nonzero stationary
    # offset — the real pipeline refits per cycle)
    cte_mean = jnp.mean(jnp.abs(tr.zs[:, :, 4]), axis=1)
    cte0 = float(cte_mean[0])
    cte_min = float(jnp.min(cte_mean))
    cteN = float(cte_mean[-1])
    assert cte_min < 0.6 * cte0, (cte0, cte_min)
    assert cteN <= cte0, (cte0, cteN)
    # velocity converges toward the reference
    vN = float(jnp.mean(tr.zs[-1, :, 3]))
    assert abs(vN - float(p.ref_vel)) < 0.1
    assert bool(jnp.all(jnp.isfinite(tr.costs)))


def test_warm_start_reduces_iterations_over_cycles():
    dtype = jnp.float64
    B = 16
    z0s, coeffs = gentle_scenarios(jax.random.PRNGKey(1), B, dtype)
    p = MPCParams(w_cte=300.0).astype(dtype)
    cfg = SolverConfig(n_steps=15)
    tr = receding_horizon_rollout(z0s, coeffs, p, cfg, n_cycles=20)
    early = float(jnp.mean(tr.iters[0].astype(jnp.float64)))
    late = float(jnp.mean(tr.iters[5:].astype(jnp.float64)))
    assert late < early, (early, late)


def test_receding_with_obstacle_field_avoids_blob():
    """Per-robot parametric obstacles flow through the serving loop: the
    closed-loop fleet must not drive through the blob (with these weights
    the optimal response is braking short of it, not swerving — lateral
    deviation is punished by w_cte)."""
    import jax

    from mpc_ros_tpu.engine.receding import receding_horizon_rollout
    from mpc_ros_tpu.models.obstacles import GaussianObstacles

    dtype = jnp.float32
    B = 8
    z0s = jnp.tile(jnp.asarray([0, 0, 0, 0.5, 0, 0], dtype), (B, 1))
    coeffs = jnp.zeros((B, 4), dtype)
    p = MPCParams(ref_vel=0.5, w_cte=50.0).astype(dtype)
    cfg = SolverConfig(n_steps=10, max_sqp_iters=8, tol_grad=1e-3)
    blobs = GaussianObstacles.from_sigmas(
        jnp.full((B, 1), 0.6, dtype), jnp.full((B, 1), 0.05, dtype),
        jnp.full((B, 1), 0.25, dtype), jnp.full((B, 1), 200.0, dtype))
    # 20 cycles x dt=0.1 at ~0.5 m/s: unobstructed fleet passes x=0.6
    tr_free = receding_horizon_rollout(z0s, coeffs, p, cfg, n_cycles=20)
    tr_obs = receding_horizon_rollout(z0s, coeffs, p, cfg, n_cycles=20,
                                      blobs=blobs)
    assert float(jnp.max(tr_free.zs[..., 0])) > 0.8
    # obstructed fleet keeps clear of the blob center the whole run
    d = jnp.sqrt((tr_obs.zs[..., 0] - 0.6) ** 2
                 + (tr_obs.zs[..., 1] - 0.05) ** 2)
    assert float(jnp.min(d)) > 0.3, float(jnp.min(d))
    assert bool(jnp.all(jnp.isfinite(tr_obs.us)))
