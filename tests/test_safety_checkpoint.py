"""Failure-detection watchdog + checkpoint/resume tests."""

import jax
import jax.numpy as jnp
import numpy as np

from mpc_ros_tpu.planner.safety import SafetyConfig, SafetyMonitor


def test_monitor_passes_healthy_cycles():
    m = SafetyMonitor(period_s=0.1)
    for _ in range(5):
        v, w = m.check(True, (0.4, 0.1))
        assert (v, w) == (0.4, 0.1)
    assert m.status.healthy and not m.status.fault


def test_monitor_latches_fault_and_decelerates():
    m = SafetyMonitor(0.1, SafetyConfig(max_consecutive_failures=3,
                                        decel_limit=1.0))
    m.check(True, (0.5, 0.0))
    cmds = [m.check(False, (0.5, 0.2)) for _ in range(4)]
    assert m.status.fault
    # speed bleeds at decel_limit * period per cycle, rotation zeroed
    vs = [c[0] for c in cmds]
    assert all(b <= a for a, b in zip(vs, vs[1:]))
    assert np.isclose(vs[0], 0.4)
    assert cmds[-1][1] == 0.0
    # stays stopped until operator clears
    v, w = m.check(True, (0.5, 0.1))
    assert v < 0.5 and w == 0.0
    m.clear_fault()
    v, w = m.check(True, (0.5, 0.1))
    assert (v, w) == (0.5, 0.1)


def test_monitor_rejects_nonfinite():
    m = SafetyMonitor(0.1)
    v, w = m.check(True, (float("nan"), 0.0))
    assert np.isfinite(v) and w == 0.0
    assert m.status.total_failures == 1


def test_checkpoint_roundtrip(tmp_path):
    from mpc_ros_tpu.obs.checkpoint import (restore_checkpoint,
                                            save_checkpoint, serving_state)

    zs = jnp.asarray(np.random.default_rng(0).normal(size=(8, 6)))
    warm = jnp.asarray(np.random.default_rng(1).normal(size=(8, 9, 2)))
    st = serving_state(zs, warm, cycle=42)
    path = str(tmp_path / "ckpt")
    save_checkpoint(path, st)
    out = restore_checkpoint(path)
    assert out is not None
    np.testing.assert_allclose(np.asarray(out["zs"]), np.asarray(zs))
    np.testing.assert_allclose(np.asarray(out["warm_us"]), np.asarray(warm))
    assert int(out["cycle"]) == 42
    # absent path -> None
    assert restore_checkpoint(str(tmp_path / "nope")) is None


def test_sweep_checkpoint_resume(tmp_path):
    from mpc_ros_tpu.config import MPCParams
    from mpc_ros_tpu.engine.sweep import sample_weight_candidates
    from mpc_ros_tpu.obs.checkpoint import (restore_checkpoint,
                                            save_checkpoint, sweep_state)

    cands = sample_weight_candidates(jax.random.PRNGKey(0), 4, MPCParams(),
                                     dtype=jnp.float64)
    st = sweep_state(cands, jnp.arange(4.0), jnp.arange(4.0) * 0.1,
                     jnp.ones(4), n_done=2)
    path = str(tmp_path / "sweep")
    save_checkpoint(path, st)
    out = restore_checkpoint(path)
    np.testing.assert_allclose(np.asarray(out["candidates"]["w_cte"]),
                               np.asarray(cands.w_cte))
    assert int(out["n_done"]) == 2


def test_checkpoint_atomic_replacement(tmp_path):
    """save_checkpoint must never destroy the previous checkpoint before
    the new one is live: a second save over an existing path leaves a
    restorable state at every step, and the .old fallback covers the
    rename window."""
    import os
    import shutil

    from mpc_ros_tpu.obs.checkpoint import (restore_checkpoint,
                                            save_checkpoint)

    path = str(tmp_path / "ck")
    save_checkpoint(path, {"x": np.arange(3.0)})
    save_checkpoint(path, {"x": np.arange(3.0) + 10.0})
    got = restore_checkpoint(path)
    np.testing.assert_array_equal(got["x"], np.arange(3.0) + 10.0)
    # crash window: live dir missing, only .old present -> fallback
    shutil.move(path, path + ".old.sim")
    if os.path.exists(path + ".old"):
        shutil.rmtree(path + ".old")
    shutil.move(path + ".old.sim", path + ".old")
    got = restore_checkpoint(path)
    np.testing.assert_array_equal(got["x"], np.arange(3.0) + 10.0)


def test_csv_logger_context_manager(tmp_path):
    """NativeCsvLogger honors the documented context-manager contract and
    flushes buffered rows on exception exit."""
    import pytest

    from mpc_ros_tpu.native.runtime import NativeCsvLogger

    path = str(tmp_path / "log.csv")
    with pytest.raises(RuntimeError):
        with NativeCsvLogger(path) as log:
            log.row(1, 0.1, 0.2, 0.3, 0.4)
            raise RuntimeError("mid-run crash")
    text = open(path).read()
    assert "0.1" in text            # the buffered row survived
    assert "tracking time" in text  # footer written by __exit__


def test_controlled_stop_preserves_reverse_sign():
    """A reversing robot ramps to rest at the decel limit instead of
    halting instantaneously (the old clamp-to-zero)."""
    m = SafetyMonitor(period_s=0.1, cfg=SafetyConfig(decel_limit=1.0))
    m.check(True, (-0.5, 0.0))           # commanded reverse
    v1, w1 = m.check(False, (0.0, 0.0))  # fault -> controlled stop
    assert w1 == 0.0 and -0.5 < v1 < 0.0, v1
    v2, _ = m.check(False, (0.0, 0.0))
    assert v1 < v2 <= 0.0                # monotone ramp toward zero
