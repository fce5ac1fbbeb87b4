"""Baseline-controller tests: Pure Pursuit and DWA in the shared lifecycle.

The reference's benchmark capability is the three-controller closed-loop
comparison (/root/reference/assets/{mpc,dwa,pure_pursuit}.csv — SURVEY.md
§4.2). These tests run the built-in baselines through exactly the same
simulator + CSV harness as the NMPC planner and hold them to the
reference logs' own error envelopes (pure pursuit mean |cte| 0.0326 m,
DWA 0.202 m — BASELINE.md).
"""

import numpy as np
import pytest

from mpc_ros_tpu.config import MPCParams, PlannerConfig
from mpc_ros_tpu.planner import (DWAConfig, DWAPlanner, PurePursuitPlanner)
from mpc_ros_tpu.planner.baselines import _dwa_eval_jit
from mpc_ros_tpu.sim import get_shape, run_closed_loop, read_tracking_csv


def make_params():
    return MPCParams(dt=0.1, ref_vel=0.5, max_angvel=1.5, w_cte=300.0,
                     w_angvel_d=10.0, w_accel_d=10.0)


def make_baseline(kind):
    pcfg = PlannerConfig(local_plan_length=2.5)
    if kind == "pure_pursuit":
        return PurePursuitPlanner(params=make_params(), planner_cfg=pcfg)
    return DWAPlanner(params=make_params(), planner_cfg=pcfg)


def geo_error(plan, poses):
    return np.array(
        [np.min(np.hypot(plan[:, 0] - q[0], plan[:, 1] - q[1])) for q in poses])


@pytest.mark.parametrize("kind", ["pure_pursuit", "dwa"])
@pytest.mark.parametrize("shape", ["infinity", "square"])
def test_baseline_tracks_course(kind, shape):
    plan = get_shape(shape)
    planner = make_baseline(kind)
    res = run_closed_loop(planner, plan, max_cycles=1500)
    assert res.reached, f"{kind}/{shape}: goal not reached"
    d = geo_error(plan, res.poses)
    # reference-log envelopes: PP mean 0.0326/max 0.132; DWA mean 0.202
    assert d.mean() < 0.1, f"{kind}/{shape}: mean geo error {d.mean():.4f}"
    assert d.max() < 0.5, f"{kind}/{shape}: max geo error {d.max():.4f}"
    assert np.all(np.isfinite(res.records))


def test_baseline_csv_schema(tmp_path):
    plan = get_shape("infinity")
    planner = make_baseline("pure_pursuit")
    path = str(tmp_path / "pure_pursuit.csv")
    res = run_closed_loop(planner, plan, max_cycles=1500, log_path=path)
    assert res.reached
    with open(path) as f:
        assert f.readline().strip() == \
            "idx,cte,etheta,cmd_vel.linear.x,cmd_vel.angular.z"
    rec, course_time = read_tracking_csv(path)
    assert rec.shape == res.records.shape
    assert abs(course_time - res.course_time_s) < 1e-6


def test_compare_harness_runs_one(tmp_path):
    """sim.compare's per-controller runner produces the summary row and the
    reference-schema CSV."""
    from mpc_ros_tpu.sim.compare import run_one

    log = str(tmp_path / "pure_pursuit.csv")
    row = run_one("pure_pursuit", "infinity", n_steps=20, dt=0.1,
                  ref_vel=0.5, max_cycles=1500, log_path=log)
    assert row["reached"]
    assert row["mean_abs_cte"] < 0.1
    rec, course_time = read_tracking_csv(log)
    assert abs(course_time - row["course_time_s"]) < 0.05


def test_pure_pursuit_curvature_geometry():
    """On a circular path of radius R, the commanded curvature w/v must
    approximate 1/R (the defining pure-pursuit property)."""
    R = 2.0
    th = np.linspace(0, np.pi, 200)
    plan = np.stack([R * np.sin(th), R * (1 - np.cos(th)), th], -1)
    planner = make_baseline("pure_pursuit")
    planner.initialize()
    pose = plan[0].copy()
    assert planner.set_plan(plan, pose, (0.5, 0.0))
    # warm the speed ramp to steady state
    v = w = 0.0
    for _ in range(12):
        ok, (v, w), _ = planner.compute_velocity_commands(pose, (v, w))
        assert ok
    assert v > 0.2
    assert abs(w / v - 1.0 / R) < 0.25 / R


def test_dwa_window_respects_limits():
    """Commands stay inside the dynamic window and actuator bounds."""
    plan = get_shape("infinity")
    planner = make_baseline("dwa")
    planner.initialize()
    pose = plan[0].copy()
    assert planner.set_plan(plan, pose, (0.0, 0.0))
    v_prev, w_prev = 0.0, 0.0
    p = planner.params
    for _ in range(40):
        ok, (v, w), _ = planner.compute_velocity_commands(pose, (v_prev, w_prev))
        assert ok
        assert 0.0 <= v <= float(p.ref_vel) + 1e-6
        assert abs(w) <= float(p.max_angvel) + 1e-6
        assert abs(v - v_prev) <= float(p.max_throttle) \
            * planner.dwa_cfg.window_dt + 1e-6
        pose = np.array([pose[0] + v * np.cos(pose[2]) * 0.1,
                         pose[1] + v * np.sin(pose[2]) * 0.1,
                         pose[2] + w * 0.1])
        v_prev, w_prev = v, w


def test_dwa_obstacle_clearance_steers_away():
    """With a Gaussian obstacle straight ahead, the chosen rollout must
    deviate (nonzero turn) vs the obstacle-free run that goes straight."""
    import jax.numpy as jnp

    from mpc_ros_tpu.models.obstacles import GaussianObstacles

    cfg = DWAConfig()
    # straight path along +x, goal 2.5 m ahead
    pts = np.stack([np.linspace(0, 2.5, cfg.plan_points),
                    np.zeros(cfg.plan_points)], -1).astype(np.float32)
    goal = pts[-1]
    lim = jnp.asarray([1.0, 3.0, 1.5, 0.5, 0.0], jnp.float32)

    f_free = _dwa_eval_jit(cfg, False, False)
    v0, w0 = f_free(jnp.float32(0.5), jnp.float32(0.0), lim,
                    jnp.asarray(pts), jnp.asarray(goal))
    assert abs(float(w0)) < 0.2  # straight-ish

    blobs = GaussianObstacles.from_sigmas(
        cx=jnp.asarray([0.6]), cy=jnp.asarray([0.0]),
        sigma=jnp.asarray([0.25]), w=jnp.asarray([50.0]))
    f_obs = _dwa_eval_jit(cfg, False, True)
    v1, w1 = f_obs(jnp.float32(0.5), jnp.float32(0.0), lim,
                   jnp.asarray(pts), jnp.asarray(goal), blobs=blobs)
    assert abs(float(w1)) > abs(float(w0)) + 0.1, \
        f"no avoidance: w_free={float(w0):.3f} w_obs={float(w1):.3f}"
