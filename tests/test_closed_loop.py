"""Closed-loop simulation tests: the three reference shapes + CSV schema.

The quality bars are the reference's own logged numbers
(/root/reference/assets/mpc.csv, BASELINE.md): mean |geometric cross-track
error| comparable to 0.0501 m, max below its 0.472 m.
"""

import numpy as np
import pytest

from mpc_ros_tpu.config import MPCParams, PlannerConfig, SolverConfig
from mpc_ros_tpu.planner import MPCPlanner
from mpc_ros_tpu.sim import (get_shape, infinity, run_closed_loop,
                             read_tracking_csv)


def make_planner(n_steps=20):
    p = MPCParams(dt=0.1, ref_vel=0.5, max_angvel=1.5, w_cte=300.0,
                  w_angvel_d=10.0, w_accel_d=10.0)
    return MPCPlanner(
        params=p, solver_cfg=SolverConfig(n_steps=n_steps),
        planner_cfg=PlannerConfig(local_plan_length=2.5))


def geo_error(plan, poses):
    return np.array(
        [np.min(np.hypot(plan[:, 0] - q[0], plan[:, 1] - q[1])) for q in poses])


@pytest.mark.parametrize("shape,max_cycles,mean_bar,max_bar", [
    ("infinity", 1200, 0.08, 0.25),
    ("epitrochoid", 2500, 0.10, 0.40),
    # square: corner fillets cut by up to ~0.45 m; the reference's own max
    # logged cte is 0.472 (BASELINE.md), so 0.5 is the parity bar
    ("square", 1500, 0.08, 0.50),
])
def test_tracks_reference_shapes(shape, max_cycles, mean_bar, max_bar):
    plan = get_shape(shape)
    planner = make_planner()
    res = run_closed_loop(planner, plan, max_cycles=max_cycles)
    assert res.reached, f"{shape}: goal not reached in {max_cycles} cycles"
    d = geo_error(plan, res.poses)
    assert d.mean() < mean_bar, f"{shape}: mean geo error {d.mean():.4f}"
    assert d.max() < max_bar, f"{shape}: max geo error {d.max():.4f}"
    assert np.all(np.isfinite(res.records))


def test_csv_log_schema_roundtrip(tmp_path):
    plan = infinity(n_points=400)
    planner = make_planner(n_steps=20)
    path = str(tmp_path / "mpc.csv")
    res = run_closed_loop(planner, plan, max_cycles=1200, log_path=path)
    assert res.reached
    with open(path) as f:
        header = f.readline().strip()
    # exact reference header (/root/reference/assets/mpc.csv:1)
    assert header == "idx,cte,etheta,cmd_vel.linear.x,cmd_vel.angular.z"
    rec, course_time = read_tracking_csv(path)
    assert rec.shape[1] == 5
    assert abs(course_time - res.course_time_s) < 1e-6
    # the reference CSVs parse with the same reader
    ref_rec, ref_time = read_tracking_csv("/root/reference/assets/mpc.csv")
    assert ref_rec.shape == (365, 5)
    assert abs(ref_time - 143.345) < 1e-6


def test_course_time_beats_reference_pace():
    """Reference NMPC course: 143.3 s for a ~14-15 m course at ref 0.5 m/s
    class speeds. Ours must complete its course at comparable-or-better
    average speed (course_length / course_time)."""
    plan = infinity(n_points=600, scale=3.0)
    course_len = float(np.sum(np.hypot(np.diff(plan[:, 0]), np.diff(plan[:, 1]))))
    planner = make_planner()
    res = run_closed_loop(planner, plan, max_cycles=1200)
    assert res.reached
    avg_speed = course_len / res.course_time_s
    # reference logged mean commanded 0.735 at ref 0.8ish; at ref_vel 0.5 we
    # expect >= 0.25 m/s average including rotate/stop phases
    assert avg_speed > 0.25, f"avg speed {avg_speed:.3f}"


def test_delay_mode_off_still_tracks():
    plan = infinity(n_points=400)
    p = MPCParams(dt=0.1, ref_vel=0.5, max_angvel=1.5, w_cte=300.0)
    planner = MPCPlanner(
        params=p, solver_cfg=SolverConfig(n_steps=20),
        planner_cfg=PlannerConfig(local_plan_length=2.5, delay_mode=False))
    res = run_closed_loop(planner, plan, max_cycles=1200)
    assert res.reached
    d = geo_error(plan, res.poses)
    assert d.mean() < 0.12
