#!/usr/bin/env python
"""Planner-cycle breakdown: host pipeline vs tracker.compute vs solve."""

import json
import time

import numpy as np

import jax
import jax.numpy as jnp


def stats(f, n=50, warm=2):
    for _ in range(warm):
        f()
    ls = []
    for _ in range(n):
        t0 = time.time()
        f()
        ls.append(time.time() - t0)
    a = np.asarray(ls) * 1e3
    return {"p50": round(float(np.percentile(a, 50)), 2),
            "p99": round(float(np.percentile(a, 99)), 2)}


def main():
    import sys
    sys.path.insert(0, ".")
    from mpc_ros_tpu.config import MPCParams, SolverConfig
    from mpc_ros_tpu.planner import plan_utils
    from mpc_ros_tpu.planner.planner import MPCPlanner
    from mpc_ros_tpu.sim import get_shape

    dtype = jnp.float32
    pparams = MPCParams(max_angvel=1.5, w_cte=300.0, w_angvel_d=10.0,
                        w_accel_d=10.0)
    cfg = SolverConfig(n_steps=30)
    pl = MPCPlanner(params=pparams, solver_cfg=cfg, dtype=dtype)
    pl.initialize()
    plan = get_shape("infinity")
    pose = np.array([plan[40, 0], plan[40, 1], plan[40, 2]])
    pl.set_plan(plan, pose)
    pl.compute_velocity_commands(pose, (0.3, 0.0))

    out = {}
    out["full_cycle"] = stats(
        lambda: pl.compute_velocity_commands(pose, (0.3, 0.0)))

    # host pipeline alone
    def host_pipe():
        cut = plan_utils.cutoff_plan(pl.global_plan, pose[:2])
        cut = plan_utils.truncate_by_length(
            cut, pl.planner_cfg.local_plan_length)
        plan_utils.downsample_plan(cut, pl.planner_cfg.downsample_segments)
        pl._is_position_reached(pose)
        return cut

    out["host_pipeline"] = stats(host_pipe)

    cut = host_pipe()
    ref_plan = plan_utils.downsample_plan(
        cut, pl.planner_cfg.downsample_segments)
    out["tracker_compute"] = stats(
        lambda: pl.tracker.compute(pose, pl.goal, 0.3, ref_plan,
                                   raw_plan=cut))

    # tracker.compute minus the device part: host prep only (native fit)
    from mpc_ros_tpu.native.runtime import plan_fit

    out["native_plan_fit"] = stats(
        lambda: plan_fit(ref_plan[:, :2],
                         (pose[0], pose[1], pose[2]), 3))
    print(json.dumps(out))


if __name__ == "__main__":
    main()
