#!/usr/bin/env python
"""Why is tracker.compute ~20 ms slower than the bare packed solve?
Replicate the tracker's exact packed call outside the class and compare;
report n_iters of the warm solve."""

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
    from mpc_ros_tpu.planner.tracking import _cycle_jit
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
    ok, cmd, info = pl.compute_velocity_commands(pose, (0.3, 0.0))
    out = {"warm_iters_first": int(info.tracking.solve.n_iters)}
    ok, cmd, info = pl.compute_velocity_commands(pose, (0.3, 0.0))
    out["warm_iters_steady"] = int(info.tracking.solve.n_iters)
    out["conv"] = bool(info.tracking.solve.converged)

    # replicate the packed call with the tracker's own inp/params
    tr = pl.tracker
    dbg = info.tracking
    inp = np.zeros(6 + cfg.n_coeffs + 1)
    inp[:6] = dbg.state
    inp[6:6 + cfg.n_coeffs] = dbg.coeffs
    inp[6 + cfg.n_coeffs] = dbg.ref_vel
    cyc = _cycle_jit(cfg, False, False)
    st = {"carry": tr._warm_dev}

    def packed():
        flat, st["carry"] = cyc(jnp.asarray(inp, dtype), st["carry"],
                                tr.params)
        np.asarray(jax.device_get(flat))

    out["packed_same_inputs"] = stats(packed)

    ref_plan = plan_utils.downsample_plan(
        plan_utils.truncate_by_length(
            plan_utils.cutoff_plan(pl.global_plan, pose[:2]), 2.5), 10)
    out["tracker_compute"] = stats(
        lambda: tr.compute(pose, pl.goal, 0.3, ref_plan))

    # MPCParams defaults for comparison (diag_lat2 shape)
    p0 = MPCParams().astype(dtype)
    st2 = {"carry": jnp.zeros((cfg.n_controls, 2), dtype)}

    def packed_defaults():
        flat, st2["carry"] = cyc(jnp.asarray(inp, dtype), st2["carry"], p0)
        np.asarray(jax.device_get(flat))

    out["packed_default_params"] = stats(packed_defaults)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
