"""Planner-level obstacle avoidance: world-frame blobs through the lifecycle.

The reference wired a costmap into the planner but never used it in the NLP
(SURVEY.md C1); here world-frame GaussianObstacles installed with
`MPCPlanner.set_obstacles` are transformed into the robot frame each
Tracking cycle and enter the solver's cost (and DWA's clearance scoring).
"""

import numpy as np
import pytest

from mpc_ros_tpu.config import MPCParams, PlannerConfig, SolverConfig
from mpc_ros_tpu.models.obstacles import GaussianObstacles
from mpc_ros_tpu.planner import DWAPlanner, MPCPlanner
from mpc_ros_tpu.sim import run_closed_loop


def straight_plan(length=6.0, n=120):
    x = np.linspace(0.0, length, n)
    return np.stack([x, np.zeros(n), np.zeros(n)], -1)


def make_blob(dtype=np.float32):
    import jax.numpy as jnp

    # slightly off-center so avoidance has a preferred side
    return GaussianObstacles.from_sigmas(
        cx=jnp.asarray([3.0], dtype), cy=jnp.asarray([0.05], dtype),
        sigma=jnp.asarray([0.3], dtype), w=jnp.asarray([50.0], dtype))


def min_dist_to_blob(poses):
    return float(np.min(np.hypot(poses[:, 0] - 3.0, poses[:, 1] - 0.05)))


def test_to_frame_roundtrip():
    import jax.numpy as jnp

    blobs = make_blob()
    pose = (1.0, -2.0, 0.7)
    local = blobs.to_frame(pose)
    # transform the local center back to world coordinates
    ct, st = np.cos(pose[2]), np.sin(pose[2])
    cx = float(local.cx[0]) * ct - float(local.cy[0]) * st + pose[0]
    cy = float(local.cx[0]) * st + float(local.cy[0]) * ct + pose[1]
    assert abs(cx - 3.0) < 1e-5 and abs(cy - 0.05) < 1e-5
    assert float(local.gamma[0]) == pytest.approx(float(blobs.gamma[0]))


def _setup(kind):
    p = MPCParams(dt=0.1, ref_vel=0.5, max_angvel=1.5,
                  w_angvel_d=10.0, w_accel_d=10.0)
    pcfg = PlannerConfig(local_plan_length=2.5)
    if kind == "mpc":
        return lambda: MPCPlanner(params=p, planner_cfg=pcfg,
                                  solver_cfg=SolverConfig(n_steps=20))
    return lambda: DWAPlanner(params=p, planner_cfg=pcfg)


def test_mpc_swerves_around_blocking_obstacle():
    """NMPC resolves an obstacle sitting ON the global plan locally: the
    solver's trajectory optimization swerves around it and still reaches
    the goal — the capability a plan-following local planner lacks."""
    plan = straight_plan()
    mk = _setup("mpc")

    res0 = run_closed_loop(mk(), plan, max_cycles=600)
    assert res0.reached
    d0 = min_dist_to_blob(res0.poses)
    assert d0 < 0.12  # drives straight through the blob site

    avoider = mk()
    avoider.initialize()
    avoider.set_obstacles(make_blob())
    res1 = run_closed_loop(avoider, plan, max_cycles=900)
    assert res1.reached, "goal not reached with obstacle"
    d1 = min_dist_to_blob(res1.poses)
    assert d1 > d0 + 0.1, f"no avoidance (d0={d0:.3f}, d1={d1:.3f})"
    assert d1 > 0.2, f"clearance too small ({d1:.3f})"


def test_dwa_vetoes_collision_and_holds_clearance():
    """DWA is a plan follower: with the global plan running THROUGH the
    obstacle it cannot re-route (in the reference stack move_base's global
    replanning handles this), but the collision veto must keep every
    executed pose outside the lethal radius — the safety property DWA
    actually guarantees. The NMPC planner passes the same course
    (test above): a capability A/B the reference could only show between
    separate ROS plugins."""
    plan = straight_plan()
    pl = _setup("dwa")()
    pl.initialize()
    pl.set_obstacles(make_blob())
    res = run_closed_loop(pl, plan, max_cycles=400)
    assert len(res.poses)
    # never enters the veto radius (blob cost 25 of peak 50 ~ 0.35 m)
    assert min_dist_to_blob(res.poses) > 0.35
    # and it makes real progress toward the obstacle before holding off
    assert res.poses[:, 0].max() > 1.5


def test_set_obstacles_none_clears():
    """set_obstacles(None) must actually clear the tracker's robot-frame
    snapshot: after clearing, the planner drives straight through the old
    blob site instead of repelling from a phantom glued to the robot."""
    plan = straight_plan()
    pl = _setup("mpc")()
    pl.initialize()
    pl.set_obstacles(make_blob())
    res1 = run_closed_loop(pl, plan, max_cycles=200)
    assert pl.tracker.obstacles is not None

    pl2 = _setup("mpc")()
    pl2.initialize()
    pl2.set_obstacles(make_blob())
    pl2.set_plan(plan, plan[0])
    pl2.compute_velocity_commands(plan[0], (0.2, 0.0))
    assert pl2.tracker.obstacles is not None
    pl2.set_obstacles(None)
    pl2.compute_velocity_commands(plan[0], (0.2, 0.0))
    assert pl2.tracker.obstacles is None


def test_moving_obstacle_per_cycle_updates():
    """Dynamic obstacles: set_obstacles is called EVERY cycle with the
    current world-frame position (constant leaf shapes -> no recompile);
    the robot yields to a pedestrian crossing its path where the
    obstacle-blind run would nearly hit them."""
    import time

    import jax.numpy as jnp

    n = 100
    plan = np.stack([np.linspace(0, 6, n), np.zeros(n), np.zeros(n)], 1)
    p = MPCParams(dt=0.1, ref_vel=0.5, max_angvel=1.5,
                  w_angvel_d=10.0, w_accel_d=10.0)

    def run(avoid):
        planner = MPCPlanner(params=p, solver_cfg=SolverConfig(n_steps=20),
                             planner_cfg=PlannerConfig(local_plan_length=2.5))
        planner.initialize()
        pose = plan[0].copy()
        planner.set_plan(plan, pose)
        vw = (0.0, 0.0)
        min_d = np.inf
        t1 = time.perf_counter()
        cyc_times = []
        for cyc in range(400):
            t = cyc * 0.1
            ped = np.array([3.0, 1.2 - 0.18 * t])  # crosses y=0 at ~6.7 s
            if avoid:
                planner.set_obstacles(GaussianObstacles.from_sigmas(
                    jnp.asarray([ped[0]]), jnp.asarray([ped[1]]),
                    jnp.asarray([0.3]), jnp.asarray([60.0])))
            t0 = time.perf_counter()
            ok, (v, w), _ = planner.compute_velocity_commands(pose, vw)
            cyc_times.append(time.perf_counter() - t0)
            assert ok
            pose = pose + np.array([v * np.cos(pose[2]) * 0.1,
                                    v * np.sin(pose[2]) * 0.1, w * 0.1])
            vw = (v, w)
            min_d = min(min_d, float(np.hypot(pose[0] - ped[0],
                                              pose[1] - ped[1])))
            if pose[0] > 5.5:
                break
        return min_d, pose, np.asarray(cyc_times)

    d_avoid, pose_a, ct = run(True)
    d_blind, pose_b, _ = run(False)
    assert pose_a[0] > 5.5 and pose_b[0] > 5.5     # both complete
    assert d_blind < 0.35, d_blind                 # near-miss without blobs
    assert d_avoid > 0.45, d_avoid                 # real clearance with them
    # per-cycle updates must not recompile: steady cycles stay in the ms
    # range (a recompile would be seconds even on CPU)
    assert float(np.median(ct[5:])) < 0.2


def test_set_costmap_routes_match_explicit_fit():
    """MPCPlanner.set_costmap / FleetPlanner.set_costmaps (the production
    costmap doors) must equal fitting explicitly and calling
    set_obstacles — same blobs, same commands."""
    import jax
    import jax.numpy as jnp

    from mpc_ros_tpu.models.obstacles import (fit_gaussians_to_map,
                                              fit_gaussians_to_maps,
                                              gaussian_blob_map)
    from mpc_ros_tpu.planner import FleetPlanner

    plan = straight_plan()
    omap = gaussian_blob_map((3.0, 0.2), sigma=0.3, extent=8.0,
                             weight=50.0)

    mk = _setup("mpc")
    outs = []
    for route in ("costmap", "explicit"):
        pl = mk()
        pl.initialize()
        pose = plan[0].copy()
        pl.set_plan(plan, pose)
        if route == "costmap":
            pl.set_costmap(omap, refine=False)
        else:
            pl.set_obstacles(fit_gaussians_to_map(omap, 4, refine=False))
        ok, cmd, _ = pl.compute_velocity_commands(pose, (0.2, 0.0))
        assert ok
        outs.append(cmd)
    np.testing.assert_allclose(outs[0], outs[1], rtol=0, atol=0)

    # fleet twin: batched maps through set_costmaps == explicit batched fit
    B = 4
    omaps = jax.tree.map(lambda a: jnp.broadcast_to(a[None],
                                                    (B,) + a.shape), omap)
    p = MPCParams(dt=0.1, ref_vel=0.5, max_angvel=1.5,
                  w_angvel_d=10.0, w_accel_d=10.0)
    cmds = []
    for route in ("costmaps", "explicit"):
        fp = FleetPlanner(params=p, solver_cfg=SolverConfig(n_steps=12),
                          planner_cfg=PlannerConfig(local_plan_length=2.5))
        fp.initialize(B)
        poses = np.stack([plan[0]] * B)
        assert fp.set_plans([plan] * B, poses).all()
        if route == "costmaps":
            fp.set_costmaps(omaps)
        else:
            fp.set_obstacles(fit_gaussians_to_maps(omaps, 4))
        _, cmd, _ = fp.compute_velocity_commands(poses, np.zeros((B, 2)))
        cmds.append(cmd)
    np.testing.assert_allclose(cmds[0], cmds[1], rtol=0, atol=0)
