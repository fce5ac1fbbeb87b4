"""Closed-loop trajectory-tracking tests (the upstream
`ref_trajectory_tracking` capability, /root/reference/README.md:43-46).

Path tracking is judged on cross-track error; trajectory tracking on
distance to the MOVING reference point and on schedule (lag) recovery.
These tests close VERDICT round-1 item 1: TrajectoryTracker.compute /
finished exercised end-to-end through run_trajectory_tracking, with
dist_to_ref envelopes on all three timed courses, a forced-disturbance
schedule-recovery case, and the CSV log schema.
"""

import numpy as np
import pytest

from mpc_ros_tpu.config import MPCParams, PlannerConfig, SolverConfig
from mpc_ros_tpu.planner.trajectory import TimedTrajectory, TrajectoryTracker
from mpc_ros_tpu.sim import get_shape, read_tracking_csv
from mpc_ros_tpu.sim.simulator import run_trajectory_tracking


def make_tracker(**kw):
    p = MPCParams(dt=0.1, max_angvel=1.5, w_cte=300.0,
                  w_angvel_d=10.0, w_accel_d=10.0)
    return TrajectoryTracker(p, SolverConfig(n_steps=20),
                             PlannerConfig(local_plan_length=2.5), **kw)


@pytest.mark.parametrize("shape,speed,mean_bar,max_bar", [
    ("infinity", 0.4, 0.25, 0.55),
    ("epitrochoid", 0.35, 0.25, 0.60),
    # square corners force the schedule to wait out the turn; the moving
    # point keeps going, so the worst-case distance is corner-dominated
    ("square", 0.35, 0.30, 0.80),
])
def test_tracks_timed_courses(shape, speed, mean_bar, max_bar):
    plan = get_shape(shape)
    traj = TimedTrajectory.from_path(plan, speed)
    tracker = make_tracker()
    res = run_trajectory_tracking(tracker, traj, max_cycles=4000)
    assert res.reached, f"{shape}: schedule end not reached"
    d = res.dist_to_ref
    assert d.mean() < mean_bar, f"{shape}: mean dist_to_ref {d.mean():.3f}"
    assert d.max() < max_bar, f"{shape}: max dist_to_ref {d.max():.3f}"
    # the closed loop should finish within ~15% of the schedule duration
    assert res.course_time_s < 1.15 * traj.duration + 2.0
    assert np.all(np.isfinite(res.records))


def test_schedule_recovery_after_disturbance():
    """Start 0.8 m BEHIND the schedule start: the catch-up term must engage
    (commanded speed above the feedforward profile) and shrink the lag."""
    plan = get_shape("infinity")
    traj = TimedTrajectory.from_path(plan, 0.3)
    tracker = make_tracker()
    # displace the start pose backwards along the initial tangent
    yaw0 = traj.yaw[0]
    start = np.array([traj.xy[0, 0] - 0.8 * np.cos(yaw0),
                      traj.xy[0, 1] - 0.8 * np.sin(yaw0), yaw0])
    res = run_trajectory_tracking(tracker, traj, start_pose=start,
                                  max_cycles=4000)
    assert res.reached
    lags = res.lags
    assert lags[0] > 0.6, "test setup: should start well behind schedule"
    # lag must shrink to near zero within the first quarter of the run
    k = max(len(lags) // 4, 10)
    assert np.abs(lags[k:]).max() < 0.35, (
        f"lag never recovered: max |lag| after cycle {k} = "
        f"{np.abs(lags[k:]).max():.3f}")
    # catch-up actually engaged: early commanded speeds exceed the profile
    v_cmd = res.records[:k, 3]
    assert v_cmd.max() > 0.3 + 0.05, "catch-up term never raised the speed"


def test_catchup_gain_zero_stays_behind():
    """Control experiment for the catch-up term: with gain=0 the lag from a
    displaced start persists (pure feedforward cannot recover a schedule)."""
    plan = get_shape("infinity")
    traj = TimedTrajectory.from_path(plan, 0.3)
    yaw0 = traj.yaw[0]
    start = np.array([traj.xy[0, 0] - 0.8 * np.cos(yaw0),
                      traj.xy[0, 1] - 0.8 * np.sin(yaw0), yaw0])
    tracker = make_tracker(catchup_gain=0.0)
    res = run_trajectory_tracking(tracker, traj, start_pose=start,
                                  max_cycles=int(traj.duration / 0.1) + 5)
    mid = len(res.lags) // 2
    # the lag partially decays even open-loop (the fit window is anchored
    # at the moving point), but a substantial residual must persist where
    # the catch-up run drives it under 0.1 within the same horizon
    assert res.lags[mid:].mean() > 0.25, (
        "without catch-up the lag should persist — if this fails the "
        "recovery test above is not actually testing the catch-up term")
    assert res.lags[-20:].mean() > 0.25, "lag fully recovered with gain=0"


def test_finished_stop_rule():
    plan = get_shape("infinity")[:80]
    traj = TimedTrajectory.from_path(plan, 0.4)
    tracker = make_tracker()
    tracker.set_trajectory(traj)
    goal = traj.xy[-1]
    far = goal + np.array([5.0, 0.0])
    # before the schedule end: never finished, even at the goal point
    assert not tracker.finished(0.0, np.array([goal[0], goal[1], 0.0]))
    # after the end: finished only inside the xy tolerance
    t_end = traj.t[-1] + 1.0
    assert tracker.finished(t_end, np.array([goal[0], goal[1], 0.0]))
    assert not tracker.finished(t_end, np.array([far[0], far[1], 0.0]))


def test_from_path_filters_duplicate_waypoints():
    """Planner output frequently repeats waypoints (ADVICE r1): zero-length
    segments must be dropped, not crash the strictly-increasing check."""
    plan = get_shape("infinity")[:50]
    dup = np.repeat(plan, 2, axis=0)  # every waypoint doubled
    traj = TimedTrajectory.from_path(dup, 0.4)
    assert np.all(np.diff(traj.t) > 0)
    ref = TimedTrajectory.from_path(plan, 0.4)
    assert np.allclose(traj.xy, ref.xy)
    assert abs(traj.duration - ref.duration) < 1e-9


def test_near_end_fit_is_well_conditioned(recwarn):
    """Past the schedule end sample() clamps knots onto the final waypoint;
    the polyfit degree must drop with the distinct-abscissa count instead
    of emitting RankWarning cubics (ADVICE r1 low)."""
    import warnings

    plan = get_shape("infinity")[:60]
    traj = TimedTrajectory.from_path(plan, 0.4)
    tracker = make_tracker()
    tracker.set_trajectory(traj)
    pose = np.array([traj.xy[-1, 0] - 0.05, traj.xy[-1, 1], traj.yaw[-1]])
    with warnings.catch_warnings():
        warnings.simplefilter("error", np.exceptions.RankWarning)
        # 1.5 s before the end: most of the window is clamped to the goal
        (v, w), dbg = tracker.compute(float(traj.t[-1]) - 1.5, pose, 0.3)
    assert np.all(np.isfinite(dbg.coeffs))
    assert np.isfinite(v) and np.isfinite(w)


def test_trajectory_csv_log_schema(tmp_path):
    plan = get_shape("infinity")[:100]
    traj = TimedTrajectory.from_path(plan, 0.4)
    tracker = make_tracker()
    path = str(tmp_path / "traj.csv")
    res = run_trajectory_tracking(tracker, traj, max_cycles=2000,
                                  log_path=path)
    assert res.reached
    with open(path) as f:
        header = f.readline().strip()
    # exact reference header (/root/reference/assets/mpc.csv:1)
    assert header == "idx,cte,etheta,cmd_vel.linear.x,cmd_vel.angular.z"
    rec, course_time = read_tracking_csv(path)
    assert rec.shape[1] == 5
    assert abs(course_time - res.course_time_s) < 1e-6


def test_fleet_trajectory_tracker_closed_loop():
    """B robots chase B timed references with ONE batched solve per cycle
    (FleetTrajectoryTracker); every robot must finish on schedule with a
    bounded distance to its moving reference point."""
    from mpc_ros_tpu.planner.trajectory import FleetTrajectoryTracker

    B = 6
    base = get_shape("infinity")[:240]
    trajs = []
    for i in range(B):
        pl = base.copy()
        pl[:, :2] += 3.0 * i
        trajs.append(TimedTrajectory.from_path(pl, 0.35 + 0.02 * i))

    p = MPCParams(dt=0.1, max_angvel=1.5, w_cte=300.0,
                  w_angvel_d=10.0, w_accel_d=10.0)
    tr = FleetTrajectoryTracker(p, SolverConfig(n_steps=20),
                                PlannerConfig(local_plan_length=2.5))
    tr.set_trajectories(trajs)

    poses = np.stack([t.xy[0] for t in trajs])
    poses = np.concatenate([poses, np.array([[t.yaw[0]] for t in trajs])], 1)
    vs = np.zeros(B)
    dt = 0.1
    max_d = np.zeros(B)
    sum_d = np.zeros(B)
    n = 0
    for cycle in range(3000):
        t_now = cycle * dt
        fin = tr.finished(t_now, poses)
        if fin.all():
            break
        cmds, lags = tr.compute(t_now, poses, vs)
        ref_now, _, _ = tr._sample(np.full((B, 1), t_now))
        d = np.hypot(poses[:, 0] - ref_now[:, 0, 0],
                     poses[:, 1] - ref_now[:, 0, 1])
        max_d = np.maximum(max_d, d)
        sum_d += d
        n += 1
        v, w = cmds[:, 0], cmds[:, 1]
        poses[:, 0] += dt * v * np.cos(poses[:, 2])
        poses[:, 1] += dt * v * np.sin(poses[:, 2])
        poses[:, 2] += dt * w
        vs = v
    assert fin.all(), f"not all robots finished: {fin}"
    mean_d = sum_d / max(n, 1)
    assert mean_d.max() < 0.3, f"mean dist_to_ref per robot: {mean_d}"
    assert max_d.max() < 0.7, f"max dist_to_ref per robot: {max_d}"


def test_fleet_trajectory_device_matches_host():
    """pipeline="device" (one-jit cycle, device-resident warm bank) ==
    pipeline="host" command-for-command over several cycles."""
    from mpc_ros_tpu.planner.trajectory import FleetTrajectoryTracker

    B = 8
    base = get_shape("infinity")[:240]
    trajs = []
    for i in range(B):
        pl = base.copy()
        pl[:, :2] += 3.0 * i
        trajs.append(TimedTrajectory.from_path(pl, 0.35 + 0.02 * i))
    p = MPCParams(dt=0.1, max_angvel=1.5, w_cte=300.0,
                  w_angvel_d=10.0, w_accel_d=10.0)
    kw = dict(planner_cfg=PlannerConfig(local_plan_length=2.5))
    host = FleetTrajectoryTracker(p, SolverConfig(n_steps=20), **kw)
    dev = FleetTrajectoryTracker(p, SolverConfig(n_steps=20),
                                 pipeline="device", **kw)
    host.set_trajectories(trajs)
    dev.set_trajectories(trajs)
    poses = np.stack([t.xy[0] for t in trajs])
    poses = np.concatenate([poses, np.array([[t.yaw[0]] for t in trajs])], 1)
    vs = np.zeros(B)
    dt = 0.1
    for cycle in range(5):
        t_now = cycle * dt
        cmd_h, lag_h = host.compute(t_now, poses, vs)
        cmd_d, lag_d = dev.compute(t_now, poses, vs)
        assert np.max(np.abs(cmd_h - cmd_d)) < 2e-3, cycle
        assert np.max(np.abs(np.asarray(lag_h) - np.asarray(lag_d))) < 1e-3
        v, w = cmd_h[:, 0], cmd_h[:, 1]
        poses[:, 0] += dt * v * np.cos(poses[:, 2])
        poses[:, 1] += dt * v * np.sin(poses[:, 2])
        poses[:, 2] += dt * w
        vs = v


def test_trajectory_tracker_avoids_obstacle_on_schedule():
    """Obstacle-aware trajectory tracking (round 4): a pedestrian crosses
    the timed reference path. With per-cycle set_obstacles the tracker
    yields (real clearance) and still completes the course close to
    schedule; obstacle-blind it nearly hits the pedestrian. A STATIC blob
    parked forever on the reference is intentionally not the scenario:
    there the correct behavior is to stop and wait (the reference pull,
    schedule catch-up, and repulsion balance), which asserts nothing
    about avoidance."""
    import jax.numpy as jnp

    from mpc_ros_tpu.models.obstacles import GaussianObstacles

    n = 120
    plan = np.stack([np.linspace(0, 6, n), np.zeros(n), np.zeros(n)], 1)
    traj = TimedTrajectory.from_path(plan, 0.4)

    def run(avoid):
        p = MPCParams(dt=0.1, max_angvel=1.5, w_cte=100.0,
                      w_angvel_d=10.0, w_accel_d=10.0)
        tr = TrajectoryTracker(p, SolverConfig(n_steps=20),
                               PlannerConfig(local_plan_length=2.5))
        tr.set_trajectory(traj)
        pose = np.array([0.0, 0.0, 0.0])
        v = 0.0
        dt = 0.1
        min_d, t_done = np.inf, None
        for cycle in range(600):
            t_now = cycle * dt
            ped = np.array([3.0, 1.0 - 0.15 * t_now])  # crosses y=0 at ~6.7 s
            if avoid:
                tr.set_obstacles(GaussianObstacles.from_sigmas(
                    jnp.asarray([ped[0]], jnp.float32),
                    jnp.asarray([ped[1]], jnp.float32),
                    jnp.asarray([0.35], jnp.float32),
                    jnp.asarray([120.0], jnp.float32)))
            (v_cmd, w_cmd), dbg = tr.compute(t_now, pose, v)
            pose = pose + np.array([v_cmd * np.cos(pose[2]) * dt,
                                    v_cmd * np.sin(pose[2]) * dt,
                                    w_cmd * dt])
            v = v_cmd
            min_d = min(min_d, float(np.hypot(pose[0] - ped[0],
                                              pose[1] - ped[1])))
            if pose[0] > 5.5:
                t_done = t_now
                break
        return min_d, pose, t_done

    d_avoid, pose_a, t_a = run(True)
    d_blind, pose_b, t_b = run(False)
    assert t_a is not None and t_b is not None        # both complete
    assert d_blind < 0.35, d_blind                    # blind: near-miss
    assert d_avoid > 0.50, d_avoid                    # aware: real clearance
    # yielding costs schedule time, but the catch-up recovers most of it
    assert t_a - t_b < 3.0, (t_a, t_b)


def test_fleet_trajectory_obstacles_device_matches_host():
    """Fleet obstacle-aware trajectory tracking: device pipeline ==
    host pipeline with per-robot world obstacles, and the obstacle terms
    actually change the commands."""
    import jax.numpy as jnp

    from mpc_ros_tpu.models.obstacles import GaussianObstacles
    from mpc_ros_tpu.planner.trajectory import FleetTrajectoryTracker

    B = 4
    base = get_shape("infinity")[:240]
    trajs = []
    for i in range(B):
        pl = base.copy()
        pl[:, :2] += 3.0 * i
        trajs.append(TimedTrajectory.from_path(pl, 0.35))
    p = MPCParams(dt=0.1, max_angvel=1.5, w_cte=300.0,
                  w_angvel_d=10.0, w_accel_d=10.0)
    kw = dict(planner_cfg=PlannerConfig(local_plan_length=2.5))
    # per-robot blob just ahead on each course
    ref1, _, _ = None, None, None
    blobs = None

    def mk(pipeline):
        tr = FleetTrajectoryTracker(p, SolverConfig(n_steps=20),
                                    pipeline=pipeline, **kw)
        tr.set_trajectories(trajs)
        return tr

    host = mk("host")
    dev = mk("device")
    plain = mk("host")
    poses = np.stack([t.xy[0] for t in trajs])
    poses = np.concatenate([poses, np.array([[t.yaw[0]] for t in trajs])], 1)
    vs = np.zeros(B)
    dt = 0.1
    # obstacle at the 1-second-ahead reference point of each robot
    ahead, _, _ = host._sample(np.full((B, 1), 1.0))
    blobs = GaussianObstacles.from_sigmas(
        jnp.asarray(ahead[:, 0, 0:1], jnp.float32),
        jnp.asarray(ahead[:, 0, 1:2], jnp.float32),
        jnp.full((B, 1), 0.3, jnp.float32),
        jnp.full((B, 1), 40.0, jnp.float32))
    host.set_obstacles(blobs)
    dev.set_obstacles(blobs)
    for cycle in range(4):
        t_now = cycle * dt
        cmd_h, _ = host.compute(t_now, poses, vs)
        cmd_d, _ = dev.compute(t_now, poses, vs)
        cmd_p, _ = plain.compute(t_now, poses, vs)
        assert np.max(np.abs(cmd_h - cmd_d)) < 2e-3, cycle
        v, w = cmd_h[:, 0], cmd_h[:, 1]
        poses[:, 0] += dt * v * np.cos(poses[:, 2])
        poses[:, 1] += dt * v * np.sin(poses[:, 2])
        poses[:, 2] += dt * w
        vs = v
    # the blobs must matter by the time the robots approach them
    assert np.max(np.abs(cmd_h - cmd_p)) > 1e-4


def test_fleet_trajectory_sharded_matches_unsharded():
    """Round-5 (VERDICT r4 item 3): the one-jit device cycle under a data
    mesh (B/D robots per device via shard_map, zero control-path
    collectives) == the unsharded device cycle command-for-command over
    several warm cycles."""
    from mpc_ros_tpu.parallel import make_mesh
    from mpc_ros_tpu.planner.trajectory import FleetTrajectoryTracker

    B = 16
    base = get_shape("infinity")[:240]
    trajs = []
    for i in range(B):
        pl = base.copy()
        pl[:, :2] += 3.0 * i
        trajs.append(TimedTrajectory.from_path(pl, 0.35 + 0.01 * i))
    p = MPCParams(dt=0.1, max_angvel=1.5, w_cte=300.0,
                  w_angvel_d=10.0, w_accel_d=10.0)
    kw = dict(planner_cfg=PlannerConfig(local_plan_length=2.5),
              pipeline="device")
    plain = FleetTrajectoryTracker(p, SolverConfig(n_steps=20), **kw)
    shard = FleetTrajectoryTracker(p, SolverConfig(n_steps=20),
                                   mesh=make_mesh(n_data=4), **kw)
    plain.set_trajectories(trajs)
    shard.set_trajectories(trajs)
    poses = np.stack([t.xy[0] for t in trajs])
    poses = np.concatenate([poses, np.array([[t.yaw[0]] for t in trajs])], 1)
    vs = np.zeros(B)
    dt = 0.1
    for cycle in range(4):
        t_now = cycle * dt
        cmd_p, lag_p = plain.compute(t_now, poses, vs)
        cmd_s, lag_s = shard.compute(t_now, poses, vs)
        # identical program per robot; only the device placement differs
        assert np.max(np.abs(cmd_p - cmd_s)) < 1e-5, cycle
        assert np.max(np.abs(np.asarray(lag_p) - np.asarray(lag_s))) < 1e-5
        v, w = cmd_p[:, 0], cmd_p[:, 1]
        poses[:, 0] += dt * v * np.cos(poses[:, 2])
        poses[:, 1] += dt * v * np.sin(poses[:, 2])
        poses[:, 2] += dt * w
        vs = v


def test_fleet_trajectory_obs_tile_device_matches_host():
    """Round-5: the fleet trajectory tracker's per-robot observability
    tile (obs_every — the DeviceFleetPlanner pattern: cte, etheta,
    ref_v0, cost, converged, iters) matches between the host and device
    pipelines, and is None on skipped cycles."""
    from mpc_ros_tpu.planner.trajectory import FleetTrajectoryTracker

    B = 8
    base = get_shape("infinity")[:240]
    trajs = []
    for i in range(B):
        pl = base.copy()
        pl[:, :2] += 3.0 * i
        trajs.append(TimedTrajectory.from_path(pl, 0.35 + 0.02 * i))
    p = MPCParams(dt=0.1, max_angvel=1.5, w_cte=300.0,
                  w_angvel_d=10.0, w_accel_d=10.0)
    kw = dict(planner_cfg=PlannerConfig(local_plan_length=2.5),
              obs_every=2)
    host = FleetTrajectoryTracker(p, SolverConfig(n_steps=20), **kw)
    dev = FleetTrajectoryTracker(p, SolverConfig(n_steps=20),
                                 pipeline="device", **kw)
    host.set_trajectories(trajs)
    dev.set_trajectories(trajs)
    poses = np.stack([t.xy[0] for t in trajs])
    poses = np.concatenate([poses, np.array([[t.yaw[0]] for t in trajs])], 1)
    vs = np.zeros(B)
    for cycle in range(3):
        host.compute(cycle * 0.1, poses, vs)
        dev.compute(cycle * 0.1, poses, vs)
        if cycle % 2 == 0:
            assert host.last_obs is not None and dev.last_obs is not None
            assert host.last_obs.shape == (6, B)
            # cte/etheta/ref_v0 rows: f32-vs-f64 pipeline noise only
            np.testing.assert_allclose(dev.last_obs[:3], host.last_obs[:3],
                                       atol=2e-3)
            # conv flags equal; iteration counts within one certificate
            # flip; costs to solver noise
            np.testing.assert_allclose(dev.last_obs[4], host.last_obs[4],
                                       atol=0)
            assert np.max(np.abs(dev.last_obs[5] - host.last_obs[5])) <= 1
            np.testing.assert_allclose(dev.last_obs[3], host.last_obs[3],
                                       rtol=1e-3)
        else:
            assert host.last_obs is None and dev.last_obs is None


def test_fleet_trajectory_sharded_heterogeneous_dt():
    """The horizon-timeline step is max(dt) over the WHOLE fleet. With a
    per-robot (B,)-shaped dt leaf (sharded under the mesh), a naive
    jnp.max(p.dt) inside the shard-mapped cycle is a per-SHARD max — dt
    now rides the replicated tnow vector so sharded == unsharded holds
    for heterogeneous-dt fleets too."""
    from mpc_ros_tpu.parallel import make_mesh
    from mpc_ros_tpu.planner.trajectory import FleetTrajectoryTracker

    B = 16
    base = get_shape("infinity")[:240]
    trajs = []
    for i in range(B):
        pl = base.copy()
        pl[:, :2] += 3.0 * i
        trajs.append(TimedTrajectory.from_path(pl, 0.35))
    # ascending dt: under a 4-way data mesh the first shards' local max
    # (0.0875) differs from the global max (0.12) — the failure shape
    dts = np.linspace(0.08, 0.12, B).astype(np.float32)
    p = MPCParams(dt=dts, max_angvel=1.5, w_cte=300.0,
                  w_angvel_d=10.0, w_accel_d=10.0)
    kw = dict(planner_cfg=PlannerConfig(local_plan_length=2.5),
              pipeline="device")
    plain = FleetTrajectoryTracker(p, SolverConfig(n_steps=20), **kw)
    shard = FleetTrajectoryTracker(p, SolverConfig(n_steps=20),
                                   mesh=make_mesh(n_data=4), **kw)
    plain.set_trajectories(trajs)
    shard.set_trajectories(trajs)
    poses = np.stack([t.xy[0] for t in trajs])
    poses = np.concatenate([poses, np.array([[t.yaw[0]] for t in trajs])], 1)
    vs = np.zeros(B)
    for cycle in range(3):
        cmd_p, _ = plain.compute(cycle * 0.1, poses, vs)
        cmd_s, _ = shard.compute(cycle * 0.1, poses, vs)
        assert np.max(np.abs(cmd_p - cmd_s)) < 1e-5, cycle
        v, w = cmd_p[:, 0], cmd_p[:, 1]
        poses[:, 0] += 0.1 * v * np.cos(poses[:, 2])
        poses[:, 1] += 0.1 * v * np.sin(poses[:, 2])
        poses[:, 2] += 0.1 * w
        vs = v
