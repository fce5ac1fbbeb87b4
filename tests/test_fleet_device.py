"""DeviceFleetPlanner == FleetPlanner, robot by robot, cycle by cycle.

The device planner runs the whole per-cycle pipeline (cutoff, window, FSM,
latches, downsample, fit, error extraction, scheduling, solve, commands) as
one jitted program; these tests drive it against the host-pipeline planner
on identical inputs and pin the agreement. The fit runs f32-scaled on
device vs f64 on host, and the solver is f32 on both — commands agree to
solver noise (~1e-3), FSM codes and cursors exactly.
"""

import numpy as np
import pytest

from mpc_ros_tpu.config import MPCParams, PlannerConfig, SolverConfig
from mpc_ros_tpu.planner import FleetPlanner
from mpc_ros_tpu.planner.fleet_device import DeviceFleetPlanner
from mpc_ros_tpu.sim import get_shape


def _make_pair(B=12, model="diff_drive", curvature=False, **pkw):
    params = MPCParams(max_angvel=1.5, w_cte=300.0, w_angvel_d=10.0,
                       w_accel_d=10.0, **pkw)
    if model == "bicycle":
        params = params.replace(lf=0.25, max_steer=0.6)
    cfg = SolverConfig(n_steps=12, model=model, max_sqp_iters=25)
    pc = PlannerConfig(local_plan_length=2.5, curvature_slowdown=curvature)
    host = FleetPlanner(params=params, solver_cfg=cfg, planner_cfg=pc)
    dev = DeviceFleetPlanner(params=params, solver_cfg=cfg, planner_cfg=pc)
    host.initialize(B)
    dev.initialize(B)
    return host, dev


def _plans(B, stagger=True):
    base = get_shape("infinity")
    plans = []
    for i in range(B):
        pl = base.copy()
        pl[:, :2] += 3.0 * i
        if stagger:  # heterogeneous lengths exercise the padding masks
            pl = pl[: len(pl) - 37 * (i % 3)]
        plans.append(pl)
    return plans


def _drive(host, dev, plans, n_cycles=6, rng_seed=0):
    B = host.B
    poses = np.stack([pl[0] for pl in plans]).astype(float)
    rng = np.random.default_rng(rng_seed)
    poses[:, :2] += rng.normal(0, 0.05, (B, 2))
    fb = np.zeros((B, 2))
    assert host.set_plans(plans, poses).all()
    assert dev.set_plans(plans, poses).all()
    devs = []
    for cyc in range(n_cycles):
        ok_h, cmd_h, info_h = host.compute_velocity_commands(poses, fb)
        ok_d, cmd_d, info_d = dev.compute_velocity_commands(poses, fb)
        np.testing.assert_array_equal(ok_h, ok_d)
        np.testing.assert_array_equal(info_h.states, info_d.states,
                                      err_msg=f"cycle {cyc}")
        np.testing.assert_array_equal(np.asarray(host._start),
                                      np.asarray(dev._carry["start"]),
                                      err_msg=f"cycle {cyc} cursors")
        dcmd = np.max(np.abs(cmd_h - cmd_d))
        devs.append(dcmd)
        assert dcmd < 2e-3, f"cycle {cyc}: command dev {dcmd}"
        # error states agree to fit noise (device fit is f32-scaled)
        tr = info_h.states == 0
        if tr.any():
            assert np.nanmax(np.abs(info_h.cte[tr] - info_d.cte[tr])) < 1e-3
            assert np.nanmax(np.abs(info_h.etheta[tr]
                                    - info_d.etheta[tr])) < 1e-3
            assert np.nanmax(np.abs(info_h.ref_vel[tr]
                                    - info_d.ref_vel[tr])) < 1e-5
        # advance the plant with the HOST commands so both see identical
        # inputs every cycle (divergence would compound otherwise)
        v, w = cmd_h[:, 0], cmd_h[:, 1]
        dt = 0.1
        poses[:, 0] += dt * v * np.cos(poses[:, 2])
        poses[:, 1] += dt * v * np.sin(poses[:, 2])
        poses[:, 2] += dt * w
        fb = cmd_h.copy()
    return devs


def test_device_matches_host_diff_drive():
    host, dev = _make_pair(B=12)
    _drive(host, dev, _plans(12), n_cycles=6)


def test_device_matches_host_bicycle_curvature():
    host, dev = _make_pair(B=8, model="bicycle", curvature=True)
    _drive(host, dev, _plans(8), n_cycles=4)


def test_device_goal_latches_and_reach():
    """Goal consume-once latches behave identically through the device
    twin of is_goal_reached."""
    host, dev = _make_pair(B=4)
    plans = _plans(4, stagger=False)
    # park every robot at its goal, stopped
    poses = np.stack([pl[-1] for pl in plans]).astype(float)
    fb = np.zeros((4, 2))
    host.set_plans(plans, poses)
    dev.set_plans(plans, poses)
    for _ in range(3):
        rh = host.is_goal_reached(poses, fb)
        rd = dev.is_goal_reached(poses, fb)
        np.testing.assert_array_equal(rh, rd)
        np.testing.assert_array_equal(host.latch_xy,
                                      np.asarray(dev._carry["latch_xy"]))
        np.testing.assert_array_equal(host.latch_yaw,
                                      np.asarray(dev._carry["latch_yaw"]))
    assert rh.all()


def test_device_midrun_replan_keeps_live_state():
    """set_plans on a running fleet must merge the LIVE device state (warm
    bank, latches, actuation), not the stale host mirrors."""
    host, dev = _make_pair(B=6)
    plans = _plans(6)
    devs = _drive(host, dev, plans, n_cycles=3)
    # replan robots 0..2 mid-run (new goals), keep 3..5 on their course
    poses = np.stack([pl[3] for pl in plans]).astype(float)
    new_plans = [pl[::-1].copy() if i < 3 else None
                 for i, pl in enumerate(plans)]
    # reversed plans need their heading column re-synthesized
    for i in range(3):
        d = np.diff(new_plans[i][:, :2], axis=0)
        new_plans[i][:-1, 2] = np.arctan2(d[:, 1], d[:, 0])
        new_plans[i][-1, 2] = new_plans[i][-2, 2]
    ok_h = host.set_plans(new_plans, poses)
    ok_d = dev.set_plans(new_plans, poses)
    np.testing.assert_array_equal(ok_h, ok_d)
    np.testing.assert_array_equal(host.states,
                                  np.asarray(dev._carry["states"]))
    # carried robots keep their warm bank on both sides
    np.testing.assert_array_equal(host._has_warm,
                                  np.asarray(dev._carry["has_warm"]))
    fb = np.zeros((6, 2))
    _, cmd_h, ih = host.compute_velocity_commands(poses, fb)
    _, cmd_d, id_ = dev.compute_velocity_commands(poses, fb)
    np.testing.assert_array_equal(ih.states, id_.states)
    assert np.max(np.abs(cmd_h - cmd_d)) < 2e-3


def test_device_state_dict_roundtrip():
    """Device checkpoints interoperate with the host planner."""
    host, dev = _make_pair(B=6)
    plans = _plans(6)
    _drive(host, dev, plans, n_cycles=2)
    sd = dev.state_dict()
    host2, dev2 = _make_pair(B=6)
    host2.initialize(6)
    dev2.initialize(6)
    host2.load_state_dict(sd)   # host planner resumes a device checkpoint
    dev2.load_state_dict(sd)
    poses = np.stack([pl[2] for pl in plans]).astype(float)
    fb = np.full((6, 2), 0.1)
    _, cmd_h, _ = host2.compute_velocity_commands(poses, fb)
    _, cmd_d, _ = dev2.compute_velocity_commands(poses, fb)
    assert np.max(np.abs(cmd_h - cmd_d)) < 2e-3


def test_device_fleet_sharded_matches_unsharded():
    """DeviceFleetPlanner(mesh=...) runs the whole cycle under shard_map
    over the data axis (B/D robots per device, zero control-path
    collectives) — commands and FSM codes match the unsharded device
    planner exactly."""
    import jax

    from mpc_ros_tpu.parallel import make_mesh

    B = 8
    mesh = make_mesh(n_data=4, n_time=1, devices=jax.devices()[:4])
    params = MPCParams(max_angvel=1.5, w_cte=300.0, w_angvel_d=10.0,
                       w_accel_d=10.0,
                       ref_vel=np.full(B, 0.5))     # (B,) leaf shards too
    cfg = SolverConfig(n_steps=12, max_sqp_iters=25)
    pc = PlannerConfig(local_plan_length=2.5)
    dev = DeviceFleetPlanner(params=params, solver_cfg=cfg, planner_cfg=pc)
    shd = DeviceFleetPlanner(params=params, solver_cfg=cfg, planner_cfg=pc,
                             mesh=mesh)
    dev.initialize(B)
    shd.initialize(B)
    plans = _plans(B, stagger=False)
    poses = np.stack([pl[0] for pl in plans]).astype(float)
    fb = np.zeros((B, 2))
    assert dev.set_plans(plans, poses).all()
    assert shd.set_plans(plans, poses).all()
    for cyc in range(4):
        ok_d, cmd_d, info_d = dev.compute_velocity_commands(poses, fb)
        ok_s, cmd_s, info_s = shd.compute_velocity_commands(poses, fb)
        np.testing.assert_array_equal(info_d.states, info_s.states)
        assert np.max(np.abs(cmd_d - cmd_s)) < 1e-5, cyc
        v, w = cmd_d[:, 0], cmd_d[:, 1]
        poses[:, 0] += 0.1 * v * np.cos(poses[:, 2])
        poses[:, 1] += 0.1 * v * np.sin(poses[:, 2])
        poses[:, 2] += 0.1 * w
        fb = cmd_d.copy()


def test_device_matches_host_with_world_obstacles():
    """Per-robot world-frame Gaussian obstacles flow through the device
    cycle program (frame transform + megakernel blob terms) identically to
    the host pipeline."""
    import jax.numpy as jnp

    from mpc_ros_tpu.models.obstacles import GaussianObstacles

    B = 4
    n = 100
    host, dev = _make_pair(B=B)
    plan = np.stack([np.linspace(0, 6, n), np.zeros(n), np.zeros(n)], 1)
    plans = [plan.copy() for _ in range(B)]
    # robots 0/1 share a blob on the path; 2/3 see a far-away blob
    blobs = GaussianObstacles.from_sigmas(
        jnp.asarray([[3.0], [3.0], [50.0], [50.0]]),
        jnp.asarray([[0.05], [0.05], [50.0], [50.0]]),
        jnp.full((B, 1), 0.3), jnp.full((B, 1), 50.0))
    host.set_obstacles(blobs)
    dev.set_obstacles(blobs)
    poses = np.stack([plan[0]] * B).astype(float)
    fb = np.zeros((B, 2))
    assert host.set_plans(plans, poses).all()
    assert dev.set_plans(plans, poses).all()
    for cyc in range(5):
        _, cmd_h, ih = host.compute_velocity_commands(poses, fb)
        _, cmd_d, id_ = dev.compute_velocity_commands(poses, fb)
        np.testing.assert_array_equal(ih.states, id_.states)
        assert np.max(np.abs(cmd_h - cmd_d)) < 2e-3, cyc
        v, w = cmd_h[:, 0], cmd_h[:, 1]
        poses[:, 0] += 0.1 * v * np.cos(poses[:, 2])
        poses[:, 1] += 0.1 * v * np.sin(poses[:, 2])
        poses[:, 2] += 0.1 * w
        fb = cmd_h.copy()


def test_device_reinitialize_drops_stale_carry():
    """initialize() on a live device planner must not let the old fleet's
    device carry resurrect through set_plans' device->host sync (review
    finding: a stale carry with a different B broke the seeding ops)."""
    host, dev = _make_pair(B=6)
    _drive(host, dev, _plans(6), n_cycles=2)
    dev.initialize(4)                       # new, smaller fleet
    plans = _plans(4, stagger=False)
    poses = np.stack([pl[0] for pl in plans]).astype(float)
    ok = dev.set_plans(plans, poses)
    assert ok.all()
    assert not np.asarray(dev._carry["has_warm"]).any()  # fresh fleet
    _, cmds, info = dev.compute_velocity_commands(poses, np.zeros((4, 2)))
    assert np.isfinite(cmds).all()
    assert (info.states == 0).any()


def test_device_i16_wire_matches_host():
    """The 16-bit wire (VERDICT r3 item 6: int16 pose deltas against a
    bit-exact tick mirror up, int16 fixed-point commands down) must track
    the host pipeline like the f32 wire does — the only extra error budget
    is the wire resolution (0.1 mm poses, 2.5e-4 command units). Also
    exercises the automatic float32 keyframe: the first cycle after
    set_plans reseeds the fresh (zero) mirror from poses far outside the
    int16 delta range."""
    host, dev = _make_pair(B=12)
    del dev
    B = 12
    dev_i16 = DeviceFleetPlanner(params=host.params,
                                 solver_cfg=host.solver_cfg,
                                 planner_cfg=host.planner_cfg, wire="i16")
    dev_i16.initialize(B)
    plans = _plans(B)
    poses = np.stack([pl[0] for pl in plans]).astype(float)
    rng = np.random.default_rng(0)
    poses[:, :2] += rng.normal(0, 0.05, (B, 2))
    fb = np.zeros((B, 2))
    # plan offsets put robots up to ~33 m out — far beyond the 3.27 m
    # delta range, so cycle 1 must take the keyframe path
    assert host.set_plans(plans, poses).all()
    assert dev_i16.set_plans(plans, poses).all()
    for cyc in range(6):
        ok_h, cmd_h, info_h = host.compute_velocity_commands(poses, fb)
        ok_d, cmd_d, info_d = dev_i16.compute_velocity_commands(poses, fb)
        np.testing.assert_array_equal(ok_h, ok_d)
        np.testing.assert_array_equal(info_h.states, info_d.states)
        # the 0.05 mm pose quantization can flip knife-edge cutoff-walk
        # comparisons: cursors within one knot, commands within the wire
        # resolution + the one-knot fit-window sensitivity
        dcur = np.abs(np.asarray(host._start)
                      - np.asarray(dev_i16._carry["start"]))
        assert dcur.max() <= 1 and (dcur > 0).sum() <= 3, dcur
        same = dcur == 0
        dcmd = np.max(np.abs(cmd_h - cmd_d)[same])
        assert dcmd < 3e-3, f"cycle {cyc}: command dev {dcmd}"
        dcmd_all = np.max(np.abs(cmd_h - cmd_d))
        assert dcmd_all < 3e-2, f"cycle {cyc}: command dev {dcmd_all}"
        v, w = cmd_h[:, 0], cmd_h[:, 1]
        poses[:, 0] += 0.1 * v * np.cos(poses[:, 2])
        poses[:, 1] += 0.1 * v * np.sin(poses[:, 2])
        poses[:, 2] += 0.1 * w
        fb = cmd_h.copy()
    # the mirror really is in delta mode after the keyframe
    assert dev_i16._wire_ticks is not None
    assert np.abs(dev_i16._wire_ticks[:, 0]).max() > 0
