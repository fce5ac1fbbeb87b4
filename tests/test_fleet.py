"""FleetPlanner: B-robot lifecycle with one batched solve per cycle.

Pins: multi-course fleet convergence, per-robot equivalence with the
single-robot MPCPlanner (same pose stream -> same commands), goal latching,
world-frame per-robot obstacles, and the bicycle family at fleet scale.
"""

import numpy as np

import jax.numpy as jnp

from mpc_ros_tpu.config import MPCParams, PlannerConfig, SolverConfig
from mpc_ros_tpu.planner import FleetPlanner, MPCPlanner
from mpc_ros_tpu.sim import get_shape

P = MPCParams(max_angvel=1.5, w_cte=300.0, w_angvel_d=10.0, w_accel_d=10.0)
SCFG = SolverConfig(n_steps=20)
PCFG = PlannerConfig(local_plan_length=2.5)


def _roll_fleet(fp, plans, max_cycles=1200, model="diff_drive"):
    B = len(plans)
    poses = np.stack([pl[0] for pl in plans])
    assert fp.set_plans(plans, poses).all()
    vw = np.zeros((B, 2))
    dt = float(np.max(np.asarray(fp.params.dt)))
    lf = float(np.max(np.asarray(fp.params.lf)))
    done = np.zeros(B, bool)
    for _ in range(max_cycles):
        done |= fp.is_goal_reached(poses, vw)
        if done.all():
            break
        ok, cmds, info = fp.compute_velocity_commands(poses, vw)
        act = ok & ~done
        v, u0 = cmds[:, 0], cmds[:, 1]
        w = u0 if model == "diff_drive" else v / lf * u0
        poses[act, 0] += v[act] * np.cos(poses[act, 2]) * dt
        poses[act, 1] += v[act] * np.sin(poses[act, 2]) * dt
        poses[act, 2] += w[act] * dt
        vw[act, 0] = v[act]
        vw[act, 1] = w[act]
        vw[~act] = 0.0
    return done, poses


def test_fleet_mixed_courses_reach():
    """6 robots on 3 different (disjointly offset) courses all reach their
    goals through ONE batched solve per cycle."""
    shapes = ["infinity", "epitrochoid", "square"]
    plans = []
    for i in range(6):
        plan = get_shape(shapes[i % 3]).copy()
        plan[:, :2] += 10.0 * i
        plans.append(plan)
    fp = FleetPlanner(params=P, solver_cfg=SCFG, planner_cfg=PCFG)
    fp.initialize(6)
    done, poses = _roll_fleet(fp, plans)
    assert done.all(), done
    for i, plan in enumerate(plans):
        g = plan[-1]
        assert np.hypot(poses[i, 0] - g[0], poses[i, 1] - g[1]) \
            <= PCFG.limits.xy_goal_tolerance + 1e-9


def test_fleet_matches_single_planner_commands():
    """Robot-by-robot equivalence: feeding the fleet the single planner's
    pose stream reproduces its commands (same cutoff/downsample/fit/FSM
    semantics; the fit is the same LSQ problem solved batched)."""
    plan = get_shape("infinity")
    single = MPCPlanner(params=P, solver_cfg=SCFG, planner_cfg=PCFG,
                        dtype=jnp.float32)
    single.initialize()
    fp = FleetPlanner(params=P, solver_cfg=SCFG, planner_cfg=PCFG)
    fp.initialize(2)
    off = np.array([50.0, 50.0, 0.0])
    pose = plan[0].copy()
    poses = np.stack([pose, pose + off])
    plan2 = plan.copy()
    plan2[:, :2] += 50.0
    assert single.set_plan(plan, pose)
    assert fp.set_plans([plan, plan2], poses).all()

    vw = np.zeros(2)
    dt = float(P.dt)
    for cyc in range(60):
        ok1, (v1, w1), _ = single.compute_velocity_commands(pose, tuple(vw))
        okf, cmds, _ = fp.compute_velocity_commands(
            np.stack([pose, pose + off]), np.stack([vw, vw]))
        assert ok1 and okf.all()
        assert abs(cmds[0, 0] - v1) < 5e-3, (cyc, cmds[0], (v1, w1))
        assert abs(cmds[0, 1] - w1) < 5e-3, (cyc, cmds[0], (v1, w1))
        # the offset twin is the same problem translated: same commands
        np.testing.assert_allclose(cmds[1], cmds[0], atol=5e-3)
        # advance the plant with the SINGLE planner's commands (the shared
        # pose stream keeps the two pipelines comparable cycle-by-cycle)
        pose = pose + np.array([v1 * np.cos(pose[2]) * dt,
                                v1 * np.sin(pose[2]) * dt, w1 * dt])
        vw = np.array([v1, w1])


def test_fleet_goal_latching_and_idle_commands():
    """A robot at its goal goes idle with zero commands while the rest of
    the fleet keeps tracking; is_goal_reached consumes the latch pair once
    (the reference's force-one-more-cycle behavior)."""
    plan_long = np.stack([np.linspace(0, 5, 50), np.zeros(50),
                          np.zeros(50)], 1)
    plan_done = np.stack([np.linspace(0, 0.3, 5), np.zeros(5),
                          np.zeros(5)], 1)
    fp = FleetPlanner(params=P, solver_cfg=SCFG, planner_cfg=PCFG)
    fp.initialize(2)
    poses = np.array([[0.0, 0.05, 0.0], [0.29, 0.0, 0.0]])
    assert fp.set_plans([plan_long, plan_done], poses).all()
    fb = np.zeros((2, 2))
    done = fp.is_goal_reached(poses, fb)
    # latch pair: first query that satisfies both returns False once...
    d2 = fp.is_goal_reached(poses, fb)
    assert not done[0] and not d2[0]
    assert done[1] or d2[1]
    ok, cmds, info = fp.compute_velocity_commands(poses, fb)
    assert ok.all()
    assert tuple(cmds[1]) == (0.0, 0.0)      # idle robot: explicit zeros
    assert abs(cmds[0, 0]) > 0.0             # tracking robot: moving


def test_fleet_with_world_obstacles():
    """World-frame per-robot Gaussian obstacles flow through the batched
    frame transform into the solve: the robot with a blob on its path keeps
    clearance, the twin (blob far away) drives straight through the site —
    the same setup as test_obstacle_planner.py, per-robot in one batch."""
    from mpc_ros_tpu.models.obstacles import GaussianObstacles

    n = 100
    plan = np.stack([np.linspace(0, 6, n), np.zeros(n), np.zeros(n)], 1)
    # the default weights of the single-robot swerve test (w_cte=300 makes
    # avoidance costlier than stopping)
    p = MPCParams(dt=0.1, ref_vel=0.5, max_angvel=1.5,
                  w_angvel_d=10.0, w_accel_d=10.0)
    fp = FleetPlanner(params=p, solver_cfg=SCFG, planner_cfg=PCFG)
    fp.initialize(2)
    blobs = GaussianObstacles.from_sigmas(
        jnp.asarray([[3.0], [50.0]]), jnp.asarray([[0.05], [50.0]]),
        jnp.asarray([[0.3], [0.3]]), jnp.asarray([[50.0], [50.0]]))
    fp.set_obstacles(blobs)
    poses = np.stack([plan[0], plan[0]])
    assert fp.set_plans([plan, plan.copy()], poses).all()
    vw = np.zeros((2, 2))
    dt = 0.1
    mind = np.full(2, np.inf)
    for _ in range(900):
        ok, cmds, _ = fp.compute_velocity_commands(poses, vw)
        v, w = cmds[:, 0], cmds[:, 1]
        poses[:, 0] += v * np.cos(poses[:, 2]) * dt
        poses[:, 1] += v * np.sin(poses[:, 2]) * dt
        poses[:, 2] += w * dt
        vw = cmds.copy()
        mind = np.minimum(mind, np.hypot(poses[:, 0] - 3.0,
                                         poses[:, 1] - 0.05))
        if (poses[:, 0] > 5.0).all():
            break
    assert (poses[:, 0] > 5.0).all(), poses
    assert mind[0] > 0.2, mind       # keeps clearance from its blob
    assert mind[1] < 0.12, mind      # twin drives straight through


def test_fleet_bicycle_family():
    """The Ackermann family at fleet scale: (v, delta) commands against
    bicycle plants; both robots complete the infinity course."""
    plan = get_shape("infinity")
    plans = [plan, plan.copy()]
    plans[1][:, :2] += 20.0
    p = MPCParams(max_angvel=1.5, w_cte=300.0, w_angvel_d=10.0,
                  w_accel_d=10.0, lf=0.25, max_steer=0.6)
    fp = FleetPlanner(params=p,
                      solver_cfg=SolverConfig(n_steps=20, model="bicycle"),
                      planner_cfg=PCFG)
    fp.initialize(2)
    done, poses = _roll_fleet(fp, plans, max_cycles=1200, model="bicycle")
    assert done.all(), done


def test_fleet_per_robot_throttle_scheduling():
    """(B,)-shaped MPCParams leaves apply per robot in the host schedulers:
    a low-throttle robot enters its (longer) braking zone while its
    high-throttle twin at the same distance does not."""
    import jax.numpy as jnp

    n = 40
    plan = np.stack([np.linspace(0, 3, n), np.zeros(n), np.zeros(n)], 1)
    p = MPCParams(max_throttle=jnp.asarray([0.5, 2.0]), ref_vel=0.5)
    fp = FleetPlanner(params=p, solver_cfg=SCFG, planner_cfg=PCFG)
    fp.initialize(2)
    # dist to goal = 0.3: v^2/mt = 0.5 (brakes) vs 0.125 (does not) at v=0.5
    poses = np.array([[2.7, 0.0, 0.0], [2.7, 0.0, 0.0]])
    assert fp.set_plans([plan, plan.copy()], poses).all()
    fb = np.array([[0.5, 0.0], [0.5, 0.0]])
    ok, cmds, info = fp.compute_velocity_commands(poses, fb)
    assert ok.all()
    # robot 0: scheduled ref_vel = clip(mt*dist) = 0.5*0.3 = 0.15
    assert abs(info.ref_vel[0] - 0.15) < 1e-9, info.ref_vel
    # robot 1: outside its braking distance -> full ref_vel
    assert abs(info.ref_vel[1] - 0.5) < 1e-9, info.ref_vel


def test_sharded_batch_solve_matches_unsharded():
    """sharded_batch_solve over a data mesh == batch_solve_lane, including
    per-robot (B,)-shaped param leaves, warm starts, and per-robot blobs —
    no collectives in the control path, pure data parallelism."""
    import jax
    from mpc_ros_tpu.engine import make_random_scenarios
    from mpc_ros_tpu.models.obstacles import GaussianObstacles
    from mpc_ros_tpu.parallel import make_mesh, sharded_batch_solve
    from mpc_ros_tpu.solver.batch_lane import batch_solve_lane

    dtype = jnp.float32
    B = 64
    mesh = make_mesh(4)
    z0s, coeffs = make_random_scenarios(jax.random.PRNGKey(0), B, dtype)
    # per-robot ref_vel leaf exercises the sharded-params spec path
    p = MPCParams(ref_vel=jnp.linspace(0.3, 0.7, B)).astype(dtype)
    cfg = SolverConfig(n_steps=10, max_sqp_iters=6, backward="xla")
    warm = jnp.zeros((B, cfg.n_controls, 2), dtype)
    blobs = GaussianObstacles.from_sigmas(
        jnp.full((B, 1), 1.0, dtype), jnp.full((B, 1), 0.3, dtype),
        jnp.full((B, 1), 0.3, dtype), jnp.full((B, 1), 20.0, dtype))

    r0 = batch_solve_lane(z0s, coeffs, p, cfg, u_init=warm, blobs=blobs)
    r1 = sharded_batch_solve(mesh, z0s, coeffs, p, cfg, u_init=warm,
                             blobs=blobs)
    np.testing.assert_allclose(np.asarray(r1.us), np.asarray(r0.us),
                               atol=2e-5)
    np.testing.assert_array_equal(np.asarray(r1.converged),
                                  np.asarray(r0.converged))


def test_fleet_planner_on_mesh_matches_unsharded():
    """FleetPlanner(mesh=...) serves the fleet with the solve sharded over
    the data axis; commands match the unsharded fleet cycle-for-cycle."""
    from mpc_ros_tpu.parallel import make_mesh

    B = 8
    plan = get_shape("infinity")
    plans = [plan.copy() for _ in range(B)]
    for i, pl in enumerate(plans):
        pl[:, :2] += 10.0 * i
    mesh = make_mesh(4)
    fps = [FleetPlanner(params=P, solver_cfg=SCFG, planner_cfg=PCFG),
           FleetPlanner(params=P, solver_cfg=SCFG, planner_cfg=PCFG,
                        mesh=mesh)]
    poses0 = np.stack([pl[0] for pl in plans])
    for fp in fps:
        fp.initialize(B)
        assert fp.set_plans(plans, poses0.copy()).all()
    poses = poses0.copy()
    vw = np.zeros((B, 2))
    dt = float(P.dt)
    for _ in range(25):
        outs = [fp.compute_velocity_commands(poses, vw) for fp in fps]
        (ok0, c0, _), (ok1, c1, _) = outs
        assert ok0.all() and ok1.all()
        np.testing.assert_allclose(c1, c0, atol=5e-4)
        v, w = c0[:, 0], c0[:, 1]
        poses[:, 0] += v * np.cos(poses[:, 2]) * dt
        poses[:, 1] += v * np.sin(poses[:, 2]) * dt
        poses[:, 2] += w * dt
        vw = c0.copy()


def test_fleet_degenerate_plans_fuzz():
    """Fail-safe property: fleets mixing degenerate plans (single point,
    duplicate waypoints, 2-column, zigzag reversals, long jumps) never
    produce non-finite commands or crash, with and without the curvature
    scheduler (zero-length segments and <=2-point windows are the edge
    cases the vectorized pipeline must survive)."""
    rng = np.random.default_rng(0)

    def random_plan(kind):
        if kind == 0:
            return np.array([[1.0, 1.0, 0.5]])
        if kind == 1:
            return np.array([[1.0, 1.0, 0.5], [1.0, 1.0, 0.5]])
        if kind == 2:     # duplicated waypoints (zero-length segments)
            pts = np.cumsum(rng.normal(0, 0.2, (10, 2)), 0)
            pts = np.repeat(pts, 2, axis=0)
            return np.concatenate([pts, np.zeros((len(pts), 1))], 1)
        if kind == 3:     # 2 columns (tangent yaws synthesized)
            return np.cumsum(rng.normal(0, 0.3, (15, 2)), 0)
        if kind == 4:
            pts = np.cumsum(rng.normal(0, 0.3, (40, 2)), 0)
            return np.concatenate([pts, np.zeros((40, 1))], 1)
        if kind == 5:     # zigzag: direction reversals
            x = np.arange(20) * 0.2
            y = np.where(np.arange(20) % 2 == 0, 0.0, 0.5)
            return np.stack([x, y, np.zeros(20)], 1)
        return np.array([[0.0, 0.0, 0.0], [5.0, 0.0, 0.0]])

    B = 14
    plans = [random_plan(i % 7) for i in range(B)]
    for slow in (False, True):
        fp = FleetPlanner(
            params=MPCParams(),
            solver_cfg=SolverConfig(n_steps=10, max_sqp_iters=6,
                                    backward="xla"),
            planner_cfg=PlannerConfig(curvature_slowdown=slow))
        fp.initialize(B)
        poses = np.stack([np.array([pl[0, 0], pl[0, 1],
                                    pl[0, 2] if pl.shape[1] >= 3 else 0.0])
                          for pl in plans])
        assert fp.set_plans(plans, poses).all()
        vw = np.zeros((B, 2))
        for _ in range(15):
            ok, cmds, info = fp.compute_velocity_commands(
                poses + rng.normal(0, 0.05, poses.shape), vw)
            assert np.isfinite(cmds).all()
            vw = cmds * 0.5


def test_fleet_checkpoint_resume(tmp_path):
    """Serving resume: snapshot mid-course via obs.checkpoint, restore into
    a fresh FleetPlanner, and the continued run produces the identical
    command stream (warm-start bank, goal latches, plan cursors intact)."""
    from mpc_ros_tpu.obs.checkpoint import restore_checkpoint, save_checkpoint

    B = 3
    plan = get_shape("infinity")
    plans = [plan.copy() for _ in range(B)]
    for i, pl in enumerate(plans):
        pl[:, :2] += 10.0 * i

    def make():
        fp = FleetPlanner(params=P, solver_cfg=SCFG, planner_cfg=PCFG)
        fp.initialize(B)
        return fp

    fp = make()
    poses = np.stack([pl[0] for pl in plans])
    assert fp.set_plans(plans, poses).all()
    vw = np.zeros((B, 2))
    dt = float(P.dt)

    def advance(fp, poses, vw, n):
        outs = []
        for _ in range(n):
            ok, cmds, _ = fp.compute_velocity_commands(poses, vw)
            v, w = cmds[:, 0], cmds[:, 1]
            poses = poses.copy()
            poses[:, 0] += v * np.cos(poses[:, 2]) * dt
            poses[:, 1] += v * np.sin(poses[:, 2]) * dt
            poses[:, 2] += w * dt
            vw = cmds.copy()
            outs.append(cmds)
        return poses, vw, outs

    poses, vw, _ = advance(fp, poses, vw, 20)
    path = str(tmp_path / "fleet_ckpt")
    save_checkpoint(path, fp.state_dict())

    # uninterrupted continuation
    poses_a, vw_a, outs_a = advance(fp, poses.copy(), vw.copy(), 10)

    # restart: fresh planner + restore
    fp2 = make()
    fp2.load_state_dict(restore_checkpoint(path))
    poses_b, vw_b, outs_b = advance(fp2, poses.copy(), vw.copy(), 10)

    for a, b in zip(outs_a, outs_b):
        np.testing.assert_allclose(b, a, atol=1e-6)
    # the restored planner is warm (not a cold-start transient)
    assert fp2._has_warm.all()


def test_pipelined_begin_finish_matches_sequential():
    """Interleaved begin(k+1)/finish(k) serving must produce the same
    commands as the sequential path when the inputs repeat (the one-period
    actuation-state lag vanishes at steady state)."""
    import numpy as np

    from mpc_ros_tpu.config import MPCParams, SolverConfig
    from mpc_ros_tpu.planner import FleetPlanner
    from mpc_ros_tpu.sim import get_shape

    B = 8
    plan0 = get_shape("infinity")[:200]
    plans = [plan0.copy() for _ in range(B)]
    p = MPCParams(w_cte=300.0, w_angvel_d=10.0, w_accel_d=10.0)
    poses = np.stack([pl[0] for pl in plans])
    vw = np.zeros((B, 2))

    # with static inputs both serving modes converge to the same
    # fixed point of the (warm start, actuation state) iteration; the
    # pipelined mode follows the identical damped oscillation one cycle
    # behind (first cycle equal exactly, late cycles equal in the limit)
    n_cyc = 24
    fp_seq = FleetPlanner(params=p, solver_cfg=SolverConfig(n_steps=10))
    fp_seq.initialize(B)
    fp_seq.set_plans(plans, poses)
    first_s = None
    for k in range(n_cyc):
        ok_s, cmds_s, info_s = fp_seq.compute_velocity_commands(poses, vw)
        if k == 0:
            first_s = cmds_s.copy()

    fp_pip = FleetPlanner(params=p, solver_cfg=SolverConfig(n_steps=10))
    fp_pip.initialize(B)
    fp_pip.set_plans(plans, poses)
    h = fp_pip.begin_cycle(poses, vw)
    first_p = None
    for k in range(n_cyc):
        h_next = fp_pip.begin_cycle(poses, vw)
        ok_p, cmds_p, info_p = fp_pip.finish_cycle(h)
        if k == 0:
            first_p = cmds_p.copy()
        h = h_next
    ok_p, cmds_p, info_p = fp_pip.finish_cycle(h)

    np.testing.assert_allclose(first_p, first_s, atol=1e-6)
    np.testing.assert_allclose(cmds_p, cmds_s, atol=2e-3)
    np.testing.assert_array_equal(info_p.states, info_s.states)
    assert bool(np.all(ok_p == ok_s))
