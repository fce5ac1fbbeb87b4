"""Planner-node integration: full control loop over native topics."""

import struct
import time

import numpy as np

from mpc_ros_tpu.config import MPCParams, PlannerConfig, SolverConfig
from mpc_ros_tpu.planner import MPCPlanner
from mpc_ros_tpu.planner.node import (TWIST_FMT, PlannerNode, pack_pose,
                                      pack_twist)


def test_node_closed_loop_over_topics():
    """Simulated plant publishes pose/feedback over topics; the node must
    drive it along a straight plan — commands flow back over the cmd topic
    and the plant advances."""
    p = MPCParams(dt=0.05, ref_vel=0.5, w_cte=300.0)
    planner = MPCPlanner(params=p, solver_cfg=SolverConfig(n_steps=10),
                         planner_cfg=PlannerConfig(local_plan_length=2.0))
    planner.initialize()
    node = PlannerNode(planner, period_s=0.02)  # faster than realtime sim

    xs = np.linspace(0, 5.0, 100)
    plan = np.stack([xs, np.zeros(100), np.zeros(100)], axis=1)

    pose = np.array([0.0, 0.15, 0.0])   # offset from the path
    vel = (0.0, 0.0)
    node.pose_topic.publish(pack_pose(*pose))
    node.feedback_topic.publish(pack_twist(*vel))
    assert node.set_plan(plan)
    node.start()
    try:
        t_end = time.time() + 6.0
        applied = 0
        while time.time() < t_end and pose[0] < 1.0:
            raw = node.cmd_topic.read()
            if raw is not None:
                v, w = struct.unpack(TWIST_FMT, raw)
                # integrate the plant at the node period
                pose = pose + 0.02 * np.array(
                    [v * np.cos(pose[2]), v * np.sin(pose[2]), w])
                vel = (v, w)
                applied += 1
            node.pose_topic.publish(pack_pose(*pose))
            node.feedback_topic.publish(pack_twist(*vel))
            time.sleep(0.004)
    finally:
        node.stop()

    assert node.cycles > 20
    assert node.errors == 0
    assert applied > 20
    assert pose[0] > 0.3, f"robot did not advance: {pose}"
    assert abs(pose[1]) < 0.2, f"lateral error grew: {pose}"
    # predicted-trajectory topic carried a horizon
    raw_traj = node.traj_topic.read()
    assert raw_traj is not None
    traj = np.frombuffer(raw_traj, dtype=np.float64).reshape(-1, 3)
    assert traj.shape[0] == 10


def test_failed_cycle_always_publishes_explicit_stop():
    """A not-ok cycle with NO SafetyMonitor must still publish an explicit
    stop — otherwise the last nonzero command (e.g. a recovery rotate)
    stays latched in cmd_topic and the robot spins forever."""
    import struct

    from mpc_ros_tpu.config import MPCParams, PlannerConfig, SolverConfig
    from mpc_ros_tpu.planner import MPCPlanner
    from mpc_ros_tpu.planner.node import PlannerNode, pack_pose, pack_twist

    planner = MPCPlanner(params=MPCParams().astype("float32"),
                         solver_cfg=SolverConfig(n_steps=10, backward="xla"),
                         planner_cfg=PlannerConfig())
    planner.initialize()
    node = PlannerNode(planner, period_s=0.05)   # no recovery, no safety
    plan = np.stack([np.linspace(0, 2, 20), np.zeros(20), np.zeros(20)], 1)
    node.pose_topic.publish(pack_pose(0.0, 0.0, 0.0))
    node.feedback_topic.publish(pack_twist(0.2, 0.0))
    assert node.set_plan(plan)
    node._cycle()
    # fault: lose the plan, latch a sentinel command, cycle again
    planner.global_plan = None
    node.cmd_topic.publish(pack_twist(9.0, 9.0))
    node._cycle()
    v, w = struct.unpack("<2d", node.cmd_topic.read())
    assert (v, w) == (0.0, 0.0), (v, w)


def test_stop_reports_alive_thread():
    """stop() must not discard the handle of a still-running loop thread
    (a second start() would run two publishers)."""
    import time

    from mpc_ros_tpu.config import MPCParams, PlannerConfig, SolverConfig
    from mpc_ros_tpu.planner import MPCPlanner
    from mpc_ros_tpu.planner.node import PlannerNode

    planner = MPCPlanner(params=MPCParams().astype("float32"),
                         solver_cfg=SolverConfig(n_steps=10, backward="xla"),
                         planner_cfg=PlannerConfig())
    planner.initialize()
    node = PlannerNode(planner, period_s=0.02)
    node.start()
    try:
        import pytest

        with pytest.raises(RuntimeError):
            node.start()                 # double-start refused
    finally:
        assert node.stop(timeout=5.0)    # clean shutdown joins fine
    assert node._thread is None
