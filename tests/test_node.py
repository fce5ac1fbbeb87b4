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
