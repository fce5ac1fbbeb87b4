"""Recovery supervision (planner/recovery.py) — the move_base ladder.

The reference returns `false` from computeVelocityCommands to trigger
move_base's external recovery behaviors (replan, costmap clearing, rotate
recovery, abort) — SURVEY.md §5.3. These tests pin the standalone ladder:
escalation thresholds, replan-then-rotate sequencing, bounded rotation,
abort on exhaustion, re-arm, and the wiring through PlannerNode.
"""

import numpy as np

from mpc_ros_tpu.config import MPCParams, PlannerConfig, SolverConfig
from mpc_ros_tpu.planner import (MPCPlanner, RecoveryConfig, RecoveryState,
                                 RecoverySupervisor, SafetyMonitor)


class FakePlanner:
    """Scripted planner: fails until `fail_for` cycles have elapsed."""

    def __init__(self, fail_for=10**9):
        self.fail_for = fail_for
        self.calls = 0
        self.set_plans = []
        self.global_plan = None

    def set_plan(self, plan, pose, feedback_vel=(0.0, 0.0)):
        self.set_plans.append(np.asarray(plan, float))
        self.global_plan = np.asarray(plan, float)
        return True

    def compute_velocity_commands(self, pose, feedback):
        self.calls += 1
        if self.calls > self.fail_for:
            return True, (0.3, 0.1), None
        return False, (0.0, 0.0), None


PLAN = np.array([[0.0, 0.0, 0.0], [1.0, 0.0, 0.0], [2.0, 0.0, 0.0]])
POSE = np.array([0.0, 0.1, 0.0])
CFG = RecoveryConfig(failures_to_recover=3, rotate_speed=0.4,
                     rotate_cycles_max=5, max_rounds=2)


def test_normal_passthrough_and_threshold():
    fp = FakePlanner()
    sup = RecoverySupervisor(fp, CFG)
    sup.set_plan(PLAN, POSE)
    # success passes through untouched
    ok, cmd = sup.on_cycle(True, (0.5, -0.2), POSE, (0.0, 0.0))
    assert ok and cmd == (0.5, -0.2)
    # below the threshold: failures produce a stop, no replan yet
    for _ in range(CFG.failures_to_recover - 1):
        ok, cmd = sup.on_cycle(False, (0.5, 0.2), POSE, (0.0, 0.0))
        assert not ok and cmd == (0.0, 0.0)
    assert sup.stats.replans == 0
    assert sup.state is RecoveryState.NORMAL
    # a success resets the consecutive counter
    sup.on_cycle(True, (0.5, 0.0), POSE, (0.0, 0.0))
    for _ in range(CFG.failures_to_recover - 1):
        sup.on_cycle(False, (0.0, 0.0), POSE, (0.0, 0.0))
    assert sup.stats.replans == 0


def test_replan_clears_failure():
    # planner starts succeeding on the probe right after the replan
    fp = FakePlanner(fail_for=0)
    fp.fail_for = 0  # probe succeeds
    sup = RecoverySupervisor(fp, CFG)
    sup.set_plan(PLAN, POSE)
    ok = True
    for _ in range(CFG.failures_to_recover):
        ok, cmd = sup.on_cycle(False, (0.0, 0.0), POSE, (0.0, 0.0))
    assert sup.stats.replans == 1
    assert len(fp.set_plans) == 2          # set_plan + recovery replan
    assert ok and cmd == (0.3, 0.1)        # the probe's command
    assert sup.state is RecoveryState.NORMAL


def test_rotate_then_recover():
    # the replan probe (planner call #1) fails -> rotation starts; the
    # next cycle the CALLER's planner result (call #2) succeeds and is
    # passed in -> back to normal (in ROTATING the supervisor uses the
    # incoming result as the probe — no second solve per cycle)
    fp = FakePlanner(fail_for=1)
    sup = RecoverySupervisor(fp, CFG)
    sup.set_plan(PLAN, POSE)
    for _ in range(CFG.failures_to_recover):
        ok, cmd = sup.on_cycle(False, (0.0, 0.0), POSE, (0.0, 0.0))
    assert sup.state is RecoveryState.ROTATING
    assert ok and cmd[0] == 0.0 and abs(cmd[1]) == CFG.rotate_speed
    # the node's next planner call succeeds; its result flows through
    ok2, cmd2, _ = fp.compute_velocity_commands(POSE, (0.0, 0.0))
    ok, cmd = sup.on_cycle(ok2, cmd2, POSE, (0.0, 0.0))
    assert ok and cmd == (0.3, 0.1)
    assert sup.state is RecoveryState.NORMAL
    assert sup.stats.rotate_cycles == 0 or sup.stats.rotate_cycles <= 1


def test_rotating_uses_incoming_result_no_extra_solve():
    """In ROTATING the supervisor must not re-invoke the planner: the
    caller's per-cycle result is the probe (one solve per cycle)."""
    fp = FakePlanner()
    sup = RecoverySupervisor(fp, CFG)
    sup.set_plan(PLAN, POSE)
    for _ in range(CFG.failures_to_recover):
        sup.on_cycle(False, (0.0, 0.0), POSE, (0.0, 0.0))
    assert sup.state is RecoveryState.ROTATING
    calls_before = fp.calls
    sup.on_cycle(False, (0.0, 0.0), POSE, (0.0, 0.0))
    assert fp.calls == calls_before        # no hidden probe solve


def test_nonrotating_family_holds_instead_of_spinning():
    """An Ackermann planner (can_rotate_in_place=False) gets a
    hold-and-retry rung: zero command, same ladder budget."""
    import dataclasses as _dc

    from mpc_ros_tpu.config import SolverConfig as _SC

    fp = FakePlanner(fail_for=CFG.failures_to_recover + 2)
    fp.solver_cfg = _SC(n_steps=10, model="bicycle")
    sup = RecoverySupervisor(fp, CFG)
    assert sup._can_rotate is False
    sup.set_plan(PLAN, POSE)
    for _ in range(CFG.failures_to_recover):
        ok, cmd = sup.on_cycle(False, (0.0, 0.0), POSE, (0.0, 0.0))
    assert sup.state is RecoveryState.ROTATING
    assert cmd == (0.0, 0.0)               # no impossible in-place spin
    # the ladder still recovers once the planner comes back
    ok2, cmd2, _ = fp.compute_velocity_commands(POSE, (0.0, 0.0))
    while not ok2:
        ok, cmd = sup.on_cycle(ok2, cmd2, POSE, (0.0, 0.0))
        ok2, cmd2, _ = fp.compute_velocity_commands(POSE, (0.0, 0.0))
    ok, cmd = sup.on_cycle(ok2, cmd2, POSE, (0.0, 0.0))
    assert ok and sup.state is RecoveryState.NORMAL


def test_ladder_exhaustion_aborts_then_reset():
    fp = FakePlanner()  # never succeeds
    sup = RecoverySupervisor(fp, CFG)
    sup.set_plan(PLAN, POSE)
    results = []
    for _ in range(60):
        results.append(sup.on_cycle(False, (0.0, 0.0), POSE, (0.0, 0.0)))
        if sup.state is RecoveryState.ABORTED:
            break
    assert sup.state is RecoveryState.ABORTED
    assert sup.stats.aborts == 1
    assert sup.stats.replans == CFG.max_rounds      # one per round
    assert sup.stats.rounds == CFG.max_rounds
    # aborted: zero command, ok False, sticky until reset
    ok, cmd = sup.on_cycle(True, (0.5, 0.5), POSE, (0.0, 0.0))
    assert not ok and cmd == (0.0, 0.0)
    sup.reset()
    ok, cmd = sup.on_cycle(True, (0.5, 0.5), POSE, (0.0, 0.0))
    assert ok and cmd == (0.5, 0.5)


def test_replan_fn_preferred_over_stored_plan():
    fp = FakePlanner(fail_for=3)
    fresh = PLAN + np.array([0.0, 1.0, 0.0])
    sup = RecoverySupervisor(fp, CFG, replan_fn=lambda pose: fresh)
    sup.set_plan(PLAN, POSE)
    for _ in range(CFG.failures_to_recover):
        sup.on_cycle(False, (0.0, 0.0), POSE, (0.0, 0.0))
    np.testing.assert_array_equal(fp.set_plans[-1], fresh)


def test_rotate_direction_follows_path_heading():
    # path heads +y from the robot (heading error ~ +pi/2) -> rotate +.
    plan_up = np.array([[0.0, 0.0, 1.57], [0.0, 1.0, 1.57], [0.0, 2.0, 1.57]])
    fp = FakePlanner()
    sup = RecoverySupervisor(fp, CFG)
    sup.set_plan(plan_up, np.array([0.0, 0.0, 0.0]))
    for _ in range(CFG.failures_to_recover):
        ok, cmd = sup.on_cycle(False, (0.0, 0.0),
                               np.array([0.0, 0.0, 0.0]), (0.0, 0.0))
    assert cmd[1] > 0
    # same path, robot yawed past it -> rotate negative
    fp2 = FakePlanner()
    sup2 = RecoverySupervisor(fp2, CFG)
    sup2.set_plan(plan_up, np.array([0.0, 0.0, 3.0]))
    for _ in range(CFG.failures_to_recover):
        ok, cmd = sup2.on_cycle(False, (0.0, 0.0),
                                np.array([0.0, 0.0, 3.0]), (0.0, 0.0))
    assert cmd[1] < 0


def test_real_planner_lost_plan_recovers():
    """Integration: the live MPCPlanner loses its plan mid-course; the
    supervisor re-issues the stored plan and tracking resumes."""
    p = MPCParams().astype("float32")
    planner = MPCPlanner(params=p,
                         solver_cfg=SolverConfig(n_steps=10, max_sqp_iters=8,
                                                 backward="xla"),
                         planner_cfg=PlannerConfig())
    planner.initialize()
    plan = np.stack([np.linspace(0, 3, 30), np.zeros(30), np.zeros(30)], 1)
    pose = np.array([0.0, 0.05, 0.0])
    sup = RecoverySupervisor(planner, CFG)
    assert sup.set_plan(plan, pose)
    ok, cmd, _ = planner.compute_velocity_commands(pose, (0.2, 0.0))
    ok, cmd = sup.on_cycle(ok, cmd, pose, (0.2, 0.0))
    assert ok
    # plan vanishes (host-side fault)
    planner.global_plan = None
    for _ in range(CFG.failures_to_recover):
        ok, cmd, info = (False, (0.0, 0.0), None)
        got = planner.compute_velocity_commands(pose, (0.2, 0.0))
        ok, cmd, info = got
        ok, cmd = sup.on_cycle(ok, cmd, pose, (0.2, 0.0))
    assert ok                     # recovered via replan probe
    assert sup.state is RecoveryState.NORMAL
    assert planner.global_plan is not None
    assert sup.stats.replans == 1
    assert np.isfinite(cmd).all()


def test_node_wiring_publishes_during_recovery():
    """PlannerNode + recovery + safety: a lost plan produces explicit safe
    commands on the cmd topic instead of silence (the reference left the
    last command latched — quirk-adjacent behavior we close)."""
    import struct

    from mpc_ros_tpu.planner.node import PlannerNode, pack_pose, pack_twist

    p = MPCParams().astype("float32")
    planner = MPCPlanner(params=p,
                         solver_cfg=SolverConfig(n_steps=10, max_sqp_iters=8,
                                                 backward="xla"),
                         planner_cfg=PlannerConfig())
    planner.initialize()
    sup = RecoverySupervisor(planner, CFG)
    mon = SafetyMonitor(period_s=0.1)
    node = PlannerNode(planner, period_s=0.05, recovery=sup, safety=mon)
    plan = np.stack([np.linspace(0, 3, 30), np.zeros(30), np.zeros(30)], 1)
    node.pose_topic.publish(pack_pose(0.0, 0.05, 0.0))
    node.feedback_topic.publish(pack_twist(0.2, 0.0))
    assert node.set_plan(plan)
    node._cycle()
    assert node.cmd_topic.read() is not None
    # lose the plan; failures must still produce published (stop) commands
    planner.global_plan = None
    sup._plan = np.zeros((0, 3))          # replan has nothing to offer
    node.cmd_topic.publish(pack_twist(9.0, 9.0))  # sentinel
    for _ in range(CFG.failures_to_recover):
        node._cycle()
    v, w = struct.unpack("<2d", node.cmd_topic.read())
    assert (v, w) != (9.0, 9.0)           # something explicit was published
    assert np.isfinite([v, w]).all()


def test_recovery_success_clears_safety_fault():
    """PlannerNode: the safety fault latched during an outage must re-arm
    when recovery restores planning (otherwise the latched controlled-stop
    would permanently override the recovered commands)."""
    import struct

    from mpc_ros_tpu.planner import SafetyMonitor
    from mpc_ros_tpu.planner.safety import SafetyConfig
    from mpc_ros_tpu.planner.node import PlannerNode, pack_pose, pack_twist

    p = MPCParams().astype("float32")
    planner = MPCPlanner(params=p,
                         solver_cfg=SolverConfig(n_steps=10, max_sqp_iters=8,
                                                 backward="xla"),
                         planner_cfg=PlannerConfig())
    planner.initialize()
    # safety trips BEFORE the ladder engages (2 < 4)
    sup = RecoverySupervisor(planner, RecoveryConfig(failures_to_recover=4))
    mon = SafetyMonitor(period_s=0.1,
                        cfg=SafetyConfig(max_consecutive_failures=2))
    node = PlannerNode(planner, period_s=0.05, recovery=sup, safety=mon)
    plan = np.stack([np.linspace(0, 3, 30), np.zeros(30), np.zeros(30)], 1)
    node.pose_topic.publish(pack_pose(0.0, 0.05, 0.0))
    node.feedback_topic.publish(pack_twist(0.2, 0.0))
    assert node.set_plan(plan)
    node._cycle()
    # outage: safety latches fault before recovery's threshold
    planner.global_plan = None
    for _ in range(3):
        node._cycle()
    assert mon.status.fault
    # the ladder replans on the 4th failure and recovery succeeds; the
    # fault must clear and real commands must flow again
    node._cycle()
    assert sup.state is RecoveryState.NORMAL
    assert not mon.status.fault
    node._cycle()
    v, w = struct.unpack("<2d", node.cmd_topic.read())
    assert abs(v) > 0.0                      # not the latched stop
