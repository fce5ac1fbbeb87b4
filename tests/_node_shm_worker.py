"""Subprocess worker: a full PlannerNode serving over SHARED-MEMORY topics
— the planner process side of the cross-process control-loop test."""

import sys
import time

import numpy as np


def main() -> None:
    import jax

    jax.config.update("jax_platforms", "cpu")

    from mpc_ros_tpu.config import MPCParams, PlannerConfig, SolverConfig
    from mpc_ros_tpu.native import ShmTopic
    from mpc_ros_tpu.planner import MPCPlanner
    from mpc_ros_tpu.planner.node import PlannerNode

    prefix, seconds = sys.argv[1], float(sys.argv[2])
    topics = {
        "pose": ShmTopic(prefix + "_pose"),
        "feedback": ShmTopic(prefix + "_fb"),
        "cmd": ShmTopic(prefix + "_cmd"),
        "traj": ShmTopic(prefix + "_traj"),
    }
    p = MPCParams(dt=0.05, ref_vel=0.5, w_cte=300.0).astype("float32")
    planner = MPCPlanner(params=p,
                         solver_cfg=SolverConfig(n_steps=10, backward="xla"),
                         planner_cfg=PlannerConfig(local_plan_length=2.0))
    planner.initialize()
    node = PlannerNode(planner, period_s=0.02, topics=topics)
    xs = np.linspace(0, 5.0, 100)
    plan = np.stack([xs, np.zeros(100), np.zeros(100)], axis=1)
    assert node.set_plan(plan)
    node.start()
    time.sleep(seconds)
    node.stop()
    for t in topics.values():
        t.close()
    print("cycles", node.cycles, "errors", node.errors, flush=True)


if __name__ == "__main__":
    main()
