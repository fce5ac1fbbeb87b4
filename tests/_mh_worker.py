"""Standalone worker for the real multi-process DCN test.

Launched (twice) by tests/test_multihost_sweep.py, NOT collected by pytest.
Each process owns 2 virtual CPU devices; the two processes form one global
4-device mesh and run the ACTUAL production sweep path: init_multihost ->
host_local_scenarios (cross-process global array assembly) -> sharded_sweep
(shard_map + psum riding the inter-process Gloo transport that stands in
for DCN). Prints one JSON line with the sweep statistics; the parent
asserts both processes computed identical global results.
"""

import json
import os
import sys

os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"

import jax

jax.config.update("jax_platforms", "cpu")


def main() -> None:
    port = sys.argv[1]
    pid = int(sys.argv[2])

    from mpc_ros_tpu.config import MPCParams, SolverConfig
    from mpc_ros_tpu.parallel.multihost import (host_local_scenarios,
                                                init_multihost)
    from mpc_ros_tpu.parallel.sharded import sharded_sweep

    topo = init_multihost(f"127.0.0.1:{port}", num_processes=2,
                          process_id=pid)
    assert topo["processes"] == 2, topo
    assert topo["global_devices"] == 4, topo

    import jax.numpy as jnp

    cfg = SolverConfig(n_steps=8, max_sqp_iters=6, tol_grad=1e-3)
    p = MPCParams().astype(jnp.float32)
    mesh, z0s, coeffs = host_local_scenarios(jax.random.PRNGKey(0), 32,
                                             jnp.float32)
    res, stats = sharded_sweep(mesh, z0s, coeffs, p, cfg)
    print(json.dumps({
        "process": pid,
        "mean_cost": float(stats.mean_cost),
        "converged_frac": float(stats.converged_frac),
    }), flush=True)


if __name__ == "__main__":
    main()
