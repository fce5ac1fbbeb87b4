#!/usr/bin/env python
"""Single-solve latency decomposition on the real chip (VERDICT r3 item 1).

Measures, on the axon v5e tunnel, the p50/p99 of:
  rtt        — a bare scalar fetch of a tiny device array (pure tunnel RTT)
  vmap_ddp   — batch-1 through engine.batch_solve with the BENCH throughput
               config (ddp=True -> nested-jacfwd step Hessians under vmap):
               what bench.py's p50_single_solve_ms measured in rounds 1-3
  vmap_gn    — same path, ddp off (the rounds-1/2 measurement)
  prod_cold  — the PRODUCTION single-robot path (planner/tracking.py):
               jitted ilqr.solve, library-default SolverConfig, cold start,
               whole-result device_get (one fetch, like the tracker)
  prod_warm  — same, warm-started by the shift of the previous optimum —
               what the tracker executes every cycle after the first
  cycle      — the full MPCPlanner.compute_velocity_commands cycle (host
               path pipeline + solve + fetch) on the infinity course

Run: python tools/diag_latency.py   (real TPU; nothing else on the tunnel)
"""

import json
import time

import numpy as np

import jax
import jax.numpy as jnp


def pct(f, n=50, warmups=2):
    for _ in range(warmups):
        f()
    lat = []
    for _ in range(n):
        t0 = time.time()
        f()
        lat.append(time.time() - t0)
    a = np.asarray(lat) * 1e3
    return {"p50": round(float(np.percentile(a, 50)), 2),
            "p90": round(float(np.percentile(a, 90)), 2),
            "p99": round(float(np.percentile(a, 99)), 2)}


def main():
    import sys
    sys.path.insert(0, ".")
    from mpc_ros_tpu.config import MPCParams, PlannerConfig, SolverConfig
    from mpc_ros_tpu.engine import batch_solve, make_random_scenarios
    from mpc_ros_tpu.solver import ilqr

    dev = jax.devices()[0]
    out = {"device": str(dev)}
    dtype = jnp.float32
    p = MPCParams().astype(dtype)
    z0s, coeffs = make_random_scenarios(jax.random.PRNGKey(0), 8, dtype)
    z1 = jax.device_put(z0s[:1], dev)
    c1 = jax.device_put(coeffs[:1], dev)

    x = jax.device_put(jnp.ones((8,), dtype), dev)
    out["rtt"] = pct(lambda: float(jnp.sum(x)))

    bench_ddp = SolverConfig(n_steps=30, max_sqp_iters=12, ls_iters=4,
                             ddp=True, tol_grad=1e-4)
    bench_gn = SolverConfig(n_steps=30, max_sqp_iters=12, ls_iters=5,
                            ddp=False, tol_grad=1e-4)
    t0 = time.time()
    float(jnp.sum(batch_solve(z1, c1, p, bench_ddp).us))
    out["vmap_ddp_compile_s"] = round(time.time() - t0, 1)
    out["vmap_ddp"] = pct(
        lambda: float(jnp.sum(batch_solve(z1, c1, p, bench_ddp).us)))
    out["vmap_gn"] = pct(
        lambda: float(jnp.sum(batch_solve(z1, c1, p, bench_gn).us)))

    # production tracker path: library-default SolverConfig, f32 on TPU
    prod = SolverConfig(n_steps=30)
    z0 = z1[0]
    cf = c1[0]

    cold = jax.jit(lambda z, c, pp: ilqr.solve(z, c, pp, prod))
    warm = jax.jit(lambda z, c, pp, ui: ilqr.solve(z, c, pp, prod,
                                                   u_init=ui))
    t0 = time.time()
    res = jax.device_get(cold(z0, cf, p))
    out["prod_compile_s"] = round(time.time() - t0, 1)
    out["prod_cold"] = pct(lambda: jax.device_get(cold(z0, cf, p)))
    us = np.asarray(res.us)
    u_init = jax.device_put(
        jnp.asarray(np.concatenate([us[1:], us[-1:]]), dtype), dev)
    jax.device_get(warm(z0, cf, p, u_init))
    out["prod_warm"] = pct(lambda: jax.device_get(warm(z0, cf, p, u_init)))

    # full planner cycle on the infinity course (mid-course pose)
    from mpc_ros_tpu.planner.planner import MPCPlanner
    from mpc_ros_tpu.sim import get_shape

    plan = get_shape("infinity")
    pl = MPCPlanner(params=MPCParams(max_angvel=1.5, w_cte=300.0,
                                     w_angvel_d=10.0, w_accel_d=10.0),
                    solver_cfg=SolverConfig(n_steps=30), dtype=dtype)
    pl.initialize()
    pose = np.array([plan[40, 0], plan[40, 1], plan[40, 2]])
    pl.set_plan(plan, pose)
    cmd = pl.compute_velocity_commands(pose, (0.3, 0.0))   # compile+warm

    def cycle():
        pl.compute_velocity_commands(pose, (0.3, 0.0))

    out["cycle"] = pct(cycle)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
