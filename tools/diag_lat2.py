#!/usr/bin/env python
"""Stability probe for the production-latency bench leg: RTT + warm prod
solve, 3 rounds of 50 each, with raw max values — is the 1.6 s outlier a
repeatable artifact or a transient tunnel stall?"""

import json
import time

import numpy as np

import jax
import jax.numpy as jnp


def stats(f, n=50, warm=2):
    for _ in range(warm):
        f()
    ls = []
    for _ in range(n):
        t0 = time.time()
        f()
        ls.append(time.time() - t0)
    a = np.asarray(ls) * 1e3
    return {"p50": round(float(np.percentile(a, 50)), 2),
            "p99": round(float(np.percentile(a, 99)), 2),
            "max": round(float(a.max()), 2)}


def main():
    import sys
    sys.path.insert(0, ".")
    from mpc_ros_tpu.config import MPCParams, SolverConfig
    from mpc_ros_tpu.engine import make_random_scenarios
    from mpc_ros_tpu.planner.tracking import _cycle_jit

    dtype = jnp.float32
    p = MPCParams().astype(dtype)
    z0s, coeffs = make_random_scenarios(jax.random.PRNGKey(0), 8, dtype)
    prod = SolverConfig(n_steps=30)
    cyc = _cycle_jit(prod, False, False)
    inp = np.zeros(6 + prod.n_coeffs + 1)
    inp[:6] = np.asarray(z0s[0], np.float64)
    inp[6:6 + prod.n_coeffs] = np.asarray(coeffs[0], np.float64)
    inp[6 + prod.n_coeffs] = 0.5
    st = {"carry": jnp.zeros((prod.n_controls, 2), dtype)}

    def solve():
        flat, st["carry"] = cyc(jnp.asarray(inp, dtype), st["carry"], p)
        np.asarray(jax.device_get(flat))

    tiny = jnp.ones((8,), dtype)
    out = {}
    for r in range(3):
        out[f"rtt_{r}"] = stats(lambda: float(jnp.sum(tiny)))
        out[f"prod_{r}"] = stats(solve)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
