#!/usr/bin/env python
"""Decompose the single-robot cycle's transfer overhead on the tunnel.

Times, each p50 over 40 reps:
  fetch_1leaf    — device_get of one packed (256,) array
  fetch_7leaf    — device_get of a 7-leaf pytree (SolveResult shape)
  up1_fetch1     — one (16,) upload + trivial jit + one packed fetch
  up4_fetch1     — four small uploads + trivial jit + one packed fetch
  warm_solve_7   — jitted warm ilqr solve, 4 uploads, 7-leaf fetch
                   (what tracking.py does today)
  warm_solve_1   — jitted warm ilqr solve (device-resident u_init carry,
                   packed single-array out), 1 upload, 1-leaf fetch
"""

import json
import time

import numpy as np

import jax
import jax.numpy as jnp


def pct(f, n=40, warmups=2):
    for _ in range(warmups):
        f()
    lat = []
    for _ in range(n):
        t0 = time.time()
        f()
        lat.append(time.time() - t0)
    a = np.asarray(lat) * 1e3
    return {"p50": round(float(np.percentile(a, 50)), 2),
            "p99": round(float(np.percentile(a, 99)), 2)}


def main():
    import sys
    sys.path.insert(0, ".")
    from mpc_ros_tpu.config import MPCParams, SolverConfig
    from mpc_ros_tpu.engine import make_random_scenarios
    from mpc_ros_tpu.solver import ilqr

    dev = jax.devices()[0]
    dtype = jnp.float32
    out = {"device": str(dev)}

    packed = jax.device_put(jnp.ones((256,), dtype), dev)
    leaves = [jax.device_put(jnp.ones((s,), dtype), dev)
              for s in (58, 180, 1, 1, 1, 1, 1)]
    out["fetch_1leaf"] = pct(lambda: jax.device_get(packed))
    out["fetch_7leaf"] = pct(lambda: jax.device_get(leaves))

    @jax.jit
    def trivial(a):
        return jnp.concatenate([a, a * 2.0])[:256]

    host16 = np.ones((16,), np.float32)
    host4 = [np.ones((s,), np.float32) for s in (6, 4, 1, 58)]

    def up1():
        a = jnp.asarray(host16)
        return jax.device_get(trivial(a))

    @jax.jit
    def trivial4(a, b, c, d):
        return jnp.concatenate([a, b, c, d])[:32]

    def up4():
        r = trivial4(jnp.asarray(host4[0]), jnp.asarray(host4[1]),
                     jnp.asarray(host4[2]), jnp.asarray(host4[3][:22]))
        return jax.device_get(r)

    out["up1_fetch1"] = pct(up1)
    out["up4_fetch1"] = pct(up4)

    # the real thing
    p = MPCParams().astype(dtype)
    z0s, coeffs = make_random_scenarios(jax.random.PRNGKey(0), 8, dtype)
    z0 = np.asarray(z0s[0])
    cf = np.asarray(coeffs[0])
    prod = SolverConfig(n_steps=30)

    warm = jax.jit(lambda z, c, pp, ui: ilqr.solve(z, c, pp, prod,
                                                   u_init=ui))
    res0 = jax.device_get(warm(jnp.asarray(z0), jnp.asarray(cf), p,
                               jnp.zeros((29, 2), dtype)))
    us_host = np.asarray(res0.us)

    def cycle_today():
        ui = jnp.asarray(np.concatenate([us_host[1:], us_host[-1:]]))
        r = warm(jnp.asarray(z0), jnp.asarray(cf), p, ui)
        return jax.device_get(r)

    out["warm_solve_7"] = pct(cycle_today)

    @jax.jit
    def warm_packed(inp, prev_us):
        z = inp[:6]
        c = inp[6:10]
        ui = jnp.concatenate([prev_us[1:], prev_us[-1:]])
        r = ilqr.solve(z, c, p, prod, u_init=ui)
        flat = jnp.concatenate([
            r.us.reshape(-1), r.zs.reshape(-1),
            jnp.stack([r.cost, r.converged.astype(dtype),
                       r.n_iters.astype(dtype), r.grad_norm, r.reg])])
        return flat, r.us

    inp_host = np.concatenate([z0, cf]).astype(np.float32)
    carry = jax.device_put(jnp.asarray(us_host), dev)

    def cycle_packed():
        nonlocal carry
        flat, carry = warm_packed(jnp.asarray(inp_host), carry)
        return jax.device_get(flat)

    out["warm_solve_1"] = pct(cycle_packed)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
