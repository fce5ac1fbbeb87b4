"""Upload/compute/fetch split of the device fleet cycle at 32k/64k robots
(VERDICT r3 item 6). Technique: chained dispatch — K cycles enqueued
back-to-back reusing the same device-resident inputs, one scalar fetch —
isolates device compute; bare transfers of the exact wire tiles measure
the wire; the full begin/finish cycle is the production number."""
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from mpc_ros_tpu.config import MPCParams, SolverConfig
from mpc_ros_tpu.planner.fleet_device import DeviceFleetPlanner
from mpc_ros_tpu.sim import get_shape

dev = jax.devices()[0]
print("device:", dev)


def pct(ts):
    a = np.asarray(ts)
    return f"p50 {np.percentile(a,50)*1e3:6.1f} ms  p99 {np.percentile(a,99)*1e3:6.1f} ms"


for B in (32768, 65536):
    plan0 = get_shape("infinity")
    plans = []
    for i in range(B):
        pl = plan0.copy()
        pl[:, :2] += 10.0 * (i % 64)
        plans.append(pl)
    params = MPCParams(max_angvel=1.5, w_cte=300.0, w_angvel_d=10.0,
                      w_accel_d=10.0)
    cfg = SolverConfig(n_steps=20, ls_iters=4, ddp=True)
    fp = DeviceFleetPlanner(params=params, solver_cfg=cfg, obs_every=0)
    fp.initialize(B)
    poses = np.stack([pl[0] for pl in plans])
    assert fp.set_plans(plans, poses).all()
    vw = np.zeros((B, 2))
    fp.compute_velocity_commands(poses, vw)   # compile

    # full lean cycle
    ts = []
    for _ in range(30):
        t0 = time.time()
        fp.compute_velocity_commands(poses, vw)
        ts.append(time.time() - t0)
    full = ts

    # bare upload of the exact wire tile (B, 5) f32 + sync
    world = np.empty((B, 5), np.float32)
    world[:, :3] = poses
    world[:, 3:] = vw
    ts = []
    for _ in range(30):
        t0 = time.time()
        wd = jax.device_put(world, dev)
        float(jnp.sum(wd[0]))
        ts.append(time.time() - t0)
    up = ts

    # bare fetch of a device-resident (2, B) f32 commands tile
    cm = jax.device_put(np.zeros((2, B), np.float32), dev)
    ts = []
    for _ in range(30):
        t0 = time.time()
        np.asarray(jax.device_get(cm))
        ts.append(time.time() - t0)
    down = ts

    # device compute: K chained cycles on resident inputs, one sync
    wd = jax.device_put(jnp.asarray(world), dev)
    h = fp.begin_cycle(poses, vw)   # ensures jitted fn cached
    import dataclasses as _dc
    sharded_leaves = tuple(sorted(
        f.name for f in _dc.fields(MPCParams)
        if jnp.ndim(getattr(fp.params, f.name)) >= 1))
    from mpc_ros_tpu.planner.fleet_device import _cycle_jit
    Mk = fp._kmax_win.shape[1]
    M = fp._buf.shape[1]
    fn = _cycle_jit(fp.solver_cfg, fp.planner_cfg, M, Mk, False,
                    jnp.dtype(fp.dtype).name, mesh=fp.mesh,
                    sharded_leaves=sharded_leaves)
    K = 8
    ts = []
    carry = fp._carry
    for _ in range(5):
        t0 = time.time()
        acc = None
        for _ in range(K):
            carry, cmds_out, obs = fn(fp._consts, carry, wd, fp.params)
            s = jnp.sum(cmds_out[:, :8])
            acc = s if acc is None else acc + s
        float(acc)
        ts.append((time.time() - t0) / K)
    fp._carry = carry
    comp = ts

    rtt = []
    tiny = jax.device_put(jnp.ones((8,), jnp.float32), dev)
    for _ in range(30):
        t0 = time.time()
        float(jnp.sum(tiny))
        rtt.append(time.time() - t0)

    mb_up = world.nbytes / 1e6
    mb_dn = 2 * B * 4 / 1e6
    print(f"\nB={B}:")
    print(f"  full lean cycle   {pct(full)}")
    print(f"  upload (B,5) f32  {pct(up)}   [{mb_up:.2f} MB]")
    print(f"  fetch (2,B) f32   {pct(down)}   [{mb_dn:.2f} MB]")
    print(f"  device compute    {pct(comp)}   (chained, per cycle)")
    print(f"  bare RTT          {pct(rtt)}")
