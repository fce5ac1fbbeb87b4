"""Obstacle costmap penalty tests."""

import jax
import jax.numpy as jnp
import numpy as np

from mpc_ros_tpu.config import MPCParams, SolverConfig
from mpc_ros_tpu.models.obstacles import (bilinear_sample,
                                          gaussian_blob_map, obstacle_cost,
                                          obstacle_grad_xy)
from mpc_ros_tpu.solver import ilqr


def test_bilinear_sample_exact_on_grid_points():
    grid = jnp.asarray(np.arange(16, dtype=np.float64).reshape(4, 4))
    origin = jnp.asarray([0.0, 0.0])
    res = 1.0
    for iy in range(3):
        for ix in range(3):
            v = bilinear_sample(grid, origin, res,
                                jnp.asarray([float(ix), float(iy)]))
            assert float(v) == float(grid[iy, ix])
    # midpoint average
    v = bilinear_sample(grid, origin, res, jnp.asarray([0.5, 0.5]))
    assert float(v) == float((grid[0, 0] + grid[0, 1] + grid[1, 0] + grid[1, 1]) / 4)


def test_grad_matches_autodiff_inside_cells():
    omap = gaussian_blob_map((0.5, -0.2), weight=10.0, dtype=jnp.float64)
    pts = jnp.asarray([[0.33, 0.11], [0.81, -0.44], [-0.7, 0.9]])
    g = obstacle_grad_xy(omap, pts)
    for i in range(len(pts)):
        g_ad = jax.grad(lambda xy: obstacle_cost(omap, xy))(pts[i])
        np.testing.assert_allclose(np.asarray(g[i]), np.asarray(g_ad),
                                   rtol=1e-9, atol=1e-9)


def test_outside_map_is_free():
    omap = gaussian_blob_map((0.0, 0.0), weight=10.0, dtype=jnp.float64)
    # far outside: clamped border cells are ~0 for a centered blob
    v = obstacle_cost(omap, jnp.asarray([[100.0, 100.0]]))
    assert float(v) < 1e-6


def test_solver_steers_around_obstacle():
    """A blob on the straight-ahead path must push the optimal trajectory
    sideways vs the obstacle-free solve."""
    dtype = jnp.float64
    z0 = jnp.asarray([0.0, 0.0, 0.0, 0.5, 0.0, 0.0], dtype)
    coeffs = jnp.zeros((4,), dtype)          # straight reference y=0
    p = MPCParams(ref_vel=0.5, w_cte=50.0).astype(dtype)
    cfg = SolverConfig(n_steps=20)
    free = ilqr.solve(z0, coeffs, p, cfg)
    # blob slightly off-axis: a local method cannot break an exact symmetry
    # (zero lateral gradient on the ridge), matching iLQR semantics
    omap = gaussian_blob_map((0.6, 0.05), sigma=0.25, weight=200.0,
                             dtype=dtype)
    blocked = ilqr.solve(z0, coeffs, p, cfg, omap=omap)
    # free solution hugs y=0; blocked one must deviate laterally AWAY from
    # the blob (negative y)
    max_dev_free = float(jnp.max(jnp.abs(free.zs[:, 1])))
    assert max_dev_free < 0.02
    assert float(jnp.min(blocked.zs[:, 1])) < -0.03
    # and the blocked trajectory has lower TOTAL (tracking+obstacle) cost
    # than the free trajectory evaluated under the obstacle
    from mpc_ros_tpu.solver.ilqr import _traj_cost
    J_free_under_obs = float(_traj_cost(free.zs, free.us, p, omap))
    assert float(blocked.cost) < J_free_under_obs


def test_batched_obstacle_solves():
    dtype = jnp.float32
    B = 8
    z0s = jnp.tile(jnp.asarray([0.0, 0.0, 0.0, 0.5, 0.0, 0.0], dtype), (B, 1))
    coeffs = jnp.zeros((B, 4), dtype)
    p = MPCParams(ref_vel=0.5, w_cte=50.0).astype(dtype)
    cfg = SolverConfig(n_steps=10, tol_grad=1e-3)
    centers = jnp.stack([jnp.linspace(0.3, 1.0, B),
                         jnp.zeros((B,), dtype)], axis=-1)
    omaps = jax.vmap(lambda c: gaussian_blob_map(
        (c[0], c[1]), sigma=0.25, weight=100.0, dtype=dtype))(centers)
    res = jax.vmap(lambda z, c, m: ilqr.solve(z, c, p, cfg, omap=m))(
        z0s, coeffs, omaps)
    assert res.us.shape == (B, 9, 2)
    assert bool(jnp.all(jnp.isfinite(res.cost)))


def test_lane_solver_obstacles_match_vmapped():
    """Lane solver with batched obstacle maps must agree with the vmapped
    per-scenario obstacle solves."""
    from mpc_ros_tpu.solver.batch_lane import batch_solve_lane

    dtype = jnp.float64
    B = 8
    z0s = jnp.tile(jnp.asarray([0.0, 0.0, 0.0, 0.5, 0.0, 0.0], dtype), (B, 1))
    coeffs = jnp.zeros((B, 4), dtype)
    p = MPCParams(ref_vel=0.5, w_cte=50.0).astype(dtype)
    cfg = SolverConfig(n_steps=10)
    centers = jnp.stack([jnp.linspace(0.3, 1.0, B),
                         jnp.full((B,), 0.05, dtype)], axis=-1)
    omaps = jax.vmap(lambda c: gaussian_blob_map(
        (c[0], c[1]), sigma=0.25, weight=100.0, dtype=dtype))(centers)
    r_vm = jax.vmap(lambda z, c, m: ilqr.solve(z, c, p, cfg, omap=m))(
        z0s, coeffs, omaps)
    r_ln = batch_solve_lane(z0s, coeffs, p, cfg, omaps=omaps)
    np.testing.assert_allclose(np.asarray(r_ln.us), np.asarray(r_vm.us),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(r_ln.cost), np.asarray(r_vm.cost),
                               rtol=1e-8)


def test_lane_obstacle_sampling_matches_single():
    """obstacle_cost_grad_bl must agree with the per-map functions."""
    from mpc_ros_tpu.models.obstacles import obstacle_cost_grad_bl

    dtype = jnp.float64
    B = 4
    centers = jnp.stack([jnp.linspace(-0.5, 0.6, B),
                         jnp.linspace(0.2, -0.3, B)], axis=-1)
    omaps = jax.vmap(lambda c: gaussian_blob_map(
        (c[0], c[1]), weight=7.0, dtype=dtype))(centers)
    rng = np.random.default_rng(0)
    pts = jnp.asarray(rng.uniform(-1.5, 1.5, size=(5, 2, B)))
    val, dx, dy = obstacle_cost_grad_bl(omaps, pts[:, 0], pts[:, 1])
    for b in range(B):
        omap_b = jax.tree.map(lambda leaf: leaf[b], omaps)
        for i in range(5):
            xy = jnp.asarray([pts[i, 0, b], pts[i, 1, b]])
            v_ref = obstacle_cost(omap_b, xy[None])
            g_ref = obstacle_grad_xy(omap_b, xy)
            np.testing.assert_allclose(float(val[i, b]), float(v_ref),
                                       rtol=1e-10)
            np.testing.assert_allclose(
                [float(dx[i, b]), float(dy[i, b])],
                np.asarray(g_ref), rtol=1e-10, atol=1e-12)


def test_planner_tracking_with_costmap_steers_away():
    """The live planner consumes a robot-frame costmap: with a blob ahead
    slightly left, the commanded angular velocity must steer right
    relative to the obstacle-free command."""
    from mpc_ros_tpu.config import PlannerConfig
    from mpc_ros_tpu.planner import MPCPlanner

    p = MPCParams(dt=0.1, ref_vel=0.5, w_cte=50.0)
    plan = np.stack([np.linspace(0, 5, 100), np.zeros(100),
                     np.zeros(100)], axis=1)

    def run(with_map):
        planner = MPCPlanner(params=p, solver_cfg=SolverConfig(n_steps=10),
                             planner_cfg=PlannerConfig(local_plan_length=2.0,
                                                       delay_mode=False))
        planner.initialize()
        planner.set_plan(plan, np.array([0.0, 0.0, 0.0]))
        if with_map:
            planner.tracker.obstacle_map = gaussian_blob_map(
                (0.6, 0.06), sigma=0.25, weight=300.0, dtype=jnp.float64)
        ok, (v, w), info = planner.compute_velocity_commands(
            np.array([0.0, 0.0, 0.0]), (0.5, 0.0))
        assert ok
        return w

    w_free = run(False)
    w_obs = run(True)
    assert w_obs < w_free - 1e-3, (w_free, w_obs)
