"""Accuracy bound for the costmap -> Gaussian-blob conversion (VERDICT r1
item 6): the parametric path is the documented canonical obstacle route,
so its representation error vs the grid truth must be measured and pinned.

Representative maps are costmap_2d-style inflations — a plateau of peak
cost inside the inscribed radius with exponential decay outside
(the reference wires costmap_2d as its native obstacle representation,
/root/reference/mpc_ros/src/mpc_planner_ros.cpp:47-49).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mpc_ros_tpu.config import MPCParams, SolverConfig
from mpc_ros_tpu.models.obstacles import (ObstacleMap, blob_cost,
                                          fit_gaussians_to_map,
                                          obstacle_cost)
from mpc_ros_tpu.solver import ilqr


def costmap2d_style(obstacles, extent=4.0, cells=96, r_ins=0.15,
                    decay=3.0):
    """Plateau + exponential-decay inflation, peak 1.0 per obstacle cell,
    combined by max (costmap_2d semantics)."""
    xs = np.linspace(-extent / 2, extent / 2, cells)
    X, Y = np.meshgrid(xs, xs)
    g = np.zeros_like(X)
    for (ox, oy) in obstacles:
        d = np.hypot(X - ox, Y - oy)
        c = np.where(d <= r_ins, 1.0, np.exp(-decay * (d - r_ins)))
        g = np.maximum(g, c)
    return ObstacleMap(grid=jnp.asarray(g, jnp.float64),
                      origin=jnp.asarray([-extent / 2, -extent / 2]),
                      resolution=jnp.asarray(extent / (cells - 1)),
                      weight=jnp.asarray(100.0))


CASES = {
    "single": [(0.6, 0.3)],
    "two": [(0.6, 0.3), (1.4, -0.4)],
    "three": [(0.5, 0.2), (1.2, 0.8), (1.8, -0.3)],
}


def fit_errors(omap, blobs):
    xs = np.linspace(-2.0, 2.0, 81)
    X, Y = np.meshgrid(xs, xs)
    pts = jnp.asarray(np.stack([X.ravel(), Y.ravel()], -1))
    g = np.asarray(jax.vmap(lambda q: obstacle_cost(omap, q[None]))(pts))
    b = np.asarray(jax.vmap(lambda q: blob_cost(blobs, q[None]))(pts))
    g, b = g.ravel(), b.ravel()
    peak = g.max()
    err = np.abs(g - b)
    support = g > 0.01 * peak
    return err.max() / peak, err[support].mean() / peak


@pytest.mark.parametrize("name", list(CASES))
def test_refined_fit_error_bound(name):
    """The bound the README advertises: refined K-blob fit holds
    max error <= 15% of peak, on-support mean <= 3%."""
    omap = costmap2d_style(CASES[name])
    K = 4 if len(CASES[name]) < 3 else 8
    blobs = fit_gaussians_to_map(omap, n_blobs=K)
    mx, mean = fit_errors(omap, blobs)
    assert mx <= 0.15, f"{name}: max fit error {mx:.3f} of peak"
    assert mean <= 0.03, f"{name}: mean on-support error {mean:.4f}"


def test_refinement_actually_helps():
    omap = costmap2d_style(CASES["two"])
    raw = fit_gaussians_to_map(omap, n_blobs=4, refine=False)
    ref = fit_gaussians_to_map(omap, n_blobs=4, refine=True)
    mx_raw, mean_raw = fit_errors(omap, raw)
    mx_ref, mean_ref = fit_errors(omap, ref)
    assert mx_ref < 0.5 * mx_raw, (mx_raw, mx_ref)
    assert mean_ref < 0.5 * mean_raw, (mean_raw, mean_ref)


def test_grid_vs_blob_solution_agreement():
    """Downstream bound: the SOLUTION with the fitted blobs stays close to
    the grid-truth solution — same avoidance side, bounded first-control
    deviation — on scenarios steering past the obstacle."""
    omap = costmap2d_style(CASES["single"])
    blobs = fit_gaussians_to_map(omap, n_blobs=4)
    p = MPCParams(w_cte=100.0, w_etheta=100.0, w_vel=100.0,
                  w_angvel_d=10.0, w_accel_d=10.0).astype(jnp.float64)
    cfg = SolverConfig(n_steps=20, max_sqp_iters=60, tol_grad=1e-8)
    devs = []
    for cte0 in (-0.2, 0.0, 0.2):
        z0 = jnp.asarray([0.0, 0.0, 0.0, 0.4, cte0, 0.0], jnp.float64)
        coeffs = jnp.asarray([cte0, 0.0, 0.0, 0.0], jnp.float64)
        rg = ilqr.solve(z0, coeffs, p, cfg, omap=omap)
        rb = ilqr.solve(z0, coeffs, p, cfg, blobs=blobs)
        assert bool(rg.converged) and bool(rb.converged)
        # both must steer the same way on the first command
        w_g, w_b = float(rg.us[0, 0]), float(rb.us[0, 0])
        if abs(w_g) > 0.05:
            assert np.sign(w_g) == np.sign(w_b), (w_g, w_b)
        devs.append(np.abs(np.asarray(rg.us[0]) - np.asarray(rb.us[0])))
    dev = np.max(devs)
    assert dev < 0.25, f"first-control deviation grid vs blobs: {dev:.3f}"


def test_refine_empty_map_is_noop():
    omap = ObstacleMap.empty()
    blobs = fit_gaussians_to_map(omap, n_blobs=4)
    assert float(jnp.max(jnp.abs(blobs.w))) == 0.0


def test_grid_kink_diagnosis_cost_converged():
    """Grid-costmap convergence wart, diagnosed (VERDICT r2 item 6).

    On the bench grid ensemble ~4-6% of lanes report converged=False at
    any cap. The diagnosis: their minimizers sit ON bilinear cell-boundary
    KINKS, where the surface is non-differentiable — the sampled gradient
    promises descent but every line-search step crosses into a cell where
    cost rises, so the smooth projected-gradient certificate can never
    fire. The lanes are COST-converged (their objective stops improving
    many iterations before the cap; pinned below), i.e. the flag is a
    certificate artifact, not a solution-quality failure; the same
    scenarios on the smooth parametric route converge outright. The PSD
    second-difference curvature (models/obstacles.obstacle_curv_bl) fixed
    the true rejected-step spirals (conv 0.94 -> 0.96, mean iters
    8.1 -> 7.1); the kink residue is documented in README with the
    parametric route as the canonical production path.
    """
    import jax

    from mpc_ros_tpu.engine import make_random_scenarios
    from mpc_ros_tpu.models.obstacles import gaussian_blob_map
    from mpc_ros_tpu.solver.batch_lane import batch_solve_lane

    B = 256
    z0s, coeffs = make_random_scenarios(jax.random.PRNGKey(0), B)
    centers = jax.random.uniform(jax.random.PRNGKey(1), (B, 2),
                                 jnp.float32, 0.3, 1.2)
    omaps = jax.vmap(lambda c: gaussian_blob_map(
        (c[0], c[1]), sigma=0.3, weight=100.0, dtype=jnp.float32))(centers)
    p = MPCParams().astype(jnp.float32)
    mk = lambda cap: SolverConfig(n_steps=30, max_sqp_iters=cap,
                                  ls_iters=5, tol_grad=1e-4,
                                  backward="xla")
    r30 = batch_solve_lane(z0s, coeffs, p, mk(30), omaps=omaps)
    conv = np.asarray(r30.converged)
    # pin the post-curvature-fix convergence level (was 0.89 in round 2)
    assert conv.mean() >= 0.93, conv.mean()
    # the certificate-unconverged lanes are COST-converged: doubling the
    # iteration budget moves their objective by < 0.1% (kink, not failure)
    bad = np.nonzero(~conv)[0]
    if len(bad):
        r60 = batch_solve_lane(z0s, coeffs, p, mk(60), omaps=omaps)
        c30 = np.asarray(r30.cost)[bad]
        c60 = np.asarray(r60.cost)[bad]
        rel = np.abs(c30 - c60) / (1.0 + np.abs(c60))
        assert rel.max() < 1e-3, rel.max()


def test_device_batched_fit_matches_host_greedy():
    """fit_gaussians_to_maps (the jitted batched device fit — the
    per-cycle fleet-scale conversion, VERDICT r3 item 3) must reproduce
    the host greedy fit (refine=False) map-for-map: identical peak
    placement, gamma/w within f32-vs-f64 log-curvature noise."""
    from mpc_ros_tpu.models.obstacles import (fit_gaussians_to_maps,
                                              gaussian_blob_map)

    maps = [gaussian_blob_map((0.8, 0.5), sigma=0.3, weight=100.0),
            gaussian_blob_map((-0.5, 1.0), sigma=0.5, weight=50.0),
            ObstacleMap.empty()]
    omaps = jax.tree.map(lambda *ls: jnp.stack(ls), *maps)
    dev = fit_gaussians_to_maps(omaps, 4)
    for i, m in enumerate(maps):
        host = fit_gaussians_to_map(m, 4, refine=False)
        for nm, tol in (("cx", 1e-5), ("cy", 1e-5), ("gamma", 5e-4),
                        ("w", 1e-4)):
            h = np.asarray(getattr(host, nm), np.float64)
            d = np.asarray(getattr(dev, nm), np.float64)[i]
            err = np.max(np.abs(h - d) / (1.0 + np.abs(h)))
            assert err < tol, (i, nm, h, d)


def test_closed_loop_fit_pipeline_tracks_grid_truth():
    """Closed-loop fidelity of the production costmap->Gaussians pipeline
    (VERDICT r3 item 3): drive the same course against (a) the grid-truth
    costmap and (b) the per-cycle device-fitted blobs (costmap snapshot ->
    fit_gaussians_to_maps -> world-frame install, exactly the per-cycle
    production loop). Both must clear the obstacle; the two closed-loop
    trajectories must stay within a pinned deviation bound."""
    from mpc_ros_tpu.config import PlannerConfig
    from mpc_ros_tpu.models.obstacles import fit_gaussians_to_maps
    from mpc_ros_tpu.planner import MPCPlanner

    n = 120
    plan = np.stack([np.linspace(0, 6, n), np.zeros(n), np.zeros(n)], -1)
    # offset enough that the coarse grid resolves a preferred side
    # (dead-center the bilinear lateral gradient vanishes at cell scale
    # and the grid-truth run brakes/creeps for ~25 s before committing)
    obst = np.array([3.0, 0.2])
    sigma, w_obs = 0.3, 50.0
    cells, extent = 64, 4.0
    xs = np.linspace(-extent / 2, extent / 2, cells)
    XR, YR = np.meshgrid(xs, xs)

    def robot_frame_map(pose):
        ct, st = np.cos(pose[2]), np.sin(pose[2])
        wx = XR * ct - YR * st + pose[0]
        wy = XR * st + YR * ct + pose[1]
        g = np.exp(-((wx - obst[0]) ** 2 + (wy - obst[1]) ** 2)
                   / (2.0 * sigma**2))
        return ObstacleMap(grid=jnp.asarray(g, jnp.float32),
                           origin=jnp.asarray([-extent / 2, -extent / 2],
                                              jnp.float32),
                           resolution=jnp.asarray(extent / (cells - 1),
                                                  jnp.float32),
                           weight=jnp.asarray(w_obs, jnp.float32))

    def run(mode):
        p = MPCParams(dt=0.1, ref_vel=0.5, max_angvel=1.5,
                      w_angvel_d=10.0, w_accel_d=10.0)
        planner = MPCPlanner(params=p, solver_cfg=SolverConfig(n_steps=20),
                             planner_cfg=PlannerConfig(local_plan_length=2.5))
        planner.initialize()
        pose = plan[0].copy()
        planner.set_plan(plan, pose)
        vw = (0.0, 0.0)
        poses = [pose.copy()]
        for _ in range(400):
            omap = robot_frame_map(pose)
            if mode == "grid":
                planner.tracker.obstacle_map = omap
            else:
                batched = jax.tree.map(lambda a: jnp.asarray(a)[None], omap)
                bl = fit_gaussians_to_maps(batched, 4)
                # robot-frame fit centers -> world frame (isotropic blobs
                # rotate exactly); install through the production door
                ct, st = np.cos(pose[2]), np.sin(pose[2])
                cx = np.asarray(bl.cx[0], float)
                cy = np.asarray(bl.cy[0], float)
                from mpc_ros_tpu.models.obstacles import GaussianObstacles
                planner.set_obstacles(GaussianObstacles(
                    cx=jnp.asarray(cx * ct - cy * st + pose[0], jnp.float32),
                    cy=jnp.asarray(cx * st + cy * ct + pose[1], jnp.float32),
                    gamma=bl.gamma[0], w=bl.w[0]))
            ok, (v, w), _ = planner.compute_velocity_commands(pose, vw)
            assert ok
            pose = pose + np.array([v * np.cos(pose[2]) * 0.1,
                                    v * np.sin(pose[2]) * 0.1, w * 0.1])
            vw = (v, w)
            poses.append(pose.copy())
            if pose[0] > 5.5:
                break
        return np.asarray(poses)

    pg = run("grid")
    pf = run("fit")
    assert pg[-1, 0] > 5.5 and pf[-1, 0] > 5.5       # both complete
    dg = np.min(np.hypot(pg[:, 0] - obst[0], pg[:, 1] - obst[1]))
    df = np.min(np.hypot(pf[:, 0] - obst[0], pf[:, 1] - obst[1]))
    assert dg > 0.25 and df > 0.25, (dg, df)         # both really avoid
    # same-course deviation: compare y(x) on the shared x range
    xs_c = np.linspace(0.3, 5.4, 200)
    yg = np.interp(xs_c, pg[:, 0], pg[:, 1])
    yf = np.interp(xs_c, pf[:, 0], pf[:, 1])
    dev = float(np.max(np.abs(yg - yf)))
    assert dev < 0.15, f"closed-loop grid-vs-fit deviation {dev:.3f} m"
