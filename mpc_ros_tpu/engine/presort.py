"""Host-side difficulty presort — an opt-in throughput lever for
permutation-invariant batch workloads (round 4).

The megakernel's per-tile adaptive loop pays mean-over-tiles(max-in-tile)
iterations: at N=30/ddp the per-lane mean is 3.57 but the tile-max mean is
5.38 because the 2.6% of lanes needing 5+ iterations are sprinkled into
nearly every (8x128)-lane tile. Grouping similar-difficulty scenarios into
the same tiles closes that gap. Every ON-DEVICE reordering loses — the
batch rides the minor lane axis, so device permutations pay cross-lane
gathers for every operand (sorted schedule: 2x loss; compact at N=30:
~11 ms fixed overhead at every knob setting, measured round 4) — but a
HOST-side permutation of the inputs before upload costs the device
NOTHING.

Measured on v5e (tools/probe_presort.py, B=524,288, N=30, ddp):

  unsorted                 33.8 ms/batch  (15.5M solves/s), tile-max 5.38
  oracle sort (true iters) 24.8 ms/batch  (21.1M solves/s), tile-max 3.59
  ridge difficulty model   ~30 ms/batch   (~17M solves/s),  tile-max 4.70

The oracle bound is +36%; the shippable ridge model (spearman 0.59
against true iteration counts; closed-form fit on one calibration solve)
captures about a third of it. Stronger predictors were tried and
rejected: gradient boosting reaches tile-max 4.31 but costs 4 s/512k
rows to evaluate (8 us/row — slower than the saving), and a small MLP
failed to beat ridge.

SEMANTICS: `solve_presorted` returns results in the PERMUTED order plus
the permutation (device-side unpermutation would re-pay the cross-lane
gathers this module exists to avoid). Use it for workloads whose
consumption is permutation-invariant — tuning sweeps, Monte-Carlo
statistics, convergence censuses — or fetch to host and restore order
with `PresortedResult.unpermuted_host()` (a contiguous numpy take,
~free; downloads stream back with the program on the axon tunnel).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

import numpy as np

from ..config import MPCParams, SolverConfig

Array = Any


def difficulty_features(z0s: np.ndarray, coeffs: np.ndarray,
                        blob_xy: Optional[np.ndarray] = None,
                        blob_sigma: float = 0.3) -> np.ndarray:
    """Per-scenario difficulty features (B, 16 or 23) — the census class
    behind the iteration tail is high heading error at speed on curved
    references (BENCH_NOTES), so the features are those raw terms, their
    pairwise interactions, and the heading error measured against the
    local path tangent atan(c1).

    `blob_xy` (B, 2): the nearest/primary obstacle blob center per
    scenario (robot frame). Obstacle hardness is dominated by the blob's
    geometry relative to the reference path — the miss distance of the
    path at the blob and the penalty value AT the path (ridge-sliding
    lanes are the ones whose path runs through the blob) — so those
    terms join the feature set."""
    z0s = np.asarray(z0s, np.float64)
    coeffs = np.asarray(coeffs, np.float64)
    v0, cte, eth = z0s[:, 3], z0s[:, 4], z0s[:, 5]
    c0 = coeffs[:, 0]
    c1 = coeffs[:, 1]
    c2 = coeffs[:, 2]
    c3 = coeffs[:, 3]
    etan = np.abs(eth - np.arctan(c1))
    cols = [v0, np.abs(cte), np.abs(eth), np.abs(c1), np.abs(c2),
            np.abs(c3), v0 * np.abs(eth), v0 * np.abs(c2),
            np.abs(eth) * np.abs(c2), np.abs(cte) * np.abs(c2),
            v0 * v0, eth * eth, cte * cte, etan, v0 * etan]
    if blob_xy is not None:
        bx = np.asarray(blob_xy, np.float64)[:, 0]
        by = np.asarray(blob_xy, np.float64)[:, 1]
        py = c0 + c1 * bx + c2 * bx**2 + c3 * bx**3
        slope = c1 + 2 * c2 * bx + 3 * c3 * bx**2
        miss = np.abs(by - py) / np.sqrt(1.0 + slope * slope)
        pen = np.exp(-(miss * miss) / (2.0 * blob_sigma**2))
        start = np.exp(-((bx - 0.0) ** 2 + (by - cte) ** 2)
                       / (2.0 * blob_sigma**2))
        cols += [bx, np.abs(by), miss, pen, pen * v0, pen * np.abs(eth),
                 start]
    cols.append(np.ones_like(v0))
    return np.stack(cols, axis=1)


def fit_difficulty_model(z0s, coeffs, n_iters, reg: float = 1e-3,
                         blob_xy: Optional[np.ndarray] = None,
                         blob_sigma: float = 0.3) -> np.ndarray:
    """Closed-form ridge fit of iteration counts on the difficulty
    features: run ONE calibration solve on a representative scenario draw,
    pass its `SolveResult.n_iters`, get back the weight vector. Refit when
    the ensemble distribution or solver config changes. Pass `blob_xy` on
    obstacle ensembles (and then also at predict time)."""
    X = difficulty_features(z0s, coeffs, blob_xy, blob_sigma)
    y = np.asarray(n_iters, np.float64)
    A = X.T @ X + reg * np.eye(X.shape[1])
    return np.linalg.solve(A, X.T @ y)


def predict_difficulty(model: np.ndarray, z0s, coeffs,
                       blob_xy: Optional[np.ndarray] = None,
                       blob_sigma: float = 0.3) -> np.ndarray:
    """Difficulty keys (B,) — one BLAS matvec, ~1 ms at B=512k."""
    return difficulty_features(z0s, coeffs, blob_xy, blob_sigma) @ \
        np.asarray(model, np.float64)


@dataclasses.dataclass
class PresortedResult:
    """Solve results in difficulty order + the permutation that produced
    them. `result` leaves are device arrays with lane b holding scenario
    `perm[b]` of the caller's batch."""

    result: Any          # SolveResult, permuted order
    perm: np.ndarray     # (B,) caller index of each result lane

    def unpermuted_host(self):
        """Fetch to host and restore the caller's scenario order (numpy
        take — contiguous, ~free; use when per-scenario outputs are
        consumed by index rather than reduced)."""
        import jax

        inv = np.empty_like(self.perm)
        inv[self.perm] = np.arange(len(self.perm))
        host = jax.device_get(self.result)
        return jax.tree.map(
            lambda a: np.asarray(a)[inv] if np.ndim(a) and
            np.shape(a)[0] == len(inv) else np.asarray(a), host)


def solve_presorted(z0s, coeffs, p: MPCParams, cfg: SolverConfig,
                    model: Optional[np.ndarray] = None,
                    keys: Optional[np.ndarray] = None) -> PresortedResult:
    """Solve a host-resident scenario batch with difficulty-presorted
    tiles. `model`: weights from `fit_difficulty_model` (or `keys`: any
    per-scenario difficulty ranking, e.g. true iteration counts from a
    previous identical solve). Host cost: one matvec + argsort + two
    contiguous takes — overlapped with device compute in a pipelined
    sweep."""
    from ..solver.batch_lane import batch_solve_lane

    z0s_h = np.asarray(z0s)
    coeffs_h = np.asarray(coeffs)
    if keys is None:
        assert model is not None, "pass a fitted model or explicit keys"
        keys = predict_difficulty(model, z0s_h, coeffs_h)
    perm = np.argsort(np.asarray(keys), kind="stable")
    res = batch_solve_lane(z0s_h[perm], coeffs_h[perm], p, cfg)
    return PresortedResult(result=res, perm=perm)
