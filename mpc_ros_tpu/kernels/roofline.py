"""Speed-of-light accounting for the solver's hot stages.

BASELINE.md config #3 requires "kernel speed-of-light accounting for rollout
+ Riccati": analytic FLOP and HBM-byte counts per stage of the lane-major
batched solve (solver/batch_lane.py), a roofline bound from device peaks,
and efficiency = bound / measured.

Counts are per SQP iteration for a batch B, horizon T, state n=8, control
m=2, n_alpha line-search candidates, f32. The workload is strongly
MEMORY-bound (arithmetic intensity ~2-3 flop/byte vs the v5e knee at ~60),
so the roofline is effectively the HBM bound — which is what the lane-major
layout optimizes.
"""

from __future__ import annotations

import dataclasses

_N = 8     # augmented state dim
_M = 2     # control dim
_F32 = 4   # bytes


@dataclasses.dataclass(frozen=True)
class DeviceSpec:
    """Peak numbers for the roofline. Defaults: TPU v5e (one chip).

    peak_flops_f32 is approximated as 1/4 of the published bf16 MXU peak
    (197 TFLOP/s) — f32 multiplies cost ~4 bf16 passes; VPU-bound stages
    are lower still, making the efficiency numbers conservative on the
    compute axis (the binding constraint here is HBM anyway).
    """

    name: str = "TPU v5e"
    peak_flops_f32: float = 197e12 / 4
    hbm_bytes_per_s: float = 819e9


@dataclasses.dataclass
class StageAccount:
    name: str
    flops: float
    bytes: float

    def roofline_s(self, dev: DeviceSpec) -> float:
        return max(self.flops / dev.peak_flops_f32,
                   self.bytes / dev.hbm_bytes_per_s)

    @property
    def intensity(self) -> float:
        return self.flops / self.bytes


# bytes of one stage's linearization outputs per scenario:
# A(n*n) + B(n*m) + l_s(n) + l_u(m) + l_ss(n*n) + l_uu(m*m) + l_us(m*n)
_STAGE_LIN = (_N * _N + _N * _M + _N + _M + _N * _N + _M * _M + _M * _N)


def account_linearize(B: int, T: int) -> StageAccount:
    """Per-iteration linearize+expand: elementwise over (T, B); reads the
    trajectory slice, writes all stage quadratics."""
    flops = B * T * 80.0                      # trig, polynomial, products
    bytes_ = B * T * ((_N + _M) + _STAGE_LIN) * _F32
    return StageAccount("linearize+expand", flops, bytes_)


def account_backward(B: int, T: int) -> StageAccount:
    """Per-iteration control-limited Riccati scan: per stage ~6 batched
    (8x8)-class matmuls + the 9-combo box QP; reads stage quadratics,
    writes (k, K). The (Vs, Vss) carry stays on chip."""
    matmul_flops = 2 * (_N**3 + 2 * _N * _N * _M + _N * _M * _M
                        + 2 * _M * _M * _N)          # Q-expansion + V update
    boxqp_flops = 9 * 40 + 60                         # enumeration + select
    flops = B * T * float(matmul_flops + boxqp_flops)
    bytes_ = B * T * (_STAGE_LIN + (_M + _M * _N)) * _F32
    return StageAccount("riccati backward", flops, bytes_)


def account_forward(B: int, T: int, n_alpha: int) -> StageAccount:
    """Per-iteration multi-alpha forward rollouts: per stage and alpha a
    feedback matvec + dynamics step + stage cost; writes the candidate
    trajectories (gathered once per iteration)."""
    flops = B * T * n_alpha * (2 * _M * _N + 60.0)
    bytes_ = B * T * ((_N + _M + _M + _M * _N) * _F32          # read bar/k/K
                      + n_alpha * (_N + _M) * _F32 * 2)        # write + gather
    return StageAccount("forward line-search", flops, bytes_)


def account_rollout(B: int, T: int) -> StageAccount:
    """Initial cold/warm-start rollout (once per solve)."""
    flops = B * T * 60.0
    bytes_ = B * T * (_N + _M) * 2 * _F32
    return StageAccount("rollout", flops, bytes_)


def solve_accounting(B: int, T: int, n_alpha: int = 8,
                     n_iters: float = 5.0,
                     dev: DeviceSpec = DeviceSpec()) -> dict:
    """Full-solve accounting: per-iteration stages x n_iters + rollout."""
    stages = [account_linearize(B, T), account_backward(B, T),
              account_forward(B, T, n_alpha)]
    per_iter_flops = sum(s.flops for s in stages)
    per_iter_bytes = sum(s.bytes for s in stages)
    roll = account_rollout(B, T)
    total_flops = per_iter_flops * n_iters + roll.flops
    total_bytes = per_iter_bytes * n_iters + roll.bytes
    total = StageAccount("solve", total_flops, total_bytes)
    return {
        "device": dev.name,
        "B": B,
        "T": T,
        "n_iters": n_iters,
        "stages": {
            s.name: {
                "gflops": s.flops / 1e9,
                "mbytes": s.bytes / 1e6,
                "intensity_flop_per_byte": round(s.intensity, 2),
                "roofline_us": s.roofline_s(dev) * 1e6,
            }
            for s in stages + [roll]
        },
        "solve_roofline_ms": total.roofline_s(dev) * 1e3,
        "solve_gflops": total.flops / 1e9,
        "solve_mbytes": total.bytes / 1e6,
        "bound": ("memory" if total.bytes / dev.hbm_bytes_per_s
                  > total.flops / dev.peak_flops_f32 else "compute"),
    }


def megakernel_accounting(B: int, T: int, n_alpha: int = 8,
                          n_iters: float = 5.0, ddp: bool = False,
                          dev: DeviceSpec = DeviceSpec()) -> dict:
    """Speed-of-light accounting for the whole-solve megakernel.

    The megakernel (kernels/solve_pallas.py) holds the trajectory, gains
    and loop state in VMEM for the entire solve: HBM traffic collapses to
    problem inputs + final outputs, and the binding constraint flips from
    HBM bandwidth (the XLA lane paths stream ~stage-quadratic arrays every
    iteration) to VPU compute. FLOPs are unchanged — every iteration still
    linearizes, scans and line-searches — so the compute side reuses the
    per-iteration stage counts (linearization is inlined into the backward
    scan; the winner re-roll adds one more alpha-like rollout).

    `vpu_flops_f32` approximates the v5e vector unit: (8, 128) lanes x
    4 ALUs x 2 flops (FMA) x ~0.94 GHz ~= 7.7e12. The megakernel is pure
    VPU (no MXU use by design), so that is the relevant compute peak.
    """
    vpu_flops_f32 = 7.7e12
    per_iter = (account_linearize(B, T).flops
                + account_backward(B, T).flops
                + account_forward(B, T, n_alpha + 1).flops)
    if ddp:
        # gated second-order terms (SolverConfig.ddp): per backward stage,
        # the f''(x) Horner (~2P-3), the five dmap entry products (~22
        # FMAs+mults incl. the gate scale) and their Qss additions (~7) —
        # real executed work the GN model would otherwise omit, making
        # per-executed-iteration efficiency read low under ddp
        per_iter += 35.0 * B * T
    flops = per_iter * n_iters + account_rollout(B, T).flops
    in_bytes = B * (6 + 4 + 12 + 2 + 2 + 2 * T) * _F32
    # 6 per-lane scalar outputs: cost, conv, iters, gnorm, mu, done
    out_bytes = B * (_N * (T + 1) + _M * T + 6) * _F32
    bytes_ = float(in_bytes + out_bytes)
    t_compute = flops / vpu_flops_f32
    t_hbm = bytes_ / dev.hbm_bytes_per_s
    return {
        "device": dev.name,
        "kernel": "megakernel",
        "B": B,
        "T": T,
        "n_iters": n_iters,
        "solve_gflops": flops / 1e9,
        "solve_mbytes": bytes_ / 1e6,
        "intensity_flop_per_byte": round(flops / bytes_, 1),
        "vpu_peak_tflops_f32": vpu_flops_f32 / 1e12,
        "solve_roofline_ms": max(t_compute, t_hbm) * 1e3,
        "bound": "compute" if t_compute > t_hbm else "memory",
    }


def efficiency(measured_s: float, accounting: dict) -> float:
    """Fraction of speed-of-light achieved by a measured batch-solve time."""
    return accounting["solve_roofline_ms"] / 1e3 / measured_s
