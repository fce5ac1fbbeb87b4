"""Roofline accounting sanity tests."""

from mpc_ros_tpu.kernels import (DeviceSpec, account_backward,
                                 account_linearize, efficiency,
                                 solve_accounting)


def test_accounting_scales_linearly():
    a1 = solve_accounting(1024, 29)
    a2 = solve_accounting(2048, 29)
    assert abs(a2["solve_gflops"] / a1["solve_gflops"] - 2.0) < 1e-9
    assert abs(a2["solve_mbytes"] / a1["solve_mbytes"] - 2.0) < 1e-9


def test_memory_bound_regime():
    acct = solve_accounting(4096, 29)
    assert acct["bound"] == "memory"
    # arithmetic intensity far below the v5e knee (~60 flop/byte)
    assert acct["stages"]["riccati backward"]["intensity_flop_per_byte"] < 10


def test_roofline_is_max_of_bounds():
    dev = DeviceSpec(peak_flops_f32=1e12, hbm_bytes_per_s=1e9)  # slow HBM
    s = account_backward(1024, 29)
    assert abs(s.roofline_s(dev) - s.bytes / 1e9) < 1e-12


def test_efficiency_fraction():
    acct = solve_accounting(4096, 29, n_iters=5.0)
    e = efficiency(acct["solve_roofline_ms"] / 1e3, acct)
    assert abs(e - 1.0) < 1e-9
    assert efficiency(1.0, acct) < 0.01


def test_linearize_dominated_by_output_bytes():
    s = account_linearize(4096, 29)
    assert s.intensity < 1.0


def test_megakernel_accounting_compute_bound():
    """VMEM-resident megakernel: tiny HBM traffic, compute-bound roofline,
    and a strictly lower HBM byte count than the streaming lane path."""
    from mpc_ros_tpu.kernels import megakernel_accounting, solve_accounting

    B, T = 16384, 29
    mk = megakernel_accounting(B, T, n_alpha=8, n_iters=6.0)
    ln = solve_accounting(B, T, n_alpha=8, n_iters=6.0)
    assert mk["bound"] == "compute"
    assert mk["solve_mbytes"] < 0.05 * ln["solve_mbytes"]
    # FLOPs are the same order (every iteration still does the work)
    assert 0.5 < mk["solve_gflops"] / ln["solve_gflops"] < 2.5
