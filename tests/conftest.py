"""Test harness configuration.

The session environment boots every interpreter with the `axon` TPU-tunnel
platform pre-registered (sitecustomize imports jax and pins
JAX_PLATFORMS=axon). Unit tests must run on CPU — fast, single-tenant, and
with a virtual 8-device mesh so multi-chip sharding is validated without
hardware — so we override via jax.config BEFORE any backend initializes.

float64 is enabled so the scipy oracle can act as a tight golden reference;
solver code is dtype-polymorphic and f32 paths are exercised by passing f32
inputs explicitly.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402  (already imported by sitecustomize; config still mutable)

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import gc  # noqa: E402

import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _bound_jax_compile_accumulation():
    """Clear JAX's executable/tracing caches after every test module.

    The full suite compiles ~hundreds of XLA CPU programs in one process;
    with all of them held live, the CPU compiler deterministically
    segfaults partway through the run (reproduced at HEAD across three
    full-suite runs, always inside backend_compile, while every subset of
    the suite passes — an upstream XLA CPU issue triggered by accumulated
    compiled-program state, not by any single test). Dropping the caches
    at module boundaries bounds that accumulation; modules re-jit shared
    helpers, costing ~10-20% suite runtime.

    Repro for upstream: `tools/repro_xla_cpu_segfault.sh` runs the suite
    with this fixture disabled (MPC_ROS_TPU_NO_CACHE_CLEAR=1) — expect a
    hard crash partway through. A synthetic attempt with 500 distinct
    SMALL programs (scan + while_loop + matmul each) did NOT reproduce,
    so the trigger needs the suite's large solver programs, not sheer
    program count."""
    yield
    if not os.environ.get("MPC_ROS_TPU_NO_CACHE_CLEAR"):
        jax.clear_caches()
        gc.collect()
