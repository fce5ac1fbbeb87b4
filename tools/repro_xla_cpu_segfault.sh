#!/bin/sh
# Reproduce the XLA-CPU accumulated-programs segfault that
# tests/conftest.py::_bound_jax_compile_accumulation works around.
#
# Runs the full suite in ONE process with the per-module
# jax.clear_caches() disabled. Observed behavior at round-2/3 HEAD:
# a deterministic hard crash (SIGSEGV inside backend_compile) after
# roughly ~250 accumulated compiled programs — while the identical
# suite passes with the fixture enabled, and every module passes alone.
# A synthetic 500-distinct-small-programs loop does NOT reproduce, so
# the trigger involves the suite's large solver programs (lax.while_loop
# around long scans), not sheer program count.
#
# Usage (from the repo root; takes ~15 min to reach the crash):
#   sh tools/repro_xla_cpu_segfault.sh
set -x
MPC_ROS_TPU_NO_CACHE_CLEAR=1 python -m pytest tests/ -q
echo "exit code: $? (a negative/139 exit = the segfault reproduced)"
