"""Checkpoint / resume for long-running sweeps and serving state.

The reference has no checkpointing at all and rebuilds its solver state
every cycle (SURVEY.md §5.4). Here, orbax-backed persistence for:

* sweep checkpoints — weight candidates + accumulated statistics of a
  Monte-Carlo tuning run, so multi-hour sweeps survive preemption and
  resume at the last completed chunk;
* serving state — the warm-start bank (previous optimal controls per
  robot) + plant states of a receding-horizon fleet, so a restarted
  server resumes with warm solves instead of a cold-start transient.

Everything stored is a plain pytree of arrays; restore returns jnp arrays
ready to feed back into the engines.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import numpy as np


def _ckptr():
    import orbax.checkpoint as ocp

    return ocp.PyTreeCheckpointer()


def save_checkpoint(path: str, state: Any) -> None:
    """Persist a pytree of arrays at `path` (a directory), atomically
    replacing any existing checkpoint: the new state is fully written to a
    sibling tmp dir first, then swapped in (orbax's force=True would
    DELETE the old checkpoint before the new one is finalized — a
    preemption mid-save would lose both, the exact failure this module
    exists to survive)."""
    import shutil

    import jax

    path = os.path.abspath(path)
    tmp = path + ".tmp"
    old = path + ".old"
    for d in (tmp, old):
        if os.path.exists(d):
            shutil.rmtree(d)
    state = jax.tree.map(np.asarray, state)
    _ckptr().save(tmp, state)
    if os.path.exists(path):
        os.rename(path, old)
    os.rename(tmp, path)       # new checkpoint becomes live
    if os.path.exists(old):
        shutil.rmtree(old)


def restore_checkpoint(path: str) -> Optional[Any]:
    """Load the pytree saved at `path`; falls back to the `.old` sibling
    if a crash landed between the two renames of save_checkpoint; None if
    neither exists."""
    path = os.path.abspath(path)
    if os.path.exists(path):
        return _ckptr().restore(path)
    if os.path.exists(path + ".old"):
        return _ckptr().restore(path + ".old")
    return None


def serving_state(zs, warm_us, cycle: int) -> dict:
    """Pack a receding-horizon fleet's resumable state."""
    return {"zs": zs, "warm_us": warm_us, "cycle": np.asarray(cycle)}


def sweep_state(candidates, mean_cost, mean_terminal_cte, converged_frac,
                n_done: int) -> dict:
    """Pack a tuning sweep's resumable state (candidates are an MPCParams
    pytree; stored as its leaves dict)."""
    import dataclasses

    cand_dict = {f.name: getattr(candidates, f.name)
                 for f in dataclasses.fields(candidates)}
    return {
        "candidates": cand_dict,
        "mean_cost": mean_cost,
        "mean_terminal_cte": mean_terminal_cte,
        "converged_frac": converged_frac,
        "n_done": np.asarray(n_done),
    }
