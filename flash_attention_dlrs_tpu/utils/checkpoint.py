"""Checkpoint / resume for train state (orbax-backed, with a numpy fallback).

The reference has NO model-state checkpointing — its only "resume" is
benchmark CSV reuse (reference: src/plot_bench_results.py:28-29,60-77;
SURVEY.md §5).  A framework needs the real thing: save/restore of the
(params, opt_state, step) pytree, async-friendly, safe to call from
multi-host (only process 0 writes unless the checkpointer shards).
"""

from __future__ import annotations

import os
import pickle
from typing import Any, Optional, Tuple

import jax
import numpy as np


def _try_orbax():
    try:
        import orbax.checkpoint as ocp

        return ocp
    except Exception:
        return None


def save_checkpoint(path: str, state: Any, *, step: int, keep: int = 3) -> str:
    """Write `state` (any pytree) under path/step_{step}; prunes old steps."""
    ocp = _try_orbax()
    os.makedirs(path, exist_ok=True)
    target = os.path.join(path, f"step_{step:08d}")
    if ocp is not None:
        ckptr = ocp.StandardCheckpointer()
        ckptr.save(os.path.abspath(target), state, force=True)
        ckptr.wait_until_finished()
    else:  # numpy/pickle fallback (single-host only)
        host_state = jax.tree.map(np.asarray, state)
        os.makedirs(target, exist_ok=True)
        with open(os.path.join(target, "state.pkl"), "wb") as f:
            pickle.dump(host_state, f)
    _prune(path, keep)
    return target


def latest_step(path: str) -> Optional[int]:
    if not os.path.isdir(path):
        return None
    steps = [
        int(name.split("_")[1])
        for name in os.listdir(path)
        if name.startswith("step_")
    ]
    return max(steps) if steps else None


def restore_checkpoint(
    path: str, template: Any, *, step: Optional[int] = None
) -> Tuple[Any, int]:
    """Restore into the structure of `template`; returns (state, step)."""
    if step is None:
        step = latest_step(path)
        if step is None:
            raise FileNotFoundError(f"no checkpoints under {path}")
    target = os.path.join(path, f"step_{step:08d}")
    ocp = _try_orbax()
    if ocp is not None and not os.path.exists(
        os.path.join(target, "state.pkl")
    ):
        ckptr = ocp.StandardCheckpointer()
        state = ckptr.restore(os.path.abspath(target), template)
        return state, step
    with open(os.path.join(target, "state.pkl"), "rb") as f:
        host_state = pickle.load(f)
    state = jax.tree.map(jax.numpy.asarray, host_state)
    return state, step


def _prune(path: str, keep: int) -> None:
    steps = sorted(
        name for name in os.listdir(path) if name.startswith("step_")
    )
    for name in steps[:-keep]:
        full = os.path.join(path, name)
        for root, dirs, files in os.walk(full, topdown=False):
            for fn in files:
                os.remove(os.path.join(root, fn))
            for dn in dirs:
                os.rmdir(os.path.join(root, dn))
        os.rmdir(full)
