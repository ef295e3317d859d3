"""Shared utilities: device detection, padding."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def on_tpu() -> bool:
    """True when the default backend exposes TPU devices (including the
    experimental 'axon' tunnel platform whose device_kind is 'TPU ...')."""
    try:
        return any("tpu" in d.device_kind.lower() for d in jax.devices())
    except Exception:
        return False


def default_interpret() -> bool:
    """Pallas kernels run compiled on TPU, interpreted elsewhere (the
    CPU-runnable fake-backend mechanism the reference lacked; SURVEY §4)."""
    return not on_tpu()


def round_up(n: int, multiple: int) -> int:
    return -(-n // multiple) * multiple


def pad_axis_to(x, axis: int, multiple: int, value=0.0):
    """Pad `axis` of x up to the next multiple; returns (padded, orig_len).

    TPU-native generalization of the reference's pad-head-dim-to-pow2
    (src/flash_attention_torch.py:38-47): here any axis pads to a lane/tile
    multiple and partial blocks are masked in-kernel instead of requiring
    divisibility (src/autotune_configs.py:187).
    """
    n = x.shape[axis]
    target = round_up(n, multiple)
    if target == n:
        return x, n
    pads = [(0, 0)] * x.ndim
    pads[axis] = (0, target - n)
    return jnp.pad(x, pads, constant_values=value), n
