"""Sublane<->lane relayout helpers for per-row statistics (lse, D).

Per-row statistics live as ``[rows, 1]`` fp32 columns inside the kernels,
but Mosaic's HBM<->VMEM DMA wants a 128-lane trailing dimension.  Round 1
satisfied that by lane-REPLICATING the stats to ``[rows, 128]`` in HBM — a
128x read/write amplification that is pure overhead: at B=8 H=16 N=4096 the
forward wrote 256 MiB of lse of which the backward read lane 0 only, and the
backward wrapper materialized the same 256 MiB again via ``broadcast_to``
(measured ~6% of fwd and ~9% of bwd wall time at N=2048-4096).

This module packs the stats densely instead: HBM shape ``[rows/128, 128]``
whose row-major flattening IS the stat vector, so the host-side conversion
``[B, H, N] <-> [B, H, N/128, 128]`` is a contiguous reshape (metadata only).
The lane<->sublane relayout happens inside the kernel, off the hot loop:

- ``column_to_lanes`` (write side): broadcast each ``[128, 1]`` chunk across
  lanes, mask with the identity, sublane-reduce -> its ``[1, 128]`` row.
- ``lanes_to_column`` (read side): broadcast each ``[1, 128]`` row across
  sublanes, mask with the identity, lane-reduce -> its ``[128, 1]`` column.

One 128x128 VPU multiply+reduce per 128 rows — O(rows·128) work, noise next
to the O(rows·block_kv·d) MXU matmuls it unblocks, and deliberately on the
VPU so it does not contend with the MXU-bound backward.  (The reference has
no analogue: Triton loads ``L`` as a 1-D row vector directly,
src/flash_attention_kernels.py:279-281 — a layout freedom TPU VMEM tiling
does not offer.)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .. import geometry as geo

_L = geo.NUM_LANES


def _eye_mask():
    r = jax.lax.broadcasted_iota(jnp.int32, (_L, _L), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (_L, _L), 1)
    return r == c


def column_to_lanes(col):
    """[k*128, 1] -> [k, 128] with row i holding col[i*128:(i+1)*128, 0]."""
    k = col.shape[0] // _L
    assert col.shape == (k * _L, 1), col.shape
    eye = _eye_mask()
    zero = jnp.zeros((), col.dtype)
    rows = []
    for i in range(k):
        chunk = jnp.broadcast_to(col[i * _L:(i + 1) * _L, :], (_L, _L))
        rows.append(
            jnp.sum(jnp.where(eye, chunk, zero), axis=0, keepdims=True)
        )
    return rows[0] if k == 1 else jnp.concatenate(rows, axis=0)


def lanes_to_column(pane):
    """[k, 128] -> [k*128, 1]; exact inverse of column_to_lanes."""
    k = pane.shape[0]
    assert pane.shape == (k, _L), pane.shape
    eye = _eye_mask()
    zero = jnp.zeros((), pane.dtype)
    cols = []
    for i in range(k):
        row = jnp.broadcast_to(pane[i:i + 1, :], (_L, _L))
        cols.append(
            jnp.sum(jnp.where(eye, row, zero), axis=1, keepdims=True)
        )
    return cols[0] if k == 1 else jnp.concatenate(cols, axis=0)


def pack_stat(x):
    """Host side: [B, H, n] (n % 128 == 0) -> packed [B, H, n/128, 128].

    Contiguous reshape — no data movement."""
    b, h, n = x.shape
    return x.reshape(b, h, n // _L, _L)


def unpack_stat(x):
    """Host side: packed [B, H, n/128, 128] -> [B, H, n]."""
    b, h, r, l = x.shape
    return x.reshape(b, h, r * l)
