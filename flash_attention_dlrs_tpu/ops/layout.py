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

    Contiguous reshape — no data movement.  ONLY legal for kernels whose
    stat BlockSpec covers the whole packed-row axis (the one-shot small/mid
    routes): Mosaic requires a block's sublane dim to be a multiple of 8 OR
    equal to the full array dim.  Blocked kernels use the grouped form below.
    """
    b, h, n = x.shape
    return x.reshape(b, h, n // _L, _L)


def unpack_stat(x):
    """Host side: packed [B, H, n/128, 128] -> [B, H, n]."""
    b, h, r, l = x.shape
    return x.reshape(b, h, r * l)


def stat_rows(block_q: int) -> int:
    """Sublane rows one q block's stats occupy in the GROUPED layout.

    A q block owns k = block_q/128 packed stat rows, but a Mosaic block
    mapping needs its sublane dim to be a multiple of NUM_SUBLANES (8) —
    measured on hardware: (1, 1, 4, 128) blocks over a [B, H, n/128, 128]
    array are rejected by the Pallas TPU lowering.  So each q block's group
    is padded up to s = max(k, 8) rows; k >= 8 (block_q >= 1024) is already
    a multiple of 8 because block sizes are multiples of MIN_BLOCK=128...
    1024-divisibility: k in {8,16,32,...} only when block_q is a power-of-two
    multiple of 1024 — enforced by the assert below for anything larger."""
    k = block_q // _L
    s = max(k, geo.NUM_SUBLANES)
    assert s % geo.NUM_SUBLANES == 0, (
        f"block_q={block_q}: stat group of {k} rows is not sublane-tileable"
    )
    return s


def pack_stat_grouped(x, block_q: int):
    """Host side: [B, H, n] (n % block_q == 0) -> [B, H, (n/block_q)*s, 128]
    with each q block's k = block_q/128 stat rows padded to s = stat_rows
    sublanes.  Row-major flattening of group g's first k rows is that block's
    stat vector; rows k..s are padding the kernels never read.  Amplification
    is s/k = max(1024/block_q, 1) — 1x at block_q >= 1024, <= 8x at the
    128 minimum, vs the 128x round-1 lane replication."""
    b, h, n = x.shape
    k = block_q // _L
    s = stat_rows(block_q)
    g = x.reshape(b, h, n // block_q, k, _L)
    if s != k:
        g = jnp.pad(g, ((0, 0), (0, 0), (0, 0), (0, s - k), (0, 0)))
    return g.reshape(b, h, (n // block_q) * s, _L)


def unpack_stat_grouped(x, block_q: int):
    """Host side: grouped [B, H, (n/block_q)*s, 128] -> [B, H, n]."""
    b, h, rows, l = x.shape
    k = block_q // _L
    s = stat_rows(block_q)
    g = x.reshape(b, h, rows // s, s, l)[:, :, :, :k, :]
    return g.reshape(b, h, (rows // s) * block_q)
