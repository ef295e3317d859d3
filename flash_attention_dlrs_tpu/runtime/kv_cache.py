"""Paged KV-cache manager: virtual-memory-style page tables for KV state.

North-star component (no reference counterpart — the reference has no
serving/KV state at all, SURVEY.md §0).  Host-side page accounting (free
list, per-sequence page tables) with device-side page pools, designed so the
decode step is a single jitted update + one paged-attention kernel call:

- the page pool lives on device as [Hkv, num_pages, page_size, d] (the layout
  :mod:`..ops.decode` consumes directly);
- appending a token touches exactly one (page, slot) per sequence via a
  scatter (`.at[].set`), batched across sequences and layers under jit;
- page allocation/free is plain Python on the host — it happens at request
  admission/retirement (continuous-batching control plane), never inside the
  per-token hot loop.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from .. import geometry as geo
from ..ops.quantization import QuantizedTensor, qmax_for


def _pad_d(x: jax.Array, d_pool: int) -> jax.Array:
    """Zero-pad the trailing (head) dim up to the pool's lane-aligned width."""
    d = x.shape[-1]
    if d == d_pool:
        return x
    pads = [(0, 0)] * (x.ndim - 1) + [(0, d_pool - d)]
    return jnp.pad(x, pads)


class PageAllocator:
    """Host-side page accounting: free list + per-sequence page tables.

    Shared by the single-layer :class:`PagedKVCache` and the multi-layer
    decode engine (which reuses ONE allocation across all layers — every
    layer's pool is indexed with the same page ids)."""

    def __init__(self, num_pages: int, page_size: int):
        self.page_size = page_size
        self.free_pages = list(range(num_pages - 1, -1, -1))
        self.page_tables: dict = {}
        self.seq_lengths: dict = {}
        # Reference counts for prefix sharing: a page allocated to a
        # sequence starts at 1; add_ref/release manage extra holders (the
        # prefix-cache registry and sequences reusing cached pages).  A page
        # returns to the free list only when its count reaches 0.
        self._refs = np.zeros(num_pages, np.int32)

    def can_allocate(self, num_tokens: int) -> bool:
        return -(-max(num_tokens, 1) // self.page_size) <= len(self.free_pages)

    def allocate(self, seq_id, num_tokens: int) -> None:
        self.allocate_mixed(seq_id, (), num_tokens)

    def allocate_mixed(self, seq_id, shared_pages, num_tokens: int) -> None:
        """Allocate a sequence whose first pages are SHARED (refcounted,
        already filled by a previous sequence) plus fresh pages to cover
        ``num_tokens`` total."""
        if seq_id in self.page_tables:
            raise ValueError(f"sequence {seq_id!r} already allocated")
        shared = list(shared_pages)
        need = -(-max(num_tokens, 1) // self.page_size) - len(shared)
        if need > len(self.free_pages):
            raise MemoryError(
                f"KV cache out of pages: need {need}, free {len(self.free_pages)}"
            )
        fresh = [self.free_pages.pop() for _ in range(max(need, 0))]
        for p in shared:
            self._refs[p] += 1
        for p in fresh:
            self._refs[p] = 1
        self.page_tables[seq_id] = shared + fresh
        self.seq_lengths[seq_id] = 0

    def add_ref(self, pages) -> None:
        for p in pages:
            self._refs[p] += 1

    def ref_counts(self, pages) -> np.ndarray:
        return self._refs[np.asarray(list(pages), np.int32)].copy()

    def release(self, pages) -> None:
        """Drop one reference per page; count-0 pages return to the free list."""
        for p in pages:
            self._refs[p] -= 1
            if self._refs[p] <= 0:
                self._refs[p] = 0
                self.free_pages.append(int(p))

    def ensure_capacity(self, seq_id, new_len: int) -> None:
        table = self.page_tables[seq_id]
        need = -(-new_len // self.page_size)
        while len(table) < need:
            if not self.free_pages:
                raise MemoryError("KV cache out of pages")
            p = self.free_pages.pop()
            self._refs[p] = 1
            table.append(p)

    def free(self, seq_id) -> None:
        pages = self.page_tables.pop(seq_id)
        self.seq_lengths.pop(seq_id)
        self.release(reversed(pages))

    def page_indices_for(self, seq_ids, pages_per_seq: int) -> np.ndarray:
        out = np.zeros((len(seq_ids), pages_per_seq), np.int32)
        for row, sid in enumerate(seq_ids):
            table = self.page_tables[sid]
            out[row, : len(table)] = table
        return out

    def lengths_for(self, seq_ids) -> np.ndarray:
        return np.array(
            [self.seq_lengths.get(s, 0) for s in seq_ids], np.int32
        )

    def decode_step_bookkeeping(self, seq_ids, pages_per_seq: int,
                                wrap_tokens: int = 0, sink_tokens: int = 0):
        """Per-decode-step bookkeeping for a batch: grow each sequence's
        table by one token, emit (rows, offs, tables, positions, lens) and
        advance the stored lengths.  Same contract as the native allocator's
        single-call fused version (native_alloc.py).

        ``wrap_tokens`` > 0 = rolling ring of that many tokens (sliding-
        window serving): the write slot is pos % wrap (overwriting the
        oldest token), capacity never grows past the ring, and positions/
        lens stay TRUE (callers clamp the attention length).
        ``sink_tokens`` (with wrap) pins the FIRST sink_tokens slots
        (StreamingLLM attention sinks): positions below it write in place,
        later positions ring over the wrap_tokens slots after it."""
        n = len(seq_ids)
        rows = np.zeros(n, np.int32)
        offs = np.zeros(n, np.int32)
        tbl = np.zeros((n, pages_per_seq), np.int32)
        positions = np.zeros(n, np.int32)
        lens = np.zeros(n, np.int32)
        for i, sid in enumerate(seq_ids):
            pos = self.seq_lengths[sid]
            if not wrap_tokens:
                idx = pos
            elif pos < sink_tokens:
                idx = pos
            else:
                idx = sink_tokens + (pos - sink_tokens) % wrap_tokens
            self.ensure_capacity(
                sid, min(pos + 1, sink_tokens + wrap_tokens)
                if wrap_tokens else pos + 1)
            table = self.page_tables[sid]
            rows[i] = table[idx // self.page_size]
            offs[i] = idx % self.page_size
            m = min(len(table), pages_per_seq)
            tbl[i, :m] = table[:m]
            positions[i] = pos
            lens[i] = pos + 1
            self.seq_lengths[sid] = pos + 1
        return rows, offs, tbl, positions, lens


@dataclasses.dataclass
class PagedKVCache:
    """Device page pools + host page accounting for one attention layer."""

    k_pages: jax.Array  # [Hkv, num_pages, page_size, d] (payload dtype)
    v_pages: jax.Array
    k_scales: Optional[jax.Array]  # [Hkv, num_pages, page_size, 1] fp32
    v_scales: Optional[jax.Array]
    page_size: int
    allocator: PageAllocator
    # True head dim; pools are padded to the 128-lane multiple because the
    # decode kernel's page DMA needs a lane-aligned trailing dim (Mosaic
    # rejects HBM slices whose last dim isn't a tiling multiple).
    head_dim: int = 0

    # -- construction -------------------------------------------------------

    @classmethod
    def create(
        cls,
        *,
        num_kv_heads: int,
        head_dim: int,
        num_pages: int,
        page_size: int = 256,
        dtype=jnp.bfloat16,
        quantized: bool = False,
    ) -> "PagedKVCache":
        d_pad = geo.current_geometry().round_up(head_dim)
        shape = (num_kv_heads, num_pages, page_size, d_pad)
        k = jnp.zeros(shape, dtype)
        v = jnp.zeros(shape, dtype)
        sc = (
            jnp.ones((num_kv_heads, num_pages, page_size, 1), jnp.float32)
            if quantized
            else None
        )
        return cls(
            k_pages=k,
            v_pages=v,
            k_scales=sc,
            v_scales=None if sc is None else sc,
            page_size=page_size,
            allocator=PageAllocator(num_pages, page_size),
            head_dim=head_dim,
        )

    @property
    def quantized(self) -> bool:
        return self.k_scales is not None

    @property
    def num_pages(self) -> int:
        return self.k_pages.shape[1]

    def kv_for_attention(self):
        """Views consumable by ops.decode.paged_decode_attention."""
        if self.quantized:
            return (
                QuantizedTensor(self.k_pages, self.k_scales),
                QuantizedTensor(self.v_pages, self.v_scales),
            )
        return self.k_pages, self.v_pages

    # -- host-side control plane (delegated to the allocator) ----------------

    @property
    def free_pages(self):
        return self.allocator.free_pages

    @property
    def page_tables(self):
        return self.allocator.page_tables

    @property
    def seq_lengths(self):
        return self.allocator.seq_lengths

    def allocate(self, seq_id, num_tokens: int) -> None:
        self.allocator.allocate(seq_id, num_tokens)

    def ensure_capacity(self, seq_id, new_len: int) -> None:
        self.allocator.ensure_capacity(seq_id, new_len)

    def free(self, seq_id) -> None:
        self.allocator.free(seq_id)

    def page_indices_for(self, seq_ids, pages_per_seq: int) -> np.ndarray:
        return self.allocator.page_indices_for(seq_ids, pages_per_seq)

    def lengths_for(self, seq_ids) -> np.ndarray:
        return self.allocator.lengths_for(seq_ids)

    # -- device-side data plane ---------------------------------------------

    def write_prompt(self, seq_id, k: jax.Array, v: jax.Array) -> None:
        """Write a full prompt's K/V ([Hkv, T, d]) into the sequence's pages."""
        k = _pad_d(k, self.k_pages.shape[-1])
        v = _pad_d(v, self.v_pages.shape[-1])
        t = k.shape[1]
        self.ensure_capacity(seq_id, t)
        table = self.page_tables[seq_id]
        ps = self.page_size
        for pg in range(-(-t // ps)):
            lo, hi = pg * ps, min((pg + 1) * ps, t)
            kc, vc = k[:, lo:hi], v[:, lo:hi]
            if hi - lo < ps:
                pad = ps - (hi - lo)
                kc = jnp.pad(kc, ((0, 0), (0, pad), (0, 0)))
                vc = jnp.pad(vc, ((0, 0), (0, pad), (0, 0)))
            self._write_page(table[pg], kc, vc)
        self.seq_lengths[seq_id] = t

    def append_tokens(self, seq_ids, k_new: jax.Array, v_new: jax.Array) -> None:
        """Append one token per sequence: k_new/v_new [B, Hkv, d]."""
        k_new = _pad_d(k_new, self.k_pages.shape[-1])
        v_new = _pad_d(v_new, self.v_pages.shape[-1])
        rows, slots = [], []
        for sid in seq_ids:
            pos = self.seq_lengths[sid]
            self.ensure_capacity(sid, pos + 1)
            rows.append(self.page_tables[sid][pos // self.page_size])
            slots.append(pos % self.page_size)
            self.seq_lengths[sid] = pos + 1
        pages = jnp.asarray(np.array(rows, np.int32))
        offs = jnp.asarray(np.array(slots, np.int32))
        if self.quantized:
            (
                self.k_pages, self.k_scales, self.v_pages, self.v_scales,
            ) = _append_quantized(
                self.k_pages, self.k_scales, self.v_pages, self.v_scales,
                k_new, v_new, pages, offs,
            )
        else:
            self.k_pages, self.v_pages = _append_tokens(
                self.k_pages, self.v_pages, k_new, v_new, pages, offs
            )

    def _write_page(self, page: int, kc: jax.Array, vc: jax.Array) -> None:
        if self.quantized:
            qmax = qmax_for(self.k_pages.dtype)
            for arr_name, sc_name, chunk in (
                ("k_pages", "k_scales", kc),
                ("v_pages", "v_scales", vc),
            ):
                x = chunk.astype(jnp.float32)
                amax = jnp.max(jnp.abs(x), axis=-1, keepdims=True)
                scale = jnp.where(amax == 0.0, 1.0, amax / qmax)
                payload = x / scale
                if self.k_pages.dtype == jnp.int8:
                    payload = jnp.round(payload)
                setattr(
                    self, arr_name,
                    getattr(self, arr_name).at[:, page].set(
                        payload.astype(self.k_pages.dtype)
                    ),
                )
                setattr(
                    self, sc_name,
                    getattr(self, sc_name).at[:, page].set(scale),
                )
        else:
            self.k_pages = self.k_pages.at[:, page].set(kc.astype(self.k_pages.dtype))
            self.v_pages = self.v_pages.at[:, page].set(vc.astype(self.v_pages.dtype))


@jax.jit
def _append_tokens(k_pages, v_pages, k_new, v_new, pages, offs):
    """Scatter one token per sequence into (page, slot)."""
    # k_new: [B, Hkv, d] → per-sequence updates on axis (pages, offs).
    k_pages = k_pages.at[:, pages, offs].set(
        jnp.swapaxes(k_new, 0, 1).astype(k_pages.dtype)
    )
    v_pages = v_pages.at[:, pages, offs].set(
        jnp.swapaxes(v_new, 0, 1).astype(v_pages.dtype)
    )
    return k_pages, v_pages


@jax.jit
def _append_quantized(k_pages, k_scales, v_pages, v_scales, k_new, v_new, pages, offs):
    qmax = qmax_for(k_pages.dtype)

    def quant(x):  # [B, Hkv, d] → payload/scale per token row
        x = x.astype(jnp.float32)
        amax = jnp.max(jnp.abs(x), axis=-1, keepdims=True)
        scale = jnp.where(amax == 0.0, 1.0, amax / qmax)
        payload = x / scale
        if k_pages.dtype == jnp.int8:
            payload = jnp.round(payload)
        return payload.astype(k_pages.dtype), scale

    kq, ks = quant(k_new)
    vq, vs = quant(v_new)
    k_pages = k_pages.at[:, pages, offs].set(jnp.swapaxes(kq, 0, 1))
    v_pages = v_pages.at[:, pages, offs].set(jnp.swapaxes(vq, 0, 1))
    k_scales = k_scales.at[:, pages, offs].set(jnp.swapaxes(ks, 0, 1))
    v_scales = v_scales.at[:, pages, offs].set(jnp.swapaxes(vs, 0, 1))
    return k_pages, k_scales, v_pages, v_scales
