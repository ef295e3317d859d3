"""Paged decode attention: single-query-step attention over a paged KV cache.

North-star component with no reference counterpart (the reference is
single-GPU training-shape attention only; SURVEY.md §0, §2.2): decode-time
attention where the KV cache lives in non-contiguous HBM pages.

Design (TPU-first):
- grid ``(B, H_kv, seq_blocks)``; each cell computes all ``Hq/Hkv`` grouped
  query heads against one block of KV pages (GQA head-KV co-location);
- KV pages stay in HBM (``memory_space=ANY``); the kernel issues one async
  DMA per page into a double-buffered VMEM scratch, prefetching block i+1
  while computing block i;
- page lookup indices and sequence lengths arrive via scalar prefetch
  (``PrefetchScalarGridSpec``) so DMA source addresses are computable before
  the body runs;
- INT8 / FP8 payloads are dequantized *in-kernel*: the per-token scale is
  folded into the score matrix (for K) and the probability matrix (for V)
  after the MXU matmuls — dequantized K/V tiles are never materialized;
- online softmax identical to the forward kernel's
  (fwd_kernel.py, ≙ src/flash_attention_kernels.py:88-101), with the
  sm_scale pre-folded into Q.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .. import geometry as geo
from ..utils import default_interpret
from .fwd_kernel import DEFAULT_MASK_VALUE, mxu_dot
from .quantization import (
    Int4QuantizedTensor,
    QuantizedTensor,
    fp8_to_f32_int,
    unpack_int4_rows,
)


def _decode_kernel(
    # scalar prefetch
    lengths_ref,  # [B] int32 (SMEM)
    page_idx_ref,  # [B * pages_per_seq] int32 (SMEM)
    # inputs
    q_ref,  # [1, 1, group_pad, d] VMEM (pre-scaled by sm_scale)
    k_pages_ref,  # [Hkv, P, page_size, d] HBM
    v_pages_ref,
    k_sc_ref,  # [1, 1, 1, bk] VMEM fp32 dense per-block scales, or None
    v_sc_ref,
    slope_ref,  # [1, rows_pad, LANES] fp32 per-ROW ALiBi slope, or None
    # outputs
    o_ref,  # [1, 1, group_pad, d]
    lse_ref,  # [1, 1, rows_pad, NUM_LANES] f32, or None
    # scratch
    k_buf,  # [2, ppb, page_size, d]
    v_buf,
    sems,  # DMA sems [3, 2]
    m_scr,  # [group_pad, 128] f32
    l_scr,
    acc_scr,  # [group_pad, d] f32
    *,
    quantized: bool,
    pages_per_block: int,
    page_size: int,
    pages_per_seq: int,
    num_tokens: int = 1,
    group_pad: int = 0,
    int4: bool = False,
    softcap: float = 0.0,  # Gemma-style logit cap (natural units)
    s8_scores: bool = True,  # int8 K: native s8×s8→s32 score dot (see below)
):
    b = pl.program_id(0)
    h = pl.program_id(1)
    i = pl.program_id(2)
    nb_total = pl.num_programs(0)
    nh_total = pl.num_programs(1)
    bk = pages_per_block * page_size
    length = lengths_ref[b]
    num_blocks = pl.cdiv(length, bk)

    def dma_block(cell_b, cell_h, block, slot):
        """One async copy per page of `block` of cell (cell_b, cell_h) into
        buffer `slot`.  Scales ride a dense BlockSpec-pipelined input, NOT
        per-page DMAs: at 8K ctx the 2 extra ~256 B scale copies per page
        doubled the DMA count and pinned int8 decode at bf16's wall time
        (per-DMA fixed cost, not bandwidth — measured on v5e, round 3)."""
        copies = []
        for j in range(pages_per_block):
            pidx = page_idx_ref[
                cell_b * pages_per_seq + block * pages_per_block + j
            ]
            copies.append(
                pltpu.make_async_copy(
                    k_pages_ref.at[cell_h, pidx],
                    k_buf.at[slot, j],
                    sems.at[slot, 0],
                )
            )
            copies.append(
                pltpu.make_async_copy(
                    v_pages_ref.at[cell_h, pidx],
                    v_buf.at[slot, j],
                    sems.at[slot, 1],
                )
            )
        return copies

    # Cross-cell software pipeline: slot 2 is a handoff buffer that always
    # holds a cell's FIRST block, filled by the PREVIOUS grid cell while its
    # own last block computes.  Without this the DMA pipeline drains at
    # every (batch, head) boundary — the cold first-block fetch cost
    # ~2.4 µs × B·Hkv cells ≈ 25% of the whole step at 8K ctx (measured
    # 609 → 756 GB/s on v5e).  Requires strictly sequential row-major grid
    # execution — dimension_semantics is all-"arbitrary" below.
    is_last_step = i == jnp.maximum(num_blocks - 1, 0)
    next_h = jax.lax.rem(h + 1, nh_total)
    next_b = b + (h + 1) // nh_total
    not_last_cell = jnp.logical_or(b < nb_total - 1, h < nh_total - 1)

    @pl.when(jnp.logical_and(jnp.logical_and(b == 0, h == 0), i == 0))
    def _boot():
        # The very first cell has no predecessor: fill its own handoff slot.
        for c in dma_block(0, 0, 0, 2):
            c.start()

    @pl.when(i == 0)
    def _first():
        m_scr[...] = jnp.full_like(m_scr, -jnp.inf)
        l_scr[...] = jnp.zeros_like(l_scr)
        acc_scr[...] = jnp.zeros_like(acc_scr)
        o_ref[0, 0] = jnp.zeros_like(o_ref[0, 0])
        if lse_ref is not None:
            lse_ref[0, 0] = jnp.full_like(lse_ref[0, 0], DEFAULT_MASK_VALUE)

    # Early cross-issue: overlaps this cell's last compute.  Only safe once
    # the handoff slot's data was consumed (at i == 0), i.e. multi-block
    # cells; 1-block cells issue late (below) after their compute.
    @pl.when(
        jnp.logical_and(
            jnp.logical_and(is_last_step, not_last_cell), num_blocks > 1
        )
    )
    def _xcell_early():
        for c in dma_block(next_b, next_h, 0, 2):
            c.start()

    # Empty cell (idle slot, length 0): nobody computes from the handoff
    # data the predecessor sent — drain the semaphores to keep the protocol
    # aligned for the next cell.
    @pl.when(jnp.logical_and(i == 0, num_blocks == 0))
    def _drain():
        for c in dma_block(b, h, 0, 2):
            c.wait()

    @pl.when(i < num_blocks)
    def _active():
        # Block 0 lives in the handoff slot; blocks ≥ 1 alternate slots 0/1.
        slot = jnp.where(i == 0, 2, jax.lax.rem(i - 1, 2))

        # Prefetch the next within-cell block while this one computes.
        @pl.when(i + 1 < num_blocks)
        def _prefetch():
            for c in dma_block(b, h, i + 1, jax.lax.rem(i, 2)):
                c.start()

        # Wait for this block's pages.
        for c in dma_block(b, h, i, slot):
            c.wait()

        q = q_ref[0, 0]  # [rows, d], already sm_scale-scaled

        _fp8 = (jnp.dtype(jnp.float8_e4m3fn), jnp.dtype(jnp.float8_e5m2))

        def payload(x):
            # fp8 payloads on parts without an fp8 datapath: XLA's convert
            # is cast-bound (69 GB/s measured on v5e) — the integer bit-
            # surgery route (quantization.fp8_to_f32_int) replaces it.
            if jnp.dtype(x.dtype) in _fp8 and not geo.supports_fast_fp8():
                return fp8_to_f32_int(x).astype(q.dtype)
            return x.astype(q.dtype)

        int8_k = (jnp.dtype(k_buf.dtype) == jnp.int8 and not int4
                  and s8_scores)
        int4_s8 = int4 and s8_scores
        if int4_s8:
            # Nibble-planar s8 score dots: the low/high nibble planes each
            # feed the MXU's native s8×s8→s32 path as their own half-dot,
            # and the token-order assembly happens on the [rows, bk]
            # RESULT — d=128× smaller than concatenating unpacked K (the
            # old path's [bk, d] int32 concat + f32 materialization is
            # what pinned int4 ABOVE int8's wall time at half the bytes).
            # Split-half packing (quantization.pack_int4_rows): byte row r
            # of a page holds logical row r (low nibble) and r + ps/2
            # (high), so plane rows are page-major contiguous.
            xi = k_buf[slot].astype(jnp.int32)  # [ppb, ps/2, d]
            k_i8 = jnp.concatenate(
                [((xi << 28) >> 28).astype(jnp.int8),
                 (xi >> 4).astype(jnp.int8)], axis=-2
            ).reshape(bk, -1)  # narrow BEFORE the concat: 1/4 the copy bytes
            qf = q.astype(jnp.float32)
            qa = jnp.max(jnp.abs(qf), axis=-1, keepdims=True)
            q_i = jnp.round(
                qf * jnp.where(qa > 0.0, 127.0 / qa, 0.0)
            ).astype(jnp.int8)
            s32 = jax.lax.dot_general(
                q_i, k_i8, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
            s = s32.astype(jnp.float32) * (qa * (1.0 / 127.0))
        elif int8_k:
            # int8 K pages never leave int8: quantize the q rows (tiny —
            # rows×d elements) and run the score dot on the MXU's native
            # s8×s8→s32 path.  This skips the per-element int8→bf16 dequant
            # of the whole K block, which is what pins int8 decode at a
            # VPU floor well above its bandwidth bound (measured v5e 8K
            # B=8: int8 246 µs vs a ~176 µs byte-count bound with dequant;
            # int4 255 µs at HALF the bytes).  Accuracy: per-row symmetric
            # q quantization adds |δq| ≤ qa/254 per element (qa = row max
            # of the PRE-SCALED q); through the score dot that is a
            # random-walk error of ≈ (qa/254)·√d·σ_k — order 1e-2 on the
            # scores at unit-normal q/k, i.e. a few e-3 on the output, the
            # same class as the K pages' own int8 error.  Tests that pin
            # this path use a tolerance derived from that bound; paths
            # where kernel-vs-oracle fidelity matters more than decode
            # latency (multi-token verify — it feeds accept/reject
            # decisions, and its dequant cost amortizes over T·group rows)
            # pass s8_scores=False to take the dequant route below.
            qf = q.astype(jnp.float32)
            qa = jnp.max(jnp.abs(qf), axis=-1, keepdims=True)  # [rows, 1]
            q_i = jnp.round(
                qf * jnp.where(qa > 0.0, 127.0 / qa, 0.0)
            ).astype(jnp.int8)
            s32 = jax.lax.dot_general(
                q_i, k_buf[slot].reshape(bk, -1),
                (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
            s = s32.astype(jnp.float32) * (qa * (1.0 / 127.0))
        else:
            if int4:
                # [ppb, ps/2, d] packed bytes -> [ppb, ps, d] int4 values
                # (shifts + one contiguous concat; all int32 ops —
                # Mosaic-legal)
                k = unpack_int4_rows(k_buf[slot]).reshape(bk, -1)
                k = k.astype(q.dtype)
            else:
                k = payload(k_buf[slot].reshape(bk, -1))  # [bk, d]
            s = mxu_dot(q, k, (((1,), (1,)), ((), ())))  # [rows, bk]
        if quantized:
            s = s * k_sc_ref[0, 0]  # [1, bk] dense per-token K scales
        if softcap:
            # Gemma-2 attention-logit cap on the SCALED scores (q arrives
            # pre-scaled), before masking — capping the mask sentinel would
            # compress it to ±cap.
            s = softcap * jnp.tanh(s * (1.0 / softcap))

        # Length mask.  Multi-token (verify/chunked-prefill) mode: row
        # r = t·group_pad + g is the t-th of num_tokens new tokens, whose
        # causal horizon is length − (num_tokens − 1 − t); ``length`` is the
        # FINAL sequence length after all num_tokens are appended.
        pos = i * bk + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        if slope_ref is not None:
            # Separable ALiBi (natural units here — this kernel's softmax is
            # base-e): the true bias −m·(q_pos − col) loses its row-constant
            # −m·q_pos to softmax invariance; only +m·col is added.  Rows of
            # one cell are different q HEADS (× tokens in verify mode), so
            # the slope is a per-row column, not a scalar.
            s = s + slope_ref[0][:, :1] * pos.astype(jnp.float32)
        if num_tokens > 1:
            t_of_row = (
                jax.lax.broadcasted_iota(jnp.int32, s.shape, 0) // group_pad
            )
            thr = length - (num_tokens - 1) + t_of_row
        else:
            thr = length
        s = jnp.where(pos < thr, s, DEFAULT_MASK_VALUE)

        m_prev, l_prev = m_scr[...], l_scr[...]
        m_curr = jnp.max(s, axis=-1, keepdims=True)
        m_next = jnp.maximum(m_prev, m_curr)
        alpha = jnp.exp(m_prev - m_next)
        p = jnp.exp(s - m_next[:, :1])  # [g, bk] f32
        l_scr[...] = alpha * l_prev + jnp.sum(p, axis=-1, keepdims=True)
        m_scr[...] = m_next

        if quantized:
            p = p * v_sc_ref[0, 0]  # [1, bk] dense per-token V scales
        # (an s8 PV dot — p per-row-quantized like q above — measured
        # SLOWER on v5e, 240 vs 234 µs, and 5× less accurate: the [rows,bk]
        # p quantization costs more VPU than the V dequant it saves)
        if int4:
            v = unpack_int4_rows(v_buf[slot]).reshape(bk, -1).astype(q.dtype)
        else:
            v = payload(v_buf[slot].reshape(bk, -1))
        pv = mxu_dot(p.astype(q.dtype), v, (((1,), (0,)), ((), ())))
        acc_scr[...] = acc_scr[...] * alpha[:, :1] + pv

        # Write the running normalized output every active block — the last
        # active block's write is the one flushed to HBM (matmul-guide
        # pattern: unconditional store beats a dynamic "last block" branch).
        l = l_scr[...][:, :1]
        l_inv = jnp.where(l == 0.0, 0.0, 1.0 / l)
        o_ref[0, 0] = (acc_scr[...] * l_inv).astype(o_ref.dtype)
        if lse_ref is not None:
            # natural-base logsumexp of this chip's partial attention; the
            # cross-chip combine is merge_partials (parallel/ring.py)
            lse = m_scr[...] + jnp.log(jnp.where(l_scr[...] == 0.0, 1.0,
                                                 l_scr[...]))
            lse = jnp.where(l_scr[...] == 0.0, DEFAULT_MASK_VALUE, lse)
            lse_ref[0, 0] = lse

    # Late cross-issue for 1-block cells: their handoff slot is only freed
    # by the compute above.
    @pl.when(
        jnp.logical_and(
            jnp.logical_and(is_last_step, not_last_cell), num_blocks <= 1
        )
    )
    def _xcell_late():
        for c in dma_block(next_b, next_h, 0, 2):
            c.start()


@functools.partial(
    jax.jit,
    static_argnames=(
        "sm_scale", "pages_per_block", "quantized", "interpret",
        "num_tokens", "group_pad", "return_lse", "int4", "softcap",
        "s8_scores",
    ),
)
def _paged_decode(
    q_grouped,  # [B, Hkv, group_pad, d], pre-scaled
    k_pages,
    v_pages,
    k_scales,  # [B, Hkv, 1, num_blocks·bk] DENSE fp32, or None (unquantized)
    v_scales,
    lengths,
    page_indices,  # [B, pages_per_seq]
    slope_rows=None,  # [Hkv, rows_pad, LANES] fp32 per-row ALiBi slopes
    *,
    sm_scale: float,
    pages_per_block: int,
    quantized: bool,
    interpret: bool,
    num_tokens: int = 1,
    group_pad: int = 0,
    return_lse: bool = False,
    int4: bool = False,
    softcap: float = 0.0,
    s8_scores: bool = True,
):
    batch, num_kv_heads, rows_pad, head_dim = q_grouped.shape
    if not group_pad:
        group_pad = rows_pad
    # int4 pages store two tokens per byte row: the POOL row count is half
    # the logical page_size (scales/masking always use the logical size).
    _, total_pages, store_ps, _ = k_pages.shape
    page_size = store_ps * 2 if int4 else store_ps
    pages_per_seq = page_indices.shape[1]
    num_blocks = pages_per_seq // pages_per_block
    bk = pages_per_block * page_size

    base_kernel = functools.partial(
        _decode_kernel,
        quantized=quantized,
        pages_per_block=pages_per_block,
        page_size=page_size,
        pages_per_seq=pages_per_seq,
        num_tokens=num_tokens,
        group_pad=group_pad,
        int4=int4,
        softcap=float(softcap),
        s8_scores=s8_scores,
    )
    has_slope = slope_rows is not None

    def kernel(l_r, p_r, q_r, k_r, v_r, *rest):
        i = 0
        if quantized:
            ks_r, vs_r = rest[i], rest[i + 1]
            i += 2
        else:
            ks_r = vs_r = None
        sl_r = rest[i] if has_slope else None
        i += 1 if has_slope else 0
        o_r = rest[i]
        i += 1
        lse_r = rest[i] if return_lse else None
        i += 1 if return_lse else 0
        return base_kernel(l_r, p_r, q_r, k_r, v_r, ks_r, vs_r, sl_r, o_r,
                           lse_r, *rest[i:])

    # Dense scales ride the normal BlockSpec pipeline (auto double-buffered
    # by Pallas, one contiguous ~bk·4-byte fetch per block) instead of two
    # tiny manual DMAs per page — see dma_block's docstring.
    sc_spec = pl.BlockSpec(
        (1, 1, 1, bk), lambda b, h, i, *refs: (b, h, 0, i)
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(batch, num_kv_heads, num_blocks),
        in_specs=[
            pl.BlockSpec(
                (1, 1, rows_pad, head_dim), lambda b, h, i, *refs: (b, h, 0, 0)
            ),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ] + ([sc_spec, sc_spec] if quantized else [])
        + ([pl.BlockSpec(
            (1, rows_pad, geo.NUM_LANES), lambda b, h, i, *refs: (h, 0, 0)
        )] if has_slope else []),
        out_specs=[pl.BlockSpec(
            (1, 1, rows_pad, head_dim), lambda b, h, i, *refs: (b, h, 0, 0)
        )] + ([pl.BlockSpec(
            (1, 1, rows_pad, geo.NUM_LANES), lambda b, h, i, *refs: (b, h, 0, 0)
        )] if return_lse else []),
        scratch_shapes=[
            # 3 slots: 2 for the steady-state double buffer + 1 handoff slot
            # filled across cell boundaries (see _decode_kernel).
            pltpu.VMEM((3, pages_per_block, store_ps, head_dim), k_pages.dtype),
            pltpu.VMEM((3, pages_per_block, store_ps, head_dim), v_pages.dtype),
            pltpu.SemaphoreType.DMA((3, 2)),
            pltpu.VMEM((rows_pad, geo.NUM_LANES), jnp.float32),
            pltpu.VMEM((rows_pad, geo.NUM_LANES), jnp.float32),
            pltpu.VMEM((rows_pad, head_dim), jnp.float32),
        ],
    )

    out_shape = [jax.ShapeDtypeStruct(q_grouped.shape, q_grouped.dtype)]
    if return_lse:
        out_shape.append(jax.ShapeDtypeStruct(
            (batch, num_kv_heads, rows_pad, geo.NUM_LANES), jnp.float32))
    outs = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            # All-"arbitrary": the cross-cell handoff pipeline relies on
            # strict sequential row-major grid order on one core.
            dimension_semantics=("arbitrary", "arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )(lengths, page_indices.reshape(-1), q_grouped, k_pages, v_pages,
      *([k_scales, v_scales] if quantized else []),
      *([slope_rows] if has_slope else []))
    if return_lse:
        return outs[0], outs[1]
    return outs[0]


def _dense_block_scales(sc, page_indices, num_blocks, bk):
    """Gather pool scales [Hkv, P, ps, 1] through the page table into the
    dense per-sequence layout the kernel pipelines: [B, Hkv, 1, nb·bk]
    fp32.  Tiny (~4 B/token) — the gather is a per-step XLA op, a few µs at
    8K ctx; the payoff is zero per-page scale DMAs in the kernel.

    The block axis is FLATTENED into the lane dim (unit dim in its place):
    a [B, Hkv, nb, bk] layout with a (1, 1, 1, bk) block is rejected by
    Mosaic whenever nb > 1 (the second-to-last block dim must divide 8 or
    equal the array dim); with the [B, Hkv, 1, nb·bk] layout the unit dim
    IS the array dim and the lane dim is blocked bk at a time."""
    hkv = sc.shape[0]
    b = page_indices.shape[0]
    # NB: sc[:, page_indices, :, 0] would be WRONG — two non-consecutive
    # advanced indices (array + integer) move the broadcast dims to the
    # front ([B, pps, Hkv, ps]).  Drop the unit axis first.
    d = sc[..., 0][:, page_indices]  # [Hkv, B, pps, ps]
    d = jnp.moveaxis(d, 0, 1)  # [B, Hkv, pps, ps]
    return d.reshape(b, hkv, 1, num_blocks * bk).astype(jnp.float32)


def _slope_rows(alibi_slopes, num_q_heads, num_kv_heads, group, group_pad,
                num_tokens=1):
    """Per-ROW ALiBi slopes for the decode grid: one grid cell's q block
    stacks the GQA group's heads (t-major × num_tokens in verify mode), so
    the kernel needs slope-by-row, not slope-by-cell.  Natural units (this
    kernel's softmax is base-e), lane-replicated: [Hkv, rows, LANES]."""
    if alibi_slopes is None:
        return None
    slopes = jnp.asarray(alibi_slopes, jnp.float32).reshape(-1)
    if slopes.shape[0] == 1 and num_q_heads > 1:
        slopes = jnp.broadcast_to(slopes, (num_q_heads,))
    if slopes.shape[0] != num_q_heads:
        raise ValueError(
            f"alibi_slopes must have one slope per q head ({num_q_heads}), "
            f"got {slopes.shape[0]}"
        )
    sr = slopes.reshape(num_kv_heads, group)
    if group_pad != group:
        sr = jnp.pad(sr, ((0, 0), (0, group_pad - group)))
    if num_tokens > 1:
        # verify rows are t-major (row = t·group_pad + g): repeat the group
        # pattern once per token.
        sr = jnp.tile(sr, (1, num_tokens))
    return jnp.broadcast_to(
        sr[:, :, None], (*sr.shape, geo.NUM_LANES)
    )


def _default_pages_per_block(page_size, head_dim, dtype, pages_per_seq,
                             int4=False):
    """Target ~1 MiB of K payload per double-buffered DMA block: measured on
    v5e @8K ctx, smaller blocks are DMA-issue-bound (int8 at 2048-token
    blocks: 414 GB/s; at 4096-token blocks: 707 GB/s) and larger ones blow
    the handoff-slot VMEM.  Bytes-based, so int8 blocks carry twice the
    tokens of bf16 — and int4 (two tokens per stored byte row) twice
    int8's."""
    isz = jnp.dtype(dtype).itemsize
    target = 1 << 20
    stored = page_size * head_dim * isz // (2 if int4 else 1)
    ppb = max(1, target // stored)
    # Keep >= 2 blocks per sequence: with a single block per cell the
    # cross-cell handoff prefetch cannot overlap anything (late issue).
    ppb = min(ppb, max(1, pages_per_seq // 2))
    return int(max(1, min(ppb, pages_per_seq)))


def tuned_pages_per_block(
    q,
    k_pages,
    v_pages,
    lengths,
    page_indices,
    *,
    sm_scale=None,
    alibi_slopes=None,
    logit_softcap: float = 0.0,
) -> int:
    """Timed search over ``pages_per_block`` for this decode workload,
    cached on the (q shape, pool shape, pages_per_seq, dtype, bias/cap
    variant) key — the decode-kernel analogue of the fwd/bwd block tuners
    (the reference autotunes every kernel it ships,
    src/flash_attention_kernels.py:11-15).  Pass the serving
    configuration's alibi/softcap so the probe times the kernel variant
    that will actually run.

    Candidates: powers of two up to pages_per_seq whose double-buffered
    handoff scratch fits a conservative VMEM share.  Concrete arrays only.
    """
    from .. import tuning

    k_vals = (k_pages.values
              if isinstance(k_pages, (QuantizedTensor, Int4QuantizedTensor))
              else k_pages)
    _, _, page_size, d_pool = k_vals.shape  # physical rows (int4: ps/2)
    pages_per_seq = page_indices.shape[1]
    isz = jnp.dtype(k_vals.dtype).itemsize
    cands = []
    ppb = 1
    while ppb <= pages_per_seq:
        # 3 handoff slots × (K + V) payload per block (decode kernel scratch)
        if 3 * 2 * ppb * page_size * d_pool * isz <= 8 * 1024 * 1024:
            cands.append(ppb)
        ppb *= 2
    if not cands:
        cands = [1]

    def build(ppb_):
        def fn(q_, k_, v_, lengths_, idx_):
            return jnp.sum(
                paged_decode_attention(
                    q_, k_, v_, lengths_, idx_,
                    sm_scale=sm_scale, pages_per_block=ppb_,
                    alibi_slopes=alibi_slopes, logit_softcap=logit_softcap,
                ).astype(jnp.float32)
            )

        return jax.jit(fn)

    return int(tuning.tune_decode_pages_per_block(
        build,
        cands,
        [list(q.shape), list(k_vals.shape), pages_per_seq,
         str(k_vals.dtype), type(k_pages).__name__,
         alibi_slopes is not None, float(logit_softcap)],
        (q, k_pages, v_pages, lengths, page_indices),
    ))


def paged_decode_attention(
    q,  # [B, Hq, d]
    k_pages,  # [Hkv, P, page_size, d] array or QuantizedTensor
    v_pages,
    lengths,  # [B] int32
    page_indices,  # [B, pages_per_seq] int32
    *,
    sm_scale=None,
    pages_per_block: int | None = None,
    return_lse: bool = False,
    alibi_slopes=None,
    logit_softcap: float = 0.0,
    interpret=None,
):
    """O = softmax(scale·q·K_pagesᵀ + bias, masked to `lengths`) · V_pages.

    ``alibi_slopes`` (one per q head) adds the ALiBi bias −m·(q_pos − col)
    in its separable in-kernel form.  With ``return_lse`` the published lse
    is then shifted by +m·(length−1) per row (the separable convention);
    the context-sharded merge is unaffected (the shift is shard-invariant),
    but alibi is NOT valid across context shards (column positions are
    shard-local) — the sharded-decode wrappers don't expose it.

    GQA: q heads are grouped onto their KV head inside one grid cell.
    Quantized KV: pass ``QuantizedTensor`` pages (int8 / fp8 payload with
    per-token scales from :func:`quantize_kv_pages`).

    ``pages_per_block`` defaults to ~2048 tokens of KV per double-buffered
    DMA block: measured on v5e @8K ctx, small per-page DMAs are issue-bound
    (~250 GB/s with 128-token blocks) while 2-4K-token blocks reach
    600-700 GB/s of the ~819 GB/s HBM peak.
    """
    batch, num_q_heads, head_dim = q.shape
    quantized = isinstance(k_pages, (QuantizedTensor, Int4QuantizedTensor))
    int4 = isinstance(k_pages, Int4QuantizedTensor)
    if type(k_pages) is not type(v_pages):
        raise ValueError("k_pages and v_pages must be the same kind "
                         f"({type(k_pages).__name__} vs {type(v_pages).__name__})")
    if quantized:
        k_vals, k_sc = k_pages.values, k_pages.scales
        v_vals, v_sc = v_pages.values, v_pages.scales
    else:
        k_vals, v_vals = k_pages, v_pages
        k_sc = v_sc = None
    num_kv_heads = k_vals.shape[0]
    if num_q_heads % num_kv_heads:
        raise ValueError(
            f"num_q_heads ({num_q_heads}) must divide by num_kv_heads ({num_kv_heads})"
        )
    if sm_scale is None:
        sm_scale = float(head_dim) ** -0.5
    if interpret is None:
        interpret = default_interpret()
    statics = dict(
        sm_scale=float(sm_scale), pages_per_block=pages_per_block,
        int4=int4, return_lse=return_lse, softcap=float(logit_softcap),
        interpret=bool(interpret),
    )
    from . import partitioning

    if alibi_slopes is not None or not partitioning.ENABLED:
        # ALiBi slopes are static and indexed by LOCAL head id — bypass the
        # partitioning wrapper (same head-replication rule as training).
        return _paged_decode_local(
            q, k_vals, v_vals, k_sc, v_sc, lengths, page_indices,
            alibi_slopes=alibi_slopes, **statics,
        )
    cp = partitioning.partitioned_paged_decode(
        has_scales=quantized, **statics
    )
    scales = (k_sc, v_sc) if quantized else ()
    return cp(q, k_vals, v_vals, *scales, lengths, page_indices)


def _paged_decode_local(q, k_vals, v_vals, k_sc, v_sc, lengths,
                        page_indices, *, sm_scale, pages_per_block, int4,
                        return_lse, softcap, interpret, alibi_slopes=None):
    """Single-device paged decode on raw payload/scale arrays (the impl the
    GSPMD wrapper partitions; must trace const-free — no jnp.array of host
    data in here).  Scales arrive [Hkv, P, page_size(*2 for int4), 1] or
    None for unquantized pools."""
    batch, num_q_heads, head_dim = q.shape
    quantized = k_sc is not None
    num_kv_heads, _, page_size, d_pool = k_vals.shape
    group = num_q_heads // num_kv_heads
    group_pad = max(geo.NUM_SUBLANES, group)
    # Pools carry a lane-padded head dim (Mosaic page-DMA alignment); pad q
    # to match and slice the output back.  Zero-padded K columns add zero to
    # the scores; zero-padded V columns are sliced off below.
    if head_dim != d_pool:
        q = jnp.pad(q, ((0, 0), (0, 0), (0, d_pool - head_dim)))

    pages_per_seq = page_indices.shape[1]
    if pages_per_block is None:
        pages_per_block = _default_pages_per_block(
            page_size, d_pool, k_vals.dtype, pages_per_seq, int4=int4
        )
    if pages_per_seq % pages_per_block:
        pad = pages_per_block - pages_per_seq % pages_per_block
        page_indices = jnp.pad(page_indices, ((0, 0), (0, pad)))

    logical_ps = page_size * 2 if int4 else page_size
    nb = page_indices.shape[1] // pages_per_block
    bk = pages_per_block * logical_ps
    if quantized:
        k_sc = _dense_block_scales(k_sc, page_indices, nb, bk)
        v_sc = _dense_block_scales(v_sc, page_indices, nb, bk)

    qg = q.reshape(batch, num_kv_heads, group, d_pool) * jnp.asarray(
        sm_scale, q.dtype
    )
    if group_pad != group:
        qg = jnp.pad(qg, ((0, 0), (0, 0), (0, group_pad - group), (0, 0)))

    res = _paged_decode(
        qg, k_vals, v_vals, k_sc, v_sc,
        lengths.astype(jnp.int32), page_indices.astype(jnp.int32),
        _slope_rows(alibi_slopes, num_q_heads, num_kv_heads, group,
                    group_pad),
        sm_scale=float(sm_scale), pages_per_block=pages_per_block,
        quantized=quantized, interpret=bool(interpret),
        return_lse=return_lse, int4=int4, softcap=float(softcap),
    )
    if return_lse:
        o, lse = res
        o = o[:, :, :group, :head_dim].reshape(batch, num_q_heads, head_dim)
        lse = lse[:, :, :group, 0].reshape(batch, num_q_heads)
        return o, lse
    return res[:, :, :group, :head_dim].reshape(batch, num_q_heads, head_dim)


def paged_verify_attention(
    q,  # [B, Hq, T, d] — T new tokens per sequence (draft verify / chunked prefill)
    k_pages,
    v_pages,
    lengths,  # [B] int32 — FINAL lengths (after the T tokens are appended)
    page_indices,
    *,
    sm_scale=None,
    pages_per_block: int | None = None,
    alibi_slopes=None,
    logit_softcap: float = 0.0,
    interpret=None,
):
    """Multi-token paged attention: token t of the T new tokens attends to
    positions < lengths − (T−1−t).  The KV for all T tokens must already be
    written into the pages (same protocol as the single-token decode step).

    This is the verification kernel for speculative decoding and the
    continuation kernel for chunked prefill — one grid pass over the paged
    cache scores all T positions.

    int8 KV note: unlike single-token decode, verify always takes the
    dequantized score dot (``s8_scores=False``) — its output feeds token
    accept/reject decisions, so kernel-vs-oracle fidelity is held to the
    dequant-path envelope (≈2e-4), and with T·group rows per dot the
    dequant cost amortizes where single-token decode's does not.
    """
    batch, num_q_heads, num_tokens, head_dim = q.shape
    quantized = isinstance(k_pages, (QuantizedTensor, Int4QuantizedTensor))
    int4 = isinstance(k_pages, Int4QuantizedTensor)
    if type(k_pages) is not type(v_pages):
        raise ValueError("k_pages and v_pages must be the same kind "
                         f"({type(k_pages).__name__} vs {type(v_pages).__name__})")
    if quantized:
        k_vals, k_sc = k_pages.values, k_pages.scales
        v_vals, v_sc = v_pages.values, v_pages.scales
    else:
        k_vals, v_vals = k_pages, v_pages
        k_sc = v_sc = None

    num_kv_heads, _, page_size, d_pool = k_vals.shape
    if num_q_heads % num_kv_heads:
        raise ValueError(
            f"num_q_heads ({num_q_heads}) must divide by num_kv_heads ({num_kv_heads})"
        )
    group = num_q_heads // num_kv_heads
    group_pad = max(geo.NUM_SUBLANES, group)
    if sm_scale is None:
        sm_scale = float(head_dim) ** -0.5
    if interpret is None:
        interpret = default_interpret()
    if head_dim != d_pool:
        q = jnp.pad(q, ((0, 0), (0, 0), (0, 0), (0, d_pool - head_dim)))

    pages_per_seq = page_indices.shape[1]
    if pages_per_block is None:
        pages_per_block = _default_pages_per_block(
            page_size, d_pool, k_vals.dtype, pages_per_seq, int4=int4
        )
    if pages_per_seq % pages_per_block:
        pad = pages_per_block - pages_per_seq % pages_per_block
        page_indices = jnp.pad(page_indices, ((0, 0), (0, pad)))

    logical_ps = page_size * 2 if int4 else page_size
    nb = page_indices.shape[1] // pages_per_block
    bk = pages_per_block * logical_ps
    if quantized:
        k_sc = _dense_block_scales(k_sc, page_indices, nb, bk)
        v_sc = _dense_block_scales(v_sc, page_indices, nb, bk)

    # [B, Hq, T, d] → [B, Hkv, T, group_pad, d] → rows = T·group_pad,
    # t-major so the kernel recovers t = row // group_pad.
    qg = q.reshape(batch, num_kv_heads, group, num_tokens, d_pool)
    qg = jnp.swapaxes(qg, 2, 3)  # [B, Hkv, T, group, d]
    qg = qg * jnp.asarray(sm_scale, q.dtype)
    if group_pad != group:
        qg = jnp.pad(qg, ((0, 0), (0, 0), (0, 0), (0, group_pad - group), (0, 0)))
    qg = qg.reshape(batch, num_kv_heads, num_tokens * group_pad, d_pool)

    o = _paged_decode(
        qg, k_vals, v_vals, k_sc, v_sc,
        lengths.astype(jnp.int32), page_indices.astype(jnp.int32),
        _slope_rows(alibi_slopes, num_q_heads, num_kv_heads, group,
                    group_pad, num_tokens),
        sm_scale=float(sm_scale), pages_per_block=pages_per_block,
        quantized=quantized, interpret=bool(interpret),
        num_tokens=num_tokens, group_pad=group_pad, int4=int4,
        softcap=float(logit_softcap), s8_scores=False,
    )
    o = o.reshape(batch, num_kv_heads, num_tokens, group_pad, d_pool)
    o = jnp.swapaxes(o[:, :, :, :group, :head_dim], 2, 3)
    return o.reshape(batch, num_q_heads, num_tokens, head_dim)


# ---------------------------------------------------------------------------
# Page-cache helpers
# ---------------------------------------------------------------------------


def quantize_kv_pages(pages: jax.Array, dtype=jnp.int8):
    """Per-token symmetric quantization of [Hkv, P, page_size, d] KV pages.

    ``dtype="int4"`` returns an :class:`Int4QuantizedTensor` (two tokens
    packed per byte along the page axis — half the DMA bytes of int8; the
    decode kernel unpacks in-register).  Gate int4 with the perplexity eval
    (scripts/eval_ppl.py) before serving with it.

    Warns (but proceeds) for fp8 payloads on parts without an fp8 datapath:
    the decode kernel dequantizes them with integer bit surgery
    (quantization.fp8_to_f32_int — 3.8× faster than XLA's cast-bound
    convert, measured 69 → 263 GB/s on v5e), but the extra VPU work still
    leaves fp8 ~1.4× behind int8 there; the DecodeEngine auto-falls-back
    to int8, this low-level op only warns.
    """
    import warnings

    from .. import geometry as geo
    from .quantization import quantize, quantize_int4

    if isinstance(dtype, str) and dtype == "int4":
        return quantize_int4(pages, axis=-1)
    if (
        jnp.dtype(dtype).itemsize == 1
        and jnp.dtype(dtype) != jnp.dtype(jnp.int8)
        and not geo.supports_fast_fp8()
    ):
        warnings.warn(
            f"fp8 KV pages dequantize through integer bit surgery on "
            f"{geo.current_geometry().device_kind} (no fp8 datapath) — "
            "works, but int8 is still ~1.4x faster there; use int8 unless "
            "targeting a v6-class part",
            stacklevel=2,
        )
    return quantize(pages, dtype=dtype, axis=-1)


def paged_reference_attention(
    q, k_pages, v_pages, lengths, page_indices, *, sm_scale=None,
    alibi_slopes=None, logit_softcap: float = 0.0,
):
    """jnp oracle: gather pages into dense K/V, masked softmax attention.
    ``alibi_slopes`` applies the TRUE bias −m·(q_pos − col) with the single
    query at q_pos = length − 1 (the kernel's separable form must match)."""
    if isinstance(k_pages, (QuantizedTensor, Int4QuantizedTensor)):
        k_pages = k_pages.dequantize()
        v_pages = v_pages.dequantize()
    batch, num_q_heads, head_dim = q.shape
    num_kv_heads, _, page_size, d_pool = k_pages.shape
    if sm_scale is None:
        sm_scale = float(head_dim) ** -0.5
    if head_dim != d_pool:  # lane-padded pools (see paged_decode_attention)
        q = jnp.pad(q, ((0, 0), (0, 0), (0, d_pool - head_dim)))
    max_len = page_indices.shape[1] * page_size
    k_dense = jnp.moveaxis(k_pages[:, page_indices], 1, 0).reshape(
        batch, num_kv_heads, max_len, d_pool
    )
    v_dense = jnp.moveaxis(v_pages[:, page_indices], 1, 0).reshape(
        batch, num_kv_heads, max_len, d_pool
    )
    if num_q_heads != num_kv_heads:
        rep = num_q_heads // num_kv_heads
        k_dense = jnp.repeat(k_dense, rep, axis=1)
        v_dense = jnp.repeat(v_dense, rep, axis=1)
    s = jnp.einsum(
        "bhd,bhld->bhl", q.astype(jnp.float32), k_dense.astype(jnp.float32),
        precision=jax.lax.Precision.HIGHEST,
    ) * sm_scale
    if logit_softcap:
        s = logit_softcap * jnp.tanh(s / logit_softcap)
    if alibi_slopes is not None:
        slopes = jnp.asarray(alibi_slopes, jnp.float32).reshape(-1)
        dist = (lengths[:, None, None] - 1).astype(jnp.float32) - jnp.arange(
            max_len, dtype=jnp.float32
        )[None, None, :]
        s = s - slopes[None, :, None] * dist
    mask = jnp.arange(max_len)[None, None, :] < lengths[:, None, None]
    s = jnp.where(mask, s, -jnp.inf)
    m = jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s - jnp.where(jnp.isfinite(m), m, 0.0))
    l = jnp.sum(e, axis=-1, keepdims=True)
    p = jnp.where(l == 0.0, 0.0, e / jnp.where(l == 0.0, 1.0, l))
    o = jnp.einsum(
        "bhl,bhld->bhd", p, v_dense.astype(jnp.float32),
        precision=jax.lax.Precision.HIGHEST,
    )
    return o[..., :head_dim].astype(q.dtype)
