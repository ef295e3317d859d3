"""Pallas forward flash-attention kernel (Flash Attention v2, TPU-native).

Re-expresses the reference Triton forward kernel
(reference: src/flash_attention_kernels.py:16-109) for the TPU:

- grid ``(B, H_q, T_q, T_kv)`` with the KV dimension innermost and
  "arbitrary" (the online-softmax reduction), instead of Triton's
  ``(cdiv(N, B_r), B, H)`` persistent programs (src/flash_attention_wrappers.py:46);
- fp32 running statistics (m, l) and output accumulator in VMEM scratch,
  exactly the role of the Triton registers at
  src/flash_attention_kernels.py:84-86;
- natural-base logsumexp residual ``L = m + log(l)`` (the reference stores
  base-2, src/flash_attention_kernels.py:106 — a kernel-internal convention);
- division by ``l`` deferred to the epilogue, as in the reference epilogue
  (src/flash_attention_kernels.py:105-108);
- causal masking + partial-block length masking built in (the reference's own
  kernel had neither — causal only existed in its vendored competitor,
  src/flash_attention_openai_tutorial.py:49-51 — and N had to divide the
  block size, src/autotune_configs.py:187);
- grouped-query attention for free via the K/V BlockSpec index map
  (``h // q_per_kv``) — no materialized head broadcast;
- the logsumexp residual is only written when ``save_residuals`` (training);
  inference skips that HBM traffic entirely.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .. import geometry as geo
from . import layout

# Finite large-negative mask: -inf would produce NaN via exp(-inf - (-inf)).
DEFAULT_MASK_VALUE = -0.7 * float(jnp.finfo(jnp.float32).max)

# Base-2 softmax: the kernels fold sm_scale*log2(e) into Q *before* the
# matmul and exponentiate with exp2 (the VPU's native transcendental).  This
# removes two O(N^2) VPU multiplies from the hot loop — the per-element
# `s * sm_scale` and the x*log2e hidden inside every exp — at O(N·d) cost
# outside the kernel.  Same trick as the reference's base-2 convention
# (src/flash_attention_kernels.py:9,92-94), but applied at the Q tensor
# rather than per score block.
LOG2E = 1.4426950408889634
LN2 = 0.6931471805599453

# Full-precision matmuls: carries the reference's input_precision="ieee"
# discipline (src/flash_attention_kernels.py:6) — JAX's DEFAULT precision is a
# bf16-based fast path even for fp32 operands.  For sub-fp32 operands the MXU
# natively accumulates in fp32 (preferred_element_type), and Mosaic rejects
# HIGHEST there, so the IEEE request applies to fp32 inputs only.
MATMUL_PRECISION = jax.lax.Precision.HIGHEST


FP8_DTYPES = (jnp.dtype(jnp.float8_e4m3fn), jnp.dtype(jnp.float8_e5m2))


def v_payload(v, target_dtype):
    """Dequantize an fp8 V block to the compute dtype inside the kernel
    (fp8 V rides half the HBM->VMEM bytes; ≙ the reference's vendored
    fp8-V forward, src/flash_attention_openai_tutorial.py:127-135).  On
    parts without an fp8 datapath the XLA convert is cast-bound, so the
    integer bit-surgery route is used instead
    (quantization.fp8_to_f32_int, measured 3.8x faster on v5e).

    Contract: fp8 V payloads must be FINITE.  The bit-surgery route maps
    e5m2 Inf/NaN encodings to large finite values rather than propagating
    them (quantize() always produces finite payloads, so this only matters
    for user-supplied fp8 V; callers feeding raw fp8 must clamp first)."""
    if jnp.dtype(v.dtype) in FP8_DTYPES:
        if geo.supports_fast_fp8():
            return v.astype(target_dtype)
        from .quantization import fp8_to_f32_int

        return fp8_to_f32_int(v).astype(target_dtype)
    return v


def mxu_dot(a, b, dims):
    """dot_general with fp32 accumulation and ieee precision for fp32 inputs."""
    prec = (
        MATMUL_PRECISION
        if a.dtype == jnp.float32 and b.dtype == jnp.float32
        else None
    )
    return jax.lax.dot_general(
        a, b, dims, preferred_element_type=jnp.float32, precision=prec
    )


def _lowbias32(x):
    """Wellons' lowbias32 integer mixer on int32 (wrap-around mul is the
    intended mod-2³² arithmetic; logical shifts — int32 ops only, the
    Mosaic-legal subset).  The counter-based RNG under attention dropout."""
    x = x ^ jax.lax.shift_right_logical(x, 16)
    x = x * jnp.int32(0x7FEB352D)
    x = x ^ jax.lax.shift_right_logical(x, 15)
    x = x * jnp.int32(-2073254261)  # 0x846CA68B
    return x ^ jax.lax.shift_right_logical(x, 16)


def dropout_keep_mask(seed, b, h, rows, cols, rate: float):
    """Keep/scale factor M ∈ {0, 1/(1−rate)} for attention dropout.

    Element-indexed (counter-based): the value at (b, h, row, col) depends
    only on the seed and those GLOBAL indices — never on block geometry —
    so the backward regenerates the identical mask even with different
    block sizes (the role of flash-attn's philox offset bookkeeping).
    ``rows``/``cols`` are int32 index arrays (broadcastable); ``seed`` a
    traced int32 scalar; ``b``/``h`` scalars.
    """
    seed_bh = _lowbias32(seed ^ (b * jnp.int32(65599) + h))
    bits = _lowbias32(rows ^ _lowbias32(cols + seed_bh))
    # 24-bit mantissa-exact uniform in [0, 1)
    u = (bits & jnp.int32(0x00FFFFFF)).astype(jnp.float32) * (1.0 / (1 << 24))
    return jnp.where(u >= rate, 1.0 / (1.0 - rate), 0.0)


def seed_input(seed):
    """Traced dropout seed as a [1, LANES] lane-replicated int32 kernel
    input (recompile-free across steps, unlike a static seed)."""
    s = jnp.asarray(seed, jnp.int32).reshape(())
    return jnp.broadcast_to(s[None, None], (1, geo.NUM_LANES))


def seed_block_spec():
    return pl.BlockSpec((1, geo.NUM_LANES), lambda *idx: (0, 0))


def slope_input(alibi_slopes, num_q_heads: int):
    """Per-head ALiBi slopes as a kernel input: [Hq, SUBLANES, LANES] fp32
    holding m_h·log2e (base-2 units, matching the pre-scaled scores),
    tile-replicated so the kernel reads a scalar without a gather.  The
    full (8, 128) trailing tile per head is a Mosaic legality requirement:
    a [1, LANES] block over a [Hq, LANES] array is rejected on hardware
    (sublane dim of a block must be a multiple of 8 or the whole array dim
    — found by scripts/probe_alibi_tpu.py; interpret mode accepts it)."""
    slopes = jnp.asarray(alibi_slopes, jnp.float32) * LOG2E
    return jnp.broadcast_to(
        slopes[:, None, None],
        (num_q_heads, geo.NUM_SUBLANES, geo.NUM_LANES),
    )


def slope_block_spec():
    """One [1, SUBLANES, LANES] slope tile per grid step, indexed by the
    q-head axis (grid axis 1 in every kernel of this package)."""
    return pl.BlockSpec(
        (1, geo.NUM_SUBLANES, geo.NUM_LANES), lambda *idx: (idx[1], 0, 0)
    )


def adapt_optional_refs(base, *, n_lead: int, segmented: bool,
                        has_slope: bool, has_seed: bool = False):
    """Adapt pallas's positional ref list — where optional inputs only exist
    when used — to a kernel signature with fixed (qseg, kvseg, slope, seed)
    slots sitting after the ``n_lead`` leading inputs."""
    if segmented and has_slope and has_seed:
        return base

    def kernel(*refs):
        i = n_lead
        qs = ks = sl = sd = None
        if segmented:
            qs, ks = refs[i], refs[i + 1]
            i += 2
        if has_slope:
            sl = refs[i]
            i += 1
        if has_seed:
            sd = refs[i]
            i += 1
        return base(*refs[:n_lead], qs, ks, sl, sd, *refs[i:])

    return kernel


def _tri_decode(p_id, num_q_blocks: int):
    """Map a linear index over the lower-triangular (iq, ikv) block space
    (ikv ≤ iq) back to coordinates: row iq owns steps [tri(iq), tri(iq+1)).

    Evaluated on the scalar core per grid step — a chain of T−1 compares, far
    cheaper than the 1−2/(T+1) grid steps the rectangular causal grid wastes
    on skipped above-diagonal blocks.
    """
    iq = jnp.int32(0)
    for t in range(1, num_q_blocks):
        iq = jnp.where(p_id >= t * (t + 1) // 2, jnp.int32(t), iq)
    ikv = p_id - iq * (iq + 1) // 2
    return iq, ikv


def _fwd_kernel(
    q_ref,
    k_ref,
    v_ref,
    qseg_ref,  # [1, stat_rows(block_q), LANES] int32 grouped-packed, or None
    kvseg_ref,  # [1, SUBLANES, block_kv] int32, or None
    slope_ref,  # [1, LANES] fp32 per-head ALiBi slope (base-2), or None
    seed_ref,  # [1, LANES] int32 dropout seed, or None
    o_ref,
    m_out_ref,  # None when save_residuals=False (row max, base-2 units)
    linv_out_ref,  # None when save_residuals=False (1/l; 0 on empty rows)
    m_scratch,
    l_scratch,
    acc_scratch,
    *,
    scale2: float,  # sm_scale·log2e, applied to the f32 scores post-dot
    causal: bool,
    kv_len: int,
    block_q: int,
    block_kv: int,
    num_kv_blocks: int,
    tri: bool = False,
    window: int = 0,  # 0 = disabled; else attend to cols in (row-window, row]
    band_w: int = 0,  # >0: banded grid, axis 3 = position within the band
    softcap: float = 0.0,  # Gemma-style logit cap (natural units); 0 = off
    q_off: int = 0,  # kv_len - q_len: bottom-right causal alignment offset
    dropout_rate: float = 0.0,  # P-dropout; mask from seed_ref (see below)
):
    _pid_b, _pid_h = pl.program_id(0), pl.program_id(1)
    if band_w:
        # Banded grid for causal sliding-window attention: each q row only
        # enumerates the ≤ band_w kv blocks its window can touch — O(N·w)
        # grid steps instead of O(N²/2).
        iq = pl.program_id(2)
        j = pl.program_id(3)
        ikv = iq - (band_w - 1) + j
        is_first = j == 0
        is_last = j == band_w - 1  # the diagonal block, always valid
    elif tri:
        # Compacted triangular causal grid: every step is real work, the
        # online-softmax row finishes at its diagonal block (ikv == iq).
        iq, ikv = _tri_decode(pl.program_id(2), num_kv_blocks)
        is_first = ikv == 0
        is_last = ikv == iq
    else:
        iq = pl.program_id(2)
        ikv = pl.program_id(3)
        is_first = ikv == 0
        is_last = ikv == num_kv_blocks - 1

    @pl.when(is_first)
    def _init():
        m_scratch[...] = jnp.full_like(m_scratch, -jnp.inf)
        l_scratch[...] = jnp.zeros_like(l_scratch)
        acc_scratch[...] = jnp.zeros_like(acc_scratch)

    # Causal block-level skip: run only if some (q_pos >= kv_pos) pair exists,
    # i.e. the block's bottom-left corner touches the lower triangle.  The
    # triangular grid never emits above-diagonal steps, so it always runs.
    if band_w:
        # Leading band steps can fall off the left edge (ikv < 0) or below
        # the window for short rows.
        should_run = jnp.logical_and(
            ikv >= 0,
            (ikv + 1) * block_kv - 1 >= iq * block_q - window + 1,
        )
    elif causal and not tri:
        should_run = (iq + 1) * block_q - 1 + q_off >= ikv * block_kv
        if window:
            should_run = jnp.logical_and(
                should_run,
                (ikv + 1) * block_kv - 1 >= iq * block_q + q_off - window + 1,
            )
    else:
        should_run = True

    def _compute(apply_mask):
        q = q_ref[0, 0]  # [block_q, d] — raw
        k = k_ref[0, 0]  # [block_kv, d]

        # S₂ = c·QKᵀ with c = sm_scale·log2e applied to the f32 scores
        # AFTER the dot (no q HBM round-trip, no bf16 re-rounding of
        # scaled q; bit-matches the backward's _recompute_p op order);
        # fp32 accumulation on the MXU
        # (≙ src/flash_attention_kernels.py:92 with input_precision="ieee").
        s = mxu_dot(q, k, (((1,), (1,)), ((), ()))) * scale2
        if softcap:
            # cap·tanh(S/cap) in base-2 units: C₂ = cap·log2e.
            c2 = softcap * LOG2E
            s = c2 * jnp.tanh(s * (1.0 / c2))
        if slope_ref is not None:
            # Separable ALiBi: the true bias −m·(qpos − col) splits into a
            # per-row constant (−m·qpos, cancels in softmax) and the
            # per-column term added here.  slope_ref holds m·log2e (base-2
            # units, matching s); absolute column = col + ikv·block_kv.
            colp = (
                jax.lax.broadcasted_iota(jnp.int32, (block_q, block_kv), 1)
                + ikv * block_kv
            )
            s = s + slope_ref[0, 0, 0] * colp.astype(jnp.float32)

        # Masking: causal within diagonal-crossing blocks + KV-length tail
        # + (packed sequences) segment-id equality.
        if apply_mask:
            mask = None
            if causal:
                row = jax.lax.broadcasted_iota(jnp.int32, (block_q, block_kv), 0)
                col = jax.lax.broadcasted_iota(jnp.int32, (block_q, block_kv), 1)
                # Bottom-right alignment: q row i sits at kv position
                # i + q_off (q_off = kv_len - q_len; 0 for self-attention).
                mask = (row + iq * block_q + q_off) >= (col + ikv * block_kv)
                if window:
                    wm = (row + iq * block_q + q_off) - (
                        col + ikv * block_kv) < window
                    mask = jnp.logical_and(mask, wm)
            if kv_len % block_kv != 0:
                col = jax.lax.broadcasted_iota(jnp.int32, (block_q, block_kv), 1)
                lm = (col + ikv * block_kv) < kv_len
                mask = lm if mask is None else jnp.logical_and(mask, lm)
            if qseg_ref is not None:
                # Grouped packed q seg ids: first block_q/128 rows of the
                # stat_rows-tall tile -> [block_q, 1] column (one VPU
                # identity-mask reduce per 128 rows; only on mask-applying
                # blocks, which with segments is every block).
                qcol = layout.lanes_to_column(
                    qseg_ref[0, : block_q // geo.NUM_LANES, :]
                )
                seg = qcol == kvseg_ref[0][:1, :]  # [bq, bkv]
                mask = seg if mask is None else jnp.logical_and(mask, seg)
            s = jnp.where(mask, s, DEFAULT_MASK_VALUE)

        # Online-softmax update (≙ src/flash_attention_kernels.py:93-98).
        m_prev = m_scratch[...]  # [block_q, 128] lane-replicated
        l_prev = l_scratch[...]
        m_curr = jnp.max(s, axis=-1, keepdims=True)  # [block_q, 1]
        m_next = jnp.maximum(m_prev, m_curr)  # broadcast over lanes
        alpha = jnp.exp2(m_prev - m_next)
        p = jnp.exp2(s - m_next[:, :1])  # [block_q, block_kv]
        if apply_mask and (q_off or qseg_ref is not None):
            # Rows fully masked WITHIN a running block (cross-length causal
            # with a q block spanning the first visible row; segment ids
            # matching nothing): their s is the finite mask constant
            # everywhere, so m == mask-floor and p would be uniform 1 —
            # zero them so l stays 0 and the epilogue emits O = 0.  With
            # q_off == 0 and no segments a running block's rows always keep
            # at least their own diagonal column visible, so the select over
            # [block_q, block_kv] would be pure VPU overhead on every
            # diagonal/tail block — skip it.
            p = jnp.where(s > 0.5 * DEFAULT_MASK_VALUE, p, 0.0)
        l_next = alpha * l_prev + jnp.sum(p, axis=-1, keepdims=True)

        m_scratch[...] = m_next
        l_scratch[...] = l_next

        if dropout_rate:
            # Dropout on P AFTER the l accumulation (the softmax denominator
            # is over undropped probabilities — flash-attn semantics); the
            # mask is a pure function of (seed, b, h, global row, global
            # col), so the backward regenerates it bit-identically whatever
            # block geometry it runs with.
            rowg = jax.lax.broadcasted_iota(
                jnp.int32, (block_q, block_kv), 0) + iq * block_q
            colg = jax.lax.broadcasted_iota(
                jnp.int32, (block_q, block_kv), 1) + ikv * block_kv
            p = p * dropout_keep_mask(
                seed_ref[0, 0], _pid_b, _pid_h,
                rowg, colg, dropout_rate,
            )

        # Unnormalized accumulate: acc = acc * alpha + P V
        # (division deferred to epilogue, ≙ src/flash_attention_kernels.py:105).
        v = v_payload(v_ref[0, 0], q_ref.dtype)  # [block_kv, d]
        pv = mxu_dot(p.astype(v.dtype), v, (((1,), (0,)), ((), ())))
        acc_scratch[...] = acc_scratch[...] * alpha[:, :1] + pv

    # Diagonal blocks of the compacted triangular grid waste ~half their
    # matmul FLOPs on masked scores (the cost that made N=1024-2048 the
    # general kernel's valley, see fwd_mid.py).  Process them as row strips
    # instead: strip i's scores only cover its (i+1)·sub_d visible columns,
    # so the wasted fraction drops from 0.5 to ~sub_d/(2·block_q) (12% at
    # 1024-wide blocks).  Tri mode only: there the masked block class is
    # exactly {diagonal} (the KV tail block is the diagonal of the last
    # row), windows ride the banded grid, and q_off == 0.
    sub_d = 256  # Mosaic compile time blows up below 256 (see fwd_mid)
    use_diag_sub = (
        tri and qseg_ref is None
        and block_q == block_kv and block_q % sub_d == 0 and block_q > sub_d
    )

    def _compute_diag():
        nsub = block_q // sub_d
        q_all = q_ref[0, 0]
        k_all = k_ref[0, 0]
        v_all = v_ref[0, 0]
        has_tail = kv_len % block_kv != 0
        for i in range(nsub):
            w = (i + 1) * sub_d
            sl = slice(i * sub_d, (i + 1) * sub_d)
            s = mxu_dot(
                q_all[sl, :], k_all[:w, :], (((1,), (1,)), ((), ())),
            ) * scale2
            if softcap:
                c2 = softcap * LOG2E
                s = c2 * jnp.tanh(s * (1.0 / c2))
            row = jax.lax.broadcasted_iota(jnp.int32, (sub_d, w), 0)
            col = jax.lax.broadcasted_iota(jnp.int32, (sub_d, w), 1)
            if slope_ref is not None:
                # Strip columns are the block's first w: absolute column
                # = col + ikv·block_kv (same separable form as _compute).
                s = s + slope_ref[0, 0, 0] * (
                    col + ikv * block_kv
                ).astype(jnp.float32)
            mask = (row + i * sub_d) >= col
            if has_tail:
                mask = jnp.logical_and(mask, (col + ikv * block_kv) < kv_len)
            s = jnp.where(mask, s, DEFAULT_MASK_VALUE)
            m_prev = m_scratch[sl, :]
            l_prev = l_scratch[sl, :]
            m_curr = jnp.max(s, axis=-1, keepdims=True)
            m_next = jnp.maximum(m_prev, m_curr)
            alpha = jnp.exp2(m_prev - m_next)
            p = jnp.exp2(s - m_next[:, :1])
            l_next = alpha * l_prev + jnp.sum(p, axis=-1, keepdims=True)
            m_scratch[sl, :] = m_next
            l_scratch[sl, :] = l_next
            if dropout_rate:
                p = p * dropout_keep_mask(
                    seed_ref[0, 0], _pid_b, _pid_h,
                    row + iq * block_q + i * sub_d, col + ikv * block_kv,
                    dropout_rate,
                )
            pv = mxu_dot(
                p.astype(v_all.dtype), v_all[:w, :], (((1,), (0,)), ((), ()))
            )
            acc_scratch[sl, :] = acc_scratch[sl, :] * alpha[:, :1] + pv

    # Interior blocks (fully below the causal diagonal, fully inside the KV
    # length) skip the iota/compare/select entirely — the element mask only
    # runs on diagonal-crossing and tail blocks.  With packed segments the
    # boundary positions are data-dependent, so every block masks.
    if qseg_ref is not None:
        if should_run is True:
            _compute(True)
        else:
            pl.when(should_run)(lambda: _compute(True))
    else:
        needs_mask = None
        if causal:
            needs_mask = (ikv + 1) * block_kv - 1 > iq * block_q + q_off
            if window:
                # Blocks the window's lower edge passes through.
                edge = ikv * block_kv < (iq + 1) * block_q + q_off - window
                needs_mask = jnp.logical_or(needs_mask, edge)
        if kv_len % block_kv != 0:
            tail = (ikv + 1) * block_kv > kv_len
            needs_mask = (
                tail if needs_mask is None else jnp.logical_or(needs_mask, tail)
            )

        if needs_mask is None:
            pl.when(should_run)(lambda: _compute(False))
        elif use_diag_sub:
            # tri: should_run is statically True; masked blocks are exactly
            # the diagonal ones → route them to the strip path.
            pl.when(needs_mask)(_compute_diag)
            pl.when(jnp.logical_not(needs_mask))(lambda: _compute(False))
        else:
            pl.when(jnp.logical_and(should_run, needs_mask))(lambda: _compute(True))
            pl.when(jnp.logical_and(should_run, jnp.logical_not(needs_mask)))(
                lambda: _compute(False)
            )

    @pl.when(is_last)
    def _epilogue():
        l = l_scratch[...][:, :1]
        m = m_scratch[...][:, :1]
        # Fully-masked rows (l == 0) produce O = 0, finite LSE sentinel.
        l_inv = jnp.where(l == 0.0, 0.0, 1.0 / l)
        o_ref[0, 0] = (acc_scratch[...] * l_inv).astype(o_ref.dtype)
        if m_out_ref is not None:
            # Residuals are the RAW softmax stats (m in base-2 units — the
            # scores were pre-scaled by log2e — and 1/l), NOT the combined
            # lse: the backward recomputes P = exp2(s − m)·(1/l) with
            # bit-identical exp2 arguments to this forward, so the
            # recompute error CANCELS in dS (measured on v5e: 3e-8 max
            # |ΔP| vs 5e-5 through a combined-lse round trip — which cost
            # ~3e-3 in fp32 dQ/dK through the (dP−D) cancellation).  lse
            # for the public API is derived host-side (stats_to_lse).
            # Empty (fully-masked) rows: m := +BIG, 1/l := 0 ⇒ P = 0
            # without inf/NaN.  GROUPED packed layout (layout.py): the
            # block's k = block_q/128 dense stat rows, remaining
            # stat_rows−k sublanes are Mosaic tile padding.
            m_out = jnp.where(l == 0.0, -DEFAULT_MASK_VALUE, m)
            m_out_ref[0, 0, : block_q // geo.NUM_LANES, :] = (
                layout.column_to_lanes(m_out)
            )
            linv_out_ref[0, 0, : block_q // geo.NUM_LANES, :] = (
                layout.column_to_lanes(l_inv[:, :1])
            )


@functools.partial(
    jax.jit,
    static_argnames=(
        "sm_scale",
        "causal",
        "block_q",
        "block_kv",
        "kv_len",
        "window",
        "softcap",
        "save_residuals",
        "interpret",
        "q_off",
        "alibi_slopes",
        "dropout_rate",
    ),
)
def fwd_pallas(
    q,
    k,
    v,
    q_seg=None,
    kv_seg=None,
    dropout_seed=None,
    *,
    sm_scale: float,
    causal: bool,
    block_q: int,
    block_kv: int,
    kv_len: int,
    window: int = 0,
    softcap: float = 0.0,
    save_residuals: bool = False,
    interpret: bool = False,
    q_off: int = 0,
    alibi_slopes=None,
    dropout_rate: float = 0.0,
):
    """Launch the forward kernel on padded inputs.

    q: [B, Hq, Nq_pad, d]; k, v: [B, Hkv, Nkv_pad, d] with Hq % Hkv == 0 and
    Nq_pad % block_q == Nkv_pad % block_kv == 0.  ``kv_len`` is the true
    (unpadded) KV length used for tail masking.  ``q_seg``/``kv_seg``
    ([B, Nq_pad] / [B, Nkv_pad] int32, padded with non-matching sentinels)
    enable packed-sequence masking: position pairs attend only within equal
    segment ids.

    Returns O [B, Hq, Nq_pad, d] in q.dtype, plus — when ``save_residuals`` —
    LSE [B, Hq, Nq_pad/128, 128] fp32 in the packed layout (layout.py;
    callers reshape to [B, Hq, Nq_pad] for free).
    """
    batch, num_q_heads, n_q, head_dim = q.shape
    _, num_kv_heads, n_kv, _ = k.shape
    assert num_q_heads % num_kv_heads == 0
    q_per_kv = num_q_heads // num_kv_heads
    num_q_blocks = n_q // block_q
    num_kv_blocks = n_kv // block_kv

    # Fold sm_scale·log2e into Q once (O(N·d), fused by XLA) so the kernel's
    # O(N²) hot loop runs scale-free in base 2.

    # Compacted triangular grid for the self-attention causal case: instead
    # of a rectangular (T_q, T_kv) grid where ~half the steps are skipped by
    # pl.when (each still paying grid/bookkeeping cost), enumerate only the
    # T(T+1)/2 lower-triangular blocks.  Measured on v5e (N=4096, d=128,
    # 1024² blocks): 103 vs 90 TF/s.
    softcap = float(softcap)
    # Compacted grids assume a zero alignment offset (the diagonal block is
    # the row's last); cross-length causal (q_off != 0, bottom-right aligned)
    # takes the rectangular grid with offset masks.
    banded = (
        causal and window > 0 and n_q == n_kv and block_q == block_kv
        and q_off == 0
    )
    band_w = 0
    if banded:
        # kv blocks a window of `window` tokens can touch from one q block.
        band_w = min((block_q + window - 2) // block_kv + 1, num_kv_blocks)
    tri = (causal and not banded and n_q == n_kv and block_q == block_kv
           and q_off == 0)
    segmented = q_seg is not None
    base = functools.partial(
        _fwd_kernel,
        scale2=float(sm_scale) * LOG2E,
        causal=causal,
        kv_len=kv_len,
        block_q=block_q,
        block_kv=block_kv,
        num_kv_blocks=num_kv_blocks,
        tri=tri,
        window=window,
        band_w=band_w,
        softcap=softcap,
        q_off=q_off,
        dropout_rate=float(dropout_rate),
    )
    # Adapt the positional pallas argument list to the full kernel signature:
    # optional (qseg, kvseg, slope) inputs via the shared shim, plus the
    # optional lse output slot between o and the scratch refs.
    if save_residuals:
        base2 = base
    else:
        def base2(q_r, k_r, v_r, qs_r, ks_r, sl_r, sd_r, o_r, m_s, l_s,
                  acc_s):
            return base(q_r, k_r, v_r, qs_r, ks_r, sl_r, sd_r, o_r, None,
                        None, m_s, l_s, acc_s)
    kernel = adapt_optional_refs(
        base2, n_lead=3, segmented=segmented,
        has_slope=alibi_slopes is not None,
        has_seed=dropout_rate > 0.0,
    )

    if banded:
        grid = (batch, num_q_heads, num_q_blocks, band_w)

        def q_index(b, h, iq, j):
            return (b, h, iq, 0)

        def kv_index(b, h, iq, j):
            # Skipped off-band steps clamp to a valid block; the pipeline
            # elides the duplicate fetch.
            ikv = jnp.clip(iq - (band_w - 1) + j, 0, num_kv_blocks - 1)
            return (b, h // q_per_kv, ikv, 0)

        dimension_semantics = ("parallel", "parallel", "parallel", "arbitrary")
    elif tri:
        grid = (batch, num_q_heads, num_q_blocks * (num_q_blocks + 1) // 2)

        def q_index(b, h, p):
            return (b, h, _tri_decode(p, num_q_blocks)[0], 0)

        def kv_index(b, h, p):
            return (b, h // q_per_kv, _tri_decode(p, num_q_blocks)[1], 0)

        dimension_semantics = ("parallel", "parallel", "arbitrary")
    else:
        grid = (batch, num_q_heads, num_q_blocks, num_kv_blocks)

        def q_index(b, h, iq, ikv):
            return (b, h, iq, 0)

        if causal:
            # Above-diagonal KV blocks are never computed (pl.when skip), but
            # Pallas would still DMA them.  Clamping the index map to the last
            # in-diagonal block makes the skipped iterations request the SAME
            # block as the previous step — the pipeline elides the refetch, so
            # causal saves ~half the K/V HBM traffic, not just the FLOPs.
            def kv_index(b, h, iq, ikv):
                ikv_c = jnp.clip(
                    ikv, 0, ((iq + 1) * block_q - 1 + q_off) // block_kv
                )
                ikv_c = jnp.clip(ikv_c, 0, num_kv_blocks - 1)
                return (b, h // q_per_kv, ikv_c, 0)
        else:
            def kv_index(b, h, iq, ikv):
                return (b, h // q_per_kv, ikv, 0)

        dimension_semantics = ("parallel", "parallel", "parallel", "arbitrary")

    q_spec = pl.BlockSpec((1, 1, block_q, head_dim), q_index)
    kv_spec = pl.BlockSpec((1, 1, block_kv, head_dim), kv_index)
    in_specs = [q_spec, kv_spec, kv_spec]
    inputs = [q, k, v]
    if segmented:
        # GROUPED packed q segments (layout.py): per-q-block groups of
        # block_q/128 dense rows padded to a Mosaic-legal sublane multiple —
        # >= 16x less HBM traffic than the round-1 lane replication.  kv
        # segments stay sublane-replicated (8x only, and the kernel needs
        # them as a [1, block_kv] row).
        qseg_packed = layout.pack_stat_grouped(
            q_seg.astype(jnp.int32)[:, None, :], block_q
        )[:, 0]
        kvseg_rep = jnp.broadcast_to(
            kv_seg.astype(jnp.int32)[:, None, :],
            (batch, geo.NUM_SUBLANES, n_kv),
        )
        in_specs.append(
            pl.BlockSpec(
                (1, layout.stat_rows(block_q), geo.NUM_LANES),
                lambda *idx: (idx[0], q_index(*idx)[2], 0),
            )
        )
        in_specs.append(
            pl.BlockSpec(
                (1, geo.NUM_SUBLANES, block_kv),
                lambda *idx: (idx[0], 0, kv_index(*idx)[2]),
            )
        )
        inputs += [qseg_packed, kvseg_rep]
    if alibi_slopes is not None:
        in_specs.append(slope_block_spec())
        inputs.append(slope_input(alibi_slopes, num_q_heads))
    if dropout_rate > 0.0:
        in_specs.append(seed_block_spec())
        inputs.append(seed_input(dropout_seed))
    o_spec = pl.BlockSpec((1, 1, block_q, head_dim), q_index)
    out_specs = [o_spec]
    out_shape = [jax.ShapeDtypeStruct(q.shape, q.dtype)]
    if save_residuals:
        # GROUPED packed stat layout (layout.py): per-q-block groups of
        # block_q/128 dense 128-lane rows padded to stat_rows sublanes
        # (Mosaic rejects sub-8 sublane block dims) — q_index block
        # arithmetic carries over unchanged because index maps are in block
        # units.
        s_rows = layout.stat_rows(block_q)
        for _ in range(2):  # m then linv, same packed stat layout
            out_specs.append(
                pl.BlockSpec(
                    (1, 1, s_rows, geo.NUM_LANES),
                    lambda *idx: q_index(*idx),
                )
            )
            out_shape.append(
                jax.ShapeDtypeStruct(
                    (batch, num_q_heads, (n_q // block_q) * s_rows,
                     geo.NUM_LANES),
                    jnp.float32,
                )
            )

    flops_matmul = 2 * batch * num_q_heads * n_q * n_kv * head_dim * 2
    if causal:
        flops_matmul //= 2

    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((block_q, geo.NUM_LANES), jnp.float32),
            pltpu.VMEM((block_q, geo.NUM_LANES), jnp.float32),
            pltpu.VMEM((block_q, head_dim), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=dimension_semantics,
        ),
        cost_estimate=pl.CostEstimate(
            flops=flops_matmul,
            bytes_accessed=(
                q.size * q.dtype.itemsize
                + k.size * k.dtype.itemsize
                + v.size * v.dtype.itemsize
                + q.size * q.dtype.itemsize
            ),
            transcendentals=batch * num_q_heads * n_q * n_kv,
        ),
        interpret=interpret,
    )(*inputs)
    if save_residuals:
        return outs[0], (outs[1], outs[2])
    return outs[0], None
