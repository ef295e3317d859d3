"""Public flash-attention API: functional wrappers + differentiable op.

Plays the combined role of the reference's two API surfaces:

- ``flash_attention_forward`` / ``flash_attention_backward`` — the functional
  wrapper API (reference: src/flash_attention_wrappers.py:7-63,66-176),
  including shape validation and pad/unpad handling
  (src/flash_attention_wrappers.py:20-34, src/flash_attention_torch.py:38-47);
- ``flash_attention`` — the autograd-integrated op, a ``jax.custom_vjp``
  instead of ``torch.autograd.Function`` (src/flash_attention_torch.py:21-158),
  saving residuals (Q, K, V, O, L) exactly as ``ctx.save_for_backward`` does
  (src/flash_attention_torch.py:77).

There is ONE backward implementation, deterministic by construction — the
reference's deterministic/non-deterministic variant split
(src/flash_attention_torch.py:161-294) does not exist here because TPU grids
are sequential per core.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Union

import jax
import jax.numpy as jnp
import numpy as np

from .. import geometry as geo
from .. import tuning
from ..utils import default_interpret, pad_axis_to
from . import bwd_fused
from . import bwd_kernel as bwd
from . import bwd_mid
from . import fwd_kernel as fwd
from . import fwd_mid
from . import fwd_small
from . import layout


def _pack_stat_padded(stat, block):
    """[B, H, L] stat -> PLAIN packed [B, H, n/128, 128] (layout.py), with L
    padded up to a multiple of ``block``.  Only for the one-shot mid/small
    kernels whose stat BlockSpec covers the whole packed-row axis (Mosaic's
    full-array-dim exception); the blocked kernels use the grouped form."""
    stat_p, _ = pad_axis_to(stat.astype(jnp.float32), 2, block)
    return layout.pack_stat(stat_p)


def _pack_stat_grouped_padded(stat, block_q):
    """[B, H, L] stat -> GROUPED packed layout for the blocked kernels
    (layout.pack_stat_grouped), with L padded up to a multiple of
    ``block_q`` first."""
    stat_p, _ = pad_axis_to(stat.astype(jnp.float32), 2, block_q)
    return layout.pack_stat_grouped(stat_p, block_q)


class SegmentIds(NamedTuple):
    """Packed-sequence segment ids: positions attend only within equal ids.

    q: [B, Nq] integer; kv: [B, Nkv] integer.  A new component with no
    reference counterpart (the reference masks nothing beyond causal in its
    vendored competitor) — required for packed-batch training pipelines.
    """

    q: jax.Array
    kv: jax.Array


# Sentinels used to pad segment arrays to block multiples: padded q rows and
# padded kv columns never match anything (including each other).
_Q_SEG_PAD = -1
_KV_SEG_PAD = -2


def _normalize_segments(segment_ids, q, k):
    if segment_ids is None:
        return None
    if not isinstance(segment_ids, SegmentIds):
        segment_ids = SegmentIds(q=segment_ids, kv=segment_ids)
    qs, ks = segment_ids.q, segment_ids.kv
    if qs.shape != (q.shape[0], q.shape[2]) or ks.shape != (k.shape[0], k.shape[2]):
        raise ValueError(
            f"segment_ids shapes {qs.shape}/{ks.shape} must be "
            f"[B, Nq]={q.shape[0], q.shape[2]} / [B, Nkv]={k.shape[0], k.shape[2]}"
        )
    return SegmentIds(q=qs.astype(jnp.int32), kv=ks.astype(jnp.int32))


def _normalize_window(window: int, causal: bool, n_kv: int) -> int:
    """Sliding-window size (tokens visible, including self).  0 disables;
    a window covering the whole sequence is normalized to 0 (plain causal)."""
    window = int(window)
    if window < 0:
        raise ValueError(f"window must be >= 0, got {window}")
    if window and not causal:
        raise ValueError("window requires causal=True (sliding-window "
                         "attention is defined on the causal mask)")
    return 0 if window >= n_kv else window


def _normalize_alibi(alibi_slopes, num_q_heads: int, causal: bool):
    """Static per-head ALiBi slopes (Press et al. 2022): hashable tuple of
    floats, one per q head.  Causal-only — the separable in-kernel form
    (see fwd_kernel._fwd_kernel) relies on the row term cancelling in
    softmax, which holds for any mask, but symmetric bidirectional ALiBi
    (−m·|i−j|) is a different function that does not decompose."""
    if alibi_slopes is None:
        return None
    if not causal:
        raise ValueError("alibi_slopes requires causal=True (ALiBi is "
                         "defined on the causal distance q_pos - kv_pos)")
    slopes = tuple(float(s) for s in np.asarray(alibi_slopes).reshape(-1))
    if len(slopes) == 1 and num_q_heads > 1:
        slopes = slopes * num_q_heads
    if len(slopes) != num_q_heads:
        raise ValueError(
            f"alibi_slopes must have one slope per q head "
            f"({num_q_heads}), got {len(slopes)}"
        )
    return slopes


def _normalize_dropout(dropout_rate, dropout_seed):
    """Attention dropout config: rate ∈ [0, 1) static, seed a traced int32
    scalar (recompile-free across steps).  The mask itself is a pure
    function of (seed, b, h, row, col) — fwd_kernel.dropout_keep_mask."""
    rate = float(dropout_rate)
    if not 0.0 <= rate < 1.0:
        raise ValueError(f"dropout_rate must be in [0, 1), got {rate}")
    if rate == 0.0:
        return 0.0, None
    if dropout_seed is None:
        raise ValueError(
            "dropout_rate > 0 requires dropout_seed (an int32 scalar; pass "
            "a fresh value per training step, e.g. the step counter)"
        )
    return rate, jnp.asarray(dropout_seed, jnp.int32).reshape(())


def stats_to_lse(m2, linv):
    """Public natural-base logsumexp from the kernels' raw (m₂, 1/l) stats.

    The forward kernels emit the row max (base-2 units) and 1/l instead of
    the combined lse so the backward's P recompute is bit-cancelling (see
    bwd_kernel._recompute_p); the public L of the functional API
    (src/flash_attention_wrappers.py:7-63 returns (O, L)) is derived here:
    L = ln2·m₂ − ln(1/l).  Empty rows (1/l == 0) map to the finite
    sentinel."""
    import jax.numpy as jnp

    empty = linv == 0.0
    lse = fwd.LN2 * m2 - jnp.log(jnp.where(empty, 1.0, linv))
    return jnp.where(empty, fwd.DEFAULT_MASK_VALUE, lse)


def lse_to_stats(lse):
    """Synthesize (m₂, 1/l) = (lse·log2e, 1) from a combined logsumexp —
    the public-backward path (ring attention passes a globally MERGED lse,
    for which no raw stats exist).  P = exp2(s − lse₂)·1 reproduces the
    combined-lse recompute (~5e-5 relative P error on v5e, vs the vjp
    path's 3e-8 bit-cancelling raw stats).  Sentinel rows map to
    (+BIG, 0) so p comes out exactly 0 without inf."""
    import jax.numpy as jnp

    empty = lse <= 0.5 * fwd.DEFAULT_MASK_VALUE
    m2 = jnp.where(empty, -fwd.DEFAULT_MASK_VALUE, lse * fwd.LOG2E)
    linv = jnp.where(empty, 0.0, 1.0)
    return m2, linv


def _alibi_lse_shift(lse, alibi, q_len: int, q_off: int, sign: float):
    """Convert between the kernels' separable-ALiBi logsumexp and the true
    one.  The kernels drop the softmax-invariant −m·qpos row term, so their
    lse is shifted by +m·qpos; ``sign=-1`` recovers the true lse after the
    forward, ``sign=+1`` re-shifts a true lse for the backward kernels.
    Fully-masked-row sentinels stay sentinels."""
    qpos = jnp.arange(q_len, dtype=jnp.float32) + float(q_off)
    shift = jnp.asarray(alibi, jnp.float32)[None, :, None] * qpos
    return jnp.where(
        lse > 0.5 * fwd.DEFAULT_MASK_VALUE, lse + sign * shift, lse
    )


def _pad_segments(seg: Optional[SegmentIds], block_q: int, block_kv: int):
    if seg is None:
        return None, None
    qs, _ = pad_axis_to(seg.q, 1, block_q, value=_Q_SEG_PAD)
    ks, _ = pad_axis_to(seg.kv, 1, block_kv, value=_KV_SEG_PAD)
    return qs, ks


def _validate(q, k, v):
    if q.ndim != 4 or k.ndim != 4 or v.ndim != 4:
        raise ValueError(
            f"q/k/v must be rank-4 [B,H,N,d]; got {q.shape} {k.shape} {v.shape}"
        )
    if k.shape != v.shape:
        raise ValueError(f"k and v shapes differ: {k.shape} vs {v.shape}")
    if q.shape[0] != k.shape[0] or q.shape[3] != k.shape[3]:
        raise ValueError(f"q/k batch or head_dim mismatch: {q.shape} vs {k.shape}")
    if q.shape[1] % k.shape[1] != 0:
        raise ValueError(
            f"num_q_heads ({q.shape[1]}) must be a multiple of num_kv_heads ({k.shape[1]})"
        )
    if q.dtype != k.dtype:
        raise ValueError(f"dtype mismatch: {q.dtype}, {k.dtype}, {v.dtype}")
    if v.dtype != q.dtype and jnp.dtype(v.dtype) not in fwd.FP8_DTYPES:
        # fp8 V with higher-precision q/k is the one legal mixed case —
        # the kernels dequantize V in-register (≙ the reference's vendored
        # fp8-V forward, src/flash_attention_openai_tutorial.py:127-135).
        # Contract: fp8 V payloads must be finite — the no-fp8-datapath
        # dequant route maps Inf/NaN bit patterns to large finite values
        # instead of propagating them (see ops/fwd_kernel.py::v_payload).
        raise ValueError(f"dtype mismatch: {q.dtype}, {k.dtype}, {v.dtype}")
    if q.dtype == jnp.float64:
        # The reference maps float64 through convert_triton_dtype
        # (src/flash_attention_torch.py:7-18) because GPUs have fp64 ALUs.
        # The TPU MXU has no fp64 (even fp32 is a multi-pass bf16
        # emulation, see BASELINE.md) — a silent downcast would betray the
        # one reason to ask for fp64.  Refuse explicitly.
        raise NotImplementedError(
            "float64 attention is not supported on TPU (the MXU has no "
            "fp64 datapath); cast to float32 — the kernels' fp32 "
            "accumulators already give the best precision the hardware has"
        )


def _resolve(q, k, sm_scale, block_sizes, interpret):
    head_dim = q.shape[-1]
    if sm_scale is None:
        sm_scale = float(head_dim) ** -0.5
    if block_sizes is None:
        block_sizes = tuning.default_block_sizes(
            q.shape[2], k.shape[2], geo.current_geometry().round_up(head_dim), q.dtype
        )
    if interpret is None:
        interpret = default_interpret()
    return float(sm_scale), block_sizes, bool(interpret)


def _use_small(q, k, block_sizes) -> bool:
    """Route to the one-shot short-sequence kernel: only when the caller
    didn't pin block sizes (explicit blocks keep exercising the general
    kernel) and the whole padded sequence fits one block."""
    return (
        block_sizes is None
        and max(q.shape[2], k.shape[2]) <= fwd_small.MAX_SMALL_N
    )


# Tiny sequences, low-precision inputs: whole-fused XLA attention beats any
# Pallas tiling.  At N <= XLA_SMALL_MAX_N the scores tensor is small enough
# that flash blocking saves nothing, while XLA fuses the (B·H)-batched
# attention into large MXU GEMMs with none of the per-grid-cell kernel
# overhead (measured 1x v5e, B=8 H=16 d=128 bf16 causal: Pallas one-shot
# 17.4 / 27.8 / 25.1 TF/s fwd+bwd at N=128/256/384 vs 89-96 for the XLA
# paths; at N=512 XLA collapses to 27 and the kernels win — the same
# size-based dispatch jax.nn.dot_product_attention itself performs).
# Low-precision dtypes only: the fp32 200-seed golden gate (N=256) must
# keep exercising the Pallas kernels, and fp32 XLA matmuls multipass on
# the MXU anyway.
XLA_SMALL_MAX_N = 384
_XLA_SMALL_DTYPES = (jnp.bfloat16, jnp.float16)
_XLA_SMALL_PRECISION = jax.lax.Precision.DEFAULT


def _use_xla_small(q, k, block_sizes) -> bool:
    return (
        block_sizes is None
        and q.dtype in _XLA_SMALL_DTYPES
        and max(q.shape[2], k.shape[2]) <= XLA_SMALL_MAX_N
    )


def _xla_small_math(q, k, v, seg, causal, sm_scale, window, softcap,
                    alibi=None, rate=0.0, seed=None, with_lse=False):
    """Whole-fused attention math for the tiny-N route, full feature set.

    Differences from the fp32 oracle (reference_attention) are deliberate,
    measured choices: DEFAULT matmul precision (bf16 single-pass MXU), a
    finite mask constant + jax.nn.softmax (the -inf/manual-softmax oracle
    recipe compiles to a backward with NaN-guard selects — 57 vs 92 TF/s
    fwd+bwd at N=128), and an explicit fully-masked-row fixup preserving
    the kernels' zero-output convention."""
    b, hq, n_q, d = q.shape
    hkv, n_kv = k.shape[1], k.shape[2]
    if v.dtype != q.dtype:  # fp8 V: this whole-fused route just upcasts
        v = v.astype(q.dtype)
    if hq != hkv:
        rep = hq // hkv
        k = jnp.repeat(k, rep, axis=1)
        v = jnp.repeat(v, rep, axis=1)
    s = jnp.einsum(
        "bhqd,bhkd->bhqk", q, k,
        preferred_element_type=jnp.float32, precision=_XLA_SMALL_PRECISION,
    ) * sm_scale
    if softcap:
        s = softcap * jnp.tanh(s * (1.0 / softcap))
    if alibi is not None:
        # True (unseparated) ALiBi bias — this whole-matrix route has the
        # full [Nq, Nkv] scores anyway; bottom-right aligned like the mask.
        qpos = jnp.arange(n_q, dtype=jnp.float32) + float(n_kv - n_q)
        col = jnp.arange(n_kv, dtype=jnp.float32)
        dist = qpos[:, None] - col[None, :]
        s = s - jnp.asarray(alibi, jnp.float32)[None, :, None, None] * dist[None, None]
    mask = None
    if causal:
        row = jax.lax.broadcasted_iota(jnp.int32, (n_q, n_kv), 0)
        col = jax.lax.broadcasted_iota(jnp.int32, (n_q, n_kv), 1)
        # bottom-right-aligned causal and window, same as oracle/kernels
        mask = (row + (n_kv - n_q)) >= col
        if window:
            mask = jnp.logical_and(mask, (row + (n_kv - n_q) - col) < window)
        mask = mask[None, None]
    if seg is not None:
        sm = seg.q[:, None, :, None] == seg.kv[:, None, None, :]
        mask = sm if mask is None else jnp.logical_and(mask, sm)
    if mask is not None:
        s = jnp.where(mask, s, fwd.DEFAULT_MASK_VALUE)
    p = jax.nn.softmax(s, axis=-1)
    if rate:
        # Same element-indexed mask as the Pallas kernels (dispatch-route
        # independence: the mask depends on seed and indices only).
        bi = jnp.arange(b, dtype=jnp.int32)[:, None, None, None]
        hi = jnp.arange(hq, dtype=jnp.int32)[None, :, None, None]
        rows = jnp.arange(n_q, dtype=jnp.int32)[None, None, :, None]
        cols = jnp.arange(n_kv, dtype=jnp.int32)[None, None, None, :]
        p = p * fwd.dropout_keep_mask(seed, bi, hi, rows, cols, rate)
    p = p.astype(v.dtype)
    o = jnp.einsum(
        "bhqk,bhkd->bhqd", p, v,
        preferred_element_type=jnp.float32, precision=_XLA_SMALL_PRECISION,
    )
    if mask is not None:
        # rows with no visible keys: kernels emit 0 (and DEFAULT_MASK_VALUE
        # lse), the finite mask constant would emit mean(V)
        any_visible = jnp.any(mask, axis=-1, keepdims=True)
        o = jnp.where(any_visible, o, 0.0)
    o = o.astype(q.dtype)
    if not with_lse:
        return o
    lse = jax.nn.logsumexp(s, axis=-1)
    if mask is not None:
        lse = jnp.where(any_visible[..., 0], lse, fwd.DEFAULT_MASK_VALUE)
    return o, lse.astype(jnp.float32)


def _xla_small_fastest(q, k, v, seg, causal, sm_scale, window, softcap,
                       alibi=None, rate=0.0, seed=None):
    """Fastest no-lse forward for the tiny-N route: XLA's fused SDPA
    (jax.nn.dot_product_attention — measured 66-68 TF/s fwd at N<=384 vs
    25-57 for the explicit math) when the feature set allows, the explicit
    math otherwise.  The backward differentiates through this same choice."""
    if v.dtype != q.dtype:  # fp8 V: tiny-N XLA route just upcasts
        v = v.astype(q.dtype)
    plain = (
        seg is None and window == 0 and softcap == 0.0 and alibi is None
        and rate == 0.0
        and (not causal or q.shape[2] == k.shape[2])
    )
    if plain:
        o = jax.nn.dot_product_attention(
            q.transpose(0, 2, 1, 3),
            k.transpose(0, 2, 1, 3),
            v.transpose(0, 2, 1, 3),
            scale=sm_scale, is_causal=causal,
        )
        return o.transpose(0, 2, 1, 3)
    return _xla_small_math(q, k, v, seg, causal, sm_scale, window, softcap,
                           alibi, rate, seed)


def _forward_impl(q, k, v, seg, causal, sm_scale, window, softcap, alibi,
                  rate, seed, bs, small, xla_small, interpret,
                  save_residuals):
    """Shared forward dispatch: XLA-math tiny-N path, one-shot small kernel,
    mid-length pane kernel, or the general kernel.

    ``bs`` may be None (caller didn't pin blocks): resolved here so the
    backward can make its own (fused-path) block choice downstream."""
    if xla_small:
        if save_residuals:
            o, lse = _xla_small_math(
                q, k, v, seg, causal, sm_scale, window, softcap, alibi,
                rate, seed, with_lse=True,
            )
            # TRUE-lse stats (this route has no separable convention; its
            # backward re-vjps and never reads them)
            return o, lse_to_stats(lse)
        o = _xla_small_fastest(
            q, k, v, seg, causal, sm_scale, window, softcap, alibi, rate,
            seed,
        )
        return o, None
    unpinned = bs is None
    if bs is None:
        bs = tuning.default_block_sizes(
            q.shape[2], k.shape[2],
            geo.current_geometry().round_up(q.shape[-1]), q.dtype,
        )
    # Mid-length causal path: in-kernel sub-blocking kills the diagonal-
    # block waste that makes 512 < N <= 2048 the general kernel's valley
    # (see fwd_mid.py).  Only when the caller didn't pin blocks.  Taken in
    # PREFERENCE to the one-shot small kernel above 384: fwd_small computes
    # the full padded N×N score block (≥50% causal waste at N=512), the
    # mid kernel's strips only the visible ~75% — the backward made the
    # same call (bwd_mid for 384 < N ≤ 512, measured 38.9 → 49.1 TF/s).
    # Above 1024 the whole-pane STRIP schedule below beats the pane kernel
    # (measured v5e bf16 d=128: 120.6 vs 110 TF/s @2048) — the pane path
    # keeps N ≤ 1024 (95 TF/s @1024, 57 @512, both ≥ strip's 95.7/52.4),
    # lengths the strip's 1024-padding would bloat, and windowed ≤ 2048
    # (the banded sub-pair skip beats strip's masked merges there).
    mid_hi = (
        fwd_mid.MAX_MID_N
        if (window or q.shape[2] % fwd_mid.STRIP) else 1024
    )
    use_mid = (
        unpinned
        and causal
        and seg is None
        and alibi is None
        and rate == 0.0
        and q.shape[2] == k.shape[2]
        and XLA_SMALL_MAX_N < q.shape[2] <= mid_hi
        and fwd_mid.mid_path_fits(
            geo.current_geometry().round_up(q.shape[2], fwd_mid.SUB),
            geo.current_geometry().round_up(q.shape[-1]),
            q.dtype,
        )
    )
    if use_mid:
        qp, kp, vp, q_len, kv_len, d = _pad_inputs(
            q, k, v, fwd_mid.SUB, fwd_mid.SUB
        )
        o, stats = fwd_mid.fwd_mid_pallas(
            qp, kp, vp,
            sm_scale=sm_scale, kv_len=kv_len, window=window,
            softcap=float(softcap), save_residuals=save_residuals,
            interpret=interpret,
        )
        if save_residuals:
            m2, linv = (
                layout.unpack_stat(s)[:, :, :q_len] for s in stats
            )
            return o[:, :, :q_len, :d], (m2, linv)
        return o[:, :, :q_len, :d], None
    # Strip path: same constraints as the pane path but for
    # mid_hi < N <= MAX_STRIP_N — K/V panes VMEM-resident, q/o in
    # whole-pane (N ≤ 4096) or streamed strips (see fwd_mid.pick_strip).
    # Measured v5e bf16 B=8 H=16 d=128 with the interleaved whole-pane
    # schedule: 147.0 TF/s @4096 / 120.6 @2048 vs the tri grid's 95.8
    # @4096 and the pane kernel's 110 @2048.
    use_strip = (
        unpinned
        and causal
        and seg is None
        and alibi is None
        and rate == 0.0
        and q.shape[2] == k.shape[2]
        and mid_hi
        < q.shape[2]
        <= fwd_mid.MAX_STRIP_N
        and fwd_mid.strip_path_fits(
            geo.current_geometry().round_up(q.shape[2], fwd_mid.STRIP),
            geo.current_geometry().round_up(q.shape[-1]),
            q.dtype,
        )
    )
    if use_strip:
        qp, kp, vp, q_len, kv_len, d = _pad_inputs(
            q, k, v, fwd_mid.STRIP, fwd_mid.STRIP
        )
        o, stats = fwd_mid.fwd_mid_strip_pallas(
            qp, kp, vp,
            sm_scale=sm_scale, kv_len=kv_len, window=window,
            softcap=float(softcap), save_residuals=save_residuals,
            interpret=interpret,
        )
        if save_residuals:
            m2, linv = (
                layout.unpack_stat(s)[:, :, :q_len] for s in stats
            )
            return o[:, :, :q_len, :d], (m2, linv)
        return o[:, :, :q_len, :d], None
    if small:
        n_pad = geo.current_geometry().round_up(
            max(q.shape[2], k.shape[2]), geo.NUM_LANES
        )
        qp, kp, vp, q_len, kv_len, d = _pad_inputs(q, k, v, n_pad, n_pad)
        qseg_p, kvseg_p = _pad_segments(seg, n_pad, n_pad)
        o, stats = fwd_small.fwd_small_pallas(
            qp, kp, vp, qseg_p, kvseg_p,
            sm_scale=sm_scale, causal=causal, kv_len=kv_len,
            window=window, softcap=float(softcap),
            save_residuals=save_residuals, interpret=interpret,
            q_off=kv_len - q_len,
        )
    else:
        qp, kp, vp, q_len, kv_len, d = _pad_inputs(
            q, k, v, bs.block_q, bs.block_kv
        )
        qseg_p, kvseg_p = _pad_segments(seg, bs.block_q, bs.block_kv)
        o, stats = fwd.fwd_pallas(
            qp, kp, vp, qseg_p, kvseg_p, seed,
            sm_scale=sm_scale, causal=causal, window=window,
            softcap=float(softcap),
            block_q=bs.block_q, block_kv=bs.block_kv,
            kv_len=kv_len, save_residuals=save_residuals,
            interpret=interpret, q_off=kv_len - q_len,
            alibi_slopes=alibi, dropout_rate=rate,
        )
    if save_residuals:
        # Small path emits a single lse in the plain packed layout (its
        # backward recomputes softmax inline; raw stats would be unused) —
        # synthesize.  The blocked path emits raw (m, 1/l) stats in the
        # grouped layout keyed by its block_q.  ALiBi stats stay in the
        # kernels' SEPARABLE convention — exactly what the backward
        # kernels recompute in; the public forward derives + shifts the
        # true lse (flash_attention_forward).
        if small:
            m2, linv = lse_to_stats(layout.unpack_stat(stats)[:, :, :q_len])
        else:
            m2, linv = (
                layout.unpack_stat_grouped(s, bs.block_q)[:, :, :q_len]
                for s in stats
            )
        return o[:, :, :q_len, :d], (m2, linv)
    return o[:, :, :q_len, :d], None


def _pad_inputs(q, k, v, block_q, block_kv):
    q, q_len = pad_axis_to(q, 2, block_q)
    k, kv_len = pad_axis_to(k, 2, block_kv)
    v, _ = pad_axis_to(v, 2, block_kv)
    d = q.shape[-1]
    d_pad = geo.current_geometry().round_up(d)
    if d_pad != d:
        q, _ = pad_axis_to(q, 3, d_pad)
        k, _ = pad_axis_to(k, 3, d_pad)
        v, _ = pad_axis_to(v, 3, d_pad)
    return q, k, v, q_len, kv_len, d


# ---------------------------------------------------------------------------
# Functional API (≙ src/flash_attention_wrappers.py)
# ---------------------------------------------------------------------------


def flash_attention_forward(
    q,
    k,
    v,
    *,
    causal: bool = False,
    sm_scale: Optional[float] = None,
    segment_ids: Optional[Union[SegmentIds, jax.Array]] = None,
    window: int = 0,
    logit_softcap: float = 0.0,
    alibi_slopes=None,
    dropout_rate: float = 0.0,
    dropout_seed=None,
    block_sizes: Optional[tuning.BlockSizes] = None,
    interpret: Optional[bool] = None,
):
    """Forward pass returning (O, L) like the reference functional wrapper
    (src/flash_attention_wrappers.py:7-63).  L is the natural-base logsumexp
    of the scaled+biased scores (dropout-independent), shape [B, H, Nq]
    fp32.

    GSPMD: the Pallas routes go through ops/partitioning, so (batch, head)-
    sharded operands run on local shards instead of being all-gathered."""
    _validate(q, k, v)
    window = _normalize_window(window, causal, k.shape[2])
    seg = _normalize_segments(segment_ids, q, k)
    alibi = _normalize_alibi(alibi_slopes, q.shape[1], causal)
    rate, seed = _normalize_dropout(dropout_rate, dropout_seed)
    small = _use_small(q, k, block_sizes) and alibi is None and rate == 0.0
    xla_small = _use_xla_small(q, k, block_sizes)
    sm_scale, bs, interpret = _resolve(q, k, sm_scale, block_sizes, interpret)
    if xla_small:  # pure-XLA route partitions natively
        o, stats = _forward_impl(
            q, k, v, seg, causal, sm_scale, window, logit_softcap, alibi,
            rate, seed, bs, small, xla_small, interpret, save_residuals=True,
        )
        return o, stats_to_lse(*stats)  # xla stats are true-lse already
    o, stats = _partitioned_fwd_call(
        q, k, v, seg, seed, causal, sm_scale, window, float(logit_softcap),
        alibi, rate, bs, small, xla_small, interpret, save_residuals=True,
    )
    lse = stats_to_lse(*stats)
    if alibi is not None:
        # Kernel stats are in the separable convention; publish true lse.
        lse = _alibi_lse_shift(
            lse, alibi, q.shape[2], k.shape[2] - q.shape[2], -1.0
        )
    return o, lse


def _forward_raw_stats(
    q, k, v, *, causal, sm_scale, segment_ids, window, logit_softcap,
    alibi_slopes, dropout_rate, dropout_seed, block_sizes, interpret,
):
    """Replay flash_attention_forward's exact dispatch and return the RAW
    kernel-convention softmax stats (m₂, 1/l) — the backward's
    rederive_stats path.  Arguments arrive pre-normalized where the caller
    already normalized them (seg/alibi/rate/seed)."""
    _validate(q, k, v)
    window = _normalize_window(window, causal, k.shape[2])
    seg = segment_ids
    alibi = alibi_slopes
    rate, seed = dropout_rate, dropout_seed
    small = _use_small(q, k, block_sizes) and alibi is None and rate == 0.0
    xla_small = _use_xla_small(q, k, block_sizes)
    sm_scale, bs, interpret = _resolve(q, k, sm_scale, block_sizes, interpret)
    if xla_small:
        _, stats = _forward_impl(
            q, k, v, seg, causal, sm_scale, window, logit_softcap, alibi,
            rate, seed, bs, small, xla_small, interpret, save_residuals=True,
        )
        return stats
    _, stats = _partitioned_fwd_call(
        q, k, v, seg, seed, causal, sm_scale, window, float(logit_softcap),
        alibi, rate, bs, small, xla_small, interpret, save_residuals=True,
    )
    return stats


def flash_attention_backward(
    q,
    k,
    v,
    o,
    do,
    lse,
    *,
    causal: bool = False,
    sm_scale: Optional[float] = None,
    segment_ids: Optional[Union[SegmentIds, jax.Array]] = None,
    window: int = 0,
    logit_softcap: float = 0.0,
    alibi_slopes=None,
    dropout_rate: float = 0.0,
    dropout_seed=None,
    block_sizes: Optional[tuning.BlockSizes] = None,
    interpret: Optional[bool] = None,
    rederive_stats: Optional[bool] = None,
):
    """Backward pass returning (dQ, dK, dV) like the reference functional
    wrapper (src/flash_attention_wrappers.py:66-176): D-preprocess kernel,
    then the dKV and dQ kernels.  `lse` is [B, H, Nq] from the forward.

    By default this path honors the PASSED lse — callers like ring
    attention feed the globally-merged logsumexp so each block produces
    its global gradient contribution.  The combined f32 lse carries an
    information floor: P must be rebuilt as exp2(s − lse·log2e), and when
    |lse| is large (ALiBi's slope·col bias raises it to O(slope·N)) the
    ulp(lse) loss amplifies through the (dP − D) cancellation into ~1e-3
    gradient error.  ``rederive_stats=True`` removes that floor for
    callers whose lse came from a MATCHING single-device forward: the
    backward replays the forward dispatch on-device (bit-identical raw
    (m, 1/l) stats — TPU compilation is deterministic) and reconstructs P
    exactly as the custom_vjp path does; the passed lse is then only a
    shape/contract witness.  Default None = auto: rederive for ALiBi
    (whose bias-raised lse magnitudes hit the floor hardest; ring
    attention never passes ALiBi, so merged-lse callers are unaffected),
    honor the lse otherwise.  Pass False to force the reference's
    combined-lse behavior.

    The fused short-sequence backward (which recomputes softmax inline and
    ignores lse) is only dispatched from the custom_vjp, where the lse is
    known to come from the matching forward.

    ``dropout_rate``/``dropout_seed`` must MATCH the forward's — the kernels
    regenerate the identical element-indexed mask from them.

    GSPMD: routed through ops/partitioning so (batch, head)-sharded
    operands run the kernels on local shards (no all-gather).  ALiBi
    bypasses the wrapper (static slopes lower to jaxpr constants)."""
    from . import partitioning

    seg = _normalize_segments(segment_ids, q, k)
    rate, seed = _normalize_dropout(dropout_rate, dropout_seed)
    alibi = _normalize_alibi(alibi_slopes, q.shape[1], causal)
    if rederive_stats is None:
        rederive_stats = alibi is not None
    if rederive_stats:
        # Raw separable-convention stats, bit-identical to the matching
        # forward's (deterministic replay of the same dispatch) — no
        # combined-lse roundtrip, no alibi re-shift.
        m2, linv = _forward_raw_stats(
            q, k, v, causal=causal, sm_scale=sm_scale, segment_ids=seg,
            window=window, logit_softcap=logit_softcap, alibi_slopes=alibi,
            dropout_rate=rate, dropout_seed=seed, block_sizes=block_sizes,
            interpret=interpret,
        )
    else:
        # Combined-lse callers (ring attention feeds a globally MERGED
        # lse, for which no raw stats exist) get the synthesized stats.
        if alibi is not None:
            # The public lse is the TRUE combined logsumexp; the kernels
            # recompute P in the SEPARABLE ALiBi convention — re-shift
            # (regression: 6276631 dropped this from the forced
            # rederive_stats=False path, NaN-ing the ALiBi lse mode).
            lse = _alibi_lse_shift(
                lse, alibi, q.shape[2], k.shape[2] - q.shape[2], +1.0
            )
        m2, linv = lse_to_stats(lse)
    if alibi is not None or not partitioning.ENABLED:
        return _backward_unpartitioned(
            q, k, v, o, do, m2, linv,
            causal=causal, sm_scale=sm_scale, segment_ids=seg, window=window,
            logit_softcap=logit_softcap, alibi_slopes=alibi,
            dropout_rate=rate, dropout_seed=seed,
            block_sizes=block_sizes, interpret=interpret,
        )
    cp = partitioning.partitioned_backward_public(
        causal, sm_scale, window, float(logit_softcap), alibi, rate,
        block_sizes, interpret, seg is not None, seed is not None,
    )
    return cp(q, k, v, o, do, m2, linv, *partitioning._pack(seg, seed))


def _backward_unpartitioned(
    q,
    k,
    v,
    o,
    do,
    m2,
    linv,
    *,
    causal: bool = False,
    sm_scale: Optional[float] = None,
    segment_ids: Optional[Union[SegmentIds, jax.Array]] = None,
    window: int = 0,
    logit_softcap: float = 0.0,
    alibi_slopes=None,
    dropout_rate: float = 0.0,
    dropout_seed=None,
    block_sizes: Optional[tuning.BlockSizes] = None,
    interpret: Optional[bool] = None,
):
    """flash_attention_backward's dispatch body, shard-local shapes in
    (the partitioning wrapper lowers to this)."""
    _validate(q, k, v)
    window = _normalize_window(window, causal, k.shape[2])
    seg = _normalize_segments(segment_ids, q, k)
    alibi = _normalize_alibi(alibi_slopes, q.shape[1], causal)
    rate, seed = _normalize_dropout(dropout_rate, dropout_seed)
    # Stats arrive in the kernels' own convention (raw separable stats on
    # the vjp path; lse_to_stats-synthesized on the public path, already
    # alibi-re-shifted by the caller).
    user_blocks = block_sizes is not None
    sm_scale, bs, interpret = _resolve(q, k, sm_scale, block_sizes, interpret)
    num_kv_heads = k.shape[1]
    d_est = geo.current_geometry().round_up(q.shape[-1])
    # Mid-length causal path: pane-resident in-kernel sub-blocking (see
    # bwd_mid.py), the backward twin of the forward's fwd_mid route.
    use_mid = (
        not user_blocks
        and causal
        and seg is None
        and alibi is None
        and rate == 0.0
        and q.shape[2] == k.shape[2]
        and q.shape[2] <= bwd_mid.MAX_MID_BWD_N
        and bwd_mid.bwd_mid_fits(
            geo.current_geometry().round_up(q.shape[2], bwd_mid.SUB),
            d_est, q.dtype,
        )
    )
    if use_mid:
        qp, kp, vp, q_len, kv_len, d = _pad_inputs(
            q, k, v, bwd_mid.SUB, bwd_mid.SUB
        )
        op, _ = pad_axis_to(o, 2, bwd_mid.SUB)
        dop, _ = pad_axis_to(do, 2, bwd_mid.SUB)
        if qp.shape[-1] != d:
            op, _ = pad_axis_to(op, 3, qp.shape[-1])
            dop, _ = pad_axis_to(dop, 3, qp.shape[-1])
        m_pk = _pack_stat_padded(m2, bwd_mid.SUB)
        linv_pk = _pack_stat_padded(linv, bwd_mid.SUB)
        dq, dk, dv = bwd_mid.bwd_mid_pallas(
            qp, kp, vp, op, dop, m_pk, linv_pk,
            sm_scale=sm_scale, kv_len=kv_len, window=window,
            softcap=float(logit_softcap), interpret=interpret,
        )
        batch, num_q_heads = q.shape[0], q.shape[1]
        if num_q_heads != num_kv_heads:
            grp = num_q_heads // num_kv_heads
            dk = dk.reshape(batch, num_kv_heads, grp, *dk.shape[2:]).sum(axis=2)
            dv = dv.reshape(batch, num_kv_heads, grp, *dv.shape[2:]).sum(axis=2)
        dq = dq[:, :, :q_len, :d].astype(q.dtype)
        dk = dk[:, :, :kv_len, :d].astype(k.dtype)
        dv = dv[:, :, :kv_len, :d].astype(v.dtype)
        return dq, dk, dv
    # Segmented fused backward for long causal sequences: the fused kernel's
    # pane-resident dQ buffer caps it at max_fused_n (8K at d=128); beyond
    # that the round-1 build fell back to the two-sweep kernels (7 matmuls
    # per block pair vs the fused 5 — measured 114 vs 132 TF/s at 16K/8K).
    # Instead, split Q into fused-size row segments and run the fused kernel
    # once per segment against the causal KV prefix it can see (segment s
    # is just a cross-length causal call with q_off = s0).  dQ rows are
    # disjoint; partial per-segment dK/dV are XLA-summed — two extra HBM
    # passes over dK/dV per extra segment, ~3% of the kernel time at 16K.
    seg_n = bwd_fused.max_fused_n(d_est)
    use_seg_fused = (
        not user_blocks
        and causal
        and window == 0
        and seg is None
        and q.shape[2] == k.shape[2]
        and q.shape[2] > seg_n
        and bwd_fused.pick_fused_blocks(seg_n, k.shape[2], d_est, q.dtype)
        is not None
    )
    if use_seg_fused:
        return _backward_fused_segmented(
            q, k, v, o, do, m2, linv, seg_n,
            sm_scale=sm_scale, softcap=float(logit_softcap), alibi=alibi,
            rate=rate, seed=seed,
            num_kv_heads=num_kv_heads, d_est=d_est, interpret=interpret,
        )
    # Block choice: the fused single-sweep kernel has its own sweet spot
    # (smaller than the split kernels' — its dQ pane buffer eats VMEM).
    # Pinned blocks are honored (fused if they fit, split otherwise).
    if user_blocks:
        bq, bkv = bs.block_q_bwd, bs.block_kv_bwd
        n_q_pad = -(-q.shape[2] // bq) * bq
        use_fused = bwd_fused.fused_bwd_fits_vmem(
            n_q_pad, d_est, bq, bkv, q.dtype
        )
    else:
        fused_blocks = bwd_fused.pick_fused_blocks(
            q.shape[2], k.shape[2], d_est, q.dtype
        )
        use_fused = fused_blocks is not None
        bq, bkv = fused_blocks if use_fused else (
            bs.block_q_bwd, bs.block_kv_bwd
        )
    qp, kp, vp, q_len, kv_len, d = _pad_inputs(q, k, v, bq, bkv)
    qseg_p, kvseg_p = _pad_segments(seg, bq, bkv)
    op, _ = pad_axis_to(o, 2, bq)
    dop, _ = pad_axis_to(do, 2, bq)
    d_pad = qp.shape[-1]
    if d_pad != d:
        op, _ = pad_axis_to(op, 3, d_pad)
        dop, _ = pad_axis_to(dop, 3, d_pad)
    # Stats arrive [B, H, Nq]; pad and pack to the grouped layout the
    # blocked backward kernels read (layout.py).  linv pads with 0 -> padded
    # q rows recompute p = exp2(s)·0 = 0; m2 pads with 0, safe because
    # padded q rows are zeros (s = 0, finite).
    m_pk = _pack_stat_grouped_padded(m2, bq)
    linv_pk = _pack_stat_grouped_padded(linv, bq)

    # Fused single-sweep backward (5 matmuls per block pair, D inline)
    # whenever the pane-resident dQ buffer fits VMEM; two-sweep kernels
    # (7 matmuls, separate D-preprocess) otherwise — see bwd_fused.py.
    if use_fused:
        dq, dk, dv = bwd_fused.bwd_fused_pallas(
            qp, kp, vp, op, dop, m_pk, linv_pk, qseg_p, kvseg_p, seed,
            sm_scale=sm_scale, causal=causal, window=window,
            softcap=float(logit_softcap),
            block_q=bq, block_kv=bkv, kv_len=kv_len, interpret=interpret,
            q_off=kv_len - q_len, alibi_slopes=alibi, dropout_rate=rate,
        )
    else:
        dpre = bwd.bwd_d_pallas(op, dop, block_q=bq, interpret=interpret)
        dk, dv = bwd.bwd_dkv_pallas(
            qp, kp, vp, dop, m_pk, linv_pk, dpre, qseg_p, kvseg_p, seed,
            sm_scale=sm_scale, causal=causal, window=window,
            softcap=float(logit_softcap),
            block_q=bq, block_kv=bkv, kv_len=kv_len, interpret=interpret,
            q_off=kv_len - q_len, alibi_slopes=alibi, dropout_rate=rate,
        )
        dq = bwd.bwd_dq_pallas(
            qp, kp, vp, dop, m_pk, linv_pk, dpre, qseg_p, kvseg_p, seed,
            sm_scale=sm_scale, causal=causal, window=window,
            softcap=float(logit_softcap),
            block_q=bq, block_kv=bkv, kv_len=kv_len, interpret=interpret,
            q_off=kv_len - q_len, alibi_slopes=alibi, dropout_rate=rate,
        )
    # GQA: group-sum per-q-head dK/dV into per-kv-head grads.
    batch, num_q_heads = q.shape[0], q.shape[1]
    if num_q_heads != num_kv_heads:
        grp = num_q_heads // num_kv_heads
        dk = dk.reshape(batch, num_kv_heads, grp, *dk.shape[2:]).sum(axis=2)
        dv = dv.reshape(batch, num_kv_heads, grp, *dv.shape[2:]).sum(axis=2)
    dq = dq[:, :, :q_len, :d].astype(q.dtype)
    dk = dk[:, :, :kv_len, :d].astype(k.dtype)
    dv = dv[:, :, :kv_len, :d].astype(v.dtype)
    return dq, dk, dv


def _backward_fused_segmented(q, k, v, o, do, m2, linv, seg_n, *, sm_scale,
                              softcap, alibi, rate, seed, num_kv_heads,
                              d_est, interpret):
    """Fused single-sweep backward run per Q row segment (plain causal
    self-attention only).  Each segment sees the KV prefix [0, s1) with
    q_off = s0 — exactly the cross-length causal contract — so dQ comes out
    exact per segment and per-segment partial dK/dV sum to the total.
    ALiBi composes: the kernels' separable column term uses the ABSOLUTE
    kv position (k always starts at 0 here) and the incoming lse is
    already in the separable convention, which slices with the q rows."""
    batch, num_q_heads, n, d_full = q.shape
    dq_parts = []
    dk_tot = jnp.zeros((batch, num_q_heads, n, d_full), jnp.float32)
    dv_tot = jnp.zeros_like(dk_tot)
    s0 = 0
    while s0 < n:
        s1 = min(s0 + seg_n, n)
        q_s, o_s, do_s = (t[:, :, s0:s1] for t in (q, o, do))
        m_s, linv_s = m2[:, :, s0:s1], linv[:, :, s0:s1]
        k_s, v_s = k[:, :, :s1], v[:, :, :s1]
        blocks = bwd_fused.pick_fused_blocks(
            s1 - s0, s1, d_est, q.dtype
        ) or (geo.MIN_BLOCK, geo.MIN_BLOCK)
        bq, bkv = blocks
        qp, kp, vp, q_len, kv_len, d = _pad_inputs(q_s, k_s, v_s, bq, bkv)
        op, _ = pad_axis_to(o_s, 2, bq)
        dop, _ = pad_axis_to(do_s, 2, bq)
        if qp.shape[-1] != d:
            op, _ = pad_axis_to(op, 3, qp.shape[-1])
            dop, _ = pad_axis_to(dop, 3, qp.shape[-1])
        m_pk = _pack_stat_grouped_padded(m_s, bq)
        linv_pk = _pack_stat_grouped_padded(linv_s, bq)
        dq_s, dk_p, dv_p = bwd_fused.bwd_fused_pallas(
            qp, kp, vp, op, dop, m_pk, linv_pk, None, None, seed,
            sm_scale=sm_scale, causal=True, window=0, softcap=softcap,
            block_q=bq, block_kv=bkv, kv_len=kv_len, interpret=interpret,
            q_off=kv_len - q_len, alibi_slopes=alibi, dropout_rate=rate,
            drop_row_off=s0,
        )
        dq_parts.append(dq_s[:, :, :q_len, :d_full])
        # Plain pad+add, NOT .at[].add: scatter-add embeds an empty int32
        # index array as a trace-time constant, and custom_partitioning
        # rejects impls whose jaxpr captures consts (this is the only
        # .at[] on the partitioned backward path).
        pad_n = ((0, 0), (0, 0), (0, n - kv_len), (0, 0))
        dk_tot = dk_tot + jnp.pad(dk_p[:, :, :kv_len, :d_full], pad_n)
        dv_tot = dv_tot + jnp.pad(dv_p[:, :, :kv_len, :d_full], pad_n)
        s0 = s1
    dq = jnp.concatenate(dq_parts, axis=2)
    dk, dv = dk_tot, dv_tot
    if num_q_heads != num_kv_heads:
        grp = num_q_heads // num_kv_heads
        dk = dk.reshape(batch, num_kv_heads, grp, *dk.shape[2:]).sum(axis=2)
        dv = dv.reshape(batch, num_kv_heads, grp, *dv.shape[2:]).sum(axis=2)
    return dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype)


def _backward_small(q, k, v, do, seg, causal, sm_scale, window, softcap,
                    interpret):
    """One-shot fused backward for short sequences (see fwd_small)."""
    n_pad = geo.current_geometry().round_up(
        max(q.shape[2], k.shape[2]), geo.NUM_LANES
    )
    qp, kp, vp, q_len, kv_len, d = _pad_inputs(q, k, v, n_pad, n_pad)
    dop, _ = pad_axis_to(do, 2, n_pad)
    if qp.shape[-1] != d:
        dop, _ = pad_axis_to(dop, 3, qp.shape[-1])
    qseg_p, kvseg_p = _pad_segments(seg, n_pad, n_pad)
    dq, dk, dv = fwd_small.bwd_small_pallas(
        qp, kp, vp, dop, qseg_p, kvseg_p,
        sm_scale=sm_scale, causal=causal, kv_len=kv_len,
        window=window, softcap=float(softcap), interpret=interpret,
        q_off=kv_len - q_len,
    )
    batch, num_q_heads = q.shape[0], q.shape[1]
    num_kv_heads = k.shape[1]
    if num_q_heads != num_kv_heads:
        grp = num_q_heads // num_kv_heads
        dk = dk.reshape(batch, num_kv_heads, grp, *dk.shape[2:]).sum(axis=2)
        dv = dv.reshape(batch, num_kv_heads, grp, *dv.shape[2:]).sum(axis=2)
    dq = dq[:, :, :q_len, :d].astype(q.dtype)
    dk = dk[:, :, :kv_len, :d].astype(k.dtype)
    dv = dv[:, :, :kv_len, :d].astype(v.dtype)
    return dq, dk, dv


# ---------------------------------------------------------------------------
# Differentiable op (≙ torch.autograd.Function, src/flash_attention_torch.py)
# ---------------------------------------------------------------------------


def _seg_cotangent(seg):
    """float0 cotangents for the (integer) segment-id primals."""
    if seg is None:
        return None
    return SegmentIds(
        q=np.zeros(seg.q.shape, jax.dtypes.float0),
        kv=np.zeros(seg.kv.shape, jax.dtypes.float0),
    )


def _partitioned_fwd_call(q, k, v, seg, seed, causal, sm_scale, window,
                          softcap, alibi, rate, block_sizes, small,
                          xla_small, interpret, save_residuals):
    """Forward through the GSPMD-partitionable wrapper (ops/partitioning):
    under jit with (batch, head)-sharded operands the Pallas kernels run on
    local shards instead of being all-gathered and replicated.  The XLA
    tiny-N route bypasses it — pure-XLA math partitions natively (and its
    global iotas keep dropout exact under GSPMD).  ALiBi also bypasses:
    the static slope tuple lowers to jaxpr constants, which
    custom_partitioning rejects (and head sharding is unsupported for it
    regardless — slopes are indexed by local head id)."""
    from . import partitioning

    if alibi is not None or not partitioning.ENABLED:
        return _forward_impl(
            q, k, v, seg, causal, sm_scale, window, softcap, alibi, rate,
            seed, block_sizes, small, xla_small, interpret,
            save_residuals=save_residuals,
        )

    cp = partitioning.partitioned_forward(
        causal, sm_scale, window, softcap, alibi, rate, block_sizes, small,
        xla_small, interpret, seg is not None, seed is not None,
        save_residuals,
    )
    out = cp(q, k, v, *partitioning._pack(seg, seed))
    if save_residuals:
        o, m2, linv = out
        return o, (m2, linv)
    return out, None


@functools.partial(
    jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8, 9, 10, 11, 12, 13, 14)
)
def _flash_attention(q, k, v, seg, seed, causal, sm_scale, window, softcap,
                     alibi, rate, block_sizes, small, xla_small, interpret):
    if xla_small:
        o, _ = _forward_impl(
            q, k, v, seg, causal, sm_scale, window, softcap, alibi, rate,
            seed, block_sizes, small, xla_small, interpret,
            save_residuals=False,
        )
        return o
    o, _ = _partitioned_fwd_call(
        q, k, v, seg, seed, causal, sm_scale, window, softcap, alibi, rate,
        block_sizes, small, xla_small, interpret, save_residuals=False,
    )
    return o


def _flash_attention_fwd(q, k, v, seg, seed, causal, sm_scale, window,
                         softcap, alibi, rate, block_sizes, small, xla_small,
                         interpret):
    if xla_small:
        # The XLA-route backward re-differentiates the whole-fused math and
        # never reads the lse — skip computing it (keeps the fastest fused
        # SDPA forward usable under jax.grad).
        o, _ = _forward_impl(
            q, k, v, seg, causal, sm_scale, window, softcap, alibi, rate,
            seed, block_sizes, small, xla_small, interpret,
            save_residuals=False,
        )
        from jax.ad_checkpoint import checkpoint_name

        o = checkpoint_name(o, "flash_o")
        return o, (q, k, v, o, None, None, seg, seed)
    o, (m2, linv) = _partitioned_fwd_call(
        q, k, v, seg, seed, causal, sm_scale, window, softcap, alibi, rate,
        block_sizes, small, xla_small, interpret, save_residuals=True,
    )
    # Residuals (Q, K, V, O, L) ≙ ctx.save_for_backward
    # (src/flash_attention_torch.py:77).  The outputs are checkpoint-NAMED
    # so a remat policy can pin them: with
    # save_only_these_names("flash_o", "flash_lse", ...) the rematerialized
    # backward reuses the saved residuals and the forward kernel is NOT
    # re-executed inside jax.checkpoint blocks (see models.transformer
    # remat_policy="save_flash").  The primal returns the same named value,
    # so the data path and the residual are one var and recompute can DCE
    # the kernel entirely.
    from jax.ad_checkpoint import checkpoint_name

    o = checkpoint_name(o, "flash_o")
    m2 = checkpoint_name(m2, "flash_lse")
    linv = checkpoint_name(linv, "flash_lse")
    return o, (q, k, v, o, m2, linv, seg, seed)


def _seed_cotangent(seed):
    if seed is None:
        return None
    return np.zeros(seed.shape, jax.dtypes.float0)


def _flash_attention_bwd(causal, sm_scale, window, softcap, alibi, rate,
                         block_sizes, small, xla_small, interpret, res, do):
    q, k, v, o, m2, linv, seg, seed = res
    if jnp.dtype(v.dtype) in fwd.FP8_DTYPES:
        # fp8 V is a forward/inference feature (matching the scope of the
        # reference's vendored fp8 path); training should keep V in bf16 —
        # a "gradient of an fp8 tensor" would silently round to garbage.
        raise NotImplementedError(
            "backward through fp8 V is not supported — use bf16 V for "
            "training, fp8 V for inference-only calls"
        )
    if xla_small:
        # Tiny-N XLA route: differentiate the same whole-fused attention
        # the forward ran (XLA fuses the recompute + grads into batched
        # GEMMs — measured 96 TF/s fwd+bwd at N=256 vs 28 for the one-shot
        # kernel).
        def f(q_, k_, v_):
            return _xla_small_fastest(
                q_, k_, v_, seg, causal, sm_scale, window, softcap, alibi,
                rate, seed,
            )

        _, vjp = jax.vjp(f, q, k, v)
        dq, dk, dv = vjp(do)
        return dq, dk, dv, _seg_cotangent(seg), _seed_cotangent(seed)
    # Pallas routes go through the partitioned wrapper (local small-vs-mid
    # dispatch lives inside it): the one-shot inline-softmax backward is the
    # numerics champion up to ~320 tokens, the sub-blocked/fused kernels
    # past that.
    from . import partitioning

    if alibi is not None or not partitioning.ENABLED:
        # static slopes lower to consts — bypass wrapper (also the env
        # escape hatch, see partitioning.ENABLED)
        if small and max(q.shape[2], k.shape[2]) <= 320:
            dq, dk, dv = _backward_small(
                q, k, v, do, seg, causal, sm_scale, window, softcap,
                interpret,
            )
        else:
            dq, dk, dv = _backward_unpartitioned(
                q, k, v, o, do, m2, linv,
                causal=causal, sm_scale=sm_scale, segment_ids=seg,
                window=window, logit_softcap=softcap, alibi_slopes=alibi,
                dropout_rate=rate, dropout_seed=seed,
                block_sizes=block_sizes, interpret=interpret,
            )
        return dq, dk, dv, _seg_cotangent(seg), _seed_cotangent(seed)
    cp = partitioning.partitioned_backward(
        causal, sm_scale, window, softcap, alibi, rate, block_sizes, small,
        interpret, seg is not None, seed is not None,
    )
    dq, dk, dv = cp(q, k, v, o, do, m2, linv,
                    *partitioning._pack(seg, seed))
    return dq, dk, dv, _seg_cotangent(seg), _seed_cotangent(seed)


_flash_attention.defvjp(_flash_attention_fwd, _flash_attention_bwd)


def flash_attention(
    q,
    k,
    v,
    *,
    causal: bool = False,
    sm_scale: Optional[float] = None,
    segment_ids: Optional[Union[SegmentIds, jax.Array]] = None,
    window: int = 0,
    logit_softcap: float = 0.0,
    alibi_slopes=None,
    dropout_rate: float = 0.0,
    dropout_seed=None,
    block_sizes: Optional[tuning.BlockSizes] = None,
    tune: bool = False,
    interpret: Optional[bool] = None,
):
    """Differentiable fused attention: O = softmax(scale·QKᵀ + bias + mask)V.

    q: [B, Hq, Nq, d]; k, v: [B, Hkv, Nkv, d] with Hq % Hkv == 0 (GQA/MQA).
    ``sm_scale`` defaults to 1/sqrt(d); pass ``sm_scale=1.0`` to reproduce the
    reference's unscaled convention (src/test_correctness.py:33).
    ``segment_ids`` enables packed-sequence masking: a ``SegmentIds(q, kv)``
    pair, or a single [B, N] array used for both sides (self-attention).
    ``tune=True`` times the VMEM-feasible block candidates on the live device
    the first time each shape key is seen (cached on disk thereafter) — the
    role of triton.autotune in the reference (src/flash_attention_kernels.py:11-15).
    ``alibi_slopes`` (one positive float per q head, causal only) adds the
    ALiBi bias −m_h·(q_pos − kv_pos) to the scores (Press et al. 2022);
    use :func:`alibi_slopes_for` for the standard geometric schedule.  The
    kernels add only the softmax-equivalent per-column term — no O(N²) bias
    tensor ever exists in HBM.
    ``dropout_rate`` (with a per-step int32 ``dropout_seed``) drops attention
    probabilities AFTER softmax normalization and rescales by 1/(1−rate)
    (flash-attn semantics).  The mask is a counter-based pure function of
    (seed, batch, head, row, col) — no mask tensor in HBM, and the backward
    regenerates it exactly whatever block geometry it runs with.
    """
    _validate(q, k, v)
    window = _normalize_window(window, causal, k.shape[2])
    seg = _normalize_segments(segment_ids, q, k)
    alibi = _normalize_alibi(alibi_slopes, q.shape[1], causal)
    rate, seed = _normalize_dropout(dropout_rate, dropout_seed)
    if tune and block_sizes is None:
        if isinstance(q, jax.core.Tracer):
            raise ValueError(
                "tune=True requires concrete arrays (call outside jit, or "
                "pass the tuned block_sizes in explicitly)"
            )
        block_sizes = tuned_block_sizes(q, k, v, causal=causal, sm_scale=sm_scale)
    if logit_softcap < 0:
        raise ValueError(f"logit_softcap must be >= 0, got {logit_softcap}")
    small = _use_small(q, k, block_sizes) and alibi is None and rate == 0.0
    xla_small = _use_xla_small(q, k, block_sizes)
    sm_scale, _, interpret = _resolve(q, k, sm_scale, block_sizes, interpret)
    # Pass the RAW block_sizes (None when unpinned) through the vjp: the
    # backward picks fused-path blocks itself when the caller didn't pin.
    return _flash_attention(q, k, v, seg, seed, causal, sm_scale, window,
                            float(logit_softcap), alibi, rate, block_sizes,
                            small, xla_small, interpret)


def tuned_block_sizes(
    q, k, v, *, causal: bool = False, sm_scale: Optional[float] = None
) -> tuning.BlockSizes:
    """Timed block-shape search for this workload (concrete arrays only).

    Tunes BOTH directions — the reference autotunes every kernel
    (src/flash_attention_kernels.py:11-15,169-173,337-341); round 1 of this
    build only timed the forward, leaving the backward on the heuristic."""
    sm_scale_r, bs0, interpret = _resolve(q, k, sm_scale, None, None)

    def build_fwd(bq, bkv):
        bs = tuning.BlockSizes(
            block_q=bq, block_kv=bkv,
            block_q_bwd=bs0.block_q_bwd, block_kv_bwd=bs0.block_kv_bwd,
        )

        def fn(q_, k_, v_):
            return _flash_attention(
                q_, k_, v_, None, None, causal, sm_scale_r, 0, 0.0, None,
                0.0, bs, False, False, interpret
            )

        return fn

    bq, bkv = tuning.tune_fwd_blocks(build_fwd, q, k, v, key_extra=causal)

    def build_bwd(bqb, bkvb):
        bs = tuning.BlockSizes(
            block_q=bq, block_kv=bkv, block_q_bwd=bqb, block_kv_bwd=bkvb
        )

        def fn(q_, k_, v_, do_):
            _, vjp = jax.vjp(
                lambda a, b, c: _flash_attention(
                    a, b, c, None, None, causal, sm_scale_r, 0, 0.0, None,
                    0.0, bs, False, False, interpret
                ),
                q_, k_, v_,
            )
            g = vjp(do_)
            # consume ALL grads (returning one lets XLA DCE the others)
            return (g[0].astype(jnp.float32).sum()
                    + g[1].astype(jnp.float32).sum()
                    + g[2].astype(jnp.float32).sum())

        return jax.jit(fn)

    do = jax.random.normal(jax.random.PRNGKey(0), q.shape, q.dtype)
    bqb, bkvb = tuning.tune_bwd_blocks(
        build_bwd, q, k, v, do, key_extra=causal
    )
    return tuning.BlockSizes(
        block_q=bq, block_kv=bkv, block_q_bwd=bqb, block_kv_bwd=bkvb
    )
