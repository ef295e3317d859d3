"""Mid-length causal forward: in-kernel sub-blocking, one cell per head.

The general kernel's causal efficiency is 1 − 0.5/T where T = N/block: at
N=1024 with the (1024, 1024) sweet-spot blocks every block pair IS the
diagonal, so half the MXU *and* VPU work (mask, exp2) is spent on masked
scores — the measured "N=1024 valley" (71 TF/s vs 103 at N=4096).  Shrinking
the grid blocks fixes the waste but drowns in per-grid-step overhead
(measured on v5e: 512² blocks 38.7 TF/s, 256² 23.9 — each grid step carries
~1µs of fixed cost).

This kernel keeps the BIG grid granularity — one cell per (batch, q-head)
pane with the whole K/V resident in VMEM — and does the fine-grained causal
blocking *inside* the kernel as an unrolled loop over the T(T+1)/2 needed
sub-block pairs.  Sub-pairs cost no grid-step overhead, diagonal sub-blocks
are the only masked ones (efficiency 1 − 0.5/T at T = N/256 = 80-94% for
N = 1-2K), and off-diagonal sub-pairs skip the mask/select VPU work
entirely.

Serves causal self-attention for 512 < N ≤ MAX_MID_N; everything else stays
on the general kernel.  Composes with GQA, kv-length tails, sliding
windows, soft-capping, and the LSE residual; packed segments fall back
(data-dependent masks need per-pair masking everywhere, which is what the
general kernel already does well).

Same numerics as fwd_kernel.py: base-2 online softmax with sm_scale·log2e
folded into Q (≙ reference src/flash_attention_kernels.py:84-108).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .. import geometry as geo
from . import layout
from .fwd_kernel import DEFAULT_MASK_VALUE, LN2, LOG2E, mxu_dot, v_payload

# Padded-length ceiling for the pane path: the whole q/k/v/o pane set is
# VMEM-resident and Mosaic's 16 MiB scoped stack rejects 3072+ (measured on
# v5e: n=3072 hb=1 sub=512 bf16 fails to compile, 2048 runs at 110 TF/s).
MAX_MID_N = 2048

# Ceiling for the STRIP path (fwd_mid_strip_pallas): K/V panes stay VMEM-
# resident but q/o stream in strips, so the footprint is 2·2·n·d·isz for
# K/V double-buffers plus strip-sized temporaries — 8192 bf16 d=128 is
# ~12 MiB, the last power of two under the scoped ceiling.
MAX_STRIP_N = 8192

# q/o strip length for the strip path.  Multiple of 1024 so the packed-stat
# BlockSpec's sublane dim (strip/128) is a multiple of 8 (Mosaic rule).
STRIP = 1024

# Padding unit for this path (inputs are padded to a multiple of this; the
# in-kernel sub edge divides it).
SUB = 256

# Debug-only ablation knob for the strip kernel (read at TRACE time):
#   "dots"  — skip the online softmax entirely (dots-only structural ceiling)
#   "nosum" — skip the row-sum accumulation for l (the costliest VPU stage)
# Used by the DESIGN.md ceiling decomposition; never set in production.
_ABLATE = os.environ.get("FA_STRIP_ABLATE", "")

# Static-bound softmax shift (inference/pipeline=2 path): replace the
# running row-max chain with the per-row Cauchy–Schwarz bound
# m_r = ‖q_r·scale₂‖₂ · max_j‖k_j‖₂ − 10.  Softmax is shift-invariant, so
# ANY m within f32's exponent range of the true row max computes the same
# normalized output — the bound guarantees s − m ≤ 10 (no overflow: p ≤
# 2^10, l ≤ n·2^10), and underflow needs the bound to be ≥ ~115 bits
# loose, i.e. scale·‖q‖‖k‖ ≥ 2^115 · e^(true max) — unreachable for any
# real activation distribution (N(0,1) data at d=128 measures ~13 bits
# loose; the −10 recenter returns most of them).  What it buys: every
# merge drops the serial max-tree / maximum / alpha-exp / two alpha
# rescales and becomes exp2 → lane-sum → PV-dot, the last VPU item the
# ceiling decomposition charges (~5 TF/s: nomax ablation 156.3 vs 151.3).
# The two O(n·d) norm passes (k once per cell, q once per chain) are
# <0.5% of cell time.  Residual/training paths keep the exact running
# max (the backward's (m, 1/l) contract pins m to the true row max).
# Set FA_STRIP_STATICMAX=0 to fall back to the running-max chain.
_STATIC_MAX = os.environ.get("FA_STRIP_STATICMAX", "")

# bf16 softmax-p in the strip kernel's visible-block merges — see
# merge_scores.  Alone it measured NEGATIVE on v5e (143.9 vs 147.0 TF/s:
# the VPU's exp2 is f32 internally) but COMBINED with the deferred lane
# sum below it is +1.3 (150.0 → 151.3 at the r5 headline config) — the
# bf16 p halves the lane-sum adds and the PV-dot cast that remain on the
# hot path once the reduction trees are gone.  Default: ON for bf16
# inputs on the NO-residual (inference) path only (p feeds the PV dot as
# bf16 anyway; fp32 inputs keep the full-precision exp2, and the
# residual-saving path keeps f32 so the published 1/l matches the
# backward's recompute — see the kernel's exp_bf16 gate).
# FA_STRIP_EXP_BF16=0/1 forces the dtype half of the gate.
_EXP_BF16 = os.environ.get("FA_STRIP_EXP_BF16", "")


def _use_exp_bf16(dtype) -> bool:
    if _EXP_BF16 in ("0", "1"):
        return _EXP_BF16 == "1"
    return jnp.dtype(dtype) == jnp.bfloat16


# Defer the l rowsum's cross-lane reduction — carry l as a [sub, LANES]
# per-lane partial-sum vector and reduce once in the epilogue, replacing
# 135 in-merge lane-reduction trees with lane-wise adds.  Measured +2.3
# TF/s at the headline shape (147.7 → 150.0); numerics-neutral up to f32
# summation order.  Default ON; FA_STRIP_LSUM_VEC=0 restores the trees.
_LSUM_VEC = bool(int(os.environ.get("FA_STRIP_LSUM_VEC", "1")))

# Unrolled-sub-pair budget: Mosaic compile time grows with the static
# T(T+1)/2 pair unroll (sub=128 at N=1024, 36 pairs of 128-edge, blew past
# 9 minutes; 256-edge 36-pair panes compile in seconds).  45 pairs = T=9,
# the largest T a non-power-of-two padded length can need at sub=256.
MAX_SUB_PAIRS = 45


def pick_sub(n: int) -> int:
    """In-kernel sub-block edge for a padded pane length ``n`` (multiple of
    SUB): the SMALLEST divisor of n in {256, 512, 1024} whose T(T+1)/2
    unroll stays within the compile-time budget.  Finer is better for
    causal efficiency (waste fraction = 1/(T+1)); the budget is what kept
    sub=128 out (36 pairs of 128-edge blew past 9 min of Mosaic compile)."""
    for sub in (256, 512, 1024):
        if n % sub:
            continue
        t = n // sub
        if t * (t + 1) // 2 <= MAX_SUB_PAIRS:
            return sub
    return max(256, n // 8)


def mid_path_fits(n_pad: int, head_dim: int, dtype, hb: int = 1,
                  margin: float = 1.0, sub: int | None = None) -> bool:
    """VMEM feasibility: q/k/v/o panes (double-buffered) + lse + score/acc
    temporaries must fit the scoped budget.  ``margin`` scales the estimate
    — Mosaic's real stack allocation exceeds this byte model (fp32 matmuls
    multipass with extra temporaries, hence the 1.25× fp32 surcharge);
    pick_hb passes margin=1.6, recalibrated against six measured v5e
    compile pass/fail points (see its docstring)."""
    isz = jnp.dtype(dtype).itemsize
    if sub is None:
        sub = pick_sub(n_pad) if n_pad % SUB == 0 else SUB
    panes = 2 * hb * (4 * n_pad * head_dim * isz + n_pad * 4)
    if isz == 4:
        # fp32 matmuls multipass on the MXU and carry extra Mosaic
        # temporaries beyond the byte model (fp32 n=1024 hb=2 compile-OOMs
        # while the byte-identical bf16 n=1024 hb=4 compiles)
        panes = int(panes * 1.25)
    temps = 3 * sub * sub * 4 + n_pad * head_dim * 4
    return geo.fits_vmem(
        int((panes + temps) * margin), geo.current_geometry()
    )


def pick_hb(n_pad: int, head_dim: int, dtype, num_q_heads: int,
            q_per_kv: int) -> int:
    """Heads per grid cell: 2 when the pane set still fits VMEM (halves the
    per-cell fixed cost), else 1.  Validity: hb must divide Hq and nest with
    the GQA group (share one kv head or own whole groups).

    Gated with the measured 1.6× Mosaic stack margin (hb=2 at n=2048 bf16
    and n=1024 fp32 both compile-OOM without it).  Short panes are
    HBM-bound, so packing more heads per cell amortizes the per-step
    pipeline cost: measured v5e bf16 B=8 H=16 d=128: N=512 47.2 → 54.1
    TF/s (hb 2 → 8), N=1024 90.9 → 94.8 (hb 2 → 4).

    r5: the pane call now raises vmem_limit_bytes (scoped_vmem_limit), so
    short panes can pack the WHOLE head set: measured v5e bf16 B=8 H=16
    d=128: N=512 57.8 → 72.2 TF/s (hb 16 under the raised limit; the old
    16 MiB gate capped hb at 8), N=1024 87 → 89.4 at hb=8.  Candidates
    above 8 are gated against the raised limit, the rest keep the default
    budget (measured to schedule better at n=2048-class panes)."""
    def fits_raised(hb_):
        isz = jnp.dtype(dtype).itemsize
        sub = pick_sub(n_pad)
        panes = 2 * hb_ * (4 * n_pad * head_dim * isz + n_pad * 4)
        if isz == 4:
            panes = int(panes * 1.25)
        temps = 3 * sub * sub * 4 + hb_ * n_pad * head_dim * 4
        return int((panes + temps) * 1.6) <= geo.scoped_vmem_limit()

    for hb in (16, 8, 4, 2):
        if num_q_heads % hb or not (
            hb % q_per_kv == 0 or q_per_kv % hb == 0
        ):
            continue
        if hb > 8:
            if n_pad <= 1024 and fits_raised(hb):
                return hb  # short panes: whole head set, raised limit
            continue
        if mid_path_fits(n_pad, head_dim, dtype, hb=hb, margin=1.6):
            return hb
    return 1


def pick_bb(n_pad: int, head_dim: int, dtype, batch: int, hb: int) -> int:
    """Batches per grid cell on top of ``hb`` heads — kept as an explicit
    knob, default OFF.  Measured v5e bf16 B=8 H=16 d=128 N=512: every
    (bb>1, hb) combination loses to packing HEADS under the raised VMEM
    limit (bb=8/hb=1: 66.7, bb=4/hb=2: 68.5, bb=2/hb=8: 69.3 vs hb=16:
    72.2 TF/s) — at equal bytes/cell the head-packed cell keeps one
    contiguous-pane DMA stream where the batch-folded block is strided
    across the batch axis."""
    del n_pad, head_dim, dtype, batch, hb
    return 1


def _mid_kernel(
    q_ref,  # [bb, hb, n, d] — raw; scores scaled by scale2 post-dot
    k_ref,  # [bb, hb_kv, n, d]
    v_ref,
    o_ref,
    m_out_ref,  # [bb, hb, n/128, 128] f32 packed (layout.py) or None
    linv_out_ref,  # same shape; 1/l (0 on empty rows)
    *,
    n: int,
    kv_len: int,
    window: int,
    softcap: float,
    sub: int,
    hb: int,
    q_per_kv: int,
    scale2: float,
    interleave: int,
    bb: int = 1,
):
    SUB = sub
    T = n // SUB
    row = jax.lax.broadcasted_iota(jnp.int32, (SUB, SUB), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (SUB, SUB), 1)
    diag_mask = row >= col  # static, shared by every diagonal sub-pair

    if interleave:
        # Interleaved emission (same trick as the strip kernel's pipeline=2,
        # see _mid_strip_kernel): every (head, row-block) chain is seeded
        # from its DIAGONAL sub-block first, then the fully-visible columns
        # are merged COLUMN-OUTER so consecutive merges belong to different
        # chains — hb·T-way ILP for Mosaic's static scheduler.
        #
        # Measured a WASH at pane sizes (v5e bf16 B=8 H=16 d=128: N=512
        # 52.6 vs 53.7 TF/s, N=1024 90.8 vs 91.7, hb=16 55.0 vs 55.3 —
        # within noise, slightly negative), so default OFF: short panes are
        # memory-pipeline-bound (q/k/v/o HBM floor ≈ 84 µs at N=512 vs
        # 156 µs measured — per-cell DMA ramp, not issue-order, is the
        # gap), unlike the long-pane strip kernel where the same reorder
        # bought 112.5 → 147 TF/s.  Kept for re-testing on parts with a
        # different VMEM/HBM balance.
        c2 = softcap * LOG2E if softcap else 0.0

        def jk_lo(iq):
            return max(0, (iq * SUB - window + 1) // SUB) if window else 0

        def kv_h(j):
            return j // q_per_kv if hb > q_per_kv else 0

        def scores(bq, j, iq, jk, qi):
            kj = k_ref[bq, kv_h(j), jk * SUB:(jk + 1) * SUB, :]
            s = mxu_dot(qi, kj, (((1,), (1,)), ((), ()))) * scale2
            if softcap:
                s = c2 * jnp.tanh(s * (1.0 / c2))
            mask = None
            if jk == iq:
                mask = diag_mask
            if window and jk * SUB < (iq + 1) * SUB - window:
                wm = (row + iq * SUB) - (col + jk * SUB) < window
                mask = wm if mask is None else jnp.logical_and(mask, wm)
            if (jk + 1) * SUB > kv_len:
                lm = (col + jk * SUB) < kv_len
                mask = lm if mask is None else jnp.logical_and(mask, lm)
            if mask is not None:
                s = jnp.where(mask, s, DEFAULT_MASK_VALUE)
            return s

        def vblock(bq, j, jk):
            return v_payload(
                v_ref[bq, kv_h(j), jk * SUB:(jk + 1) * SUB, :], q_ref.dtype
            )

        def init_chain(bq, j, iq, qi):
            s = scores(bq, j, iq, iq, qi)  # diagonal seeds the chain
            m = jnp.max(s, axis=-1, keepdims=True)
            p = jnp.exp2(s - m)
            l = jnp.sum(p, axis=-1, keepdims=True)
            vb = vblock(bq, j, iq)
            acc = mxu_dot(p.astype(vb.dtype), vb, (((1,), (0,)), ((), ())))
            return m, l, acc

        def merge(bq, j, iq, jk, qi, carry):
            m, l, acc = carry
            s = scores(bq, j, iq, jk, qi)
            m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
            alpha = jnp.exp2(m - m_new)
            p = jnp.exp2(s - m_new)
            l = l * alpha + jnp.sum(p, axis=-1, keepdims=True)
            vb = vblock(bq, j, jk)
            acc = acc * alpha + mxu_dot(
                p.astype(vb.dtype), vb, (((1,), (0,)), ((), ())),
            )
            return m_new, l, acc

        qis = {
            (bq, j, iq): q_ref[bq, j, iq * SUB:(iq + 1) * SUB, :]
            for bq in range(bb) for j in range(hb) for iq in range(T)
        }
        chains = {
            key: init_chain(*key, qis[key]) for key in qis
        }
        for jk in range(T - 1):
            for bq in range(bb):
                for j in range(hb):
                    for iq in range(jk + 1, T):
                        if window and jk < jk_lo(iq):
                            continue
                        key = (bq, j, iq)
                        chains[key] = merge(
                            bq, j, iq, jk, qis[key], chains[key]
                        )
        for (bq, j, iq), (m, l, acc) in chains.items():
            l_inv = jnp.where(l == 0.0, 0.0, 1.0 / l)
            o_ref[bq, j, iq * SUB:(iq + 1) * SUB, :] = (acc * l_inv).astype(
                o_ref.dtype
            )
            if m_out_ref is not None:
                m_out = jnp.where(l == 0.0, -DEFAULT_MASK_VALUE, m)
                rs = SUB // geo.NUM_LANES
                m_out_ref[bq, j, iq * rs:(iq + 1) * rs, :] = (
                    layout.column_to_lanes(m_out)
                )
                linv_out_ref[bq, j, iq * rs:(iq + 1) * rs, :] = (
                    layout.column_to_lanes(l_inv[:, :1])
                )
        return

    for bq, j, iq in [
        (b_, j_, iq_) for b_ in range(bb) for j_ in range(hb)
        for iq_ in range(T)
    ]:
        jkv_h = j // q_per_kv if hb > q_per_kv else 0
        qi = q_ref[bq, j, iq * SUB:(iq + 1) * SUB, :]
        m = None
        l = None
        acc = None
        jk_lo = 0
        if window:
            # first kv sub-block the row block's window can reach
            jk_lo = max(0, (iq * SUB - window + 1) // SUB)
        for jk in range(jk_lo, iq + 1):
            kj = k_ref[bq, jkv_h, jk * SUB:(jk + 1) * SUB, :]
            s = mxu_dot(qi, kj, (((1,), (1,)), ((), ()))) * scale2
            if softcap:
                c2 = softcap * LOG2E
                s = c2 * jnp.tanh(s * (1.0 / c2))
            mask = None
            if jk == iq:
                mask = diag_mask
            if window:
                # sub-pairs crossing the window's trailing edge
                if jk * SUB < (iq + 1) * SUB - window:
                    wm = (row + iq * SUB) - (col + jk * SUB) < window
                    mask = wm if mask is None else jnp.logical_and(mask, wm)
            if (jk + 1) * SUB > kv_len:
                lm = (col + jk * SUB) < kv_len
                mask = lm if mask is None else jnp.logical_and(mask, lm)
            if mask is not None:
                s = jnp.where(mask, s, DEFAULT_MASK_VALUE)
            if m is None:  # first sub-block of the row: plain init
                m = jnp.max(s, axis=-1, keepdims=True)
                p = jnp.exp2(s - m)
                l = jnp.sum(p, axis=-1, keepdims=True)
                vb = v_payload(
                    v_ref[bq, jkv_h, jk * SUB:(jk + 1) * SUB, :],
                    q_ref.dtype,
                )
                acc = mxu_dot(
                    p.astype(vb.dtype), vb, (((1,), (0,)), ((), ())),
                )
            else:
                m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
                alpha = jnp.exp2(m - m_new)
                p = jnp.exp2(s - m_new)
                l = l * alpha + jnp.sum(p, axis=-1, keepdims=True)
                vb = v_payload(
                    v_ref[bq, jkv_h, jk * SUB:(jk + 1) * SUB, :],
                    q_ref.dtype,
                )
                acc = acc * alpha + mxu_dot(
                    p.astype(vb.dtype), vb, (((1,), (0,)), ((), ())),
                )
                m = m_new
            del s
        l_inv = jnp.where(l == 0.0, 0.0, 1.0 / l)
        o_ref[bq, j, iq * SUB:(iq + 1) * SUB, :] = (acc * l_inv).astype(
            o_ref.dtype
        )
        if m_out_ref is not None:
            # Raw (m, 1/l) stats — see fwd_kernel epilogue for why the
            # combined lse is NOT stored (bit-cancelling backward recompute).
            m_out = jnp.where(l == 0.0, -DEFAULT_MASK_VALUE, m)
            rs = SUB // geo.NUM_LANES
            m_out_ref[bq, j, iq * rs:(iq + 1) * rs, :] = (
                layout.column_to_lanes(m_out)
            )
            linv_out_ref[bq, j, iq * rs:(iq + 1) * rs, :] = (
                layout.column_to_lanes(l_inv[:, :1])
            )


@functools.partial(
    jax.jit,
    static_argnames=(
        "sm_scale", "kv_len", "window", "softcap", "save_residuals",
        "interpret", "sub", "hb", "interleave", "bb",
    ),
)
def fwd_mid_pallas(
    q,
    k,
    v,
    *,
    sm_scale: float,
    kv_len: int,
    window: int = 0,
    softcap: float = 0.0,
    save_residuals: bool = False,
    interpret: bool = False,
    sub: int | None = None,
    hb: int | None = None,
    interleave: int = 0,
    bb: int | None = None,
):
    """Causal attention for padded [B, H, n, d], 512 < n ≤ MAX_MID_N.

    Same contract as fwd_pallas restricted to causal self-attention without
    packed segments.  ``bb`` folds that many BATCHES into one grid cell
    (with ``hb`` heads): short panes are DMA-ramp-bound (the per-cell cold
    fetch dominates when compute per cell is ~10 µs), so fewer, bigger
    cells with more pipelined bytes per step is the lever — see pick_bb.
    """
    batch, num_q_heads, n, head_dim = q.shape
    num_kv_heads = k.shape[1]
    q_per_kv = num_q_heads // num_kv_heads
    assert n % SUB == 0, n

    if sub is None:
        sub = pick_sub(n)
    assert n % sub == 0, (n, sub)
    assert (n // sub) * (n // sub + 1) // 2 <= 2 * MAX_SUB_PAIRS, (n, sub)
    if hb is None:
        hb = pick_hb(n, head_dim, q.dtype, num_q_heads, q_per_kv)
    if bb is None:
        bb = pick_bb(n, head_dim, q.dtype, batch, hb)
    assert batch % bb == 0, (batch, bb)
    hb_kv = hb // q_per_kv if hb % q_per_kv == 0 else 1
    kernel = functools.partial(
        _mid_kernel,
        n=n, kv_len=kv_len, window=window, softcap=float(softcap), sub=sub,
        hb=hb, q_per_kv=q_per_kv, scale2=float(sm_scale) * LOG2E,
        interleave=interleave, bb=bb,
    )
    if not save_residuals:
        inner = kernel

        def kernel(q_r, k_r, v_r, o_r):  # noqa: F811
            return inner(q_r, k_r, v_r, o_r, None, None)

    grid = (batch // bb, num_q_heads // hb)
    q_spec = pl.BlockSpec((bb, hb, n, head_dim), lambda b, h: (b, h, 0, 0))
    if hb % q_per_kv == 0:
        kv_index = lambda b, h: (b, h, 0, 0)  # cell owns whole kv groups
    else:
        kv_index = lambda b, h: (b, (h * hb) // q_per_kv, 0, 0)
    kv_spec = pl.BlockSpec((bb, hb_kv, n, head_dim), kv_index)
    out_specs = [q_spec]
    out_shape = [jax.ShapeDtypeStruct(q.shape, q.dtype)]
    if save_residuals:
        for _ in range(2):  # m then linv, same packed layout
            out_specs.append(
                pl.BlockSpec(
                    (bb, hb, n // geo.NUM_LANES, geo.NUM_LANES),
                    lambda b, h: (b, h, 0, 0),
                )
            )
            out_shape.append(
                jax.ShapeDtypeStruct(
                    (batch, num_q_heads, n // geo.NUM_LANES, geo.NUM_LANES),
                    jnp.float32,
                )
            )
    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[q_spec, kv_spec, kv_spec],
        out_specs=out_specs,
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
            vmem_limit_bytes=geo.scoped_vmem_limit(),
        ),
        interpret=interpret,
    )(q, k, v)
    if save_residuals:
        return outs[0], (outs[1], outs[2])
    return outs[0], None


# ---------------------------------------------------------------------------
# Strip path: K/V panes resident, q/o streamed — 2048 < N <= MAX_STRIP_N
# ---------------------------------------------------------------------------
#
# The pane kernel above holds the whole q/k/v/o pane set in VMEM, which dies
# at Mosaic's 16 MiB scoped-stack ceiling past N=2048.  This variant keeps
# only K/V resident — the part every query row needs — and streams q/o in
# STRIP-row slabs along a third grid axis whose K/V index map is constant,
# so Mosaic fetches each pane once per (batch, head) and revisits it for
# every strip.  The causal structure moves in-kernel: the diagonal sub-block
# is computed with a static mask, the strictly-visible interior sub-blocks
# run in a dynamic-bound fori_loop with no masking at all (the reference's
# rectangular grid masks EVERY block against the diagonal,
# ≙ src/flash_attention_openai_tutorial.py:164-181).  Efficiency is
# 1 − sub/(2·N_visible) with zero per-sub grid overhead; grid steps per pane
# shrink from (N/1024)²/2 (tri grid) to N/STRIP.


def pick_wide(n_pad: int, head_dim: int, dtype) -> int:
    """Interior merge width: 1024 while the double-buffered K/V panes
    leave room for each live strip's [sub, wide] f32 score temporaries,
    else 512.  Cutover measured on v5e (bf16 d=128: n=6144 compiles and
    runs 121 TF/s at wide=1024, n=8192 compile-OOMs at 1024 and runs
    118 TF/s at 512 — pre-vmem_limit_bytes; the raised limit keeps 1024
    viable everywhere the strip path reaches)."""
    kv = 2 * 2 * n_pad * head_dim * jnp.dtype(dtype).itemsize
    return 1024 if kv < 8 * 1024 * 1024 else 512


# Whole-pane strips (strip == n): the entire causal triangle is one static
# interleaved unroll — the fastest structure measured (v5e bf16 B=8 H=16
# d=128: 147.0 TF/s @4096 / 120.6 @2048 vs 112.5 / 110 streamed), but
# Mosaic compile time grows with the t(t+1)/2 sub-pair count: ~80 s at
# 2048 (36 pairs), ~2 min at 4096 (136), ~12 min at 6144 (300), and the
# remote compiler crashes outright at 8192 (528).  Cap the unroll here and
# stream longer panes through sub-strips with the shared interior loop.
MAX_WHOLE_STRIP_N = 4096


def pick_strip(n_pad: int) -> int:
    """q/o strip length for a padded pane length ``n_pad`` (multiple of
    STRIP): the whole pane while the static unroll stays inside the
    compile budget, else the largest dividing sub-strip ≤ the cap."""
    if n_pad <= MAX_WHOLE_STRIP_N:
        return n_pad
    for s in (4096, 3072, 2048):
        if n_pad % s == 0:
            return s
    return STRIP


def strip_path_fits(n_pad: int, head_dim: int, dtype) -> bool:
    """VMEM feasibility of the strip path against the RAISED scoped limit
    (CompilerParams.vmem_limit_bytes, see scoped_vmem_limit): K/V panes +
    q/o strips all double-buffered, per-chain f32 accumulators, plus a
    flat allowance for score temporaries and Mosaic's own slack."""
    isz = jnp.dtype(dtype).itemsize
    strip = pick_strip(n_pad)
    bufs = 2 * isz * head_dim * (2 * n_pad + 2 * strip)  # K/V + q/o, db
    accs = strip * head_dim * 4
    return bufs + accs + 8 * 1024 * 1024 <= geo.scoped_vmem_limit()


def _mid_strip_kernel(
    q_ref,  # [1, 1, strip, d] — raw; scores scaled by scale2 post-dot
    k_ref,  # [1, 1, n, d] (whole pane, constant along the strip axis)
    v_ref,
    ms_ref,  # [1, 1, 1, LANES] f32 per-cell static softmax shift, or None
    o_ref,
    m_out_ref,  # [1, 1, strip/128, 128] f32 packed or None
    linv_out_ref,
    *,
    n: int,
    kv_len: int,
    window: int,
    softcap: float,
    sub: int,
    strip: int,
    wide: int,
    scale2: float,
    pipeline: int,
    wide_static: int,
):
    t = pl.program_id(2)
    t_strip = strip // sub
    row = jax.lax.broadcasted_iota(jnp.int32, (sub, sub), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (sub, sub), 1)
    diag_mask = row >= col
    c2 = softcap * LOG2E if softcap else 0.0
    # Fold sm_scale·log2e into q once per strip (one [strip, d] pass)
    # instead of scaling every [rows, width] score block (n²/2 multiplies
    # per pane) — NO-residual (inference) path only: the backward
    # recomputes s₂ with the scale applied to the fp32 scores POST-dot
    # (the op order the residuals must bit-cancel against — see
    # fwd_kernel epilogue / README numerics), and a bf16-prescaled q
    # breaks that cancellation (hardware probe: GQA N=2048 bf16 dv err
    # 3.12e-2 → 6.25e-2).  Same gate for bf16 exp2: its ~2^-9 p-rowsum
    # noise lands in the published 1/l the backward divides by.  The
    # headline bench runs without residuals and keeps both wins.
    inference = m_out_ref is None
    prescale = pipeline in (2, 5) and inference
    eff_scale = 1.0 if prescale else scale2
    exp_bf16 = _use_exp_bf16(q_ref.dtype) and inference
    # Static-bound softmax shift — see the _STATIC_MAX knob comment.  The
    # wrapper gates it (inference + pipeline=2) and precomputes the bound;
    # the chain carry's m slot holds the STATIC shift and merges never
    # touch it (no max tree, no alpha rescale).
    static_max = ms_ref is not None

    def _lane_sum(p):
        """Row-sum of p, either fully reduced [rows, 1] or (deferred mode)
        as [rows, LANES] per-lane partials — lane-wise adds in the hot
        merges, one cross-lane tree per chain in the epilogue."""
        if not _LSUM_VEC:
            return jnp.sum(p, axis=-1, keepdims=True)
        w = p.shape[-1]
        L = geo.NUM_LANES
        out = p[:, 0:L]
        for off in range(L, w, L):
            out = out + p[:, off:off + L]
        return out

    def kv_slice(ref, col0, width):
        """[width, d] K/V block at kv offset ``col0`` — a true STATIC slice
        when the offset is a Python int (whole-pane strips): pl.ds emits a
        dynamic-base VMEM slice even for constant starts."""
        if isinstance(col0, int):
            return ref[0, 0, col0:col0 + width, :]
        return ref[0, 0, pl.ds(col0, width), :]

    def score_block(qi, col0, width):
        """Raw QK^T scores for a [sub, width] block at kv offset ``col0``
        (MXU only — no VPU post-processing, so the dot can be issued ahead
        of the previous block's softmax work)."""
        return mxu_dot(qi, kv_slice(k_ref, col0, width),
                       (((1,), (1,)), ((), ())))

    def merge_scores(s_raw, row0, col0, width, carry):
        """Online-softmax merge of a fully-visible raw score block into
        (m, l, acc)."""
        m, l, acc = carry
        if _ABLATE == "dots":  # structural ceiling: PV dot on raw scores
            vb = v_payload(kv_slice(v_ref, col0, width), q_ref.dtype)
            acc = acc + mxu_dot(
                s_raw.astype(vb.dtype), vb, (((1,), (0,)), ((), ())),
            )
            return m, l, acc
        s = s_raw * eff_scale if eff_scale != 1.0 else s_raw
        if softcap:
            s = c2 * jnp.tanh(s * (1.0 / c2))
        if window:
            # sliding window's trailing edge (dynamic column offsets);
            # height from the block itself (sub rows normally, a whole
            # band in pipeline=5)
            hgt = s_raw.shape[0]
            wm = (
                jax.lax.broadcasted_iota(jnp.int32, (hgt, 1), 0) + row0
            ) - (
                jax.lax.broadcasted_iota(jnp.int32, (hgt, width), 1) + col0
            ) < window
            s = jnp.where(wm, s, DEFAULT_MASK_VALUE)
        if static_max:
            # m is the chain's static shift (s − m ≤ 10 by construction):
            # pure accumulate — no max tree, no alpha, no rescales.
            p = (jnp.exp2((s - m).astype(jnp.bfloat16))
                 if exp_bf16 else jnp.exp2(s - m))
            l = l + _lane_sum(p.astype(jnp.float32))
            vb = v_payload(kv_slice(v_ref, col0, width), q_ref.dtype)
            acc = acc + mxu_dot(
                p.astype(vb.dtype), vb, (((1,), (0,)), ((), ())),
            )
            return m, l, acc
        if _ABLATE == "nomax":  # timing probe: skip the running-max chain
            p = jnp.exp2(s - 1.0) if not _use_exp_bf16(
                q_ref.dtype) else jnp.exp2((s - 1.0).astype(jnp.bfloat16))
            if _ABLATE != "nosum":
                l = l + _lane_sum(p.astype(jnp.float32))
            vb = v_payload(kv_slice(v_ref, col0, width), q_ref.dtype)
            acc = acc + mxu_dot(
                p.astype(vb.dtype), vb, (((1,), (0,)), ((), ())),
            )
            return m, l, acc
        m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
        alpha = jnp.exp2(m - m_new)
        if exp_bf16:
            # bf16 exp2: p feeds the PV dot as bf16 ANYWAY, so only l's
            # rowsum sees the rounding (~2^-9/√width relative — inside the
            # bf16 path's envelope).  Halves the VPU transcendental cost.
            # (Running the row-max tree itself in bf16 measured NEGATIVE:
            # 145.7 vs 151.3 — the extra whole-block cast pass outweighs
            # the halved tree.)
            p = jnp.exp2((s - m_new).astype(jnp.bfloat16))
        else:
            p = jnp.exp2(s - m_new)
        if _ABLATE != "nosum":
            l = l * alpha + _lane_sum(p.astype(jnp.float32))
        vb = v_payload(kv_slice(v_ref, col0, width), q_ref.dtype)
        acc = acc * alpha + mxu_dot(
            p.astype(vb.dtype), vb, (((1,), (0,)), ((), ())),
        )
        return m_new, l, acc

    def visible_block(qi, row0, col0, width, carry):
        """Online-softmax merge of one fully-visible [sub, width] score
        block at dynamic kv offset ``col0`` into (m, l, acc)."""
        return merge_scores(score_block(qi, col0, width), row0, col0, width,
                            carry)

    # Static phase per strip: the diagonal sub-block plus the strip-local
    # pre-diagonal columns [t·strip, row0) — width iq·sub, a compile-time
    # constant.  The dynamic interior [0, t·strip) is IDENTICAL for every
    # strip, so all strips share ONE fori_loop below: each K/V wide-block
    # is loaded once and merged into every strip's online softmax (t_strip
    # dots per load), and Mosaic sees a single dynamic loop — two dynamic
    # fori_loops in one body crash its compiler (measured on v5e; one
    # compiles fine).
    # First column of this strip's rows.  Whole-pane strips (strip == n)
    # pin it to the STATIC 0: program_id makes it a traced value otherwise,
    # and every k/v slice downstream becomes a dynamic-base VMEM slice —
    # Mosaic loses the static addressing on the hot operand loads.
    strip0 = 0 if strip == n else t * strip

    def diag_merge(qi, row0, m_static=None):
        """Diagonal sub-block: static triangular mask, dynamic K/V slice."""
        kj = kv_slice(k_ref, row0, sub)
        s = mxu_dot(qi, kj, (((1,), (1,)), ((), ())))
        if eff_scale != 1.0:
            s = s * eff_scale
        if softcap:
            s = c2 * jnp.tanh(s * (1.0 / c2))
        mask = diag_mask
        if window and window < sub:
            # The window's trailing edge crosses the diagonal sub-block
            # whenever window < sub (in-block row - col IS the absolute
            # query-key distance here) — same condition as the pane
            # kernel's jk*SUB < (iq+1)*SUB - window specialized to jk==iq.
            mask = jnp.logical_and(mask, row - col < window)
        if kv_len < n:
            # padded tail: mask columns past the real length so fully
            # padded rows come out l=0 (-> linv=0 residual, clean backward)
            mask = jnp.logical_and(mask, (col + row0) < kv_len)
        s = jnp.where(mask, s, DEFAULT_MASK_VALUE)
        if m_static is not None:  # static-bound chain seed
            p = (jnp.exp2((s - m_static).astype(jnp.bfloat16))
                 if exp_bf16 else jnp.exp2(s - m_static))
            l = _lane_sum(p.astype(jnp.float32))
            vb = v_payload(kv_slice(v_ref, row0, sub), q_ref.dtype)
            acc = mxu_dot(p.astype(vb.dtype), vb, (((1,), (0,)), ((), ())))
            return m_static, l, acc
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp2(s - m)
        l = _lane_sum(p)
        vb = v_payload(kv_slice(v_ref, row0, sub), q_ref.dtype)
        acc = mxu_dot(
            p.astype(vb.dtype), vb, (((1,), (0,)), ((), ())),
        )
        return m, l, acc

    if prescale:
        q_all = (q_ref[0, 0].astype(jnp.float32) * scale2).astype(
            q_ref.dtype
        )
        qis = [q_all[iq * sub:(iq + 1) * sub, :] for iq in range(t_strip)]
    else:
        qis = [
            q_ref[0, 0, iq * sub:(iq + 1) * sub, :] for iq in range(t_strip)
        ]

    if static_max:
        # Per-CELL static shift, computed by the WRAPPER as one fused XLA
        # pass over q/k in HBM (~40 µs total at the headline shape) —
        # computing the norms in-kernel measured 1.7 µs/cell of VPU
        # (147 TF/s vs nomax's 156: the whole win eaten).  It arrives as
        # a PREFETCHED SMEM scalar, not a VMEM stream: a 4th BlockSpec
        # input measured ~1 µs/cell of pipeline overhead (148.7 TF/s).
        # A single scalar per (batch, head) costs only the q-row-norm
        # spread within the pane in bound looseness (fractions of a bit
        # for typical activations) against a ~115-bit safety margin.
        mv = ms_ref[pl.program_id(0) * pl.num_programs(1)
                    + pl.program_id(1)]
        m_rows = [mv] * t_strip
    else:
        m_rows = [None] * t_strip

    def tall_merge(r0, col0, width, chains, first):
        """Merge one fully-visible [tall, width] column block into every
        chain iq ≥ ``first`` with ONE score dot and ONE PV dot over the
        tall = strip − r0 row extent (r0 static).  The per-row online-
        softmax state stays per-chain; the tall results are consumed as
        static [sub, ·] slices.  Rationale (measured, see DESIGN.md): the
        per-chain [sub, width] merges keep every MXU dot at 256-row
        granularity — 80 ns of pipe per dot at d=128 contraction — and the
        pipeline=2 interleave tops out at 157 TF/s dots-only while XLA's
        own batched dot at the same score shape reaches ~190 on this chip
        (bench_out/roofline_matmul.json).  Fusing the column's visible
        chains into one tall dot multiplies the M extent (up to strip−sub
        rows), amortizing the per-dot ramp; the VPU element count is
        unchanged (same scores, same exp2s), only issued as tall vectors."""
        tall = strip - r0
        q_tall = q_ref[0, 0, r0:strip, :]
        s = mxu_dot(
            q_tall, kv_slice(k_ref, col0, width),
            (((1,), (1,)), ((), ())),
        ) * scale2
        if softcap:
            s = c2 * jnp.tanh(s * (1.0 / c2))
        if window:
            wm = (
                jax.lax.broadcasted_iota(jnp.int32, (tall, width), 0)
                + (strip0 + r0)
            ) - (
                jax.lax.broadcasted_iota(jnp.int32, (tall, width), 1) + col0
            ) < window
            s = jnp.where(wm, s, DEFAULT_MASK_VALUE)
        if _ABLATE == "dots":  # structural ceiling: PV dot on raw scores
            vb = v_payload(kv_slice(v_ref, col0, width), q_ref.dtype)
            pv = mxu_dot(s.astype(vb.dtype), vb, (((1,), (0,)), ((), ())))
            out = list(chains)
            for i in range(t_strip - first):
                m, l, acc = chains[first + i]
                out[first + i] = (m, l, acc + pv[i * sub:(i + 1) * sub])
            return out
        mx = jnp.max(s, axis=-1, keepdims=True)  # [tall, 1]
        m_new = [
            jnp.maximum(chains[first + i][0], mx[i * sub:(i + 1) * sub])
            for i in range(t_strip - first)
        ]
        m_new_tall = (
            jnp.concatenate(m_new, axis=0) if len(m_new) > 1 else m_new[0]
        )
        p = jnp.exp2(s - m_new_tall)
        if _ABLATE != "nosum":
            lsum = _lane_sum(p)
        vb = v_payload(kv_slice(v_ref, col0, width), q_ref.dtype)
        pv = mxu_dot(p.astype(vb.dtype), vb, (((1,), (0,)), ((), ())))
        out = list(chains)
        for i in range(t_strip - first):
            iq = first + i
            m, l, acc = chains[iq]
            a = jnp.exp2(m - m_new[i])
            sl = slice(i * sub, (i + 1) * sub)
            if _ABLATE != "nosum":
                l = l * a + lsum[sl]
            out[iq] = (m_new[i], l, acc * a + pv[sl])
        return out

    if pipeline == 3:
        # Two-pass whole-row variant (strip == n only, so every row's full
        # visible extent is static): per chain ONE wide QK^T dot against
        # the whole visible K prefix, a single full-row softmax (no online
        # merges, no alpha rescales), then ONE deep PV dot.  The deep
        # contractions keep the MXU pipeline full where the online path
        # pays it per sub-block, and the VPU drops the per-merge
        # alpha/rescale chain entirely.  The [sub, W] f32 score row is the
        # VMEM price (raised vmem_limit_bytes pays it).
        assert strip == n, "pipeline=3 requires whole-pane strips"
        assert not window, "pipeline=3 serves the no-window path"
        carries = []
        for iq in range(t_strip):
            w_vis = (iq + 1) * sub  # static visible width of this chain
            row0 = iq * sub
            k_blk = k_ref[0, 0, 0:w_vis, :]
            s = mxu_dot(qis[iq], k_blk, (((1,), (1,)), ((), ()))) * scale2
            if softcap:
                s = c2 * jnp.tanh(s * (1.0 / c2))
            # Only the trailing sub columns cross the diagonal — mask just
            # that slice with the shared static [sub, sub] masks (a full
            # [sub, w_vis] iota pair would cost MBs of VMEM per chain).
            mask = diag_mask
            if kv_len < n:
                mask = jnp.logical_and(mask, (col + row0) < kv_len)
            s_diag = jnp.where(mask, s[:, row0:w_vis], DEFAULT_MASK_VALUE)
            if row0:
                s = jnp.concatenate([s[:, :row0], s_diag], axis=1)
            else:
                s = s_diag
            m = jnp.max(s, axis=-1, keepdims=True)
            p = jnp.exp2(s - m)
            l = jnp.sum(p, axis=-1, keepdims=True)
            vb = v_payload(v_ref[0, 0, 0:w_vis, :], q_ref.dtype)
            acc = mxu_dot(p.astype(vb.dtype), vb, (((1,), (0,)), ((), ())))
            carries.append((m, l, acc))
    elif pipeline == 4:
        # Tall-merge column-major: diagonals seed each chain, then every
        # strip-local pre-diagonal column block is merged into ALL its
        # visible chains at once via tall_merge (one deep score dot + one
        # deep PV dot per column).  Column blocks are ws·sub wide: chains
        # whose diagonal falls inside the group take their partial width
        # individually (as pipeline=2 does); the fully-visible tail below
        # the group is one tall merge.
        carries = [diag_merge(qis[iq], strip0 + iq * sub)
                   for iq in range(t_strip)]
        ws = wide_static
        for jb0 in range(0, t_strip - 1, ws):
            jb1 = min(jb0 + ws, t_strip - 1)
            col0 = strip0 + jb0 * sub
            # chains whose diagonal cuts the group: partial-width merges
            for iq in range(jb0 + 1, jb1):
                carries[iq] = visible_block(
                    qis[iq], strip0 + iq * sub, col0, (iq - jb0) * sub,
                    carries[iq],
                )
            # chains at/below the group's bottom edge: one tall merge
            carries = tall_merge(
                jb1 * sub, col0, (jb1 - jb0) * sub, carries, jb1
            )
    elif pipeline == 5:
        # Hybrid-granularity bands: the diagonal neighbourhood runs at sub
        # granularity (causal efficiency 1 − sub/2N), the interior at BAND
        # (= wide) granularity with band-level (m, l, acc) state — one
        # [band, wide] score dot + one [band, wide] PV dot per merge, no
        # sub-chain slicing.  Rationale (measured, probe_mxu.py): a
        # non-causal tall-state online softmax at wide=1024 runs 172 TF/s
        # where the sub-granular interleave tops out ≈148 — deep dots and
        # whole-band VPU vectors is what Mosaic schedules best; manual
        # dot staggering measured NEGATIVE (123-141), so emission is the
        # natural order and the scheduler overlaps on its own.
        nb = strip // wide  # row bands per strip
        spb = wide // sub  # sub-chains per band (diagonal phase)
        band_states = []
        for r in range(nb):
            subchains = []
            for c in range(spb):
                iq = r * spb + c
                carry = diag_merge(qis[iq], strip0 + iq * sub)
                if c:  # band-local pre-diagonal columns, one static merge
                    carry = visible_block(
                        qis[iq], strip0 + iq * sub,
                        strip0 + r * wide, c * sub, carry,
                    )
                subchains.append(carry)
            if spb == 1:
                band_states.append(subchains[0])
            else:
                band_states.append(tuple(
                    jnp.concatenate([s[i] for s in subchains], axis=0)
                    for i in range(3)
                ))
        qbs = [
            (q_all if prescale else q_ref[0, 0])[r * wide:(r + 1) * wide, :]
            for r in range(nb)
        ]
        # Strip-local interior: column-sync band merges (bands independent
        # → cross-band ILP, like pipeline=2 but at band granularity).
        for g in range(nb - 1):
            for r in range(g + 1, nb):
                band_states[r] = visible_block(
                    qbs[r], strip0 + r * wide, strip0 + g * wide, wide,
                    band_states[r],
                )
        carries = band_states
    elif pipeline == 2:
        # Interleaved static phase: all diagonals first, then the strip-
        # local fully-visible columns COLUMN-BLOCK-OUTER so consecutive
        # merges belong to different chains.  Within a chain, merges form a
        # serial (m, l, acc) dependency; across chains they are independent
        # — column-outer order gives Mosaic's static scheduler t_strip-way
        # ILP, overlapping one chain's MXU score dots with another's VPU
        # max/exp/sum chain (measured v5e N=4096 strip=n: 139.9 -> see
        # docs/DESIGN.md ablation).
        carries = [diag_merge(qis[iq], strip0 + iq * sub, m_rows[iq])
                   for iq in range(t_strip)]
        # Column-synchronized: every chain merges the SAME column block
        # before any chain advances — one K block in hot VMEM serves
        # t_strip−jb−1 independent merges back to back.  (A round-robin
        # order where each chain walks its own columns measured 10 TF/s
        # slower at sub=256: worse K-block locality.)  Far-past-diagonal
        # chains take the column group in ONE wide_static·sub-wide merge:
        # the MXU work is identical but each merge pays the VPU
        # max/alpha/rescale chain once instead of wide_static times.
        ws = wide_static
        for jb0 in range(0, t_strip - 1, ws):
            jb1 = min(jb0 + ws, t_strip - 1)
            col0 = strip0 + jb0 * sub
            for iq in range(jb0 + 1, t_strip):
                w = (min(iq, jb1) - jb0) * sub
                carries[iq] = visible_block(
                    qis[iq], strip0 + iq * sub, col0, w, carries[iq]
                )
    else:
        carries = []
        for iq in range(t_strip):
            qi = qis[iq]
            row0 = strip0 + iq * sub
            carry = diag_merge(qi, row0)
            # strip-local fully-visible columns [t·strip, row0), in static
            # chunks of at most ``wide`` so score temporaries stay bounded
            # (one iq·sub-wide merge at strip=n would need a strip-sized
            # f32 score block in VMEM)
            off = 0
            while off < iq * sub:
                w = min(wide, iq * sub - off)
                carry = visible_block(qi, row0, strip0 + off, w, carry)
                off += w
            carries.append(carry)

    # Shared dynamic interior [0, t·strip) in wide-width blocks.  Whole-pane
    # strips have NO interior (everything was static above) — skip the loop
    # at trace time so its dynamic-slice body isn't even compiled.
    jw_lo = jnp.int32(0)
    if window:
        # lowest strip's window edge; higher strips' stale blocks are
        # fully window-masked inside merge_scores (no-op merges)
        jw_lo = jnp.maximum(jw_lo, (strip0 - window + 1) // wide)
    jw_hi = t * (strip // wide)

    if strip == n:
        pass
    elif pipeline == 4:
        # Tall interior: every strip row sees every interior block, so each
        # wide block is ONE strip-tall score dot + ONE PV dot.
        def wide_body(jw, chains):
            col0 = jw * wide
            return tuple(tall_merge(0, col0, wide, list(chains), 0))

        carries = jax.lax.fori_loop(jw_lo, jw_hi, wide_body, tuple(carries))
    elif pipeline == 5:
        # Band-granular interior: one [band, wide] merge per band per block.
        def wide_body(jw, bands):
            col0 = jw * wide
            return tuple(
                visible_block(qbs[r], strip0 + r * wide, col0, wide, c)
                for r, c in enumerate(bands)
            )

        carries = list(jax.lax.fori_loop(
            jw_lo, jw_hi, wide_body, tuple(carries)
        ))
    elif pipeline != 1:
        # Plain loop: dot + merge per block; within one iteration the
        # t_strip chain merges are mutually independent (cross-chain ILP).
        def wide_body(jw, chains):
            col0 = jw * wide
            return tuple(
                visible_block(qis[iq], strip0 + iq * sub, col0, wide, c)
                for iq, c in enumerate(chains)
            )

        carries = jax.lax.fori_loop(jw_lo, jw_hi, wide_body, tuple(carries))
    else:
        # Software-pipelined one stage deep: the loop carries the NEXT
        # block's raw QK scores so each iteration issues its MXU dots
        # before the previous block's VPU softmax work.  The last block is
        # peeled so no prefetch is wasted.
        def interior_dots(jw):
            col0 = jw * wide
            return tuple(score_block(qi, col0, wide) for qi in qis)

        def wide_body(jw, state):
            ss, chains = state
            ss_next = interior_dots(jw + 1)  # MXU dots first (independent)
            col0 = jw * wide
            chains = tuple(
                merge_scores(ss[iq], strip0 + iq * sub, col0, wide, c)
                for iq, c in enumerate(chains)
            )
            return ss_next, chains

        def run_interior(carries):
            ss0 = interior_dots(jw_lo)
            ss, chains = jax.lax.fori_loop(
                jw_lo, jw_hi - 1, wide_body, (ss0, tuple(carries))
            )
            # peeled last block: merge in-flight scores, no next prefetch
            col0 = (jw_hi - 1) * wide
            return tuple(
                merge_scores(ss[iq], strip0 + iq * sub, col0, wide, c)
                for iq, c in enumerate(chains)
            )

        carries = jax.lax.cond(
            jw_hi > jw_lo, run_interior, lambda c: tuple(c), tuple(carries)
        )

    for seg, (m, l, acc) in enumerate(carries):
        hgt = acc.shape[0]  # sub normally, wide (band) under pipeline=5
        if _LSUM_VEC and pipeline != 3:
            l = jnp.sum(l, axis=-1, keepdims=True)
        r_lo = seg * hgt
        row0 = strip0 + r_lo

        if kv_len < n:
            # Padded q rows DID attend to real columns through the interior
            # loop (only the diagonal sub is kv_len-masked); force them to
            # the l=0 contract here — their dO is zero-padded so grads are
            # unaffected either way, but the (m, 1/l) residuals must read
            # "empty row" for the backward's recompute.
            rvalid = (
                jax.lax.broadcasted_iota(jnp.int32, (hgt, 1), 0) + row0
            ) < kv_len
            l = jnp.where(rvalid, l, 0.0)
            m = jnp.where(rvalid, m, -DEFAULT_MASK_VALUE)
        l_inv = jnp.where(l == 0.0, 0.0, 1.0 / l)
        o_ref[0, 0, r_lo:r_lo + hgt, :] = (acc * l_inv).astype(
            o_ref.dtype
        )
        if m_out_ref is not None:
            m_out = jnp.where(l == 0.0, -DEFAULT_MASK_VALUE, m)
            rs = hgt // geo.NUM_LANES
            m_out_ref[0, 0, seg * rs:(seg + 1) * rs, :] = (
                layout.column_to_lanes(m_out)
            )
            linv_out_ref[0, 0, seg * rs:(seg + 1) * rs, :] = (
                layout.column_to_lanes(l_inv[:, :1])
            )


@functools.partial(
    jax.jit,
    static_argnames=(
        "sm_scale", "kv_len", "window", "softcap", "save_residuals",
        "interpret", "sub", "strip", "wide", "pipeline", "wide_static",
    ),
)
def fwd_mid_strip_pallas(
    q,
    k,
    v,
    *,
    sm_scale: float,
    kv_len: int,
    window: int = 0,
    softcap: float = 0.0,
    save_residuals: bool = False,
    interpret: bool = False,
    sub: int | None = None,
    strip: int | None = None,
    wide: int | None = None,
    pipeline: int = 2,
    wide_static: int = 1,
):
    """Causal attention for padded [B, H, n, d], MAX_MID_N < n ≤ MAX_STRIP_N.

    Same contract as fwd_mid_pallas; n must be a multiple of ``strip``.  GQA
    is served by the kv-head index map (each q head reads its group's pane).
    """
    batch, num_q_heads, n, head_dim = q.shape
    num_kv_heads = k.shape[1]
    q_per_kv = num_q_heads // num_kv_heads
    if strip is None:
        strip = pick_strip(n)
    assert n % strip == 0, (n, strip)
    if sub is None:
        # 256 interleaves best under pipeline=2 (measured v5e strip=n=4096:
        # sub=256 146.7-147.5 TF/s vs sub=512 139, sub=128 59.8)
        sub = SUB if n % SUB == 0 else 512
    if wide is None:
        wide = min(pick_wide(n, head_dim, q.dtype), strip)
    assert strip % sub == 0 and n % sub == 0, (n, sub)
    assert wide % sub == 0 and strip % wide == 0, (strip, wide, sub)

    kernel = functools.partial(
        _mid_strip_kernel,
        n=n, kv_len=kv_len, window=window, softcap=float(softcap), sub=sub,
        strip=strip, wide=wide, scale2=float(sm_scale) * LOG2E,
        pipeline=pipeline, wide_static=wide_static,
    )
    # Static-bound softmax shift (see _STATIC_MAX): inference-only, and
    # only the pipeline=2 emission implements the static chain.  One fused
    # XLA pass over q/k at HBM bandwidth; per (batch, q-head) scalar
    # m = sm_scale·log2e·max_r‖q_r‖·max_j‖k_j‖ − 10 (zero-padded rows
    # contribute zero norms — harmless for a max bound).
    static_max = (
        not save_residuals and pipeline == 2 and not _ABLATE
        and _STATIC_MAX != "0"
    )
    if static_max:
        qf = q.astype(jnp.float32)
        kf = k.astype(jnp.float32)
        qn = jnp.sqrt(jnp.max(jnp.sum(qf * qf, -1), axis=-1))  # [B, Hq]
        kn = jnp.sqrt(jnp.max(jnp.sum(kf * kf, -1), axis=-1))  # [B, Hkv]
        ms = ((float(sm_scale) * LOG2E) * qn * jnp.repeat(
            kn, q_per_kv, axis=1
        ) - 10.0).reshape(-1)  # [B·Hq] f32, prefetched to SMEM
    inner = kernel
    if static_max:

        def kernel(ms_r, q_r, k_r, v_r, o_r):  # noqa: F811
            return inner(q_r, k_r, v_r, ms_r, o_r, None, None)

    elif not save_residuals:

        def kernel(q_r, k_r, v_r, o_r):  # noqa: F811
            return inner(q_r, k_r, v_r, None, o_r, None, None)

    else:

        def kernel(q_r, k_r, v_r, o_r, m_r, l_r):  # noqa: F811
            return inner(q_r, k_r, v_r, None, o_r, m_r, l_r)

    grid = (batch, num_q_heads, n // strip)
    q_spec = pl.BlockSpec(
        (1, 1, strip, head_dim), lambda b, h, t, *refs: (b, h, t, 0)
    )
    kv_spec = pl.BlockSpec(
        (1, 1, n, head_dim), lambda b, h, t, *refs: (b, h // q_per_kv, 0, 0)
    )
    out_specs = [q_spec]
    out_shape = [jax.ShapeDtypeStruct(q.shape, q.dtype)]
    if save_residuals:
        for _ in range(2):  # m then linv, same packed layout
            out_specs.append(
                pl.BlockSpec(
                    (1, 1, strip // geo.NUM_LANES, geo.NUM_LANES),
                    lambda b, h, t: (b, h, t, 0),
                )
            )
            out_shape.append(
                jax.ShapeDtypeStruct(
                    (batch, num_q_heads, n // geo.NUM_LANES, geo.NUM_LANES),
                    jnp.float32,
                )
            )
    compiler_params = pltpu.CompilerParams(
        dimension_semantics=("parallel", "parallel", "arbitrary"),
        # The 16 MiB scoped-VMEM ceiling is only Mosaic's DEFAULT limit
        # — v5e has 128 MiB physical VMEM and raising the limit is how
        # the K/V panes + the pipeline's score-prefetch carry fit
        # (measured: the limit is honored up to >=100 MiB on v5e).
        vmem_limit_bytes=geo.scoped_vmem_limit(),
    )
    if static_max:
        outs = pl.pallas_call(
            kernel,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=grid,
                in_specs=[q_spec, kv_spec, kv_spec],
                out_specs=out_specs,
            ),
            out_shape=out_shape,
            compiler_params=compiler_params,
            interpret=interpret,
        )(ms, q, k, v)
    else:
        outs = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[q_spec, kv_spec, kv_spec],
            out_specs=out_specs,
            out_shape=out_shape,
            compiler_params=compiler_params,
            interpret=interpret,
        )(q, k, v)
    if save_residuals:
        return outs[0], (outs[1], outs[2])
    return outs[0], None
