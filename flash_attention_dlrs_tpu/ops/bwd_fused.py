"""Fused single-sweep backward kernel: dQ, dK, dV in ONE pass.

The split backward (bwd_kernel.py) runs two sweeps over the (jkv, iq) block
space — dK/dV then dQ — recomputing P and dP in each, i.e. 7 MXU matmuls per
block pair.  This kernel recomputes them ONCE and emits all three gradients:
5 matmuls per pair (P, dV+=PᵀdO, dP=dOVᵀ, dK+=dSᵀQ, dQ+=dS·K), a structural
1.4× FLOP cut plus one fewer read of every operand.

This is the shape of the reference's tutorial backward — one kernel, no
atomics (reference: src/flash_attention_openai_tutorial.py:309-435) — but the
dQ cross-program reduction that Triton cannot express without locks
(src/flash_attention_kernels.py:305-320) maps to a TPU-native mechanism: the
dQ output block's index map is CONSTANT over the whole (batch, head) pane, so
Pallas keeps one [Nq, d] fp32 buffer VMEM-resident across every grid step of
the pane and flushes it to HBM exactly once.  Accumulation order is the
sequential grid order — deterministic by construction.

The VMEM cost of that resident buffer (Nq·d·4 bytes) bounds the sequence
length this kernel serves; the dispatcher falls back to the two-sweep kernels
beyond it (32K @ d=128 on a 128MiB-VMEM part is the practical ceiling).

Same numerics contract as bwd_kernel.py: base-2 softmax with sm_scale·log2e
folded into Q, fp32 accumulators, recompute-from-lse
(≙ src/flash_attention_kernels.py:283-293).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .. import geometry as geo
from . import layout
from .bwd_kernel import _mask_split, _recompute_p, _tri_decode_upper
from .fwd_kernel import (
    LN2, LOG2E, adapt_optional_refs, dropout_keep_mask, mxu_dot,
    seed_block_spec, seed_input, slope_block_spec, slope_input,
)


def _bwd_fused_kernel(
    q_ref,
    k_ref,
    v_ref,
    o_ref,  # forward output — D = rowsum(O ∘ dO) computed inline
    do_ref,
    m_ref,  # grouped-packed fwd row-max stats (base-2)
    linv_ref,  # grouped-packed fwd 1/l stats
    qseg_ref,  # [1, block_q, LANES] int32 or None
    kvseg_ref,  # [1, SUBLANES, block_kv] int32 or None
    slope_ref,  # [1, LANES] fp32 per-head ALiBi slope (m·log2e), or None
    seed_ref,  # [1, LANES] int32 dropout seed, or None
    dq_ref,  # [1, 1, n_q, d] fp32 — pane-resident accumulator
    dk_ref,  # [1, 1, block_kv, d] fp32
    dv_ref,
    dk_acc,
    dv_acc,
    *,
    sm_scale,
    causal,
    kv_len,
    block_q,
    block_kv,
    num_q_blocks,
    num_kv_blocks,
    tri=False,
    window=0,
    band_w=0,
    softcap=0.0,
    q_off=0,
    dropout_rate=0.0,
    drop_row_off=0,  # global q-row of local row 0 (segmented backward)
):
    _pid_b, _pid_h = pl.program_id(0), pl.program_id(1)
    if band_w:
        # Transposed band (see bwd_kernel): kv block jkv walks the q rows
        # iq = jkv … jkv+W−1 whose window reaches back into it.
        jkv = pl.program_id(2)
        j = pl.program_id(3)
        iq = jkv + j
        row_start = j == 0  # iq == jkv, always valid
        pane_start = jnp.logical_and(jkv == 0, j == 0)
        pane_end = jnp.logical_and(jkv == num_kv_blocks - 1, j == band_w - 1)
        should_run = jnp.logical_and(
            iq <= num_q_blocks - 1,
            (jkv + 1) * block_kv - 1 >= iq * block_q - window + 1,
        )
    elif tri:
        p_id = pl.program_id(2)
        jkv, iq = _tri_decode_upper(p_id, num_q_blocks)
        row_start = iq == jkv
        pane_start = p_id == 0
        pane_end = p_id == num_q_blocks * (num_q_blocks + 1) // 2 - 1
        should_run = True
    else:
        jkv = pl.program_id(2)
        iq = pl.program_id(3)
        row_start = iq == 0
        pane_start = jnp.logical_and(jkv == 0, iq == 0)
        pane_end = jnp.logical_and(
            jkv == num_kv_blocks - 1, iq == num_q_blocks - 1
        )
        if causal:
            should_run = (iq + 1) * block_q - 1 + q_off >= jkv * block_kv
            if window:
                should_run = jnp.logical_and(
                    should_run,
                    (jkv + 1) * block_kv - 1 >= iq * block_q + q_off
                    - window + 1,
                )
        else:
            should_run = True

    @pl.when(row_start)
    def _init_row():
        dk_acc[...] = jnp.zeros_like(dk_acc)
        dv_acc[...] = jnp.zeros_like(dv_acc)

    @pl.when(pane_start)
    def _init_pane():
        dq_ref[...] = jnp.zeros_like(dq_ref)

    def _compute(apply_mask):
        q = q_ref[0, 0]
        k = k_ref[0, 0]
        v = v_ref[0, 0]
        do = do_ref[0, 0]
        # Grouped packed stat layout (layout.py): the block's dense
        # block_q/128 rows of the stat_rows-tall tile -> [block_q, 1].
        _kk = block_q // geo.NUM_LANES
        m2 = layout.lanes_to_column(m_ref[0, 0, :_kk, :])
        linv = layout.lanes_to_column(linv_ref[0, 0, :_kk, :])
        # D inline (≙ src/flash_attention_kernels.py:120-166): one [bq, d]
        # VPU mul+rowsum per block pair, in exchange for dropping the
        # separate D kernel and the [Nq, 128] f32 dpre pane's HBM traffic.
        dpre = jnp.sum(
            o_ref[0, 0].astype(jnp.float32) * do.astype(jnp.float32),
            axis=-1, keepdims=True,
        )

        p, grad_cap = _recompute_p(
            q, k, m2, linv, iq, jkv,
            scale2=sm_scale * LOG2E,
            causal=causal, kv_len=kv_len,
            block_q=block_q, block_kv=block_kv, apply_mask=apply_mask,
            window=window, softcap=softcap,
            qseg=None if qseg_ref is None
            else layout.lanes_to_column(qseg_ref[0, :_kk, :]),
            kvseg=None if kvseg_ref is None else kvseg_ref[0],
            q_off=q_off,
            slope=None if slope_ref is None else slope_ref[0, 0, 0],
        )
        pd = p
        if dropout_rate:
            # Regenerate the forward's element-indexed mask (see
            # fwd_kernel.dropout_keep_mask — geometry-independent).
            rowg = jax.lax.broadcasted_iota(
                jnp.int32, (block_q, block_kv), 0
            ) + iq * block_q + drop_row_off
            colg = jax.lax.broadcasted_iota(
                jnp.int32, (block_q, block_kv), 1) + jkv * block_kv
            m_drop = dropout_keep_mask(
                seed_ref[0, 0], _pid_b, _pid_h,
                rowg, colg, dropout_rate,
            )
            pd = p * m_drop
        # dV += P_dropᵀ dO  (≙ src/flash_attention_kernels.py:287)
        dv_acc[...] += mxu_dot(pd.astype(do.dtype), do, (((0,), (0,)), ((), ())))
        # dP = dO Vᵀ   (≙ :289) — computed ONCE, reused for dK and dQ.
        dp = mxu_dot(do, v, (((1,), (1,)), ((), ())))
        if dropout_rate:
            dp = dp * m_drop
        # dS = P ∘ (M∘dP − D)  (≙ :291); scale conventions as in bwd_kernel.
        ds = p * (dp - dpre)
        if grad_cap is not None:  # soft-cap chain rule
            ds = ds * grad_cap
        # dK += dSᵀ (c·Q)  (≙ :293) — ln2 applied at the row flush.
        dk_acc[...] += mxu_dot(ds.astype(q.dtype), q, (((0,), (0,)), ((), ())))
        # dQ_iq += dS K — the reduction the reference serialized with a
        # spinlock (src/flash_attention_kernels.py:305-320); here it is a
        # read-modify-write of the pane-resident output buffer.
        dsk = mxu_dot(ds.astype(k.dtype), k, (((1,), (0,)), ((), ())))
        sl = pl.ds(iq * block_q, block_q)
        dq_ref[0, 0, sl, :] += dsk

    _mask_split(causal, kv_len, block_q, block_kv, iq, jkv, should_run,
                _compute, segmented=qseg_ref is not None, window=window,
                q_off=q_off)

    # Banded rows can end on a skipped step, so flush on every active step
    # (final content wins when the output block index advances).
    dkv_store = should_run if band_w else (iq == num_q_blocks - 1)

    @pl.when(dkv_store)
    def _store_dkv():
        dk_ref[0, 0] = (dk_acc[...] * sm_scale).astype(dk_ref.dtype)
        dv_ref[0, 0] = dv_acc[...].astype(dv_ref.dtype)

    # True scale applied once per pane: O(Nq·d), off the hot loop.
    @pl.when(pane_end)
    def _scale_dq():
        dq_ref[...] = dq_ref[...] * sm_scale


# Preference order measured on v5e (B=8 H=16 d=128 bf16 causal, N=4096,
# bwd-only): (512,1024) 113.3 TF/s > (1024,512) 111.7 > (512,512) 108.4 >
# (256,1024) 102.6; (1024,1024) exceeds scoped VMEM.  The timed autotuner
# (tune=True) refines this per shape.
_FUSED_BLOCK_PREFS = (
    (512, 1024), (1024, 512), (512, 512), (256, 512), (256, 256),
    (128, 256), (128, 128),
)


# Measured envelope for the pane-resident dQ buffer: 4MiB (N=8192 at d=128)
# compiles and runs at 126-135 TF/s; 8MiB (N=16384) passes the VMEM model
# at (512, 512) blocks but Mosaic's real stack allocation rejects it —
# beyond this the two-sweep kernels take over.
_MAX_DQ_PANE_BYTES = 4 * 1024 * 1024


def max_fused_n(head_dim: int) -> int:
    """Largest q length whose pane-resident dQ buffer fits the measured
    envelope (8192 at d=128) — the per-segment size for the segmented
    fused backward above it."""
    return (_MAX_DQ_PANE_BYTES // (head_dim * 4)) // geo.MIN_BLOCK * geo.MIN_BLOCK


def pick_fused_blocks(n_q: int, n_kv: int, head_dim: int, dtype):
    """Best measured VMEM-feasible (block_q, block_kv) for the fused
    backward, or None if no candidate fits (→ two-sweep fallback)."""
    if n_q * head_dim * 4 > _MAX_DQ_PANE_BYTES:
        return None
    for bq, bkv in _FUSED_BLOCK_PREFS:
        if bq > max(n_q, geo.MIN_BLOCK) or bkv > max(n_kv, geo.MIN_BLOCK):
            continue
        n_q_pad = -(-n_q // bq) * bq
        if fused_bwd_fits_vmem(n_q_pad, head_dim, bq, bkv, dtype):
            return bq, bkv
    return None


def fused_bwd_fits_vmem(n_q: int, head_dim: int, block_q: int,
                        block_kv: int, dtype) -> bool:
    """Feasibility gate: the pane-resident dQ buffer plus the usual working
    set must fit the scoped-VMEM budget."""
    isz = jnp.dtype(dtype).itemsize
    dq_buf = n_q * head_dim * 4
    blocks = 2 * (  # double-buffered streamed inputs
        3 * block_q * head_dim * isz  # q, o, do (o feeds the inline D)
        + 2 * block_kv * head_dim * isz  # k, v
        + 2 * block_q * geo.NUM_LANES * 4  # stat slack (calibrated; the
        # packed-lse move, layout.py, shrank the real stat term 128x but
        # this model's headroom was measured against Mosaic's actual stack
        # allocator — loosen only with a compile probe on hardware)
    )
    scratch = 2 * block_kv * head_dim * 4  # dk/dv accumulators
    outs = 2 * block_kv * head_dim * 4  # dk/dv output blocks
    score = 3 * block_q * block_kv * 4  # p, dp, ds temporaries
    need = dq_buf + blocks + scratch + outs + score
    if isz == 4:
        # fp32 matmuls multipass on the MXU and carry extra Mosaic stack
        # temporaries beyond this byte model — same measured surcharge as
        # the forward's mid_path_fits (f32 N=4096 compiled to a 19.89 MiB
        # scoped allocation against a 14-ish MiB model prediction and
        # OOM'd the 16 MiB limit; 1.3× routes that case to smaller blocks
        # or the two-sweep fallback).
        need = int(need * 1.3)
    return geo.fits_vmem(need, geo.current_geometry())


@functools.partial(
    jax.jit,
    static_argnames=(
        "sm_scale", "causal", "block_q", "block_kv", "kv_len", "window",
        "softcap", "interpret", "q_off", "alibi_slopes", "dropout_rate",
        "drop_row_off"
    ),
)
def bwd_fused_pallas(
    q, k, v, o, do, m2, linv, q_seg=None, kv_seg=None, dropout_seed=None, *,
    sm_scale, causal, block_q, block_kv, kv_len, window=0, softcap=0.0,
    interpret=False, q_off=0, alibi_slopes=None, dropout_rate=0.0,
    drop_row_off=0,
):
    """(dQ, dK, dV) in one sweep; dK/dV are per *query* head fp32 (the
    caller group-sums GQA heads, same contract as bwd_dkv_pallas).
    Takes the forward output ``o``; D = rowsum(O∘dO) is computed inline —
    no separate D-preprocess kernel on this route."""
    batch, num_q_heads, n_q, head_dim = q.shape
    _, num_kv_heads, n_kv, _ = k.shape
    q_per_kv = num_q_heads // num_kv_heads


    num_q_blocks = n_q // block_q
    num_kv_blocks = n_kv // block_kv
    banded = (causal and window > 0 and n_q == n_kv and block_q == block_kv
              and q_off == 0)
    band_w = 0
    if banded:
        band_w = min((block_kv + window - 2) // block_q + 1, num_q_blocks)
    tri = (causal and window == 0 and n_q == n_kv and block_q == block_kv
           and q_off == 0)
    kernel = functools.partial(
        _bwd_fused_kernel,
        sm_scale=sm_scale, causal=causal, kv_len=kv_len,
        block_q=block_q, block_kv=block_kv,
        num_q_blocks=num_q_blocks, num_kv_blocks=num_kv_blocks,
        tri=tri, window=window, band_w=band_w, softcap=float(softcap),
        q_off=q_off, dropout_rate=float(dropout_rate),
        drop_row_off=int(drop_row_off),
    )
    if banded:
        grid = (batch, num_q_heads, num_kv_blocks, band_w)

        def q_index(b, h, jkv, j):
            iq = jnp.minimum(jkv + j, num_q_blocks - 1)
            return (b, h, iq, 0)

        def kv_index(b, h, jkv, j):
            return (b, h // q_per_kv, jkv, 0)

        def dkv_index(b, h, jkv, j):
            return (b, h, jkv, 0)

        def dq_index(b, h, jkv, j):
            return (b, h, 0, 0)

        dimension_semantics = ("parallel", "parallel", "arbitrary", "arbitrary")
    elif tri:
        grid = (batch, num_q_heads, num_q_blocks * (num_q_blocks + 1) // 2)

        def q_index(b, h, p):
            return (b, h, _tri_decode_upper(p, num_q_blocks)[1], 0)

        def kv_index(b, h, p):
            return (b, h // q_per_kv, _tri_decode_upper(p, num_q_blocks)[0], 0)

        def dkv_index(b, h, p):
            return (b, h, _tri_decode_upper(p, num_q_blocks)[0], 0)

        def dq_index(b, h, p):
            return (b, h, 0, 0)

        dimension_semantics = ("parallel", "parallel", "arbitrary")
    else:
        if causal:
            # Skipped above-diagonal Q blocks: clamp so the pipeline doesn't
            # prefetch them (see bwd_kernel).
            def iq_c(jkv, iq):
                lo = jnp.clip(
                    (jkv * block_kv - q_off) // block_q, 0, num_q_blocks - 1
                )
                return jnp.maximum(iq, lo)
        else:
            def iq_c(jkv, iq):
                return iq

        grid = (batch, num_q_heads, num_kv_blocks, num_q_blocks)

        def q_index(b, h, jkv, iq):
            return (b, h, iq_c(jkv, iq), 0)

        def kv_index(b, h, jkv, iq):
            return (b, h // q_per_kv, jkv, 0)

        def dkv_index(b, h, jkv, iq):
            return (b, h, jkv, 0)

        def dq_index(b, h, jkv, iq):
            return (b, h, 0, 0)

        dimension_semantics = ("parallel", "parallel", "arbitrary", "arbitrary")

    q_spec = pl.BlockSpec((1, 1, block_q, head_dim), q_index)
    kv_spec = pl.BlockSpec((1, 1, block_kv, head_dim), kv_index)
    stat_spec = pl.BlockSpec(
        (1, 1, layout.stat_rows(block_q), geo.NUM_LANES), q_index
    )
    dkv_spec = pl.BlockSpec((1, 1, block_kv, head_dim), dkv_index)
    dq_spec = pl.BlockSpec((1, 1, n_q, head_dim), dq_index)
    in_specs = [q_spec, kv_spec, kv_spec, q_spec, q_spec, stat_spec,
                stat_spec]
    inputs = [q, k, v, o, do, m2, linv]
    if q_seg is not None:
        # Grouped packed q seg ids (layout.py; same grouping as the stats).
        qseg_packed = layout.pack_stat_grouped(
            q_seg.astype(jnp.int32)[:, None, :], block_q
        )[:, 0]
        kvseg_rep = jnp.broadcast_to(
            kv_seg.astype(jnp.int32)[:, None, :],
            (batch, geo.NUM_SUBLANES, n_kv),
        )
        in_specs.append(pl.BlockSpec(
            (1, layout.stat_rows(block_q), geo.NUM_LANES),
            lambda *idx: (idx[0], q_index(*idx)[2], 0),
        ))
        in_specs.append(pl.BlockSpec(
            (1, geo.NUM_SUBLANES, block_kv),
            lambda *idx: (idx[0], 0, kv_index(*idx)[2]),
        ))
        inputs += [qseg_packed, kvseg_rep]
    if alibi_slopes is not None:
        in_specs.append(slope_block_spec())
        inputs.append(slope_input(alibi_slopes, num_q_heads))
    if dropout_rate > 0.0:
        in_specs.append(seed_block_spec())
        inputs.append(seed_input(dropout_seed))
    kernel = adapt_optional_refs(
        kernel, n_lead=7, segmented=q_seg is not None,
        has_slope=alibi_slopes is not None,
        has_seed=dropout_rate > 0.0,
    )
    dq, dk, dv = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=[dq_spec, dkv_spec, dkv_spec],
        out_shape=[
            jax.ShapeDtypeStruct((batch, num_q_heads, n_q, head_dim), jnp.float32),
            jax.ShapeDtypeStruct((batch, num_q_heads, n_kv, head_dim), jnp.float32),
            jax.ShapeDtypeStruct((batch, num_q_heads, n_kv, head_dim), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((block_kv, head_dim), jnp.float32),
            pltpu.VMEM((block_kv, head_dim), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=dimension_semantics,
        ),
        interpret=interpret,
    )(*inputs)
    return dq, dk, dv
