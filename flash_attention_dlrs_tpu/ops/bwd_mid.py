"""Mid-length causal backward: in-kernel sub-blocking, one cell per head.

The backward analogue of fwd_mid.py.  At N ≈ 1K the fused backward's
(512, 1024) blocks give ~50% causal efficiency (every block pair straddles
the diagonal), capping it at ~68 TF/s on v5e — the same valley the forward
had.  This kernel processes one (batch, q-head) pane per grid cell with all
operands VMEM-resident and unrolls the T(T+1)/2 needed 256-edge sub-block
pairs, so masked work shrinks to the diagonal sub-blocks only
(efficiency 1 − 0.5·256/N) with no added grid steps.

Gradients accumulate directly into the fp32 output panes (dQ by row block,
dK/dV by kv block); the dK and dQ sm_scale factors are applied
in one vectorized pass at pane end.  Same recompute-from-lse numerics as
bwd_kernel.py (≙ reference src/flash_attention_kernels.py:283-293).

Serves causal self-attention for 512 < N ≤ MAX_MID_BWD_N; packed segments
and longer sequences stay on the fused/two-sweep kernels.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .. import geometry as geo
from . import layout
from .fwd_kernel import DEFAULT_MASK_VALUE, LN2, LOG2E, mxu_dot

# Padding unit and in-kernel sub edge (see fwd_mid.pick_sub: 128 blows up
# Mosaic compile, 256 is the floor).
SUB = 256

# Pane ceiling: 9 operand/gradient panes of N·d must stay VMEM-resident.
MAX_MID_BWD_N = 2048


def bwd_mid_fits(n_pad: int, head_dim: int, dtype, hb: int = 1,
                 margin: float = 1.0) -> bool:
    """VMEM feasibility with a 2× margin on temporaries (Mosaic's stack
    allocation runs well past the naive estimate — measured on fwd_mid)."""
    isz = jnp.dtype(dtype).itemsize
    in_panes = 2 * hb * (
        5 * n_pad * head_dim * isz + n_pad * geo.NUM_LANES * 4
        # ^ stat slack: the packed-lse move (layout.py) shrank the real lse
        # pane 128x, but this model's headroom is calibrated against
        # Mosaic's actual stack allocator — loosen only with a hardware
        # compile probe.
    )
    out_panes = 3 * hb * n_pad * head_dim * 4
    temps = 2 * (3 * SUB * SUB * 4)
    return geo.fits_vmem(
        int((in_panes + out_panes + temps) * margin), geo.current_geometry()
    )


def pick_hb_bwd(n_pad: int, head_dim: int, dtype, num_q_heads: int,
                q_per_kv: int) -> int:
    """Heads per grid cell for the backward pane kernel.

    Measured null result (v5e, B=8 H=16 d=128 bf16 causal, backward
    alone): hb=2 vs hb=1 is within noise at every pane length — 78.2/78.5
    @768, 89.1/88.4 @1024, 95.9/96.1 @1536, 102.9/103.2 @2048 TF/s.
    Unlike the forward (where hb=2 bought +10% @1024), the backward's 5
    matmuls per sub-pair already amortize the per-cell fixed cost, so the
    extra VMEM pressure buys nothing — stay at 1.  The kernel keeps the
    general hb structure (exercised in tests) should a future part shift
    the balance."""
    del n_pad, head_dim, dtype, num_q_heads, q_per_kv
    return 1


def _bwd_mid_kernel(
    q_ref,  # [1, hb, n, d] — raw; scores scaled post-dot
    k_ref,  # [1, hb_kv, n, d]
    v_ref,
    o_ref,  # [1, hb, n, d] — forward output (D computed inline)
    do_ref,
    m_ref,  # [1, hb, n/128, 128] f32 packed (layout.py): fwd row max, base-2
    linv_ref,  # same shape: fwd 1/l (0 on empty rows)
    dq_ref,  # [1, hb, n, d] f32
    dk_ref,
    dv_ref,
    *,
    n: int,
    kv_len: int,
    window: int,
    softcap: float,
    sm_scale: float,
    hb: int,
    q_per_kv: int,
):
    T = n // SUB
    row = jax.lax.broadcasted_iota(jnp.int32, (SUB, SUB), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (SUB, SUB), 1)
    diag_mask = row >= col

    dq_ref[...] = jnp.zeros_like(dq_ref)

    # KV-major sweep: dK/dV for one kv block are VALUE-carried across the
    # inner row loop (vreg-resident, one store per kv block) and only dQ
    # does a read-modify-write per pair — the same single-RMW structure as
    # bwd_fused.  A row-major variant with all three grads RMW'd measured
    # ~2× slower (37 vs 68 TF/s @N=1024): three 128KB pane round-trips per
    # sub-pair swamp the VPU.
    for jh, jk in [(jh_, jk_) for jh_ in range(hb) for jk_ in range(T)]:
        jkv_h = jh // q_per_kv if hb > q_per_kv else 0
        kj = k_ref[0, jkv_h, jk * SUB:(jk + 1) * SUB, :]
        vj = v_ref[0, jkv_h, jk * SUB:(jk + 1) * SUB, :]
        dk_acc = None
        dv_acc = None
        iq_hi = T
        for iq in range(jk, iq_hi):
            if window:
                # rows whose window cannot reach back into kv block jk
                if iq * SUB - window + 1 > (jk + 1) * SUB - 1:
                    break
            qi = q_ref[0, jh, iq * SUB:(iq + 1) * SUB, :]
            # do stays in its native dtype: upcasting would force fp32 MXU
            # matmuls (multipass — measured ~2× whole-kernel cost on v5e)
            do = do_ref[0, jh, iq * SUB:(iq + 1) * SUB, :]
            rs = SUB // geo.NUM_LANES
            # Raw (m, 1/l) stats: exp2's argument (s − m) is bit-identical
            # to the forward's, so the recompute error cancels in dS (see
            # bwd_kernel._recompute_p).
            m2 = layout.lanes_to_column(
                m_ref[0, jh, iq * rs:(iq + 1) * rs, :]
            )
            linv = layout.lanes_to_column(
                linv_ref[0, jh, iq * rs:(iq + 1) * rs, :]
            )
            # D = rowsum(O ∘ dO) inline (≙ the reference's separate
            # bwd_D_kernel, src/flash_attention_kernels.py:120-166): a
            # [SUB, d] VPU mul+rowsum per pair — 0.1% of the pair's MXU
            # FLOPs — in exchange for dropping an entire kernel launch
            # plus the [n, 128] f32 dpre pane's HBM write+read.
            oi = o_ref[0, jh, iq * SUB:(iq + 1) * SUB, :].astype(jnp.float32)
            dpre = jnp.sum(oi * do.astype(jnp.float32), axis=-1,
                           keepdims=True)
            s = mxu_dot(qi, kj, (((1,), (1,)), ((), ()))) * (
                sm_scale * LOG2E
            )
            grad_cap = None
            if softcap:
                c2 = softcap * LOG2E
                s = c2 * jnp.tanh(s * (1.0 / c2))
                grad_cap = 1.0 - (s * (1.0 / c2)) ** 2
            mask = None
            if jk == iq:
                mask = diag_mask
            if window:
                if jk * SUB < (iq + 1) * SUB - window:
                    wm = (row + iq * SUB) - (col + jk * SUB) < window
                    mask = wm if mask is None else jnp.logical_and(mask, wm)
            if (jk + 1) * SUB > kv_len:
                lm = (col + jk * SUB) < kv_len
                mask = lm if mask is None else jnp.logical_and(mask, lm)
            if mask is not None:
                s = jnp.where(mask, s, DEFAULT_MASK_VALUE)
            p = jnp.exp2(s - m2) * linv
            # dV_j += Pᵀ dO_i  (≙ src/flash_attention_kernels.py:287)
            dv_term = mxu_dot(p.astype(do.dtype), do, (((0,), (0,)), ((), ())))
            dv_acc = dv_term if dv_acc is None else dv_acc + dv_term
            # dP = dO Vᵀ; dS = P ∘ (dP − D)  (≙ :289-291)
            dp = mxu_dot(do, vj, (((1,), (1,)), ((), ())))
            ds = p * (dp - dpre)
            if grad_cap is not None:
                ds = ds * grad_cap
            # dK_j += dSᵀ Q_i  (≙ :293); sm_scale in the epilogue
            dk_term = mxu_dot(ds.astype(qi.dtype), qi, (((0,), (0,)), ((), ())))
            dk_acc = dk_term if dk_acc is None else dk_acc + dk_term
            # dQ_i += dS K_j — the one RMW per pair; sm_scale at pane end
            sl_q = pl.ds(iq * SUB, SUB)
            dq_ref[0, jh, sl_q, :] += mxu_dot(
                ds.astype(kj.dtype), kj, (((1,), (0,)), ((), ()))
            )
        sl_kv = pl.ds(jk * SUB, SUB)
        dk_ref[0, jh, sl_kv, :] = dk_acc * sm_scale
        dv_ref[0, jh, sl_kv, :] = dv_acc

    dq_ref[...] = dq_ref[...] * sm_scale


@functools.partial(
    jax.jit,
    static_argnames=(
        "sm_scale", "kv_len", "window", "softcap", "interpret", "hb",
    ),
)
def bwd_mid_pallas(
    q, k, v, o, do, m2, linv, *,
    sm_scale, kv_len, window=0, softcap=0.0, interpret=False,
    hb=None,
):
    """(dQ, dK, dV) for padded causal [B, H, n, d], 512 < n ≤ MAX_MID_BWD_N.

    Takes the forward output ``o`` and computes D = rowsum(O∘dO) inline —
    no separate D-preprocess kernel on this route.  dK/dV are per *query*
    head fp32 (caller group-sums GQA heads) — same contract as
    bwd_fused_pallas.  ``m2``/``linv``: plain-packed raw fwd stats
    (lse-only callers synthesize them — see flash_attention.lse_to_stats).
    """
    batch, num_q_heads, n, head_dim = q.shape
    num_kv_heads = k.shape[1]
    q_per_kv = num_q_heads // num_kv_heads
    assert n % SUB == 0, n


    if hb is None:
        hb = pick_hb_bwd(n, head_dim, q.dtype, num_q_heads, q_per_kv)
    hb_kv = hb // q_per_kv if hb % q_per_kv == 0 else 1
    kernel = functools.partial(
        _bwd_mid_kernel,
        n=n, kv_len=kv_len, window=window, softcap=float(softcap),
        sm_scale=sm_scale, hb=hb, q_per_kv=q_per_kv,
    )
    grid = (batch, num_q_heads // hb)
    q_spec = pl.BlockSpec((1, hb, n, head_dim), lambda b, h: (b, h, 0, 0))
    if hb % q_per_kv == 0:
        kv_index = lambda b, h: (b, h, 0, 0)  # cell owns whole kv groups
    else:
        kv_index = lambda b, h: (b, (h * hb) // q_per_kv, 0, 0)
    kv_spec = pl.BlockSpec((1, hb_kv, n, head_dim), kv_index)
    stat_spec = pl.BlockSpec(
        (1, hb, n // geo.NUM_LANES, geo.NUM_LANES), lambda b, h: (b, h, 0, 0)
    )
    g_shape = jax.ShapeDtypeStruct(
        (batch, num_q_heads, n, head_dim), jnp.float32
    )
    dq, dk, dv = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[q_spec, kv_spec, kv_spec, q_spec, q_spec, stat_spec,
                  stat_spec],
        out_specs=[q_spec, q_spec, q_spec],
        out_shape=[g_shape, g_shape, g_shape],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
        ),
        interpret=interpret,
    )(q, k, v, o, do, m2, linv)
    return dq, dk, dv
