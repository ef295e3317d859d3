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

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .. import geometry as geo
from . import layout
from .fwd_kernel import DEFAULT_MASK_VALUE, LN2, LOG2E, mxu_dot

# Padded-length ceiling for this path; beyond it the general tri-grid kernel
# is already near its efficiency asymptote and VMEM residency gets tight.
MAX_MID_N = 2048

# Padding unit for this path (inputs are padded to a multiple of this; the
# in-kernel sub edge divides it).
SUB = 256


def pick_sub(n: int) -> int:
    """In-kernel sub-block edge: causal efficiency is 1 − 0.5·sub/n, so a
    finer edge helps short panes — but sub=128 made Mosaic compilation blow
    up past 9 minutes (measured; 256-edge panes with the same 36-pair unroll
    compile in seconds), so 256 is the floor."""
    return 256


def mid_path_fits(n_pad: int, head_dim: int, dtype, hb: int = 1,
                  margin: float = 1.0) -> bool:
    """VMEM feasibility: q/k/v/o panes (double-buffered) + lse + score/acc
    temporaries must fit the scoped budget.  ``margin`` scales the estimate
    — Mosaic's real stack allocation runs ~1.5× this model (measured: hb=2
    n=2048 bf16 21.09M actual vs 13.8M modeled; fp32 n=1024 hb=2 also
    over), so optional paths pass margin=1.5."""
    isz = jnp.dtype(dtype).itemsize
    panes = 2 * hb * (4 * n_pad * head_dim * isz + n_pad * geo.NUM_LANES * 4)
    temps = 3 * SUB * SUB * 4 + n_pad * head_dim * 4
    return geo.fits_vmem(
        int((panes + temps) * margin), geo.current_geometry()
    )


def pick_hb(n_pad: int, head_dim: int, dtype, num_q_heads: int,
            q_per_kv: int) -> int:
    """Heads per grid cell: 2 when the pane set still fits VMEM (halves the
    per-cell fixed cost), else 1.  Validity: hb must divide Hq and nest with
    the GQA group (share one kv head or own whole groups).

    Gated with the measured 1.5× Mosaic stack margin (hb=2 at n=2048 bf16
    and n=1024 fp32 both compile-OOM without it); measured +10% at
    N=1024 bf16 on v5e (86.6 → 95.4 TF/s)."""
    hb = 2
    if (
        num_q_heads % hb == 0
        and (hb % q_per_kv == 0 or q_per_kv % hb == 0)
        and mid_path_fits(n_pad, head_dim, dtype, hb=hb, margin=1.5)
    ):
        return hb
    return 1


def _mid_kernel(
    q_ref,  # [1, hb, n, d] — pre-scaled by sm_scale·log2e
    k_ref,  # [1, hb_kv, n, d]
    v_ref,
    o_ref,
    m_out_ref,  # [1, hb, n/128, 128] f32 packed (layout.py) or None
    linv_out_ref,  # same shape; 1/l (0 on empty rows)
    *,
    n: int,
    kv_len: int,
    window: int,
    softcap: float,
    sub: int,
    hb: int,
    q_per_kv: int,
):
    SUB = sub
    T = n // SUB
    row = jax.lax.broadcasted_iota(jnp.int32, (SUB, SUB), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (SUB, SUB), 1)
    diag_mask = row >= col  # static, shared by every diagonal sub-pair

    for j, iq in [(j_, iq_) for j_ in range(hb) for iq_ in range(T)]:
        jkv_h = j // q_per_kv if hb > q_per_kv else 0
        qi = q_ref[0, j, iq * SUB:(iq + 1) * SUB, :]
        m = None
        l = None
        acc = None
        jk_lo = 0
        if window:
            # first kv sub-block the row block's window can reach
            jk_lo = max(0, (iq * SUB - window + 1) // SUB)
        for jk in range(jk_lo, iq + 1):
            kj = k_ref[0, jkv_h, jk * SUB:(jk + 1) * SUB, :]
            s = mxu_dot(qi, kj, (((1,), (1,)), ((), ())))
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
                acc = mxu_dot(
                    p.astype(v_ref.dtype),
                    v_ref[0, jkv_h, jk * SUB:(jk + 1) * SUB, :],
                    (((1,), (0,)), ((), ())),
                )
            else:
                m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
                alpha = jnp.exp2(m - m_new)
                p = jnp.exp2(s - m_new)
                l = l * alpha + jnp.sum(p, axis=-1, keepdims=True)
                acc = acc * alpha + mxu_dot(
                    p.astype(v_ref.dtype),
                    v_ref[0, jkv_h, jk * SUB:(jk + 1) * SUB, :],
                    (((1,), (0,)), ((), ())),
                )
                m = m_new
            del s
        l_inv = jnp.where(l == 0.0, 0.0, 1.0 / l)
        o_ref[0, j, iq * SUB:(iq + 1) * SUB, :] = (acc * l_inv).astype(
            o_ref.dtype
        )
        if m_out_ref is not None:
            # Raw (m, 1/l) stats — see fwd_kernel epilogue for why the
            # combined lse is NOT stored (bit-cancelling backward recompute).
            m_out = jnp.where(l == 0.0, -DEFAULT_MASK_VALUE, m)
            rs = SUB // geo.NUM_LANES
            m_out_ref[0, j, iq * rs:(iq + 1) * rs, :] = (
                layout.column_to_lanes(m_out)
            )
            linv_out_ref[0, j, iq * rs:(iq + 1) * rs, :] = (
                layout.column_to_lanes(l_inv[:, :1])
            )


@functools.partial(
    jax.jit,
    static_argnames=(
        "sm_scale", "kv_len", "window", "softcap", "save_residuals",
        "interpret", "sub", "hb",
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
):
    """Causal attention for padded [B, H, n, d], 512 < n ≤ MAX_MID_N.

    Same contract as fwd_pallas restricted to causal self-attention without
    packed segments.
    """
    batch, num_q_heads, n, head_dim = q.shape
    num_kv_heads = k.shape[1]
    q_per_kv = num_q_heads // num_kv_heads
    assert n % SUB == 0, n

    q = (q.astype(jnp.float32) * (sm_scale * LOG2E)).astype(q.dtype)

    if sub is None:
        sub = pick_sub(n)
    assert n % sub == 0, (n, sub)
    if hb is None:
        hb = pick_hb(n, head_dim, q.dtype, num_q_heads, q_per_kv)
    hb_kv = hb // q_per_kv if hb % q_per_kv == 0 else 1
    kernel = functools.partial(
        _mid_kernel,
        n=n, kv_len=kv_len, window=window, softcap=float(softcap), sub=sub,
        hb=hb, q_per_kv=q_per_kv,
    )
    if not save_residuals:
        inner = kernel

        def kernel(q_r, k_r, v_r, o_r):  # noqa: F811
            return inner(q_r, k_r, v_r, o_r, None, None)

    grid = (batch, num_q_heads // hb)
    q_spec = pl.BlockSpec((1, hb, n, head_dim), lambda b, h: (b, h, 0, 0))
    if hb % q_per_kv == 0:
        kv_index = lambda b, h: (b, h, 0, 0)  # cell owns whole kv groups
    else:
        kv_index = lambda b, h: (b, (h * hb) // q_per_kv, 0, 0)
    kv_spec = pl.BlockSpec((1, hb_kv, n, head_dim), kv_index)
    out_specs = [q_spec]
    out_shape = [jax.ShapeDtypeStruct(q.shape, q.dtype)]
    if save_residuals:
        for _ in range(2):  # m then linv, same packed layout
            out_specs.append(
                pl.BlockSpec(
                    (1, hb, n // geo.NUM_LANES, geo.NUM_LANES),
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
        ),
        interpret=interpret,
    )(q, k, v)
    if save_residuals:
        return outs[0], (outs[1], outs[2])
    return outs[0], None
