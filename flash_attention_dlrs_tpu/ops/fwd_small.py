"""One-shot forward kernel for short sequences.

When the whole (padded) sequence fits one block, the general kernel's online
softmax is pure overhead: running (m, l, acc) scratch, per-step init and
epilogue, and one grid step per (batch, head) pair.  This kernel computes
softmax(QKᵀ)V in a single pass per cell and blocks several HEADS per grid
cell, amortizing per-step cost over the batched head loop.  Measured on v5e
(B=8 H=16 d=128 bf16 causal): N=256 11.9 → ~35 TF/s, N=512 27 → ~50 TF/s.

Composes with causal, sliding window, segment ids, soft-capping, GQA, and
the LSE residual; the backward stays on the general kernels (small-N bwd is
a follow-up).  Q arrives pre-scaled by sm_scale·log2e (base-2 convention,
see fwd_kernel.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .. import geometry as geo
from . import layout
from .fwd_kernel import DEFAULT_MASK_VALUE, LN2, LOG2E, mxu_dot, v_payload

# Only sequences up to this padded length take the one-shot path: beyond it
# the [n, n] score tile stops fitting comfortably in scoped VMEM and the
# general online-softmax kernel wins anyway.
MAX_SMALL_N = 512


def _heads_per_cell(n: int, head_dim: int, num_q_heads: int, q_per_kv: int,
                    dtype, budget_frac: float = 1.0,
                    save_residuals: bool = False) -> int:
    """Largest head block (multiple of q_per_kv, divisor of Hq) whose
    footprint fits the scoped-VMEM budget.

    The multiple-of-q_per_kv constraint is load-bearing: the kv BlockSpec
    holds hb // q_per_kv heads and the kernel indexes k_ref[0, j // q_per_kv]
    for j < hb, so a non-multiple hb (e.g. hb=6 with q_per_kv=4) would read
    past the block — candidates are filtered, never just halved.

    The lse output must be counted when residuals are saved (omitting it
    let hb=16 through at n=384 — bench head count — and Mosaic refused the
    16.62M scoped stack on the real chip, a crash the power-of-two bench
    sweep never hit).  Since the move to the packed [hb, n/128, 128] stat
    layout (layout.py) the term is 128x smaller than the lane-replicated
    block that caused that crash.
    """
    isz = jnp.dtype(dtype).itemsize
    budget = geo.current_geometry().vmem_budget * budget_frac
    candidates = [
        hb for hb in range(num_q_heads, q_per_kv - 1, -1)
        if num_q_heads % hb == 0 and hb % q_per_kv == 0
    ]
    for hb in candidates:
        q_kv = hb * n * head_dim * isz * 2  # q + out
        kv = 2 * (hb // q_per_kv) * n * head_dim * isz
        lse = hb * n * 4 if save_residuals else 0
        scores = 2 * n * n * 4
        if (q_kv + kv + lse) * 2 + scores <= budget:
            return hb
    return q_per_kv


def _small_kernel(
    q_ref,  # [1, hb, n, d] — raw; scores scaled post-dot
    k_ref,  # [1, hb // q_per_kv, n, d]
    v_ref,
    qseg_ref,  # [1, n, LANES] int32 or None
    kvseg_ref,  # [1, SUBLANES, n] int32 or None
    o_ref,
    lse_ref,  # [1, hb, n/128, 128] f32 packed (layout.py) or None
    *,
    scale2: float,
    causal: bool,
    kv_len: int,
    n: int,
    hb: int,
    q_per_kv: int,
    window: int,
    softcap: float,
    q_off: int,
):
    mask = None
    if causal:
        # Bottom-right alignment (q_off = kv_len - q_len, see fwd_kernel)
        row = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
        col = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
        mask = (row + q_off) >= col
        if window:
            mask = jnp.logical_and(mask, (row + q_off - col) < window)
    if kv_len != n:
        col = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
        lm = col < kv_len
        mask = lm if mask is None else jnp.logical_and(mask, lm)
    if qseg_ref is not None:
        seg = qseg_ref[0][:, :1] == kvseg_ref[0][:1, :]
        mask = seg if mask is None else jnp.logical_and(mask, seg)

    for j in range(hb):
        q = q_ref[0, j]
        k = k_ref[0, j // q_per_kv]
        v = v_payload(v_ref[0, j // q_per_kv], q_ref.dtype)
        s = mxu_dot(q, k, (((1,), (1,)), ((), ()))) * scale2
        if softcap:
            c2 = softcap * LOG2E
            s = c2 * jnp.tanh(s * (1.0 / c2))
        if mask is not None:
            s = jnp.where(mask, s, DEFAULT_MASK_VALUE)
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp2(s - m)
        if mask is not None and (q_off or qseg_ref is not None):
            # fully-masked rows: s == mask-floor everywhere → p would be
            # uniform 1; zero it so l == 0 → O = 0 + lse sentinel.  Such
            # rows only exist for cross-length causal or segment ids —
            # plain rows always keep their diagonal column visible.
            p = jnp.where(s > 0.5 * DEFAULT_MASK_VALUE, p, 0.0)
        l = jnp.sum(p, axis=-1, keepdims=True)
        pv = mxu_dot(p.astype(v.dtype), v, (((1,), (0,)), ((), ())))
        l_inv = jnp.where(l == 0.0, 0.0, 1.0 / l)
        o_ref[0, j] = (pv * l_inv).astype(o_ref.dtype)
        if lse_ref is not None:
            lse = LN2 * m + jnp.log(jnp.where(l == 0.0, 1.0, l))
            lse = jnp.where(l == 0.0, DEFAULT_MASK_VALUE, lse)
            lse_ref[0, j] = layout.column_to_lanes(lse)


@functools.partial(
    jax.jit,
    static_argnames=(
        "sm_scale", "causal", "kv_len", "window", "softcap",
        "save_residuals", "interpret", "q_off",
    ),
)
def fwd_small_pallas(
    q,
    k,
    v,
    q_seg=None,
    kv_seg=None,
    *,
    sm_scale: float,
    causal: bool,
    kv_len: int,
    window: int = 0,
    softcap: float = 0.0,
    save_residuals: bool = False,
    interpret: bool = False,
    q_off: int = 0,
):
    """One-shot attention for padded [B, H, n, d] with n == padded KV length.

    Same contract as fwd_pallas restricted to the single-block case.
    """
    batch, num_q_heads, n, head_dim = q.shape
    num_kv_heads = k.shape[1]
    q_per_kv = num_q_heads // num_kv_heads

    hb = _heads_per_cell(n, head_dim, num_q_heads, q_per_kv, q.dtype,
                         save_residuals=save_residuals)
    assert num_q_heads % hb == 0 and hb % q_per_kv == 0, (hb, q_per_kv)

    kernel = functools.partial(
        _small_kernel,
        scale2=float(sm_scale) * LOG2E,
        causal=causal, kv_len=kv_len, n=n, hb=hb, q_per_kv=q_per_kv,
        window=window, softcap=float(softcap), q_off=q_off,
    )
    segmented = q_seg is not None
    if segmented and save_residuals:
        kern = kernel
    elif segmented:
        def kern(q_r, k_r, v_r, qs_r, ks_r, o_r):
            return kernel(q_r, k_r, v_r, qs_r, ks_r, o_r, None)
    elif save_residuals:
        def kern(q_r, k_r, v_r, o_r, lse_r):
            return kernel(q_r, k_r, v_r, None, None, o_r, lse_r)
    else:
        def kern(q_r, k_r, v_r, o_r):
            return kernel(q_r, k_r, v_r, None, None, o_r, None)

    grid = (batch, num_q_heads // hb)
    q_spec = pl.BlockSpec((1, hb, n, head_dim), lambda b, h: (b, h, 0, 0))
    kv_spec = pl.BlockSpec(
        (1, hb // q_per_kv, n, head_dim), lambda b, h: (b, h, 0, 0)
    )
    in_specs = [q_spec, kv_spec, kv_spec]
    inputs = [q, k, v]
    if segmented:
        qseg_rep = jnp.broadcast_to(
            q_seg.astype(jnp.int32)[:, :, None], (batch, n, geo.NUM_LANES)
        )
        kvseg_rep = jnp.broadcast_to(
            kv_seg.astype(jnp.int32)[:, None, :],
            (batch, geo.NUM_SUBLANES, n),
        )
        in_specs.append(
            pl.BlockSpec((1, n, geo.NUM_LANES), lambda b, h: (b, 0, 0))
        )
        in_specs.append(
            pl.BlockSpec((1, geo.NUM_SUBLANES, n), lambda b, h: (b, 0, 0))
        )
        inputs += [qseg_rep, kvseg_rep]
    out_specs = [q_spec]
    out_shape = [jax.ShapeDtypeStruct(q.shape, q.dtype)]
    if save_residuals:
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
        kern,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
        ),
        interpret=interpret,
    )(*inputs)
    if save_residuals:
        return outs[0], outs[1]
    return outs[0], None


def _small_bwd_kernel(
    q_ref,  # [1, hb, n, d] — raw; scores scaled post-dot
    k_ref,  # [1, hb // q_per_kv, n, d]
    v_ref,
    do_ref,  # [1, hb, n, d]
    qseg_ref,
    kvseg_ref,
    dq_ref,  # [1, hb, n, d] f32
    dk_ref,  # [1, hb, n, d] f32 (per q-head; caller group-sums)
    dv_ref,
    *,
    causal: bool,
    kv_len: int,
    n: int,
    hb: int,
    q_per_kv: int,
    window: int,
    softcap: float,
    sm_scale: float,
    q_off: int,
):
    """One-shot backward: with the full row resident there is no need for
    the saved logsumexp or the D-preprocess — softmax and D = rowsum(P∘dP)
    are computed inline, fusing the three general backward kernels into one.
    """
    mask = None
    if causal:
        # Bottom-right alignment (q_off = kv_len - q_len, see fwd_kernel)
        row = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
        col = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
        mask = (row + q_off) >= col
        if window:
            mask = jnp.logical_and(mask, (row + q_off - col) < window)
    if kv_len != n:
        col = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
        lm = col < kv_len
        mask = lm if mask is None else jnp.logical_and(mask, lm)
    if qseg_ref is not None:
        seg = qseg_ref[0][:, :1] == kvseg_ref[0][:1, :]
        mask = seg if mask is None else jnp.logical_and(mask, seg)

    for j in range(hb):
        q = q_ref[0, j]
        k = k_ref[0, j // q_per_kv]
        v = v_payload(v_ref[0, j // q_per_kv], q_ref.dtype)
        do = do_ref[0, j].astype(jnp.float32)
        s = mxu_dot(q, k, (((1,), (1,)), ((), ()))) * (sm_scale * LOG2E)
        grad_cap = None
        if softcap:
            c2 = softcap * LOG2E
            s = c2 * jnp.tanh(s * (1.0 / c2))
            grad_cap = 1.0 - (s * (1.0 / c2)) ** 2
        if mask is not None:
            s = jnp.where(mask, s, DEFAULT_MASK_VALUE)
        m = jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp2(s - m)
        if mask is not None and (q_off or qseg_ref is not None):
            # fully-masked rows: zero e so l == 0 → p == 0 → zero grads
            # (cross-length causal / segment ids only, as in the forward)
            e = jnp.where(s > 0.5 * DEFAULT_MASK_VALUE, e, 0.0)
        l = jnp.sum(e, axis=-1, keepdims=True)
        p = e * jnp.where(l == 0.0, 0.0, 1.0 / l)  # normalized probabilities
        # dV = Pᵀ dO
        dv_ref[0, j] = mxu_dot(
            p.astype(do.dtype), do, (((0,), (0,)), ((), ()))
        )
        # dP = dO Vᵀ ; D = rowsum(P ∘ dP) (≡ rowsum(dO ∘ O))
        dp = mxu_dot(do, v.astype(do.dtype), (((1,), (1,)), ((), ())))
        dpre = jnp.sum(p * dp, axis=-1, keepdims=True)
        ds = p * (dp - dpre)
        if grad_cap is not None:
            ds = ds * grad_cap
        # dQ = sm_scale · dS K  (k unscaled)
        dq_ref[0, j] = sm_scale * mxu_dot(
            ds.astype(k.dtype), k, (((1,), (0,)), ((), ())),
        )
        # dK = sm_scale · dSᵀ Q  (q raw)
        dk_ref[0, j] = sm_scale * mxu_dot(
            ds.astype(q.dtype), q, (((0,), (0,)), ((), ())),
        )


@functools.partial(
    jax.jit,
    static_argnames=(
        "sm_scale", "causal", "kv_len", "window", "softcap", "interpret",
        "q_off",
    ),
)
def bwd_small_pallas(
    q,
    k,
    v,
    do,
    q_seg=None,
    kv_seg=None,
    *,
    sm_scale: float,
    causal: bool,
    kv_len: int,
    window: int = 0,
    softcap: float = 0.0,
    interpret: bool = False,
    q_off: int = 0,
):
    """(dQ, dK, dV) for padded short sequences; dK/dV are per q-head fp32
    (the caller group-sums GQA heads, same as the general path)."""
    batch, num_q_heads, n, head_dim = q.shape
    num_kv_heads = k.shape[1]
    q_per_kv = num_q_heads // num_kv_heads

    # Backward holds ~3 score-sized f32 temporaries + 4 operand tiles:
    # give the head-block search half the forward budget.
    hb = _heads_per_cell(
        n, head_dim, num_q_heads, q_per_kv, q.dtype, budget_frac=0.5
    )
    assert num_q_heads % hb == 0 and hb % q_per_kv == 0, (hb, q_per_kv)

    kernel = functools.partial(
        _small_bwd_kernel,
        causal=causal, kv_len=kv_len, n=n, hb=hb, q_per_kv=q_per_kv,
        window=window, softcap=float(softcap), sm_scale=sm_scale,
        q_off=q_off,
    )
    segmented = q_seg is not None
    if segmented:
        kern = kernel
    else:
        def kern(q_r, k_r, v_r, do_r, dq_r, dk_r, dv_r):
            return kernel(q_r, k_r, v_r, do_r, None, None, dq_r, dk_r, dv_r)

    grid = (batch, num_q_heads // hb)
    q_spec = pl.BlockSpec((1, hb, n, head_dim), lambda b, h: (b, h, 0, 0))
    kv_spec = pl.BlockSpec(
        (1, hb // q_per_kv, n, head_dim), lambda b, h: (b, h, 0, 0)
    )
    in_specs = [q_spec, kv_spec, kv_spec, q_spec]
    inputs = [q, k, v, do]
    if segmented:
        qseg_rep = jnp.broadcast_to(
            q_seg.astype(jnp.int32)[:, :, None], (batch, n, geo.NUM_LANES)
        )
        kvseg_rep = jnp.broadcast_to(
            kv_seg.astype(jnp.int32)[:, None, :],
            (batch, geo.NUM_SUBLANES, n),
        )
        in_specs.append(
            pl.BlockSpec((1, n, geo.NUM_LANES), lambda b, h: (b, 0, 0))
        )
        in_specs.append(
            pl.BlockSpec((1, geo.NUM_SUBLANES, n), lambda b, h: (b, 0, 0))
        )
        inputs += [qseg_rep, kvseg_rep]
    g_spec = pl.BlockSpec((1, hb, n, head_dim), lambda b, h: (b, h, 0, 0))
    g_shape = jax.ShapeDtypeStruct(
        (batch, num_q_heads, n, head_dim), jnp.float32
    )
    dq, dk, dv = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=in_specs,
        out_specs=[g_spec, g_spec, g_spec],
        out_shape=[g_shape, g_shape, g_shape],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
        ),
        interpret=interpret,
    )(*inputs)
    return dq, dk, dv
