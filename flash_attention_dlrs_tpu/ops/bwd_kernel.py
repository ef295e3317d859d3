"""Pallas backward kernels for flash attention (recomputation-based).

TPU-native redesign of the reference backward path:

- ``bwd_d_pallas`` ≙ the D-preprocess kernel ``bwd_D_kernel``
  (reference: src/flash_attention_kernels.py:120-166): D = rowsum(O ∘ dO).
- ``bwd_dkv_pallas`` + ``bwd_dq_pallas`` replace BOTH reference backward
  variants (lock-based ``bwd_kernel``, src/flash_attention_kernels.py:175-334,
  and the broken ticket-ordered ``bwd_deterministic_kernel``, :343-496).
  The entire lock/ticket apparatus (spinlock via atomic_cas :305-320,
  first-writer-initializes :308-315, ticket ordering :470-484) is
  deliberately NOT ported: the dQ reduction is restructured as its own
  kernel with the KV dimension as a sequential ("arbitrary") grid axis, so
  determinism is a structural property of the TPU grid, not a kernel
  variant.

Both kernels recompute P from the saved logsumexp exactly as the reference
does (src/flash_attention_kernels.py:283-285), with fp32 accumulators.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .. import geometry as geo
from .fwd_kernel import DEFAULT_MASK_VALUE, mxu_dot


# ---------------------------------------------------------------------------
# D preprocess: D = rowsum(O ∘ dO)
# ---------------------------------------------------------------------------


def _bwd_d_kernel(o_ref, do_ref, d_ref):
    o = o_ref[0, 0].astype(jnp.float32)
    do = do_ref[0, 0].astype(jnp.float32)
    d = jnp.sum(o * do, axis=-1, keepdims=True)  # [block_q, 1]
    d_ref[0, 0] = jnp.broadcast_to(d, d_ref.shape[2:])


@functools.partial(jax.jit, static_argnames=("block_q", "interpret"))
def bwd_d_pallas(o, do, *, block_q: int, interpret: bool = False):
    """D = rowsum(O ∘ dO), fp32, lane-replicated [B, H, Nq, 128]."""
    batch, heads, n_q, head_dim = o.shape
    grid = (batch, heads, n_q // block_q)
    spec = pl.BlockSpec((1, 1, block_q, head_dim), lambda b, h, i: (b, h, i, 0))
    return pl.pallas_call(
        _bwd_d_kernel,
        grid=grid,
        in_specs=[spec, spec],
        out_specs=pl.BlockSpec(
            (1, 1, block_q, geo.NUM_LANES), lambda b, h, i: (b, h, i, 0)
        ),
        out_shape=jax.ShapeDtypeStruct(
            (batch, heads, n_q, geo.NUM_LANES), jnp.float32
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel"),
        ),
        interpret=interpret,
    )(o, do)


# ---------------------------------------------------------------------------
# Shared masked-P recomputation
# ---------------------------------------------------------------------------


def _recompute_p(q, k, lse, iq, jkv, *, sm_scale, causal, kv_len, block_q,
                 block_kv, apply_mask):
    """P = exp(scale·QKᵀ − L) with causal/length masking.

    ≙ src/flash_attention_kernels.py:283-285 (base-e instead of base-2).
    Returns (s-free) probabilities p [block_q, block_kv] fp32.
    """
    s = mxu_dot(q, k, (((1,), (1,)), ((), ())))
    if sm_scale != 1.0:
        s = s * sm_scale
    if apply_mask:
        row = jax.lax.broadcasted_iota(jnp.int32, (block_q, block_kv), 0)
        col = jax.lax.broadcasted_iota(jnp.int32, (block_q, block_kv), 1)
        mask = None
        if causal:
            mask = (row + iq * block_q) >= (col + jkv * block_kv)
        if kv_len % block_kv != 0:
            lm = (col + jkv * block_kv) < kv_len
            mask = lm if mask is None else jnp.logical_and(mask, lm)
        s = jnp.where(mask, s, DEFAULT_MASK_VALUE)
    return jnp.exp(s - lse)


def _mask_split(causal, kv_len, block_q, block_kv, iq, jkv, should_run, body):
    """Run `body(apply_mask)` under pl.when, masking only diagonal-crossing
    and KV-tail blocks (interior blocks skip the iota/select work)."""
    needs = None
    if causal:
        needs = (jkv + 1) * block_kv - 1 > iq * block_q
    if kv_len % block_kv != 0:
        tail = (jkv + 1) * block_kv > kv_len
        needs = tail if needs is None else jnp.logical_or(needs, tail)
    if needs is None:
        pl.when(should_run)(lambda: body(False))
    else:
        pl.when(jnp.logical_and(should_run, needs))(lambda: body(True))
        pl.when(jnp.logical_and(should_run, jnp.logical_not(needs)))(
            lambda: body(False)
        )


# ---------------------------------------------------------------------------
# dK/dV kernel: parallel over KV blocks, sequential over Q blocks
# ---------------------------------------------------------------------------


def _bwd_dkv_kernel(
    q_ref,
    k_ref,
    v_ref,
    do_ref,
    lse_ref,
    dpre_ref,
    dk_ref,
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
):
    jkv = pl.program_id(2)
    iq = pl.program_id(3)

    @pl.when(iq == 0)
    def _init():
        dk_acc[...] = jnp.zeros_like(dk_acc)
        dv_acc[...] = jnp.zeros_like(dv_acc)

    if causal:
        should_run = (iq + 1) * block_q - 1 >= jkv * block_kv
    else:
        should_run = True

    def _compute(apply_mask):
        q = q_ref[0, 0]
        k = k_ref[0, 0]
        v = v_ref[0, 0]
        do = do_ref[0, 0]
        lse = lse_ref[0, 0][:, :1]  # [block_q, 1]
        dpre = dpre_ref[0, 0][:, :1]

        p = _recompute_p(
            q, k, lse, iq, jkv,
            sm_scale=sm_scale, causal=causal, kv_len=kv_len,
            block_q=block_q, block_kv=block_kv, apply_mask=apply_mask,
        )
        # dV += Pᵀ dO  (≙ src/flash_attention_kernels.py:287)
        dv_acc[...] += mxu_dot(p.astype(do.dtype), do, (((0,), (0,)), ((), ())))
        # dP = dO Vᵀ   (≙ :289)
        dp = mxu_dot(do, v, (((1,), (1,)), ((), ())))
        # dS = P ∘ (dP − D) · scale  (≙ :291; scale folded here because S
        # already carries sm_scale in this design)
        ds = p * (dp - dpre)
        if sm_scale != 1.0:
            ds = ds * sm_scale
        # dK += dSᵀ Q  (≙ :293)
        dk_acc[...] += mxu_dot(ds.astype(q.dtype), q, (((0,), (0,)), ((), ())))

    _mask_split(causal, kv_len, block_q, block_kv, iq, jkv, should_run, _compute)

    @pl.when(iq == num_q_blocks - 1)
    def _store():
        dk_ref[0, 0] = dk_acc[...].astype(dk_ref.dtype)
        dv_ref[0, 0] = dv_acc[...].astype(dv_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=(
        "sm_scale", "causal", "block_q", "block_kv", "kv_len", "interpret"
    ),
)
def bwd_dkv_pallas(
    q, k, v, do, lse, dpre, *,
    sm_scale, causal, block_q, block_kv, kv_len, interpret=False,
):
    """dK, dV per *query* head: [B, Hq, Nkv_pad, d] fp32.

    GQA note: outputs are per-q-head; the caller group-sums over the q-head
    axis to get per-kv-head grads (one cheap XLA reduction) — writing
    directly to shared KV-head blocks from a head-parallel grid would race.
    """
    batch, num_q_heads, n_q, head_dim = q.shape
    _, num_kv_heads, n_kv, _ = k.shape
    q_per_kv = num_q_heads // num_kv_heads
    grid = (batch, num_q_heads, n_kv // block_kv, n_q // block_q)

    kernel = functools.partial(
        _bwd_dkv_kernel,
        sm_scale=sm_scale, causal=causal, kv_len=kv_len,
        block_q=block_q, block_kv=block_kv,
        num_q_blocks=n_q // block_q,
    )
    if causal:
        # Early (above-diagonal) Q blocks are skipped; clamp their index so
        # the pipeline doesn't fetch them (see fwd_kernel.py kv_index).
        def iq_c(jkv, iq):
            return jnp.maximum(iq, (jkv * block_kv) // block_q)
    else:
        def iq_c(jkv, iq):
            return iq

    q_spec = pl.BlockSpec(
        (1, 1, block_q, head_dim),
        lambda b, h, jkv, iq: (b, h, iq_c(jkv, iq), 0),
    )
    kv_spec = pl.BlockSpec(
        (1, 1, block_kv, head_dim),
        lambda b, h, jkv, iq: (b, h // q_per_kv, jkv, 0),
    )
    stat_spec = pl.BlockSpec(
        (1, 1, block_q, geo.NUM_LANES),
        lambda b, h, jkv, iq: (b, h, iq_c(jkv, iq), 0),
    )
    dkv_spec = pl.BlockSpec(
        (1, 1, block_kv, head_dim), lambda b, h, jkv, iq: (b, h, jkv, 0)
    )
    dk, dv = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[q_spec, kv_spec, kv_spec, q_spec, stat_spec, stat_spec],
        out_specs=[dkv_spec, dkv_spec],
        out_shape=[
            jax.ShapeDtypeStruct((batch, num_q_heads, n_kv, head_dim), jnp.float32),
            jax.ShapeDtypeStruct((batch, num_q_heads, n_kv, head_dim), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((block_kv, head_dim), jnp.float32),
            pltpu.VMEM((block_kv, head_dim), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(q, k, v, do, lse, dpre)
    return dk, dv


# ---------------------------------------------------------------------------
# dQ kernel: parallel over Q blocks, sequential over KV blocks
# ---------------------------------------------------------------------------


def _bwd_dq_kernel(
    q_ref,
    k_ref,
    v_ref,
    do_ref,
    lse_ref,
    dpre_ref,
    dq_ref,
    dq_acc,
    *,
    sm_scale,
    causal,
    kv_len,
    block_q,
    block_kv,
    num_kv_blocks,
):
    iq = pl.program_id(2)
    jkv = pl.program_id(3)

    @pl.when(jkv == 0)
    def _init():
        dq_acc[...] = jnp.zeros_like(dq_acc)

    if causal:
        should_run = (iq + 1) * block_q - 1 >= jkv * block_kv
    else:
        should_run = True

    def _compute(apply_mask):
        q = q_ref[0, 0]
        k = k_ref[0, 0]
        v = v_ref[0, 0]
        do = do_ref[0, 0]
        lse = lse_ref[0, 0][:, :1]
        dpre = dpre_ref[0, 0][:, :1]

        p = _recompute_p(
            q, k, lse, iq, jkv,
            sm_scale=sm_scale, causal=causal, kv_len=kv_len,
            block_q=block_q, block_kv=block_kv, apply_mask=apply_mask,
        )
        dp = mxu_dot(do, v, (((1,), (1,)), ((), ())))
        ds = p * (dp - dpre)
        if sm_scale != 1.0:
            ds = ds * sm_scale
        # dQ += dS K — accumulated over the sequential KV grid axis; this is
        # the reduction the reference serialized with a spinlock
        # (src/flash_attention_kernels.py:305-320).  No lock needed here.
        dq_acc[...] += mxu_dot(ds.astype(k.dtype), k, (((1,), (0,)), ((), ())))

    _mask_split(causal, kv_len, block_q, block_kv, iq, jkv, should_run, _compute)

    @pl.when(jkv == num_kv_blocks - 1)
    def _store():
        dq_ref[0, 0] = dq_acc[...].astype(dq_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=(
        "sm_scale", "causal", "block_q", "block_kv", "kv_len", "interpret"
    ),
)
def bwd_dq_pallas(
    q, k, v, do, lse, dpre, *,
    sm_scale, causal, block_q, block_kv, kv_len, interpret=False,
):
    """dQ: [B, Hq, Nq_pad, d] fp32."""
    batch, num_q_heads, n_q, head_dim = q.shape
    _, num_kv_heads, n_kv, _ = k.shape
    q_per_kv = num_q_heads // num_kv_heads
    grid = (batch, num_q_heads, n_q // block_q, n_kv // block_kv)

    kernel = functools.partial(
        _bwd_dq_kernel,
        sm_scale=sm_scale, causal=causal, kv_len=kv_len,
        block_q=block_q, block_kv=block_kv,
        num_kv_blocks=n_kv // block_kv,
    )
    if causal:
        def jkv_c(iq, jkv):
            return jnp.minimum(jkv, ((iq + 1) * block_q - 1) // block_kv)
    else:
        def jkv_c(iq, jkv):
            return jkv

    q_spec = pl.BlockSpec(
        (1, 1, block_q, head_dim), lambda b, h, iq, jkv: (b, h, iq, 0)
    )
    kv_spec = pl.BlockSpec(
        (1, 1, block_kv, head_dim),
        lambda b, h, iq, jkv: (b, h // q_per_kv, jkv_c(iq, jkv), 0),
    )
    stat_spec = pl.BlockSpec(
        (1, 1, block_q, geo.NUM_LANES), lambda b, h, iq, jkv: (b, h, iq, 0)
    )
    dq = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[q_spec, kv_spec, kv_spec, q_spec, stat_spec, stat_spec],
        out_specs=pl.BlockSpec(
            (1, 1, block_q, head_dim), lambda b, h, iq, jkv: (b, h, iq, 0)
        ),
        out_shape=jax.ShapeDtypeStruct(
            (batch, num_q_heads, n_q, head_dim), jnp.float32
        ),
        scratch_shapes=[pltpu.VMEM((block_q, head_dim), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(q, k, v, do, lse, dpre)
    return dq
