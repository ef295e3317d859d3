"""Ring attention: context-parallel attention with KV blocks rotating over
the ICI ring, communication overlapped with per-block compute.

North-star component (no reference counterpart; the reference's longest
sequence is whatever one GPU can loop over in a single kernel,
reference: src/flash_attention_kernels.py:88, src/bench.py:12).

Design: runs *inside* shard_map over a context axis.  Each device holds a KV
shard; at every step it computes flash attention of its local Q against the
KV block currently resident, then `ppermute`s the block to its ring
neighbor.  XLA overlaps the ppermute DMA with the next step's kernel.  The
partial (O, LSE) pairs are merged with the same online-softmax rescale the
kernel uses internally (src/flash_attention_kernels.py:95-98) — the
logsumexp merge IS the ring-combine operator.

Causal handling: with equal Q/KV shard sizes, a KV block from source chip s
relative to this chip's q offset is either entirely in the past (full
attention), the diagonal block (causal mask), or entirely in the future
(skipped) — selected per step with `lax.switch` on the rotating source
index, so the skip costs one branch, not one kernel.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax

from ..ops.flash_attention import flash_attention_forward
from ..ops.fwd_kernel import DEFAULT_MASK_VALUE


def merge_partials(o1, lse1, o2, lse2):
    """Merge two normalized partial attentions via their logsumexps.

    o_i: [..., N, d]; lse_i: [..., N].  Returns (o, lse) of the union —
    numerically the cross-chip form of the in-kernel rescale.
    """
    lse_c = jnp.logaddexp(lse1, lse2)
    w1 = jnp.exp(lse1 - lse_c)[..., None]
    w2 = jnp.exp(lse2 - lse_c)[..., None]
    return (
        (o1.astype(jnp.float32) * w1 + o2.astype(jnp.float32) * w2).astype(o1.dtype),
        lse_c,
    )


_SHARD_SEED_PRIME = 15485863  # ≠ the transformer's per-layer 1299709


def shard_seed(seed, q_owner, kv_src, n):
    """Per-(q shard, kv shard) dropout sub-seed.  The in-kernel mask is a
    function of (seed, b, h, LOCAL row, LOCAL col); folding both shard
    coordinates into the seed decorrelates entries that share local indices
    across chips — without it, q-row i on every chip would drop the same
    columns.  Deterministic in (seed, chip pair), so the backward lap —
    which visits the same (q_owner, kv_src) pairs — replays exactly."""
    return (
        jnp.asarray(seed, jnp.int32)
        + jnp.int32(_SHARD_SEED_PRIME) * (q_owner * n + kv_src).astype(jnp.int32)
    )


def _ring_forward(q, k, v, seed, *, axis_name, causal, sm_scale, rate,
                  interpret):
    n = lax.psum(1, axis_name)  # static axis size
    idx = lax.axis_index(axis_name)

    def full_block(q_, k_, v_, seed_):
        return flash_attention_forward(
            q_, k_, v_, causal=False, sm_scale=sm_scale,
            dropout_rate=rate, dropout_seed=seed_ if rate else None,
            interpret=interpret,
        )

    def diag_block(q_, k_, v_, seed_):
        return flash_attention_forward(
            q_, k_, v_, causal=True, sm_scale=sm_scale,
            dropout_rate=rate, dropout_seed=seed_ if rate else None,
            interpret=interpret,
        )

    def skip_block(q_, k_, v_, seed_):
        o = jnp.zeros(q_.shape, q_.dtype)
        lse = jnp.full(q_.shape[:-1], DEFAULT_MASK_VALUE, jnp.float32)
        return o, lse

    o = jnp.zeros(q.shape, q.dtype)
    lse = jnp.full(q.shape[:-1], DEFAULT_MASK_VALUE, jnp.float32)
    k_blk, v_blk = k, v
    perm = [(i, (i + 1) % n) for i in range(n)]

    for step in range(n):
        src = lax.rem(idx - step + n, n)  # which chip this KV block came from
        seed_step = shard_seed(seed, idx, src, n)
        if causal:
            case = jnp.where(src < idx, 0, jnp.where(src == idx, 1, 2))
            o_b, lse_b = lax.switch(
                case, [full_block, diag_block, skip_block],
                q, k_blk, v_blk, seed_step,
            )
        else:
            o_b, lse_b = full_block(q, k_blk, v_blk, seed_step)
        o, lse = merge_partials(o, lse, o_b, lse_b)
        if step != n - 1:
            # Rotate the KV block to the next chip; XLA schedules this
            # point-to-point transfer concurrently with the next step's
            # attention kernel (it has no data dependence on it).
            k_blk = lax.ppermute(k_blk, axis_name, perm)
            v_blk = lax.ppermute(v_blk, axis_name, perm)
    return o, lse


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7, 8))
def _ring_attention(q, k, v, seed, axis_name, causal, sm_scale, rate,
                    interpret):
    o, _ = _ring_forward(
        q, k, v, seed, axis_name=axis_name, causal=causal, sm_scale=sm_scale,
        rate=rate, interpret=interpret,
    )
    return o


def _ring_attention_fwd(q, k, v, seed, axis_name, causal, sm_scale, rate,
                        interpret):
    o, lse = _ring_forward(
        q, k, v, seed, axis_name=axis_name, causal=causal, sm_scale=sm_scale,
        rate=rate, interpret=interpret,
    )
    return o, (q, k, v, seed, o, lse)


def _ring_attention_bwd(axis_name, causal, sm_scale, rate, interpret, res,
                        do):
    """Ring backward: K/V blocks rotate a second lap; each device's partial
    (dK, dV) for the resident block travels WITH the block, so after n
    rotations every gradient accumulator is back on its owner — the ring
    replaces the psum a naive context-parallel backward would need.

    Per-block gradients use the single-device kernels with the GLOBAL
    logsumexp residual: p = exp(s − LSE_global) is the true softmax
    probability, so per-block dQ/dK/dV contributions are exact and simply
    sum (same recomputation identity as src/flash_attention_kernels.py:283-293).
    """
    from ..ops.flash_attention import flash_attention_backward

    q, k, v, seed, o, lse = res
    n = lax.psum(1, axis_name)
    idx = lax.axis_index(axis_name)
    perm = [(i, (i + 1) % n) for i in range(n)]

    def grads(q_, k_, v_, do_, seed_, causal_):
        return flash_attention_backward(
            q_, k_, v_, o, do_, lse,
            causal=causal_, sm_scale=sm_scale,
            dropout_rate=rate, dropout_seed=seed_ if rate else None,
            interpret=interpret,
        )

    def full_block(q_, k_, v_, do_, seed_):
        return grads(q_, k_, v_, do_, seed_, False)

    def diag_block(q_, k_, v_, do_, seed_):
        return grads(q_, k_, v_, do_, seed_, True)

    def skip_block(q_, k_, v_, do_, seed_):
        return (
            jnp.zeros(q_.shape, q_.dtype),
            jnp.zeros(k.shape, k.dtype),
            jnp.zeros(v.shape, v.dtype),
        )

    dq = jnp.zeros(q.shape, jnp.float32)
    dk_blk = jnp.zeros(k.shape, jnp.float32)
    dv_blk = jnp.zeros(v.shape, jnp.float32)
    k_blk, v_blk = k, v

    for step in range(n):
        src = lax.rem(idx - step + n, n)
        seed_step = shard_seed(seed, idx, src, n)  # same pair ⇒ same mask
        if causal:
            case = jnp.where(src < idx, 0, jnp.where(src == idx, 1, 2))
            dq_p, dk_p, dv_p = lax.switch(
                case, [full_block, diag_block, skip_block],
                q, k_blk, v_blk, do, seed_step,
            )
        else:
            dq_p, dk_p, dv_p = full_block(q, k_blk, v_blk, do, seed_step)
        dq = dq + dq_p.astype(jnp.float32)
        dk_blk = dk_blk + dk_p.astype(jnp.float32)
        dv_blk = dv_blk + dv_p.astype(jnp.float32)
        # Rotate EVERY step (n total): the kv block and its gradient
        # accumulator complete a full lap back to the owning device.
        k_blk = lax.ppermute(k_blk, axis_name, perm)
        v_blk = lax.ppermute(v_blk, axis_name, perm)
        dk_blk = lax.ppermute(dk_blk, axis_name, perm)
        dv_blk = lax.ppermute(dv_blk, axis_name, perm)
    return (
        dq.astype(q.dtype), dk_blk.astype(k.dtype), dv_blk.astype(v.dtype),
        None,  # seed (int) carries no cotangent
    )


_ring_attention.defvjp(_ring_attention_fwd, _ring_attention_bwd)


def ring_attention(
    q,
    k,
    v,
    *,
    axis_name: str,
    causal: bool = False,
    sm_scale: Optional[float] = None,
    dropout_rate: float = 0.0,
    dropout_seed=None,
    interpret: Optional[bool] = None,
):
    """Differentiable context-parallel attention over `axis_name` (call
    inside shard_map).

    q: [B, H, Nq_shard, d], k/v: [B, Hkv, Nkv_shard, d] — the *local* shards;
    the global sequence is the concatenation over the axis.  For causal,
    Nq_shard must equal Nkv_shard (token-aligned context sharding).
    Returns the local O shard [B, H, Nq_shard, d].

    ``dropout_rate``/``dropout_seed`` apply attention dropout with a
    per-(q shard, kv shard) sub-seed (``shard_seed``); the custom backward
    replays the identical masks on its rotation lap.  The pattern depends
    on the mesh layout (unlike single-device runs, which replay across
    block geometries) — fixed seed + fixed mesh ⇒ bitwise repeatable.
    """
    if sm_scale is None:
        sm_scale = float(q.shape[-1]) ** -0.5
    if causal and q.shape[2] != k.shape[2]:
        raise ValueError(
            f"causal ring attention requires equal q/kv shard lengths "
            f"(token-aligned context sharding); got Nq_shard={q.shape[2]} "
            f"vs Nkv_shard={k.shape[2]} — the full/diagonal/skip block "
            "classification assumes aligned shards"
        )
    rate = float(dropout_rate)
    if rate and dropout_seed is None:
        raise ValueError("dropout_rate > 0 requires dropout_seed")
    seed = jnp.asarray(
        dropout_seed if dropout_seed is not None else 0, jnp.int32
    ).reshape(())
    return _ring_attention(
        q, k, v, seed, axis_name, causal, float(sm_scale), rate, interpret
    )


def context_parallel_attention(
    q,
    k,
    v,
    *,
    axis_name: str,
    causal: bool = False,
    sm_scale: Optional[float] = None,
    dropout_rate: float = 0.0,
    dropout_seed=None,
    interpret: Optional[bool] = None,
):
    """All-gather-free context parallelism WITHOUT the ring: each chip
    attends its local KV shard, partials are combined with one logaddexp
    all-reduce (boom-guide "reduce-scatter the output" shape).  Cheaper than
    ring for short per-chip shards where N-1 small kernels would be
    launch-bound; communication is O(d) per query instead of O(Nkv·d).

    Requires Q replicated over the context axis (decode / short-q case).

    Causal story: this path targets decode, where every query token is
    globally LATER than every resident KV token — the causal mask is
    vacuously satisfied, so callers pass ``causal=False`` and get causally
    correct results (the same argument as flash-decoding's split-KV).  A
    true intra-shard causal mask would need global q positions against each
    shard's global KV offset, which only arises when q is itself a sharded
    training-length sequence — exactly the case ``ring_attention`` serves.
    Hence causal=True is rejected here rather than half-supported.
    """
    if causal:
        raise NotImplementedError(
            "combine-based CP is decode-shaped: q tokens are globally later "
            "than all resident KV, so causal masking is vacuous — pass "
            "causal=False; for sharded-q causal training use ring_attention"
        )
    rate = float(dropout_rate)
    if rate and dropout_seed is None:
        raise ValueError("dropout_rate > 0 requires dropout_seed")
    seed_l = None
    if rate:
        # Q is replicated (rows global) but KV cols are shard-local: fold
        # only the kv-owner coordinate so shards drop independent columns.
        n = lax.psum(1, axis_name)
        seed_l = shard_seed(dropout_seed, jnp.int32(0),
                            lax.axis_index(axis_name), n)
    o_l, lse_l = flash_attention_forward(
        q, k, v, causal=False, sm_scale=sm_scale,
        dropout_rate=rate, dropout_seed=seed_l, interpret=interpret,
    )
    lse_max = lax.pmax(lse_l, axis_name)
    w = jnp.exp(lse_l - lse_max)
    num = lax.psum(o_l.astype(jnp.float32) * w[..., None], axis_name)
    den = lax.psum(w, axis_name)
    return (num / den[..., None]).astype(q.dtype)
