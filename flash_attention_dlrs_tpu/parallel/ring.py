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


# ---------------------------------------------------------------------------
# Zigzag (load-balanced causal) ring
# ---------------------------------------------------------------------------
#
# The contiguous causal ring above is correct but unbalanced: chip 0's shard
# is entirely early context, so it computes 1 useful step of n while chip
# n−1 computes all n — ~2× attention wall-time loss at n=8.  The zigzag
# layout (used by production context-parallel trainers) splits the sequence
# into 2n chunks and gives chip i the PAIR (chunk i, chunk 2n−1−i) — one
# early stripe + its mirrored late stripe.  Then for a KV block arriving
# from source chip s:
#
#   s < i:  only kv chunk s is visible — ONE full kernel, local q (both
#           chunks) × early kv chunk            → 2 chunk-pairs of work
#   s > i:  only the late q chunk sees anything — ONE full kernel, late q
#           chunk × both kv chunks              → 2 chunk-pairs of work
#   s == i: both diagonal chunks + late-q×early-kv full → ~2 chunk-pairs
#
# Every chip does the same ~2 chunk-pairs at every step — balanced to the
# diagonal-mask granularity.  (No reference counterpart; layout follows the
# public zigzag ring-attention construction.)


def zigzag_indices(n_devices: int, n_tokens: int):
    """Permutation taking a CONTIGUOUS global sequence to the zigzag
    layout: chip i's contiguous shard of the permuted array holds global
    chunks (i, 2n−1−i).  Apply with jnp.take(x, idx, axis=seq_axis);
    invert with ``zigzag_inverse``."""
    import numpy as np

    two_n = 2 * n_devices
    assert n_tokens % two_n == 0, (n_tokens, two_n)
    c = n_tokens // two_n
    order = []
    for i in range(n_devices):
        order += [i, two_n - 1 - i]
    return np.concatenate(
        [np.arange(ch * c, (ch + 1) * c) for ch in order]
    )


def zigzag_inverse(n_devices: int, n_tokens: int):
    import numpy as np

    idx = zigzag_indices(n_devices, n_tokens)
    inv = np.empty_like(idx)
    inv[idx] = np.arange(n_tokens)
    return inv


def _zz_seed(seed, ga, gb, two_n):
    """Per-(global q chunk, global kv chunk) dropout sub-seed (the zigzag
    analogue of shard_seed; kernels that span two chunks key on the pair
    that cannot collide with any single-chunk kernel — see call sites)."""
    return (
        jnp.asarray(seed, jnp.int32)
        + jnp.int32(_SHARD_SEED_PRIME) * (ga * two_n + gb).astype(jnp.int32)
    )


def _zz_forward(q, k, v, seed, *, axis_name, sm_scale, rate, interpret):
    n = lax.psum(1, axis_name)
    idx = lax.axis_index(axis_name)
    two_n = 2 * n
    S = q.shape[2]
    h = S // 2
    ga_lo, ga_hi = idx, two_n - 1 - idx

    def fwd(q_, k_, v_, seed_, causal_):
        return flash_attention_forward(
            q_, k_, v_, causal=causal_, sm_scale=sm_scale,
            dropout_rate=rate, dropout_seed=seed_ if rate else None,
            interpret=interpret,
        )

    def empty(shape_q):
        return (
            jnp.zeros(shape_q, q.dtype),
            jnp.full(shape_q[:-1], DEFAULT_MASK_VALUE, jnp.float32),
        )

    def past_block(k_blk, v_blk, src):
        # kv chunk src fully visible to BOTH local q chunks; its late
        # mirror (2n−1−src) is future to both → one kernel over local q.
        o_b, lse_b = fwd(
            q, k_blk[:, :, :h], v_blk[:, :, :h],
            _zz_seed(seed, ga_lo, src, two_n), False,
        )
        return o_b, lse_b

    def future_block(k_blk, v_blk, src):
        # kv chunks src (> idx, past of the late q chunk) and 2n−1−src
        # (also past of it: src > idx ⇒ 2n−1−src < 2n−1−idx) — one kernel
        # for the late q chunk over the whole block; early q sees nothing.
        o_hi, lse_hi = fwd(
            q[:, :, h:], k_blk, v_blk,
            _zz_seed(seed, ga_hi, src, two_n), False,
        )
        o_z, lse_z = empty(q[:, :, :h].shape)
        return (
            jnp.concatenate([o_z, o_hi], axis=2),
            jnp.concatenate([lse_z, lse_hi], axis=2),
        )

    def diag_block(k_blk, v_blk, src):
        k_lo, v_lo = k_blk[:, :, :h], v_blk[:, :, :h]
        o_lo, lse_lo = fwd(
            q[:, :, :h], k_lo, v_lo, _zz_seed(seed, ga_lo, ga_lo, two_n),
            True,
        )
        o_d, lse_d = fwd(
            q[:, :, h:], k_blk[:, :, h:], v_blk[:, :, h:],
            _zz_seed(seed, ga_hi, ga_hi, two_n), True,
        )
        o_f, lse_f = fwd(
            q[:, :, h:], k_lo, v_lo, _zz_seed(seed, ga_hi, ga_lo, two_n),
            False,
        )
        o_hi, lse_hi = merge_partials(o_d, lse_d, o_f, lse_f)
        return (
            jnp.concatenate([o_lo, o_hi], axis=2),
            jnp.concatenate([lse_lo, lse_hi], axis=2),
        )

    o = jnp.zeros(q.shape, q.dtype)
    lse = jnp.full(q.shape[:-1], DEFAULT_MASK_VALUE, jnp.float32)
    k_blk, v_blk = k, v
    perm = [(i, (i + 1) % n) for i in range(n)]

    for step in range(n):
        src = lax.rem(idx - step + n, n)
        case = jnp.where(src < idx, 0, jnp.where(src == idx, 2, 1))
        o_b, lse_b = lax.switch(
            case, [past_block, future_block, diag_block], k_blk, v_blk, src
        )
        o, lse = merge_partials(o, lse, o_b, lse_b)
        if step != n - 1:
            k_blk = lax.ppermute(k_blk, axis_name, perm)
            v_blk = lax.ppermute(v_blk, axis_name, perm)
    return o, lse


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7))
def _zz_attention(q, k, v, seed, axis_name, sm_scale, rate, interpret):
    o, _ = _zz_forward(q, k, v, seed, axis_name=axis_name,
                       sm_scale=sm_scale, rate=rate, interpret=interpret)
    return o


def _zz_attention_fwd(q, k, v, seed, axis_name, sm_scale, rate, interpret):
    o, lse = _zz_forward(q, k, v, seed, axis_name=axis_name,
                         sm_scale=sm_scale, rate=rate, interpret=interpret)
    return o, (q, k, v, seed, o, lse)


def _zz_attention_bwd(axis_name, sm_scale, rate, interpret, res, do):
    """Zigzag backward: same balanced case structure as the forward; dK/dV
    accumulators ride the ring with their block (full lap, as the
    contiguous ring backward)."""
    from ..ops.flash_attention import flash_attention_backward

    q, k, v, seed, o, lse = res
    n = lax.psum(1, axis_name)
    idx = lax.axis_index(axis_name)
    two_n = 2 * n
    S = q.shape[2]
    h = S // 2
    ga_lo, ga_hi = idx, two_n - 1 - idx

    def bwd(q_, k_, v_, o_, do_, lse_, seed_, causal_):
        return flash_attention_backward(
            q_, k_, v_, o_, do_, lse_, causal=causal_, sm_scale=sm_scale,
            dropout_rate=rate, dropout_seed=seed_ if rate else None,
            interpret=interpret,
        )

    q_lo, q_hi = q[:, :, :h], q[:, :, h:]
    o_lo, o_hi = o[:, :, :h], o[:, :, h:]
    do_lo, do_hi = do[:, :, :h], do[:, :, h:]
    lse_lo, lse_hi = lse[:, :, :h], lse[:, :, h:]

    def zeros_kv_half():
        return (jnp.zeros((*k.shape[:2], h, k.shape[3]), k.dtype),
                jnp.zeros((*v.shape[:2], h, v.shape[3]), v.dtype))

    def past_block(k_blk, v_blk, src):
        dq_c, dk_lo, dv_lo = bwd(
            q, k_blk[:, :, :h], v_blk[:, :, :h], o, do, lse,
            _zz_seed(seed, ga_lo, src, two_n), False,
        )
        z_k, z_v = zeros_kv_half()
        return (
            dq_c,
            jnp.concatenate([dk_lo, z_k], axis=2),
            jnp.concatenate([dv_lo, z_v], axis=2),
        )

    def future_block(k_blk, v_blk, src):
        dq_hi, dk_b, dv_b = bwd(
            q_hi, k_blk, v_blk, o_hi, do_hi, lse_hi,
            _zz_seed(seed, ga_hi, src, two_n), False,
        )
        dq_z = jnp.zeros(q_lo.shape, q.dtype)
        return jnp.concatenate([dq_z, dq_hi], axis=2), dk_b, dv_b

    def diag_block(k_blk, v_blk, src):
        k_lo, v_lo = k_blk[:, :, :h], v_blk[:, :, :h]
        dq_lo, dk1, dv1 = bwd(
            q_lo, k_lo, v_lo, o_lo, do_lo, lse_lo,
            _zz_seed(seed, ga_lo, ga_lo, two_n), True,
        )
        dq_d, dk_hi, dv_hi = bwd(
            q_hi, k_blk[:, :, h:], v_blk[:, :, h:], o_hi, do_hi, lse_hi,
            _zz_seed(seed, ga_hi, ga_hi, two_n), True,
        )
        dq_f, dk2, dv2 = bwd(
            q_hi, k_lo, v_lo, o_hi, do_hi, lse_hi,
            _zz_seed(seed, ga_hi, ga_lo, two_n), False,
        )
        return (
            jnp.concatenate([dq_lo, dq_d + dq_f], axis=2),
            jnp.concatenate(
                [(dk1.astype(jnp.float32) + dk2.astype(jnp.float32)
                  ).astype(k.dtype), dk_hi], axis=2),
            jnp.concatenate(
                [(dv1.astype(jnp.float32) + dv2.astype(jnp.float32)
                  ).astype(v.dtype), dv_hi], axis=2),
        )

    dq = jnp.zeros(q.shape, jnp.float32)
    dk_blk = jnp.zeros(k.shape, jnp.float32)
    dv_blk = jnp.zeros(v.shape, jnp.float32)
    k_blk, v_blk = k, v
    perm = [(i, (i + 1) % n) for i in range(n)]

    for step in range(n):
        src = lax.rem(idx - step + n, n)
        case = jnp.where(src < idx, 0, jnp.where(src == idx, 2, 1))
        dq_p, dk_p, dv_p = lax.switch(
            case, [past_block, future_block, diag_block], k_blk, v_blk, src
        )
        dq = dq + dq_p.astype(jnp.float32)
        dk_blk = dk_blk + dk_p.astype(jnp.float32)
        dv_blk = dv_blk + dv_p.astype(jnp.float32)
        k_blk = lax.ppermute(k_blk, axis_name, perm)
        v_blk = lax.ppermute(v_blk, axis_name, perm)
        dk_blk = lax.ppermute(dk_blk, axis_name, perm)
        dv_blk = lax.ppermute(dv_blk, axis_name, perm)
    return (
        dq.astype(q.dtype), dk_blk.astype(k.dtype), dv_blk.astype(v.dtype),
        None,
    )


_zz_attention.defvjp(_zz_attention_fwd, _zz_attention_bwd)


def zigzag_ring_attention(
    q,
    k,
    v,
    *,
    axis_name: str,
    sm_scale: Optional[float] = None,
    dropout_rate: float = 0.0,
    dropout_seed=None,
    interpret: Optional[bool] = None,
):
    """Load-balanced CAUSAL context-parallel attention (call inside
    shard_map).  The local shards must be in ZIGZAG layout: chip i holds
    global chunks (i, 2n−1−i) concatenated, chunk length = local_len/2 —
    see ``zigzag_indices``.  Production trainers keep activations in this
    layout end-to-end (everything outside attention is position-pointwise;
    RoPE uses the zigzag position ids); ``sharded_attention(mesh,
    "zigzag")`` does the permute/unpermute at the boundary for callers
    that hold contiguous sequences.

    Always causal (a non-causal ring has no balance problem — use
    ``ring_attention``).
    """
    if sm_scale is None:
        sm_scale = float(q.shape[-1]) ** -0.5
    if q.shape[2] != k.shape[2]:
        raise ValueError(
            "zigzag ring attention requires equal q/kv shard lengths; got "
            f"Nq_shard={q.shape[2]} vs Nkv_shard={k.shape[2]}"
        )
    if q.shape[2] % 2:
        raise ValueError("zigzag shards hold two chunks: local length "
                         f"must be even, got {q.shape[2]}")
    rate = float(dropout_rate)
    if rate and dropout_seed is None:
        raise ValueError("dropout_rate > 0 requires dropout_seed")
    seed = jnp.asarray(
        dropout_seed if dropout_seed is not None else 0, jnp.int32
    ).reshape(())
    return _zz_attention(
        q, k, v, seed, axis_name, float(sm_scale), rate, interpret
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
