"""GSPMD partitioning rules for the flash-attention op.

Pallas kernels lower to opaque custom calls, so under ``jit`` with sharded
operands XLA's only safe default is to ALL-GATHER the inputs and run the
kernel replicated — measured on the dp×tp train step: q/k/v gathered over
the model axis and attention duplicated on every tensor-parallel chip.
This module gives the op real partitioning semantics instead
(``jax.experimental.custom_partitioning``, the same mechanism JAX's cuDNN
attention uses): attention is embarrassingly parallel over (batch, head),
so those dims shard freely — including GQA, where the q-head dim factors
as (kv_heads, group) so a head sharding stays co-located with its KV group
— and sequence/head_dim shardings are re-gathered (ring attention in
``parallel/`` is the sequence-sharding path).

Dropout composes: each shard folds its (batch, head) mesh coordinates into
the seed (the in-kernel mask is a function of shard-LOCAL indices, which
repeat across shards; folding keeps masks independent mesh-wide, same
argument as parallel/sharded_attention).

The wrappers preserve the existing dispatch exactly — the same statics the
custom_vjp carries select the same kernel routes on each shard.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental.custom_partitioning import (
    SdyShardingRule,
    custom_partitioning,
)
from jax._src.custom_partitioning_sharding_rule import (
    ArrayMapping,
    CompoundFactor,
)
from jax.sharding import NamedSharding, PartitionSpec as P

# Escape hatch: FA_TPU_NO_PARTITIONING=1 bypasses the wrappers entirely
# (callers fall back to the direct implementations, restoring round-1
# gather-and-replicate GSPMD behavior).  Debugging aid for partitioner
# issues on new jax/XLA versions.
ENABLED = os.environ.get("FA_TPU_NO_PARTITIONING", "0") != "1"

# Distinct from the shard_map-layer primes (parallel/): a partitioned op
# can appear beside those folds and the offsets must not structurally
# collide.
_CP_SEED_PRIME = 49979687


def _padded_spec(arg):
    spec = None if arg.sharding is None else arg.sharding.spec
    nd = arg.ndim
    if spec is None:
        return (None,) * nd
    return tuple(spec) + (None,) * (nd - len(spec))


def _axes_size(mesh, ax) -> int:
    if ax is None:
        return 1
    axes = ax if isinstance(ax, tuple) else (ax,)
    n = 1
    for a in axes:
        n *= mesh.shape[a]
    return n


def _plan(mesh, q_info, k_info, head_shardable=True):
    """(b_ax, h_ax): the supported sharding — batch from q's dim-0 spec,
    heads from q's (falling back to k's) dim-1 spec when the axis size
    divides BOTH head counts (GQA co-location).  Everything else —
    sequence dims, head_dim — is re-gathered by the arg shardings.
    ``head_shardable=False`` (ALiBi: the per-head slope tuple is static and
    indexed by LOCAL head id) forces head replication."""
    qs, ks = _padded_spec(q_info), _padded_spec(k_info)
    hq, hkv = q_info.shape[1], k_info.shape[1]
    b_ax = qs[0] if qs[0] is not None else ks[0]
    h_ax = qs[1] if qs[1] is not None else ks[1]
    if not head_shardable:
        h_ax = None
    if h_ax is not None and b_ax is not None:
        # a mesh axis may appear at most once in a spec: if mixed operand
        # specs put the same axis on batch and heads, heads replicate
        def names(ax):
            return set(ax) if isinstance(ax, tuple) else {ax}

        if names(h_ax) & names(b_ax):
            h_ax = None
    if h_ax is not None:
        n = _axes_size(mesh, h_ax)
        if hq % n or hkv % n:
            h_ax = None
    return b_ax, h_ax


def _fold_seed(seed, b_ax, h_ax, mesh):
    """Fold this shard's (batch, head) coordinates into the dropout seed."""
    flat = jnp.int32(0)
    for ax in (b_ax, h_ax):
        if ax is None:
            continue
        axes = ax if isinstance(ax, tuple) else (ax,)
        for a in axes:
            flat = flat * mesh.shape[a] + jax.lax.axis_index(a)
    return jnp.asarray(seed, jnp.int32) + jnp.int32(_CP_SEED_PRIME) * flat


def _pack(seg, seed):
    """Optional operands flattened to a fixed tail: (*segs, *seed)."""
    tail = ()
    if seg is not None:
        tail += (seg.q, seg.kv)
    if seed is not None:
        tail += (jnp.asarray(seed, jnp.int32).reshape(()),)
    return tail


def _unpack(args, n_lead, has_seg, has_seed):
    from .flash_attention import SegmentIds

    i = n_lead
    seg = seed = None
    if has_seg:
        seg = SegmentIds(q=args[i], kv=args[i + 1])
        i += 2
    if has_seed:
        seed = args[i]
        i += 1
    assert i == len(args), (i, len(args))
    return seg, seed


def _tail_specs(b_ax, has_seg, has_seed):
    """PartitionSpecs for the optional tail (segments batch-sharded like q,
    seed replicated)."""
    specs = ()
    if has_seg:
        specs += (P(b_ax, None), P(b_ax, None))
    if has_seed:
        specs += (P(),)
    return specs


def _tail_mappings(start, has_seg, has_seed):
    """Shardy mappings for the tail: seg [B, N*] shares only the batch
    factor (sequence factors stay private so they cannot propagate a
    sequence sharding we would immediately re-gather); seed is scalar."""
    maps = ()
    n = start
    if has_seg:
        maps += (ArrayMapping("b", f"sq{n}"), ArrayMapping("b", f"skv{n}"))
    if has_seed:
        maps += (ArrayMapping(),)
    return maps


def _q_mapping(g: int):
    head = CompoundFactor("hkv", "g") if g > 1 else "hkv"
    return head


@functools.lru_cache(maxsize=None)
def partitioned_forward(causal, sm_scale, window, softcap, alibi, rate,
                        block_sizes, small, xla_small, interpret,
                        has_seg, has_seed, save_residuals):
    """custom_partitioning-wrapped forward for one static configuration.

    Call with the flattened operands: (q, k, v, *segs, *seed)."""
    from .flash_attention import _forward_impl

    def _impl(q, k, v, tail, seed_override):
        seg, seed = _unpack((q, k, v) + tail, 3, has_seg, has_seed)
        if seed_override is not None:
            seed = seed_override
        o, stats = _forward_impl(
            q, k, v, seg, causal, sm_scale, window, softcap, alibi, rate,
            seed, block_sizes, small, xla_small, interpret,
            save_residuals=save_residuals,
        )
        # stats = (m2, linv): the kernels' raw softmax stats, flattened into
        # two lse-shaped [B, H, Nq] outputs (see flash_attention.stats_to_lse)
        return (o, *stats) if save_residuals else o

    def impl(q, k, v, *tail):
        return _impl(q, k, v, tail, None)

    cp = custom_partitioning(impl)

    head_ok = alibi is None

    def infer(mesh, arg_shapes, result_shape):
        b_ax, h_ax = _plan(mesh, arg_shapes[0], arg_shapes[1], head_ok)
        o_sh = NamedSharding(mesh, P(b_ax, h_ax, None, None))
        if not save_residuals:
            return o_sh
        stat_sh = NamedSharding(mesh, P(b_ax, h_ax, None))
        return (o_sh, stat_sh, stat_sh)

    def partition(mesh, arg_shapes, result_shape):
        b_ax, h_ax = _plan(mesh, arg_shapes[0], arg_shapes[1], head_ok)
        qkv = tuple(
            NamedSharding(mesh, P(b_ax, h_ax, None, None)) for _ in range(3)
        )
        tail = tuple(
            NamedSharding(mesh, s) for s in _tail_specs(b_ax, has_seg, has_seed)
        )
        o_sh = NamedSharding(mesh, P(b_ax, h_ax, None, None))
        stat_sh = NamedSharding(mesh, P(b_ax, h_ax, None))
        out_sh = (o_sh, stat_sh, stat_sh) if save_residuals else o_sh

        def lower(q, k, v, *tail_args):
            override = None
            if rate and (b_ax is not None or h_ax is not None):
                _, seed = _unpack((q, k, v) + tail_args, 3, has_seg, has_seed)
                override = _fold_seed(seed, b_ax, h_ax, mesh)
            return _impl(q, k, v, tail_args, override)

        return mesh, lower, out_sh, qkv + tail

    def shardy(mesh, value_types, result_types):
        g = value_types[0].shape[1] // value_types[1].shape[1]
        hq_f = _q_mapping(g) if head_ok else "hq_q"
        hkv_f = "hkv" if head_ok else "hkv_k"
        # seq/head_dim factors are PRIVATE per tensor: only batch/head
        # shardings may propagate through the op (anything else we would
        # re-gather — and sub-axis splits of them are inexpressible in the
        # partition callbacks).
        q_map = ArrayMapping("b", hq_f, "n_q", "d_q")
        k_map = ArrayMapping("b", hkv_f, "n_k", "d_k")
        v_map = ArrayMapping("b", hkv_f, "n_v", "d_v")
        maps = (q_map, k_map, v_map) + _tail_mappings(3, has_seg, has_seed)
        outs = (ArrayMapping("b", hq_f, "n_o", "d_o"),)
        if save_residuals:
            outs += (ArrayMapping("b", hq_f, "n_m"),
                     ArrayMapping("b", hq_f, "n_li"),)
        kw = {"g": g} if (g > 1 and head_ok) else {}
        return SdyShardingRule(maps, outs, **kw)

    cp.def_partition(infer_sharding_from_operands=infer, partition=partition,
                     sharding_rule=shardy)
    return cp


def _make_backward_cp(local_impl, head_ok, rate, has_seg, has_seed):
    """Wrap a local (dq, dk, dv) impl — signature
    (q, k, v, o, do, m2, linv, tail, seed_override) — with the (batch,
    head) partition rules.  Operands: (q, k, v, o, do, m2, linv, *segs,
    *seed); m2/linv are the forward's raw softmax stats (lse-shaped)."""

    def impl(q, k, v, o, do, m2, linv, *tail):
        return local_impl(q, k, v, o, do, m2, linv, tail, None)

    cp = custom_partitioning(impl)

    def shardings(mesh, arg_shapes):
        b_ax, h_ax = _plan(mesh, arg_shapes[0], arg_shapes[1], head_ok)
        q_sh = NamedSharding(mesh, P(b_ax, h_ax, None, None))
        stat_sh = NamedSharding(mesh, P(b_ax, h_ax, None))
        args = (q_sh, q_sh, q_sh, q_sh, q_sh, stat_sh, stat_sh) + tuple(
            NamedSharding(mesh, s) for s in _tail_specs(b_ax, has_seg, has_seed)
        )
        outs = (q_sh, q_sh, q_sh)
        return b_ax, h_ax, args, outs

    def infer(mesh, arg_shapes, result_shape):
        _, _, _, outs = shardings(mesh, arg_shapes)
        return outs

    def partition(mesh, arg_shapes, result_shape):
        b_ax, h_ax, args, outs = shardings(mesh, arg_shapes)

        def lower(q, k, v, o, do, m2, linv, *tail_args):
            override = None
            if rate and (b_ax is not None or h_ax is not None):
                _, seed = _unpack(
                    (q, k, v, o, do, m2, linv) + tail_args, 7,
                    has_seg, has_seed)
                override = _fold_seed(seed, b_ax, h_ax, mesh)
            return local_impl(q, k, v, o, do, m2, linv, tail_args, override)

        return mesh, lower, outs, args

    def shardy(mesh, value_types, result_types):
        g = value_types[0].shape[1] // value_types[1].shape[1]
        hq_f = _q_mapping(g) if head_ok else "hq_q"
        hkv_f = "hkv" if head_ok else "hkv_k"
        # Private seq/head_dim factors, as in the forward rule.
        def m4(h_f, tag):
            return ArrayMapping("b", h_f, f"n_{tag}", f"d_{tag}")

        maps = (
            m4(hq_f, "q"), m4(hkv_f, "k"), m4(hkv_f, "v"),
            m4(hq_f, "o"), m4(hq_f, "g"),
            ArrayMapping("b", hq_f, "n_m"),
            ArrayMapping("b", hq_f, "n_li"),
        ) + _tail_mappings(7, has_seg, has_seed)
        outs = (m4(hq_f, "dq"), m4(hkv_f, "dk"), m4(hkv_f, "dv"))
        kw = {"g": g} if (g > 1 and head_ok) else {}
        return SdyShardingRule(maps, outs, **kw)

    cp.def_partition(infer_sharding_from_operands=infer, partition=partition,
                     sharding_rule=shardy)
    return cp


@functools.lru_cache(maxsize=None)
def partitioned_backward(causal, sm_scale, window, softcap, alibi, rate,
                         block_sizes, small, interpret, has_seg, has_seed):
    """custom_partitioning-wrapped backward for the custom_vjp's non-XLA
    dispatch (incl. the fused short-sequence route).  The tiny-N XLA route
    never reaches here — pure-XLA math partitions natively (and its global
    iotas keep dropout exact under GSPMD)."""
    from .flash_attention import _backward_small, _backward_unpartitioned

    def local_impl(q, k, v, o, do, m2, linv, tail, seed_override):
        seg, seed = _unpack(
            (q, k, v, o, do, m2, linv) + tail, 7, has_seg, has_seed)
        if seed_override is not None:
            seed = seed_override
        if small and max(q.shape[2], k.shape[2]) <= 320:
            return _backward_small(
                q, k, v, do, seg, causal, sm_scale, window, softcap,
                interpret,
            )
        return _backward_unpartitioned(
            q, k, v, o, do, m2, linv,
            causal=causal, sm_scale=sm_scale, segment_ids=seg, window=window,
            logit_softcap=softcap, alibi_slopes=alibi,
            dropout_rate=rate, dropout_seed=seed,
            block_sizes=block_sizes, interpret=interpret,
        )

    return _make_backward_cp(local_impl, alibi is None, rate, has_seg,
                             has_seed)


@functools.lru_cache(maxsize=None)
def partitioned_backward_public(causal, sm_scale, window, softcap, alibi,
                                rate, block_sizes, interpret, has_seg,
                                has_seed):
    """custom_partitioning wrapper for the PUBLIC functional backward
    (flash_attention_backward): honors the passed lse on every shard."""
    from .flash_attention import _backward_unpartitioned

    def local_impl(q, k, v, o, do, m2, linv, tail, seed_override):
        seg, seed = _unpack(
            (q, k, v, o, do, m2, linv) + tail, 7, has_seg, has_seed)
        if seed_override is not None:
            seed = seed_override
        return _backward_unpartitioned(
            q, k, v, o, do, m2, linv,
            causal=causal, sm_scale=sm_scale, segment_ids=seg, window=window,
            logit_softcap=softcap, alibi_slopes=alibi,
            dropout_rate=rate, dropout_seed=seed,
            block_sizes=block_sizes, interpret=interpret,
        )

    return _make_backward_cp(local_impl, alibi is None, rate, has_seg,
                             has_seed)


# ---------------------------------------------------------------------------
# Paged decode attention (serving path)
# ---------------------------------------------------------------------------


def _decode_plan(mesh, q_info, k_info):
    """(b_ax, h_ax) for paged decode: batch from q's dim-0 spec; kv-head
    from the pool's dim-0 (falling back to q's dim-1) when the axis size
    divides both head counts.  Page-pool/page/head_dim shardings re-gather
    via the arg shardings (context sharding is the shard_map path in
    parallel/sharded_decode)."""
    qs, ks = _padded_spec(q_info), _padded_spec(k_info)
    b_ax = qs[0]
    h_ax = ks[0] if ks[0] is not None else qs[1]
    if h_ax is not None and b_ax is not None:
        def names(ax):
            return set(ax) if isinstance(ax, tuple) else {ax}

        if names(h_ax) & names(b_ax):
            h_ax = None
    if h_ax is not None:
        n = _axes_size(mesh, h_ax)
        hq, hkv = q_info.shape[1], k_info.shape[0]
        if hq % n or hkv % n:
            h_ax = None
    return b_ax, h_ax


@functools.lru_cache(maxsize=None)
def partitioned_paged_decode(has_scales, sm_scale, pages_per_block, int4,
                             return_lse, softcap, interpret):
    """custom_partitioning wrapper for single-token paged decode attention.

    Shardable dims: q batch (lengths/page tables shard along; pools
    replicate) and kv heads (pools shard on dim 0; q heads factor as
    (kv_heads, group) so GQA groups stay co-located with their pool shard).
    This is what lets the WHOLE decode step jit under a tp mesh without
    per-layer shard_map plumbing — XLA sees real partitioning semantics for
    the Pallas call instead of gather-and-replicate.  ALiBi bypasses the
    wrapper in the caller (static slopes index LOCAL head ids)."""
    from .decode import _paged_decode_local

    def impl(q, k_vals, v_vals, *rest):
        if has_scales:
            k_sc, v_sc, lengths, page_indices = rest
        else:
            k_sc = v_sc = None
            lengths, page_indices = rest
        return _paged_decode_local(
            q, k_vals, v_vals, k_sc, v_sc, lengths, page_indices,
            sm_scale=sm_scale, pages_per_block=pages_per_block, int4=int4,
            return_lse=return_lse, softcap=softcap, interpret=interpret,
        )

    cp = custom_partitioning(impl)

    def shardings(mesh, arg_shapes):
        b_ax, h_ax = _decode_plan(mesh, arg_shapes[0], arg_shapes[1])
        q_sh = NamedSharding(mesh, P(b_ax, h_ax, None))
        pool_sh = NamedSharding(mesh, P(h_ax, None, None, None))
        args = (q_sh, pool_sh, pool_sh)
        if has_scales:
            args += (pool_sh, pool_sh)
        args += (
            NamedSharding(mesh, P(b_ax)),
            NamedSharding(mesh, P(b_ax, None)),
        )
        outs = (
            (q_sh, NamedSharding(mesh, P(b_ax, h_ax)))
            if return_lse else q_sh
        )
        return args, outs

    def infer(mesh, arg_shapes, result_shape):
        _, outs = shardings(mesh, arg_shapes)
        return outs

    def partition(mesh, arg_shapes, result_shape):
        args, outs = shardings(mesh, arg_shapes)
        return mesh, impl, outs, args

    def shardy(mesh, value_types, result_types):
        g = value_types[0].shape[1] // value_types[1].shape[0]
        hq_f = CompoundFactor("hkv", "g") if g > 1 else "hkv"
        maps = (
            ArrayMapping("b", hq_f, "d_q"),
            ArrayMapping("hkv", "p_k", "ps_k", "d_k"),
            ArrayMapping("hkv", "p_v", "ps_v", "d_v"),
        )
        if has_scales:
            maps += (
                ArrayMapping("hkv", "p_ks", "ps_ks", "d_ks"),
                ArrayMapping("hkv", "p_vs", "ps_vs", "d_vs"),
            )
        maps += (ArrayMapping("b"), ArrayMapping("b", "pps"))
        outs = (ArrayMapping("b", hq_f, "d_o"),)
        if return_lse:
            outs += (ArrayMapping("b", hq_f),)
        kw = {"g": g} if g > 1 else {}
        return SdyShardingRule(maps, outs, **kw)

    cp.def_partition(infer_sharding_from_operands=infer, partition=partition,
                     sharding_rule=shardy)
    return cp
