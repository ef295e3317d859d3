"""shard_map wrappers: attention laid out over a device mesh.

The scale-out layer the reference never had (single CUDA device asserted at
reference: src/flash_attention_torch.py:25-26; SURVEY.md §2.2).  Strategies:

- ``head``      — Q/K/V heads sharded over a model axis; zero communication
                  during attention (GQA co-locates each KV head with its Q
                  group, boom-guide §14).
- ``data``      — batch sharded; embarrassingly parallel.
- ``ring``      — KV sequence sharded over a context axis; ring attention
                  (ppermute rotation overlapped with compute).
- ``combine``   — KV sequence sharded; partial attention + one logaddexp
                  all-reduce (decode-friendly, q replicated).

All return jitted callables closed over the mesh.  Axes missing from the
mesh are treated as size-1 (the wrappers work unchanged from 1 chip to a
multi-host slice).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ..ops.flash_attention import flash_attention
from .ring import context_parallel_attention, ring_attention, shard_seed


# Distinct from ring.shard_seed's prime: ring_context_attention composes
# both folds additively, and distinct primes keep (data/model shard id,
# ring step id) offsets from structurally colliding.
_DM_SEED_PRIME = 32452843


def _fold_axes(seed, axis_a: Optional[str], axis_b: Optional[str],
               mesh: Mesh):
    """Fold up to two mesh-axis coordinates into a dropout seed as ONE
    flattened shard id (shard-local (b, h) indices repeat across shards;
    distinct sub-seeds keep the masks independent; flattening — not summing
    — keeps (1, 0) and (0, 1) distinct).  Axes absent from the mesh
    contribute coordinate 0."""
    def coord(axis):
        if axis is None or axis not in mesh.axis_names:
            return jnp.int32(0), 1
        return lax.axis_index(axis), lax.psum(1, axis)

    ia, _ = coord(axis_a)
    ib, nb = coord(axis_b)
    flat = (ia * nb + ib).astype(jnp.int32)
    return jnp.asarray(seed, jnp.int32) + jnp.int32(_DM_SEED_PRIME) * flat


def head_parallel_attention(
    mesh: Mesh,
    *,
    causal: bool = False,
    sm_scale: Optional[float] = None,
    data_axis: Optional[str] = "data",
    model_axis: str = "model",
    dropout_rate: float = 0.0,
    interpret: Optional[bool] = None,
):
    """Heads on `model_axis`, batch on `data_axis`; no collectives inside.

    With ``dropout_rate > 0`` the returned callable takes a 4th argument —
    an int32 ``dropout_seed`` (fresh per step); each shard derives its own
    sub-seed from its mesh coordinates."""
    in_spec = P(data_axis, model_axis, None, None)
    rate = float(dropout_rate)

    def local(q, k, v, seed=None):
        if rate:
            seed = _fold_axes(seed, data_axis, model_axis, mesh)
        return flash_attention(
            q, k, v, causal=causal, sm_scale=sm_scale,
            dropout_rate=rate, dropout_seed=seed, interpret=interpret,
        )

    return jax.jit(
        shard_map(
            local,
            mesh=mesh,
            in_specs=(in_spec,) * 3 + ((P(),) if rate else ()),
            out_specs=in_spec,
            check_vma=False,
        )
    )


def ring_context_attention(
    mesh: Mesh,
    *,
    causal: bool = False,
    sm_scale: Optional[float] = None,
    data_axis: Optional[str] = "data",
    context_axis: str = "context",
    model_axis: Optional[str] = None,
    dropout_rate: float = 0.0,
    interpret: Optional[bool] = None,
):
    """Sequence sharded over `context_axis` (+ optional head/data sharding):
    ring attention rotates KV shards around the ICI ring.

    With ``dropout_rate > 0`` the callable takes a 4th int32 seed argument;
    sub-seeds fold in the data/model shard AND (inside ring_attention) the
    (q shard, kv shard) pair, so every mask is independent mesh-wide."""
    q_spec = P(data_axis, model_axis, context_axis, None)
    kv_spec = P(data_axis, model_axis, context_axis, None)
    rate = float(dropout_rate)

    def local(q, k, v, seed=None):
        if rate:
            seed = _fold_axes(seed, data_axis, model_axis, mesh)
        return ring_attention(
            q, k, v,
            axis_name=context_axis, causal=causal, sm_scale=sm_scale,
            dropout_rate=rate, dropout_seed=seed,
            interpret=interpret,
        )

    return jax.jit(
        shard_map(
            local,
            mesh=mesh,
            in_specs=(q_spec, kv_spec, kv_spec) + ((P(),) if rate else ()),
            out_specs=q_spec,
            check_vma=False,
        )
    )


def zigzag_context_attention(
    mesh: Mesh,
    *,
    sm_scale: Optional[float] = None,
    data_axis: Optional[str] = "data",
    context_axis: str = "context",
    model_axis: Optional[str] = None,
    dropout_rate: float = 0.0,
    interpret: Optional[bool] = None,
):
    """Load-balanced CAUSAL context parallelism: the sequence is permuted
    into the zigzag layout (chip i holds global chunks (i, 2n−1−i) — every
    chip does equal work per ring step, vs the contiguous ring's 1:n
    skew), ring-rotated, and the output permuted back.

    The boundary permutes are one gather each way; a production trainer
    keeps activations zigzag end-to-end instead (attention is the only
    position-coupled op) and calls ``zigzag_ring_attention`` directly."""
    from .ring import zigzag_ring_attention, zigzag_indices, zigzag_inverse

    q_spec = P(data_axis, model_axis, context_axis, None)
    kv_spec = P(data_axis, model_axis, context_axis, None)
    rate = float(dropout_rate)
    n_ctx = mesh.shape[context_axis]

    def local(q, k, v, seed=None):
        if rate:
            seed = _fold_axes(seed, data_axis, model_axis, mesh)
        return zigzag_ring_attention(
            q, k, v,
            axis_name=context_axis, sm_scale=sm_scale,
            dropout_rate=rate, dropout_seed=seed,
            interpret=interpret,
        )

    inner = shard_map(
        local,
        mesh=mesh,
        in_specs=(q_spec, kv_spec, kv_spec) + ((P(),) if rate else ()),
        out_specs=q_spec,
        check_vma=False,
    )

    def call(q, k, v, *rest):
        n_tok = q.shape[2]
        zz = jnp.asarray(zigzag_indices(n_ctx, n_tok))
        inv = jnp.asarray(zigzag_inverse(n_ctx, n_tok))
        o = inner(
            jnp.take(q, zz, axis=2),
            jnp.take(k, zz, axis=2),
            jnp.take(v, zz, axis=2),
            *rest,
        )
        return jnp.take(o, inv, axis=2)

    return jax.jit(call)


def combine_context_attention(
    mesh: Mesh,
    *,
    sm_scale: Optional[float] = None,
    data_axis: Optional[str] = "data",
    context_axis: str = "context",
    dropout_rate: float = 0.0,
    interpret: Optional[bool] = None,
):
    """Q replicated over context, KV sharded; one all-reduce to combine."""
    q_spec = P(data_axis, None, None, None)
    kv_spec = P(data_axis, None, context_axis, None)
    rate = float(dropout_rate)

    def local(q, k, v, seed=None):
        if rate:
            seed = _fold_axes(seed, data_axis, None, mesh)
        return context_parallel_attention(
            q, k, v, axis_name=context_axis, sm_scale=sm_scale,
            dropout_rate=rate, dropout_seed=seed,
            interpret=interpret,
        )

    return jax.jit(
        shard_map(
            local,
            mesh=mesh,
            in_specs=(q_spec, kv_spec, kv_spec) + ((P(),) if rate else ()),
            out_specs=q_spec,
            check_vma=False,
        )
    )


def sharded_attention(mesh: Mesh, strategy: str = "head", **kw):
    """Factory over the strategies above."""
    builders = {
        "head": head_parallel_attention,
        "data": functools.partial(head_parallel_attention, model_axis=None),
        "ring": ring_context_attention,
        "zigzag": zigzag_context_attention,
        "combine": combine_context_attention,
    }
    if strategy not in builders:
        raise ValueError(f"unknown strategy {strategy!r}; have {sorted(builders)}")
    return builders[strategy](mesh, **kw)
