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
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ..ops.flash_attention import flash_attention
from .ring import context_parallel_attention, ring_attention


def head_parallel_attention(
    mesh: Mesh,
    *,
    causal: bool = False,
    sm_scale: Optional[float] = None,
    data_axis: Optional[str] = "data",
    model_axis: str = "model",
    interpret: Optional[bool] = None,
):
    """Heads on `model_axis`, batch on `data_axis`; no collectives inside."""
    in_spec = P(data_axis, model_axis, None, None)

    def local(q, k, v):
        return flash_attention(
            q, k, v, causal=causal, sm_scale=sm_scale, interpret=interpret
        )

    return jax.jit(
        shard_map(
            local,
            mesh=mesh,
            in_specs=(in_spec, in_spec, in_spec),
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
    interpret: Optional[bool] = None,
):
    """Sequence sharded over `context_axis` (+ optional head/data sharding):
    ring attention rotates KV shards around the ICI ring."""
    q_spec = P(data_axis, model_axis, context_axis, None)
    kv_spec = P(data_axis, model_axis, context_axis, None)

    def local(q, k, v):
        return ring_attention(
            q, k, v,
            axis_name=context_axis, causal=causal, sm_scale=sm_scale,
            interpret=interpret,
        )

    return jax.jit(
        shard_map(
            local,
            mesh=mesh,
            in_specs=(q_spec, kv_spec, kv_spec),
            out_specs=q_spec,
            check_vma=False,
        )
    )


def combine_context_attention(
    mesh: Mesh,
    *,
    sm_scale: Optional[float] = None,
    data_axis: Optional[str] = "data",
    context_axis: str = "context",
    interpret: Optional[bool] = None,
):
    """Q replicated over context, KV sharded; one all-reduce to combine."""
    q_spec = P(data_axis, None, None, None)
    kv_spec = P(data_axis, None, context_axis, None)

    def local(q, k, v):
        return context_parallel_attention(
            q, k, v, axis_name=context_axis, sm_scale=sm_scale,
            interpret=interpret,
        )

    return jax.jit(
        shard_map(
            local,
            mesh=mesh,
            in_specs=(q_spec, kv_spec, kv_spec),
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
        "combine": combine_context_attention,
    }
    if strategy not in builders:
        raise ValueError(f"unknown strategy {strategy!r}; have {sorted(builders)}")
    return builders[strategy](mesh, **kw)
