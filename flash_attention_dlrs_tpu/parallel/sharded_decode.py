"""Mesh-sharded paged decode: KV-head-parallel serving over ICI.

North-star scale-out for the decode path: KV pages tensor-sharded over the
model axis (each chip owns Hkv/tp heads' pages — GQA co-locates the matching
Q-head groups), batch optionally sharded over data.  Zero collectives inside
the attention itself; the output is already correctly placed for the
(model-sharded) output projection's psum.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from ..ops.decode import paged_decode_attention
from ..ops.quantization import Int4QuantizedTensor, QuantizedTensor


def head_sharded_paged_decode(
    mesh: Mesh,
    *,
    sm_scale: Optional[float] = None,
    pages_per_block: int | None = None,
    data_axis: Optional[str] = "data",
    model_axis: str = "model",
    quantized: bool = False,
    interpret: Optional[bool] = None,
):
    """Returns jitted (q, k_pages, v_pages, lengths, page_indices) -> o with
    q heads and KV-head page pools sharded over `model_axis`.

    q: [B, Hq, d] — heads sharded; pages: [Hkv, P, page_size, d] — heads
    sharded (every chip holds the full page pool for ITS heads, so page
    indices are chip-local-identical and need no translation).
    """

    def local(q, k_pages, v_pages, k_scales, v_scales, lengths, page_indices):
        if quantized == "int4":
            kp = Int4QuantizedTensor(k_pages, k_scales)
            vp = Int4QuantizedTensor(v_pages, v_scales)
        elif quantized:
            kp = QuantizedTensor(k_pages, k_scales)
            vp = QuantizedTensor(v_pages, v_scales)
        else:
            kp, vp = k_pages, v_pages
        return paged_decode_attention(
            q, kp, vp, lengths, page_indices,
            sm_scale=sm_scale, pages_per_block=pages_per_block,
            interpret=interpret,
        )

    q_spec = P(data_axis, model_axis, None)
    pages_spec = P(model_axis, None, None, None)
    scalar_spec = P(data_axis)
    tbl_spec = P(data_axis, None)

    mapped = shard_map(
        local,
        mesh=mesh,
        in_specs=(
            q_spec, pages_spec, pages_spec, pages_spec, pages_spec,
            scalar_spec, tbl_spec,
        ),
        out_specs=q_spec,
        check_vma=False,
    )

    def call(q, k_pages, v_pages, lengths, page_indices):
        if isinstance(k_pages, (QuantizedTensor, Int4QuantizedTensor)):
            return jax.jit(mapped)(
                q, k_pages.values, v_pages.values,
                k_pages.scales, v_pages.scales, lengths, page_indices,
            )
        import jax.numpy as jnp

        dummy_k = jnp.ones((*k_pages.shape[:3], 1), jnp.float32)
        return jax.jit(mapped)(
            q, k_pages, v_pages, dummy_k, dummy_k, lengths, page_indices
        )

    return call


def context_sharded_paged_decode(
    mesh: Mesh,
    *,
    sm_scale: Optional[float] = None,
    pages_per_block: int | None = None,
    context_axis: str = "context",
    quantized: bool = False,
    interpret: Optional[bool] = None,
):
    """Context-sharded decode for sequences whose KV exceeds one chip.

    Each chip holds a SLICE of every sequence's pages (its own local pool +
    local page tables + local token counts); every chip computes a partial
    attention with its logsumexp, and the partials are merged with the
    online-softmax combine (parallel/ring.merge_partials) after an
    all-gather over the context axis — the flash-decoding split, laid out
    over ICI.

    Shapes (global, sharded over ``context_axis`` on the marked axis):
    q [B, Hq, d] (replicated); pages [Hkv, P*, page_size, d];
    lengths [B, n_chips*] local token counts; page_indices
    [B, n_chips*, pages_per_seq_local].  Chips holding no tokens of a
    sequence contribute an identity partial (lse sentinel).
    """
    from .ring import merge_partials

    def local(q, k_pages, v_pages, k_scales, v_scales, lengths, page_indices):
        if quantized == "int4":
            kp = Int4QuantizedTensor(k_pages, k_scales)
            vp = Int4QuantizedTensor(v_pages, v_scales)
        elif quantized:
            kp = QuantizedTensor(k_pages, k_scales)
            vp = QuantizedTensor(v_pages, v_scales)
        else:
            kp, vp = k_pages, v_pages
        o, lse = paged_decode_attention(
            q, kp, vp, lengths[:, 0], page_indices[:, 0],
            sm_scale=sm_scale, pages_per_block=pages_per_block,
            return_lse=True, interpret=interpret,
        )
        n = jax.lax.psum(1, context_axis)
        os_ = jax.lax.all_gather(o.astype(jnp.float32), context_axis)
        ls_ = jax.lax.all_gather(lse, context_axis)

        def body(i, carry):
            oc, lc = carry
            return merge_partials(oc, lc, os_[i], ls_[i])

        oc, _ = jax.lax.fori_loop(1, n, body, (os_[0], ls_[0]))
        return oc.astype(q.dtype)

    q_spec = P(None, None, None)
    pages_spec = P(None, context_axis, None, None)
    len_spec = P(None, context_axis)
    tbl_spec = P(None, context_axis, None)

    mapped = shard_map(
        local,
        mesh=mesh,
        in_specs=(q_spec, pages_spec, pages_spec, pages_spec, pages_spec,
                  len_spec, tbl_spec),
        out_specs=q_spec,
        check_vma=False,
    )

    def call(q, k_pages, v_pages, lengths_local, page_indices_local):
        if isinstance(k_pages, (QuantizedTensor, Int4QuantizedTensor)):
            return jax.jit(mapped)(
                q, k_pages.values, v_pages.values,
                k_pages.scales, v_pages.scales,
                lengths_local, page_indices_local,
            )
        dummy = jnp.ones((k_pages.shape[0], k_pages.shape[1], 1, 1),
                         jnp.float32)
        return jax.jit(mapped)(
            q, k_pages, v_pages, dummy, dummy,
            lengths_local, page_indices_local,
        )

    return call
