"""Perplexity evaluation: dense (training path) and paged-decode (serving
path, fp or quantized KV).

North-star accuracy gate: INT8-KV attention within 0.1 perplexity of BF16
(BASELINE.md).  `perplexity_paged` runs the REAL decode machinery —
prefill + per-token paged attention over the quantized cache — teacher-
forced, so the measured gap is exactly the serving-path quantization cost.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..runtime.kv_cache import PageAllocator
from .decoding import init_kv_pools, make_decode_step, make_prefill, write_prompt_kv
from .transformer import ModelConfig, forward


def perplexity_dense(params, cfg: ModelConfig, tokens: jax.Array) -> float:
    """Teacher-forced ppl of tokens [B, T] via the dense causal forward."""
    logits = forward(params, tokens[:, :-1], cfg)
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, tokens[:, 1:, None], axis=-1)[..., 0]
    return float(jnp.exp(jnp.mean(nll)))


def perplexity_paged(
    params,
    cfg: ModelConfig,
    tokens: jax.Array,  # [B, T]
    *,
    kv_dtype=jnp.bfloat16,
    quantized: bool = False,
    page_size: int = 128,
    num_pages: Optional[int] = None,
    interpret: Optional[bool] = None,
) -> float:
    """Teacher-forced ppl via the serving path: prefill the first token,
    then decode-step through the sequence against the paged KV cache."""
    b, t = tokens.shape
    pages_per_seq = -(-t // page_size)
    if num_pages is None:
        num_pages = b * pages_per_seq + 1
    pools = init_kv_pools(
        cfg, num_pages=num_pages, page_size=page_size,
        dtype=kv_dtype, quantized=quantized,
    )
    alloc = PageAllocator(num_pages, page_size)
    for row in range(b):
        alloc.allocate(row, t)
    tbl = jnp.asarray(alloc.page_indices_for(range(b), pages_per_seq))

    prefill = make_prefill(cfg, interpret=interpret)
    decode_step = make_decode_step(cfg, interpret=interpret)

    # Prefill on the first token only (positions 0); remaining tokens are
    # teacher-forced through the decode step.
    first = tokens[:, :1]
    pad = page_size - 1
    first_pad = jnp.pad(first, ((0, 0), (0, pad)))
    logits0, kvs = prefill(params, first_pad, jnp.ones((b,), jnp.int32))
    for li, (k, v) in enumerate(kvs):
        for row in range(b):
            pools = write_prompt_kv(
                pools, li,
                (k[row, :, :page_size], v[row, :, :page_size]),
                jnp.asarray(alloc.page_tables[row][:1]),
                page_size,
            )
    # NOTE prefill wrote a full page; only position 0 is valid (lengths mask).

    logp0 = jax.nn.log_softmax(logits0, axis=-1)
    nll_sum = -jnp.take_along_axis(logp0, tokens[:, 1:2], axis=-1)[:, 0]
    count = 1

    page_rows_np = np.asarray(alloc.page_indices_for(range(b), pages_per_seq))
    for pos in range(1, t - 1):
        rows = jnp.asarray(page_rows_np[:, pos // page_size])
        offs = jnp.full((b,), pos % page_size, jnp.int32)
        lens = jnp.full((b,), pos + 1, jnp.int32)
        positions = jnp.full((b,), pos, jnp.int32)
        logits, pools = decode_step(
            params, pools, tokens[:, pos], positions, rows, offs, tbl, lens
        )
        logp = jax.nn.log_softmax(logits, axis=-1)
        nll_sum = nll_sum - jnp.take_along_axis(
            logp, tokens[:, pos + 1 : pos + 2], axis=-1
        )[:, 0]
        count += 1
    return float(jnp.exp(jnp.mean(nll_sum / count)))
