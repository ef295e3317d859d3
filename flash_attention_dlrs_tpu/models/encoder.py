"""Bidirectional transformer encoder (BERT-style) on the Pallas kernels.

Second model family: same RMSNorm/RoPE/SwiGLU blocks as the decoder but
non-causal flash attention and a masked-LM head — exercises the kernel's
bidirectional path inside a full model, and gives the framework an
embedding/classification workhorse alongside the generative decoder.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp

from ..ops.flash_attention import flash_attention
from .transformer import ModelConfig, _proj, init_params, mlp_block, rms_norm, rope


def encode(
    params: Dict,
    tokens: jax.Array,  # [B, N]
    cfg: ModelConfig,
    *,
    interpret: Optional[bool] = None,
) -> jax.Array:
    """Token ids → contextual embeddings [B, N, d_model] (bidirectional)."""
    b, n = tokens.shape
    positions = jnp.broadcast_to(jnp.arange(n), (b, n))
    x = params["embed"][tokens]

    def block(x, layer):
        h = rms_norm(x, layer["attn_norm"])
        q = _proj(h, layer["wq"]).reshape(b, n, cfg.n_q_heads, cfg.head_dim)
        k = _proj(h, layer["wk"]).reshape(b, n, cfg.n_kv_heads, cfg.head_dim)
        v = _proj(h, layer["wv"]).reshape(b, n, cfg.n_kv_heads, cfg.head_dim)
        q = rope(q, positions, cfg.rope_theta)
        k = rope(k, positions, cfg.rope_theta)
        o = flash_attention(
            q.transpose(0, 2, 1, 3),
            k.transpose(0, 2, 1, 3),
            v.transpose(0, 2, 1, 3),
            causal=False,  # the bidirectional difference
            interpret=interpret,
        )
        x = x + _proj(o.transpose(0, 2, 1, 3).reshape(b, n, -1), layer["wo"])
        return mlp_block(layer, x)

    if cfg.remat:
        block = jax.checkpoint(block)
    for layer in params["layers"]:
        x = block(x, layer)
    return rms_norm(x, params["final_norm"])


def mlm_logits(params, tokens, cfg: ModelConfig, **kw) -> jax.Array:
    """Masked-LM logits via the tied embedding."""
    x = encode(params, tokens, cfg, **kw)
    return jnp.dot(x, params["embed"].T, preferred_element_type=jnp.float32)


def mlm_loss(
    params,
    tokens: jax.Array,  # [B, N] original tokens
    masked_tokens: jax.Array,  # [B, N] with mask token substituted
    mask_positions: jax.Array,  # [B, N] bool
    cfg: ModelConfig,
    **kw,
) -> jax.Array:
    logits = mlm_logits(params, masked_tokens, cfg, **kw)
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, tokens[..., None], axis=-1)[..., 0]
    denom = jnp.maximum(jnp.sum(mask_positions), 1)
    return jnp.sum(jnp.where(mask_positions, nll, 0.0)) / denom


init_encoder_params = init_params  # same parameter structure
