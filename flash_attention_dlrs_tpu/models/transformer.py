"""Flagship model: decoder-only GQA transformer on the Pallas attention path.

The reference ships kernels without a model (SURVEY.md §0); the north star
needs one — a 7B-class head configuration exercising the full stack: causal
flash attention (training), paged quantized-KV decode (inference), and mesh
sharding (scale-out).  Pure functional JAX: params are a pytree, the forward
is a jittable function, sharding comes from pjit constraints — no framework
dependency.

Architecture: RMSNorm → (RoPE, GQA flash attention) → RMSNorm → SwiGLU,
residual around both; weights optionally quantized per-channel INT8 with the
scale folded into the matmul epilogue (ops/quantization.py).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from ..ops.flash_attention import flash_attention
from ..ops.quantization import QuantizedTensor, int8_matmul, quantize_weight
from ..ops.reference import alibi_slopes_for


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    vocab_size: int = 32000
    d_model: int = 512
    n_layers: int = 4
    n_q_heads: int = 8
    n_kv_heads: int = 2
    head_dim: int = 64
    d_ff: int = 1408
    rope_theta: float = 10000.0
    # RoPE frequency scaling, as a hashable tuple:
    #   ("linear", factor)  — position-interpolation (all freqs / factor)
    #   ("llama3", factor, low_freq_factor, high_freq_factor, orig_max_pos)
    #     — Llama-3.1 NTK-by-parts: low-frequency components scaled by
    #       1/factor, high-frequency kept, smooth ramp between.
    #   ("yarn", factor, beta_fast, beta_slow, orig_max_pos, attn_factor)
    #     — YaRN (arXiv:2309.00071): dimension-ramped blend of
    #       interpolated and extrapolated frequencies; the rotated q/k are
    #       additionally scaled by attn_factor (HF's attention_scaling on
    #       cos/sin).
    # None = unscaled.
    rope_scaling: Optional[tuple] = None
    # Sliding-window attention (Mistral-style): each token attends the last
    # `window` tokens including itself; 0 = full causal.  Runs on the
    # banded O(N·w) kernel grid.  Training/forward paths only — the paged
    # serving engine requires the window to cover its max context (see
    # runtime/engine.py).
    window: int = 0
    # Which layers slide: "all" (Mistral), "even" (Gemma-2 alternates —
    # layers 0, 2, ... slide, odd layers attend fully), or "from:K"
    # (Qwen2 max_window_layers — the FIRST K layers attend fully, layers
    # K and beyond slide).
    window_pattern: str = "all"
    # RMSNorm epsilon (HF checkpoints vary: Llama-2/3 use 1e-5, older 1e-6).
    norm_eps: float = 1e-6
    # MLP gate activation: "silu" (Llama/Mistral/Qwen) or "gelu_tanh"
    # (Gemma GeGLU).
    mlp_act: str = "silu"
    # Gemma-isms: embeddings scaled by sqrt(d_model); attention-logit and
    # final-logit soft-capping (cap*tanh(x/cap)); an explicit softmax scale
    # (query_pre_attn_scalar**-0.5) instead of head_dim**-0.5.  Sandwich
    # (post-attn / post-mlp) norms ride optional per-layer weights
    # ("post_attn_norm"/"post_mlp_norm"), and Gemma's (1+w) norm convention
    # folds into the stored weights at import (models/convert.py).
    embed_scale: bool = False
    attn_softcap: float = 0.0
    final_softcap: float = 0.0
    sm_scale: Optional[float] = None
    # Tied unembedding (logits = x @ embed.T) by default; imported
    # checkpoints with a separate lm_head set False and carry a
    # params["unembed"] of shape [vocab, d_model] (see models/convert.py).
    tie_embeddings: bool = True
    # Position encoding: "rope" (rotary, default) or "alibi" (MPT/BLOOM-style
    # per-head linear bias — no rotation; the bias is applied inside the
    # flash kernel in separable form, see ops.flash_attention).  ALiBi
    # assumes contiguous positions; explicit `positions` only feed RoPE.
    position_encoding: str = "rope"
    # Attention-probability dropout (flash-attn dropout_p semantics; the
    # counter-based in-kernel mask, see ops.flash_attention).  Active only
    # when the caller passes dropout_seed (train steps thread the step
    # index); eval/serving paths pass no seed and run deterministic.
    attn_dropout: float = 0.0
    dtype: Any = jnp.bfloat16
    remat: bool = True  # jax.checkpoint each block (HBM ⇄ FLOPs trade)
    # remat policy: "block" recomputes everything in the block (max HBM
    # savings); "save_flash" pins the flash kernel's named outputs (o, lse)
    # so the backward recompute skips the attention kernel itself — the
    # qkv/rope recompute rebuilds the q/k/v residuals it needs.  Costs
    # ~130MB/layer at the bench shape (saving q/k/v too would skip the
    # projections as well but measured 612MB past HBM there).  Ignored when
    # remat=False.
    remat_policy: str = "block"
    # Run the last `remat_skip` layers WITHOUT jax.checkpoint: each skipped
    # layer saves its intermediates (~1.5GB at the bench shape) but drops
    # its 2·P/L recompute FLOPs from the backward — the HBM freed by
    # loss_chunk buys back step time.  0 = checkpoint every layer.
    remat_skip: int = 0
    # Cross-entropy in sequence chunks of this many tokens: the loss never
    # materializes the [B, N, vocab] fp32 logits (2.1GB at the bench shape,
    # ~2x that with the softmax residuals) — each chunk's logits live only
    # inside a rematerialized scan body.  0 = unchunked.
    loss_chunk: int = 0

    @classmethod
    def tiny(cls, **kw):
        return cls(
            vocab_size=256, d_model=128, n_layers=2, n_q_heads=4,
            n_kv_heads=2, head_dim=32, d_ff=256, **kw,
        )

    @classmethod
    def b7(cls, **kw):
        """7B-class head config (north-star eval shape)."""
        return cls(
            vocab_size=32000, d_model=4096, n_layers=32, n_q_heads=32,
            n_kv_heads=8, head_dim=128, d_ff=11008, **kw,
        )


# ---------------------------------------------------------------------------
# Params
# ---------------------------------------------------------------------------


def init_params(key: jax.Array, cfg: ModelConfig) -> Dict:
    """He-ish init; weights stored [in, out] so matmuls are x @ W."""
    dm, dh = cfg.d_model, cfg.head_dim
    nq, nkv, dff = cfg.n_q_heads, cfg.n_kv_heads, cfg.d_ff
    keys = jax.random.split(key, 2 + cfg.n_layers)

    def dense(k, din, dout):
        return (jax.random.normal(k, (din, dout), jnp.float32) * din**-0.5).astype(
            cfg.dtype
        )

    def layer(k):
        ks = jax.random.split(k, 7)
        return {
            "attn_norm": jnp.ones((dm,), jnp.float32),
            "wq": dense(ks[0], dm, nq * dh),
            "wk": dense(ks[1], dm, nkv * dh),
            "wv": dense(ks[2], dm, nkv * dh),
            "wo": dense(ks[3], nq * dh, dm),
            "mlp_norm": jnp.ones((dm,), jnp.float32),
            "w_gate": dense(ks[4], dm, dff),
            "w_up": dense(ks[5], dm, dff),
            "w_down": dense(ks[6], dff, dm),
        }

    params = {
        "embed": (
            jax.random.normal(keys[0], (cfg.vocab_size, dm), jnp.float32) * 0.02
        ).astype(cfg.dtype),
        "layers": [layer(keys[2 + i]) for i in range(cfg.n_layers)],
        "final_norm": jnp.ones((dm,), jnp.float32),
    }
    if not cfg.tie_embeddings:
        params["unembed"] = (
            jax.random.normal(keys[1], (cfg.vocab_size, dm), jnp.float32)
            * dm ** -0.5
        ).astype(cfg.dtype)
    return params


def quantize_params(params: Dict) -> Dict:
    """Weight-only INT8: every projection matrix → QuantizedTensor."""
    def q(layer):
        out = dict(layer)
        for name in ("wq", "wk", "wv", "wo", "w_gate", "w_up", "w_down"):
            out[name] = quantize_weight(layer[name].astype(jnp.float32))
        return out

    return {**params, "layers": [q(l) for l in params["layers"]]}


# ---------------------------------------------------------------------------
# Blocks
# ---------------------------------------------------------------------------


def rms_norm(x, weight, eps=1e-6):
    x32 = x.astype(jnp.float32)
    inv = jax.lax.rsqrt(jnp.mean(x32 * x32, axis=-1, keepdims=True) + eps)
    return (x32 * inv * weight).astype(x.dtype)


def _proj(x, w, b=None):
    if isinstance(w, QuantizedTensor):
        y = int8_matmul(x, w)
    else:
        y = jnp.dot(x, w, preferred_element_type=jnp.float32).astype(x.dtype)
    if b is not None:  # optional bias (Qwen2-style QKV biases)
        y = y + b.astype(y.dtype)
    return y


def _scaled_rope_freqs(theta: float, d: int, scaling):
    """Inverse frequencies with optional RoPE scaling (see ModelConfig)."""
    freqs = theta ** (-jnp.arange(0, d, 2, dtype=jnp.float32) / d)
    if scaling is None:
        return freqs
    kind = scaling[0]
    if kind == "linear":
        return freqs / float(scaling[1])
    if kind == "yarn":
        # HF _compute_yarn_parameters (truncate=True default): blend the
        # 1/factor-interpolated and unscaled frequencies with a linear
        # ramp over the correction-dim range [low, high].
        import math

        _, factor, beta_fast, beta_slow, orig_max, _att = scaling
        dim = d
        base = float(theta)

        def corr_dim(n_rot):
            return (dim * math.log(orig_max / (n_rot * 2 * math.pi))
                    ) / (2 * math.log(base))

        low = max(math.floor(corr_dim(beta_fast)), 0)
        high = min(math.ceil(corr_dim(beta_slow)), dim - 1)
        if low == high:
            high += 0.001
        ramp = jnp.clip(
            (jnp.arange(dim // 2, dtype=jnp.float32) - low) / (high - low),
            0, 1,
        )
        extrap_f = 1.0 - ramp  # 1 where extrapolation (unscaled) wins
        return (freqs / float(factor)) * (1.0 - extrap_f) + freqs * extrap_f
    if kind == "llama3":
        # HF _compute_llama3_parameters: keep high-frequency components,
        # divide low-frequency ones by `factor`, smooth-interpolate between
        # the two wavelength thresholds.
        _, factor, low_ff, high_ff, orig_max = scaling
        factor, low_ff, high_ff = float(factor), float(low_ff), float(high_ff)
        orig_max = float(orig_max)
        wavelen = 2.0 * jnp.pi / freqs
        low_wl = orig_max / low_ff
        high_wl = orig_max / high_ff
        smooth = (orig_max / wavelen - low_ff) / (high_ff - low_ff)
        interp = (1.0 - smooth) * freqs / factor + smooth * freqs
        out = jnp.where(wavelen > low_wl, freqs / factor, freqs)
        is_mid = jnp.logical_and(wavelen <= low_wl, wavelen >= high_wl)
        return jnp.where(is_mid, interp, out)
    raise ValueError(f"unsupported rope_scaling kind {kind!r}")


def rope(x, positions, theta: float, scaling=None):
    """Rotary embedding on [..., N, H, d]; positions [..., N]."""
    d = x.shape[-1]
    freqs = _scaled_rope_freqs(theta, d, scaling)
    angles = positions[..., :, None].astype(jnp.float32) * freqs  # [..., N, d/2]
    cos = jnp.cos(angles)[..., None, :]  # broadcast over heads
    sin = jnp.sin(angles)[..., None, :]
    if scaling is not None and scaling[0] == "yarn":
        # YaRN attention scaling rides the cos/sin tables in HF — applying
        # it to both q and k scales the scores by attn_factor².
        att = jnp.float32(scaling[5])
        cos = cos * att
        sin = sin * att
    x1, x2 = jnp.split(x.astype(jnp.float32), 2, axis=-1)
    return jnp.concatenate(
        [x1 * cos - x2 * sin, x2 * cos + x1 * sin], axis=-1
    ).astype(x.dtype)


def layer_window(cfg: ModelConfig, layer_idx: int) -> int:
    """This layer's sliding window: cfg.window gated by window_pattern
    ("even" = Gemma-2's alternating layout; "from:K" = Qwen2's
    max_window_layers — full attention below layer K)."""
    if not cfg.window:
        return 0
    if cfg.window_pattern == "even" and layer_idx % 2 != 0:
        return 0
    if cfg.window_pattern.startswith("from:") and layer_idx < int(
            cfg.window_pattern[5:]):
        return 0
    return cfg.window


def attention_block(layer, x, positions, cfg: ModelConfig, *,
                    layer_idx: int = 0, dropout_seed=None, interpret=None):
    b, n, dm = x.shape
    from jax.ad_checkpoint import checkpoint_name

    h = rms_norm(x, layer["attn_norm"], cfg.norm_eps)
    # Named so remat_policy="save_matmuls" can pin every projection output
    # (see forward_hidden): backward recompute then has NO matmuls left.
    q = checkpoint_name(
        _proj(h, layer["wq"], layer.get("bq")), "attn_q").reshape(
        b, n, cfg.n_q_heads, cfg.head_dim)
    k = checkpoint_name(
        _proj(h, layer["wk"], layer.get("bk")), "attn_k").reshape(
        b, n, cfg.n_kv_heads, cfg.head_dim)
    v = checkpoint_name(
        _proj(h, layer["wv"], layer.get("bv")), "attn_v").reshape(
        b, n, cfg.n_kv_heads, cfg.head_dim)
    slopes = None
    if cfg.position_encoding == "alibi":
        slopes = alibi_slopes_for(cfg.n_q_heads)
    else:
        q = rope(q, positions, cfg.rope_theta, cfg.rope_scaling)
        k = rope(k, positions, cfg.rope_theta, cfg.rope_scaling)
    # [B, H, N, d] for the kernel
    rate = cfg.attn_dropout if dropout_seed is not None else 0.0
    o = flash_attention(
        q.transpose(0, 2, 1, 3),
        k.transpose(0, 2, 1, 3),
        v.transpose(0, 2, 1, 3),
        causal=True,
        sm_scale=cfg.sm_scale,
        window=layer_window(cfg, layer_idx),
        logit_softcap=cfg.attn_softcap,
        alibi_slopes=slopes,
        dropout_rate=rate,
        dropout_seed=dropout_seed if rate else None,
        interpret=interpret,
    )
    o = o.transpose(0, 2, 1, 3).reshape(b, n, cfg.n_q_heads * cfg.head_dim)
    out = checkpoint_name(_proj(o, layer["wo"]), "attn_wo")
    if "post_attn_norm" in layer:  # Gemma-2 sandwich norm
        out = rms_norm(out, layer["post_attn_norm"], cfg.norm_eps)
    return x + out


def mlp_block(layer, x, eps: float = 1e-6, act: str = "silu"):
    from jax.ad_checkpoint import checkpoint_name

    h = rms_norm(x, layer["mlp_norm"], eps)
    # Named so remat_policy="save_dots" can pin them: gate+up are 2/3 of
    # the block's matmul FLOPs — saving them (plus the flash outputs)
    # drops the backward recompute to just qkv/wo projections + elementwise.
    gate = checkpoint_name(_proj(h, layer["w_gate"]), "mlp_gate")
    up = checkpoint_name(_proj(h, layer["w_up"]), "mlp_up")
    g32 = gate.astype(jnp.float32)
    if act == "gelu_tanh":  # Gemma GeGLU
        g32 = jax.nn.gelu(g32, approximate=True)
    else:
        g32 = jax.nn.silu(g32)
    gated = g32.astype(x.dtype) * up
    out = checkpoint_name(_proj(gated, layer["w_down"]), "mlp_down")
    if "post_mlp_norm" in layer:  # Gemma-2 sandwich norm
        out = rms_norm(out, layer["post_mlp_norm"], eps)
    return x + out


def forward_hidden(
    params: Dict,
    tokens: jax.Array,  # [B, N] int32
    cfg: ModelConfig,
    *,
    positions: Optional[jax.Array] = None,
    dropout_seed=None,
    interpret: Optional[bool] = None,
) -> jax.Array:
    """Token ids → final-norm hidden states [B, N, d_model].

    ``dropout_seed`` (int32 scalar, e.g. the train-step index) activates
    ``cfg.attn_dropout``; each layer derives a distinct sub-seed so masks
    are independent across depth."""
    b, n = tokens.shape
    if positions is None:
        positions = jnp.broadcast_to(jnp.arange(n), (b, n))
    x = params["embed"][tokens]
    if cfg.embed_scale:  # Gemma: embeddings scaled by sqrt(d_model)
        x = x * jnp.asarray(cfg.d_model ** 0.5, x.dtype)

    def block(x, layer, seed_l, layer_idx):
        x = attention_block(layer, x, positions, cfg, layer_idx=layer_idx,
                            dropout_seed=seed_l, interpret=interpret)
        return mlp_block(layer, x, cfg.norm_eps, cfg.mlp_act)

    ckpt_block = block
    if cfg.remat:
        if cfg.remat_policy == "save_flash":
            policy = jax.checkpoint_policies.save_only_these_names(
                "flash_o", "flash_lse"
            )
            ckpt_block = jax.checkpoint(block, policy=policy)
        elif cfg.remat_policy == "save_dots":
            # Pin the expensive block outputs (attention kernel + the two
            # d_ff projections, ~85% of block matmul FLOPs): the backward
            # recompute shrinks to qkv/wo + elementwise.  ~850MB/layer at
            # the bench shape — affordable once the 8-bit optimizer and
            # chunked CE free their HBM.
            policy = jax.checkpoint_policies.save_only_these_names(
                "flash_o", "flash_lse", "mlp_gate", "mlp_up"
            )
            ckpt_block = jax.checkpoint(block, policy=policy)
        elif cfg.remat_policy == "save_matmuls":
            # save_dots + the two priciest remaining recomputes (wo and
            # w_down outputs, ~2 TF/layer of the ~3.4 TF/layer save_dots
            # recompute): backward re-runs only qkv + elementwise.  Pinning
            # ALL projections (q/k/v too) measured 1.37 GB past HBM at the
            # bench shape; this subset (+0.25 GB/layer) fits.
            policy = jax.checkpoint_policies.save_only_these_names(
                "flash_o", "flash_lse", "mlp_gate", "mlp_up", "mlp_down",
                "attn_wo",
            )
            ckpt_block = jax.checkpoint(block, policy=policy)
        else:
            ckpt_block = jax.checkpoint(block, static_argnums=())
    n_ckpt = cfg.n_layers - max(0, cfg.remat_skip)
    if dropout_seed is not None and cfg.attn_dropout:
        base_seed = jnp.asarray(dropout_seed, jnp.int32)
    else:
        base_seed = None
    for i, layer in enumerate(params["layers"]):
        seed_l = None if base_seed is None else base_seed + i * 1299709
        x = (ckpt_block if i < n_ckpt else block)(x, layer, seed_l, i)
    return rms_norm(x, params["final_norm"], cfg.norm_eps)


def forward(
    params: Dict,
    tokens: jax.Array,  # [B, N] int32
    cfg: ModelConfig,
    *,
    positions: Optional[jax.Array] = None,
    dropout_seed=None,
    interpret: Optional[bool] = None,
) -> jax.Array:
    """Token ids → logits [B, N, vocab] (tied or imported unembedding)."""
    x = forward_hidden(
        params, tokens, cfg, positions=positions, dropout_seed=dropout_seed,
        interpret=interpret,
    )
    logits = jnp.dot(
        x, unembed_matrix(params).T, preferred_element_type=jnp.float32
    )
    if cfg.final_softcap:  # Gemma-2 final-logit soft-capping
        c = cfg.final_softcap
        logits = c * jnp.tanh(logits / c)
    return logits


def unembed_matrix(params: Dict) -> jax.Array:
    """[V, d_model] output embedding: the separate ``unembed`` when the
    checkpoint unties it (models/convert.py), the input embedding
    otherwise."""
    return params.get("unembed", params["embed"])


def chunked_cross_entropy(
    x: jax.Array,  # [B, N, d] final hidden states
    embed: jax.Array,  # [V, d] tied unembedding
    targets: jax.Array,  # [B, N] int
    chunk: int,
    softcap: float = 0.0,  # Gemma-2 final-logit cap
) -> jax.Array:
    """Mean next-token NLL without materializing the full logits tensor.

    Scans the sequence in chunks; each chunk's [B, chunk, V] logits and
    softmax residuals exist only inside a jax.checkpoint'd scan body, so
    the backward recomputes them per chunk instead of keeping B·N·V fp32
    alive (the recompute is one extra unembed matmul — ~3% of step FLOPs
    at the bench shape vs ~4GB of peak HBM).  N must divide by ``chunk``
    (callers pick chunk; sequence lengths here are powers of two).
    """
    b, n, d = x.shape
    if n % chunk:
        raise ValueError(f"seq len {n} not divisible by loss chunk {chunk}")

    @jax.checkpoint
    def chunk_nll(x_c, t_c):
        logits = jnp.einsum(
            "bnd,vd->bnv", x_c, embed, preferred_element_type=jnp.float32
        )
        if softcap:
            logits = softcap * jnp.tanh(logits / softcap)
        logz = jax.nn.logsumexp(logits, axis=-1)
        tgt = jnp.take_along_axis(logits, t_c[..., None], axis=-1)[..., 0]
        return jnp.sum(logz - tgt)

    xs = x.reshape(b, n // chunk, chunk, d).swapaxes(0, 1)
    ts = targets.reshape(b, n // chunk, chunk).swapaxes(0, 1)

    def body(carry, sl):
        return carry + chunk_nll(*sl), None

    # (Unrolling this scan measured NEGATIVE on v5e — 0.613 vs 0.636 MFU
    # at the bench shape: the unrolled chunk bodies raise peak residency
    # and XLA's scheduler loses more than the loop overhead costs.)
    total, _ = jax.lax.scan(body, jnp.float32(0.0), (xs, ts))
    return total / (b * n)


def loss_fn(params, tokens, cfg: ModelConfig, *, dropout_seed=None,
            interpret=None):
    """Next-token cross entropy over tokens[:, :-1] → tokens[:, 1:]."""
    targets = tokens[:, 1:]
    if cfg.loss_chunk:
        x = forward_hidden(params, tokens[:, :-1], cfg,
                           dropout_seed=dropout_seed, interpret=interpret)
        return chunked_cross_entropy(
            x, unembed_matrix(params), targets, cfg.loss_chunk,
            cfg.final_softcap,
        )
    logits = forward(params, tokens[:, :-1], cfg, dropout_seed=dropout_seed,
                     interpret=interpret)
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, targets[..., None], axis=-1)[..., 0]
    return jnp.mean(nll)
