"""Checkpoint import: HuggingFace Llama-family weights → this framework.

The reference ships no models at all (SURVEY.md §0); this converter makes
the flagship transformer a drop-in executor for the dominant open
checkpoint families (Llama / Llama-2/3 / Mistral / Qwen2 / TinyLlama ...),
whose architecture — RMSNorm → RoPE GQA attention → RMSNorm → SwiGLU —
is exactly what `models.transformer` implements:

- RoPE convention matches (split-half rotate_half, GPT-NeoX style);
- projections transpose from torch's [out, in] to our [in, out] x@W layout;
- Qwen2-style QKV biases map to optional `bq`/`bk`/`bv` layer entries;
- Mistral's `sliding_window` maps to `ModelConfig.window` (Qwen2's
  `use_sliding_window=False` gate respected);
- `lm_head` maps to the optional `params["unembed"]` ([V, d_model]) when
  the checkpoint unties it (`ModelConfig.tie_embeddings=False`);
- `rms_norm_eps` maps to `ModelConfig.norm_eps`.

No torch at run time: tensors are pulled through numpy at import, the
returned pytree is plain jax arrays.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from .transformer import ModelConfig

_REQUIRED_KEYS = (
    "model.embed_tokens.weight",
    "model.norm.weight",
    "model.layers.0.self_attn.q_proj.weight",
)


def _to_np(t) -> np.ndarray:
    """torch.Tensor / np.ndarray / jax.Array → float32 numpy."""
    if hasattr(t, "detach"):  # torch without importing torch
        t = t.detach().cpu().float().numpy()
    return np.asarray(t, np.float32)


def _rope_scaling_from_hf(c):
    """HF rope_scaling dict → ModelConfig.rope_scaling tuple (or None).
    Unsupported kinds raise — silently ignoring them would corrupt every
    position (Llama-3.1+ checkpoints ship rope_type='llama3')."""
    rs = getattr(c, "rope_scaling", None)
    if not rs:
        return None
    kind = rs.get("rope_type") or rs.get("type")
    if kind in ("default", None):
        return None
    if kind == "linear":
        return ("linear", float(rs["factor"]))
    if kind == "llama3":
        return (
            "llama3", float(rs["factor"]), float(rs["low_freq_factor"]),
            float(rs["high_freq_factor"]),
            float(rs["original_max_position_embeddings"]),
        )
    if kind == "yarn":
        import math

        factor = float(rs["factor"])
        att = rs.get("attention_factor")
        mscale, mscale_all = rs.get("mscale"), rs.get("mscale_all_dim")
        if att is None:
            def get_mscale(scale, m=1.0):
                return 1.0 if scale <= 1 else 0.1 * m * math.log(scale) + 1.0

            if mscale and mscale_all:
                att = get_mscale(factor, mscale) / get_mscale(factor,
                                                              mscale_all)
            else:
                att = get_mscale(factor)
        orig = (rs.get("original_max_position_embeddings")
                or getattr(c, "max_position_embeddings"))
        return (
            "yarn", factor, float(rs.get("beta_fast") or 32),
            float(rs.get("beta_slow") or 1), float(orig), float(att),
        )
    raise NotImplementedError(
        f"rope_scaling type {kind!r} is not supported (have: linear, "
        "llama3, yarn) — importing while ignoring it would corrupt positions"
    )


def config_from_hf(hf_config, *, dtype=jnp.bfloat16, **overrides) -> ModelConfig:
    """ModelConfig from a transformers LlamaConfig/MistralConfig."""
    c = hf_config
    head_dim = getattr(c, "head_dim", None) or (
        c.hidden_size // c.num_attention_heads
    )
    kw = dict(
        vocab_size=c.vocab_size,
        d_model=c.hidden_size,
        n_layers=c.num_hidden_layers,
        n_q_heads=c.num_attention_heads,
        n_kv_heads=getattr(c, "num_key_value_heads", c.num_attention_heads),
        head_dim=head_dim,
        d_ff=c.intermediate_size,
        rope_theta=float(getattr(c, "rope_theta", 10000.0)),
        rope_scaling=_rope_scaling_from_hf(c),
        # Mistral-style sliding window (None/absent on Llama).  Conventions
        # agree: both keep key j for query i iff i - j < window (self
        # included), so the value maps through unchanged.  Qwen2 carries a
        # sliding_window value gated by use_sliding_window (off by
        # default), and max_window_layers keeps the FIRST K layers on full
        # attention — mapped to window_pattern "from:K".
        window=int(
            (getattr(c, "sliding_window", None) or 0)
            if getattr(c, "use_sliding_window", True) else 0
        ),
        window_pattern=(
            f"from:{c.max_window_layers}"
            if (getattr(c, "use_sliding_window", False)
                and getattr(c, "sliding_window", None)
                and getattr(c, "max_window_layers", 0))
            else "all"
        ),
        norm_eps=float(getattr(c, "rms_norm_eps", 1e-6)),
        tie_embeddings=bool(getattr(c, "tie_word_embeddings", False)),
        position_encoding="rope",
        dtype=dtype,
    )
    kw.update(overrides)
    return ModelConfig(**kw)


def import_hf_llama(
    model_or_state: Any,
    *,
    dtype=jnp.bfloat16,
    cfg: Optional[ModelConfig] = None,
) -> Tuple[Dict, ModelConfig]:
    """(params, cfg) from a transformers LlamaForCausalLM-style model or its
    ``state_dict()``.

    Pass ``cfg`` to skip config inference (required when handing a bare
    state_dict, whose hyperparameters are only partially recoverable)."""
    if hasattr(model_or_state, "state_dict"):
        state = model_or_state.state_dict()
        if cfg is None:
            cfg = config_from_hf(model_or_state.config, dtype=dtype)
    else:
        state = dict(model_or_state)
        if cfg is None:
            raise ValueError("cfg is required when importing a raw state_dict")
    missing = [k for k in _REQUIRED_KEYS if k not in state]
    if missing:
        raise ValueError(
            f"not a Llama-family state dict (missing {missing}); expected "
            "model.embed_tokens / model.layers.N.self_attn.* / model.norm"
        )

    def w(name):  # [out, in] torch linear → [in, out] x@W
        return jnp.asarray(_to_np(state[name]).T, dtype)

    def vec(name):  # norm gains stay fp32 (rms_norm computes in fp32)
        return jnp.asarray(_to_np(state[name]), jnp.float32)

    layers = []
    for i in range(cfg.n_layers):
        p = f"model.layers.{i}."
        if p + "self_attn.q_proj.weight" not in state:
            raise ValueError(
                f"cfg.n_layers={cfg.n_layers} but layer {i} is missing "
                "from the state dict"
            )
        layer = {
            "attn_norm": vec(p + "input_layernorm.weight"),
            "wq": w(p + "self_attn.q_proj.weight"),
            "wk": w(p + "self_attn.k_proj.weight"),
            "wv": w(p + "self_attn.v_proj.weight"),
            "wo": w(p + "self_attn.o_proj.weight"),
            "mlp_norm": vec(p + "post_attention_layernorm.weight"),
            "w_gate": w(p + "mlp.gate_proj.weight"),
            "w_up": w(p + "mlp.up_proj.weight"),
            "w_down": w(p + "mlp.down_proj.weight"),
        }
        # Qwen2-style QKV biases (Llama/Mistral have none).
        if p + "self_attn.q_proj.bias" in state:
            layer["bq"] = jnp.asarray(
                _to_np(state[p + "self_attn.q_proj.bias"]), dtype)
            layer["bk"] = jnp.asarray(
                _to_np(state[p + "self_attn.k_proj.bias"]), dtype)
            layer["bv"] = jnp.asarray(
                _to_np(state[p + "self_attn.v_proj.bias"]), dtype)
        layers.append(layer)

    params = {
        "embed": jnp.asarray(_to_np(state["model.embed_tokens.weight"]), dtype),
        "layers": layers,
        "final_norm": vec("model.norm.weight"),
    }
    if not cfg.tie_embeddings:
        head = state.get("lm_head.weight")
        if head is None:  # some exports drop the tied head tensor
            raise ValueError(
                "cfg.tie_embeddings=False but the state dict has no "
                "lm_head.weight"
            )
        params["unembed"] = jnp.asarray(_to_np(head), dtype)  # [V, dm]
    return params, cfg


# ---------------------------------------------------------------------------
# Gemma family
# ---------------------------------------------------------------------------

_GEMMA_REQUIRED = (
    "model.embed_tokens.weight",
    "model.layers.0.input_layernorm.weight",
)


def config_from_hf_gemma(hf_config, *, dtype=jnp.bfloat16,
                         **overrides) -> ModelConfig:
    """ModelConfig from a transformers GemmaConfig / Gemma2Config."""
    c = hf_config
    is_g2 = bool(getattr(c, "attn_logit_softcapping", None))
    kw = dict(
        vocab_size=c.vocab_size,
        d_model=c.hidden_size,
        n_layers=c.num_hidden_layers,
        n_q_heads=c.num_attention_heads,
        n_kv_heads=getattr(c, "num_key_value_heads", c.num_attention_heads),
        head_dim=c.head_dim,
        d_ff=c.intermediate_size,
        rope_theta=float(getattr(c, "rope_theta", 10000.0)),
        norm_eps=float(getattr(c, "rms_norm_eps", 1e-6)),
        tie_embeddings=True,  # every Gemma ties
        position_encoding="rope",
        mlp_act="gelu_tanh",
        embed_scale=True,
        # Gemma scales queries by query_pre_attn_scalar**-0.5, not
        # head_dim**-0.5 (they differ on Gemma-2 9B/27B).
        sm_scale=float(
            getattr(c, "query_pre_attn_scalar", c.head_dim)) ** -0.5,
        attn_softcap=float(getattr(c, "attn_logit_softcapping", 0) or 0),
        final_softcap=float(getattr(c, "final_logit_softcapping", 0) or 0),
        # Gemma-2 slides on EVEN layers (HF: is_sliding = not layer_idx % 2)
        window=int(getattr(c, "sliding_window", None) or 0) if is_g2 else 0,
        window_pattern="even" if is_g2 else "all",
        dtype=dtype,
    )
    kw.update(overrides)
    return ModelConfig(**kw)


def import_hf_gemma(
    model_or_state: Any,
    *,
    dtype=jnp.bfloat16,
    cfg: Optional[ModelConfig] = None,
) -> Tuple[Dict, ModelConfig]:
    """(params, cfg) from a transformers GemmaForCausalLM /
    Gemma2ForCausalLM (or its state_dict, with an explicit cfg).

    Beyond the Llama-family mapping: Gemma's RMSNorm multiplies by (1 + w)
    — folded into the stored gains at import so the runtime norm stays
    ``x·rsqrt(mean x²)·w``; Gemma-2's sandwich norms map to the optional
    ``post_attn_norm`` / ``post_mlp_norm`` layer entries (its
    post_attention_layernorm is a TRUE post-norm, unlike Llama's, whose
    same-named tensor is the MLP pre-norm)."""
    if hasattr(model_or_state, "state_dict"):
        state = model_or_state.state_dict()
        if cfg is None:
            cfg = config_from_hf_gemma(model_or_state.config, dtype=dtype)
    else:
        state = dict(model_or_state)
        if cfg is None:
            raise ValueError("cfg is required when importing a raw state_dict")
    missing = [k for k in _GEMMA_REQUIRED if k not in state]
    if missing:
        raise ValueError(f"not a Gemma-family state dict (missing {missing})")

    def w(name):
        return jnp.asarray(_to_np(state[name]).T, dtype)

    def gain(name):  # Gemma (1+w) convention folded in, fp32
        return jnp.asarray(1.0 + _to_np(state[name]), jnp.float32)

    sandwich = "model.layers.0.pre_feedforward_layernorm.weight" in state
    layers = []
    for i in range(cfg.n_layers):
        p = f"model.layers.{i}."
        if p + "self_attn.q_proj.weight" not in state:
            raise ValueError(
                f"cfg.n_layers={cfg.n_layers} but layer {i} is missing")
        layer = {
            "attn_norm": gain(p + "input_layernorm.weight"),
            "wq": w(p + "self_attn.q_proj.weight"),
            "wk": w(p + "self_attn.k_proj.weight"),
            "wv": w(p + "self_attn.v_proj.weight"),
            "wo": w(p + "self_attn.o_proj.weight"),
            "w_gate": w(p + "mlp.gate_proj.weight"),
            "w_up": w(p + "mlp.up_proj.weight"),
            "w_down": w(p + "mlp.down_proj.weight"),
        }
        if sandwich:  # Gemma-2
            layer["post_attn_norm"] = gain(p + "post_attention_layernorm.weight")
            layer["mlp_norm"] = gain(p + "pre_feedforward_layernorm.weight")
            layer["post_mlp_norm"] = gain(p + "post_feedforward_layernorm.weight")
        else:  # Gemma-1: Llama-shaped norm placement
            layer["mlp_norm"] = gain(p + "post_attention_layernorm.weight")
        layers.append(layer)

    params = {
        "embed": jnp.asarray(_to_np(state["model.embed_tokens.weight"]), dtype),
        "layers": layers,
        "final_norm": gain("model.norm.weight"),
    }
    return params, cfg


# ---------------------------------------------------------------------------
# Phi-3 family (fused projections; otherwise Llama-shaped)
# ---------------------------------------------------------------------------


def import_hf_phi3(
    model_or_state: Any,
    *,
    dtype=jnp.bfloat16,
    cfg: Optional[ModelConfig] = None,
) -> Tuple[Dict, ModelConfig]:
    """(params, cfg) from a transformers Phi3ForCausalLM (or state_dict +
    explicit cfg).

    Phi-3 is Llama-shaped except for FUSED projections — one
    ``qkv_proj`` of [(Hq+2·Hkv)·dh, dm] rows ordered q|k|v, and one
    ``gate_up_proj`` of [2·d_ff, dm] rows ordered gate|up.  This adapter
    splits them into Llama-named tensors and delegates to
    :func:`import_hf_llama` (rope/norm/untied-head handling identical)."""
    if hasattr(model_or_state, "state_dict"):
        state = dict(model_or_state.state_dict())
        if cfg is None:
            cfg = config_from_hf(model_or_state.config, dtype=dtype)
    else:
        state = dict(model_or_state)
        if cfg is None:
            raise ValueError("cfg is required when importing a raw state_dict")
    if "model.layers.0.self_attn.qkv_proj.weight" not in state:
        raise ValueError(
            "not a Phi-3 state dict (no fused self_attn.qkv_proj); for "
            "split-projection checkpoints use import_hf_llama"
        )
    nq, nkv, dh = cfg.n_q_heads, cfg.n_kv_heads, cfg.head_dim
    for i in range(cfg.n_layers):
        p = f"model.layers.{i}."
        qkv = _to_np(state.pop(p + "self_attn.qkv_proj.weight"))  # [rows, dm]
        if qkv.shape[0] != (nq + 2 * nkv) * dh:
            raise ValueError(
                f"layer {i} qkv_proj rows {qkv.shape[0]} != "
                f"(Hq + 2·Hkv)·dh = {(nq + 2 * nkv) * dh}"
            )
        state[p + "self_attn.q_proj.weight"] = qkv[: nq * dh]
        state[p + "self_attn.k_proj.weight"] = qkv[nq * dh: (nq + nkv) * dh]
        state[p + "self_attn.v_proj.weight"] = qkv[(nq + nkv) * dh:]
        gu = _to_np(state.pop(p + "mlp.gate_up_proj.weight"))  # [2·dff, dm]
        state[p + "mlp.gate_proj.weight"] = gu[: cfg.d_ff]
        state[p + "mlp.up_proj.weight"] = gu[cfg.d_ff:]
    return import_hf_llama(state, dtype=dtype, cfg=cfg)


def load_trained(ckpt_dir: str, *, dtype=None) -> Tuple[Dict, ModelConfig]:
    """(params, cfg) from a scripts/train_lm.py run directory.

    Reads ``model_config.json`` (architecture record) and the params-only
    checkpoint under ``<ckpt_dir>/params_only`` — no optimizer template
    needed.  ``dtype`` overrides the stored activation dtype (e.g. load a
    bf16-trained model for fp32 CPU eval)."""
    import json
    import os

    import jax

    from ..utils import checkpoint as ckpt_lib
    from .transformer import init_params

    with open(os.path.join(ckpt_dir, "model_config.json")) as f:
        rec = json.load(f)
    stored = rec.pop("dtype")
    rec["dtype"] = jnp.dtype(dtype if dtype is not None else stored).type
    cfg = ModelConfig(**rec)
    template = {"params": init_params(jax.random.PRNGKey(0), cfg)}
    state, _ = ckpt_lib.restore_checkpoint(
        os.path.join(ckpt_dir, "params_only"), template
    )
    params = jax.tree.map(lambda a: jnp.asarray(a, cfg.dtype)
                          if jnp.issubdtype(a.dtype, jnp.floating) else a,
                          state["params"])
    return params, cfg
