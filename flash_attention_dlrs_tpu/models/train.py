"""Training step: optax optimizer + mesh sharding rules (dp × tp).

Sharding convention (scaling-book recipe: name a mesh, annotate, let GSPMD
insert the collectives):
- `data` axis: batch dimension of activations.
- `model` axis: attention heads / MLP hidden — projection weights are
  sharded on their head/ff dimension, so attention runs head-parallel and
  the MLP contracts locally with one all-reduce on the down projection.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .transformer import ModelConfig, init_params, loss_fn


def param_shardings(params: Dict, mesh: Mesh, model_axis: str = "model",
                    n_kv_heads: int | None = None) -> Dict:
    """PartitionSpecs per parameter: head/ff dims on the model axis.

    ``n_kv_heads``: when the model axis does not divide the KV head count
    (GQA with few KV heads on a wide mesh), wk/wv/bk/bv REPLICATE instead
    of sharding — a model-axis split of [d_model, hkv*dh] would cut through
    head_dim, a sharding the attention op re-gathers anyway (and one GSPMD
    expresses as sub-axis tilings that break partition callbacks)."""
    m_size = mesh.shape.get(model_axis, 1)
    kv_ok = n_kv_heads is None or n_kv_heads % m_size == 0

    def spec_for_layer(layer):
        m = model_axis
        kv = m if kv_ok else None
        spec = {
            "attn_norm": P(None),
            "wq": P(None, m),
            "wk": P(None, kv),
            "wv": P(None, kv),
            "wo": P(m, None),
            "mlp_norm": P(None),
            "w_gate": P(None, m),
            "w_up": P(None, m),
            "w_down": P(m, None),
        }
        if "bq" in layer:  # Qwen2-style QKV biases follow their projections
            spec["bq"] = P(m)
            spec["bk"] = P(kv)
            spec["bv"] = P(kv)
        for nm in ("post_attn_norm", "post_mlp_norm"):  # Gemma-2 sandwich
            if nm in layer:
                spec[nm] = P(None)
        return spec

    specs = {
        "embed": P(None, None),
        "layers": [spec_for_layer(l) for l in params["layers"]],
        "final_norm": P(None),
    }
    if "unembed" in params:  # untied output embedding (models/convert.py)
        specs["unembed"] = P(None, None)
    return jax.tree.map(
        lambda s: NamedSharding(mesh, s),
        specs,
        is_leaf=lambda x: isinstance(x, P),
    )


def make_train_state(
    key: jax.Array,
    cfg: ModelConfig,
    mesh: Optional[Mesh] = None,
    *,
    learning_rate: float = 3e-4,
    optimizer_name: str = "adamw",
) -> Tuple[Dict, Any, optax.GradientTransformation]:
    """(params, opt_state, optimizer) — params placed per the sharding rules.

    ``optimizer_name``: "adamw" (optax, moments in param dtype) or
    "adamw8bit" (blockwise-int8 moments, ~half the optimizer HBM —
    see models/optim.py)."""
    if mesh is not None:
        _check_tp_divisibility(cfg, mesh)
    if optimizer_name == "adamw":
        optimizer = optax.adamw(learning_rate, weight_decay=0.01)
    elif optimizer_name == "adamw8bit":
        from .optim import adamw8bit

        optimizer = adamw8bit(learning_rate, weight_decay=0.01)
    else:
        raise ValueError(f"unknown optimizer {optimizer_name!r}")
    params = init_params(key, cfg)
    if mesh is not None:
        shardings = param_shardings(params, mesh, n_kv_heads=cfg.n_kv_heads)
        params = jax.tree.map(jax.device_put, params, shardings)
    opt_state = optimizer.init(params)
    return params, opt_state, optimizer


def _check_tp_divisibility(cfg: ModelConfig, mesh: Mesh,
                           model_axis: str = "model") -> None:
    """Tensor parallelism requires the model-axis size to divide BOTH head
    counts: an indivisible split forces XLA to cut projections through
    head_dim, producing sub-axis tilings the attention partitioner cannot
    express (deep internal compile errors).  Standard TP practice — reject
    it up front with guidance instead."""
    m = mesh.shape.get(model_axis, 1)
    if cfg.n_q_heads % m or cfg.n_kv_heads % m:
        raise ValueError(
            f"model axis size {m} must divide n_q_heads={cfg.n_q_heads} AND "
            f"n_kv_heads={cfg.n_kv_heads} for tensor-parallel training — "
            "pick a mesh whose model axis divides both (put the remaining "
            "devices on the data axis)"
        )


def make_train_step(
    cfg: ModelConfig,
    optimizer: optax.GradientTransformation,
    mesh: Optional[Mesh] = None,
    *,
    data_axis: str = "data",
    interpret: Optional[bool] = None,
):
    """Jitted (params, opt_state, tokens) -> (params, opt_state, loss).

    With ``cfg.attn_dropout > 0`` the step takes a 4th argument — an int32
    ``dropout_seed`` (pass the step index): attention dropout masks are a
    pure function of it, so training stays bitwise reproducible."""
    if mesh is not None:
        _check_tp_divisibility(cfg, mesh)

    # One body for both arities: with cfg.attn_dropout the caller passes a
    # trailing int32 dropout_seed (the step index).
    def step(params, opt_state, tokens, *seed):
        kw = dict(cfg=cfg, interpret=interpret)
        if cfg.attn_dropout:
            kw["dropout_seed"] = seed[0]
        loss, grads = jax.value_and_grad(
            functools.partial(loss_fn, **kw)
        )(params, tokens)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    # params and opt_state are donated: the updated state aliases the old
    # buffers instead of doubling the largest allocations in HBM (at the
    # 1-chip bench config that second copy is ~6GB — the difference between
    # the save_dots remat policy fitting and OOMing).  Callers follow the
    # standard rebind pattern `params, opt_state, loss = step(...)`.
    if mesh is None:
        return jax.jit(step, donate_argnums=(0, 1))
    token_sharding = NamedSharding(mesh, P(data_axis, None))
    in_shardings = (None, None, token_sharding)
    if cfg.attn_dropout:
        in_shardings += (None,)  # the replicated dropout_seed scalar
    return jax.jit(
        step, in_shardings=in_shardings,
        donate_argnums=(0, 1),
    )
