"""High-level training loop: schedules, clipping, accumulation, resume.

The reference ships no training loop at all (SURVEY.md §0); this is the
framework piece that ties the stack together — `make_train_step`'s donated
mesh-sharded step, the token loaders (`runtime.data` / the native C++
prefetcher), `utils.checkpoint` (orbax), and `utils.metrics` — behind one
``fit()`` with the invariants a production loop needs:

- **Determinism across restarts**: the checkpoint carries (params,
  opt_state, loader cursor, step); a resumed run consumes exactly the
  batches the uninterrupted run would have, and attention-dropout masks are
  a pure function of the step index — bitwise-reproducible training.
- **Gradient accumulation** without an HBM blowup: microbatches stream
  through a `lax.scan` whose carry is the running gradient mean; one
  optimizer update per outer step.
- **Warmup + cosine schedule** and **global-norm clipping** composed into
  the optax chain (both optimizers, incl. the blockwise-int8 AdamW).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Callable, Dict, Iterator, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

import numpy as np

from ..runtime.data import LoaderState
from ..utils import checkpoint as ckpt_lib
from ..utils.metrics import MetricsLogger, ThroughputMeter
from .train import _check_tp_divisibility, param_shardings
from .transformer import ModelConfig, init_params, loss_fn


def _cursor(state) -> "np.ndarray":
    """LoaderState → a checkpointable (epoch, index) int64 array."""
    if state is None:
        return np.zeros(2, np.int64)
    return np.array([state.epoch, state.index], np.int64)


@dataclasses.dataclass(frozen=True)
class TrainSpec:
    """Optimization hyperparameters for :func:`fit` / :func:`make_optimizer`."""

    learning_rate: float = 3e-4
    warmup_steps: int = 0
    # Cosine decay horizon (optimizer steps).  None = constant after warmup.
    total_steps: Optional[int] = None
    min_lr_ratio: float = 0.1
    weight_decay: float = 0.01
    grad_clip_norm: float = 0.0  # global-norm clip; 0 = off
    accum_steps: int = 1  # microbatches averaged per optimizer step
    optimizer: str = "adamw"  # or "adamw8bit" (blockwise-int8 moments)

    def __post_init__(self):
        if self.accum_steps < 1:
            raise ValueError(f"accum_steps must be >= 1, got {self.accum_steps}")
        if self.optimizer not in ("adamw", "adamw8bit"):
            raise ValueError(f"unknown optimizer {self.optimizer!r}")


def lr_schedule(spec: TrainSpec) -> optax.Schedule:
    """Linear warmup → cosine decay to min_lr_ratio (constant when
    total_steps is None)."""
    peak = spec.learning_rate
    if spec.total_steps is None:
        if not spec.warmup_steps:
            return optax.constant_schedule(peak)
        return optax.join_schedules(
            [optax.linear_schedule(0.0, peak, spec.warmup_steps),
             optax.constant_schedule(peak)],
            [spec.warmup_steps],
        )
    decay = max(1, spec.total_steps - spec.warmup_steps)
    return optax.warmup_cosine_decay_schedule(
        init_value=0.0, peak_value=peak, warmup_steps=spec.warmup_steps,
        decay_steps=spec.total_steps, end_value=peak * spec.min_lr_ratio,
    ) if spec.warmup_steps else optax.cosine_decay_schedule(
        peak, decay, alpha=spec.min_lr_ratio,
    )


def make_optimizer(spec: TrainSpec) -> optax.GradientTransformation:
    sched = lr_schedule(spec)
    if spec.optimizer == "adamw8bit":
        from .optim import adamw8bit

        opt = adamw8bit(sched, weight_decay=spec.weight_decay)
    else:
        opt = optax.adamw(sched, weight_decay=spec.weight_decay)
    if spec.grad_clip_norm:
        opt = optax.chain(optax.clip_by_global_norm(spec.grad_clip_norm), opt)
    return opt


def make_accum_train_step(
    cfg: ModelConfig,
    optimizer: optax.GradientTransformation,
    mesh: Optional[Mesh] = None,
    *,
    accum_steps: int,
    data_axis: str = "data",
    interpret: Optional[bool] = None,
):
    """Jitted (params, opt_state, tokens [A·b, N], [dropout_seed]) →
    (params, opt_state, loss): the batch is split into ``accum_steps``
    microbatches scanned with a running-mean gradient carry, then ONE
    optimizer update — peak HBM is one microbatch's activations plus one
    gradient pytree, independent of A."""
    if mesh is not None:
        _check_tp_divisibility(cfg, mesh)

    has_dropout = bool(cfg.attn_dropout)

    def step(params, opt_state, tokens, *seed):
        a = accum_steps
        b_total, n = tokens.shape
        if b_total % a:
            raise ValueError(
                f"batch {b_total} must divide by accum_steps {a}")
        micro = tokens.reshape(a, b_total // a, n)

        def micro_grads(i, toks):
            kw = dict(cfg=cfg, interpret=interpret)
            if has_dropout:
                # distinct sub-seed per microbatch (step seed + micro idx)
                kw["dropout_seed"] = seed[0] + jnp.int32(7368787) * i
            return jax.value_and_grad(
                functools.partial(loss_fn, **kw))(params, toks)

        def body(carry, xs):
            loss_acc, grad_acc = carry
            i, toks = xs
            loss, grads = micro_grads(i, toks)
            grad_acc = jax.tree.map(lambda g_a, g: g_a + g / a, grad_acc, grads)
            return (loss_acc + loss / a, grad_acc), None

        zero_grads = jax.tree.map(
            lambda p: jnp.zeros(p.shape, jnp.float32)
            if jnp.issubdtype(p.dtype, jnp.floating) else jnp.zeros_like(p),
            params,
        )
        (loss, grads), _ = jax.lax.scan(
            body, (jnp.zeros((), jnp.float32), zero_grads),
            (jnp.arange(a, dtype=jnp.int32), micro),
        )
        grads = jax.tree.map(
            lambda g, p: g.astype(p.dtype) if hasattr(p, "dtype") else g,
            grads, params,
        )
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    if mesh is None:
        return jax.jit(step, donate_argnums=(0, 1))
    token_sharding = NamedSharding(mesh, P(data_axis, None))
    in_shardings = (None, None, token_sharding) + ((None,) if has_dropout else ())
    return jax.jit(step, in_shardings=in_shardings, donate_argnums=(0, 1))


def fit(
    cfg: ModelConfig,
    batches,  # iterator of (tokens [B, N+1], state), or callable(state)->iterator
    *,
    spec: TrainSpec = TrainSpec(),
    steps: int,
    mesh: Optional[Mesh] = None,
    seed: int = 0,
    checkpoint_dir: Optional[str] = None,
    checkpoint_every: int = 0,  # 0 = only at the end (if dir given)
    metrics_path: Optional[str] = None,
    log_every: int = 10,
    interpret: Optional[bool] = None,
    on_step: Optional[Callable[[int, float], None]] = None,
) -> Dict:
    """Train for ``steps`` optimizer steps; returns the final state dict
    ``{"params", "opt_state", "step", "loader_state"}``.

    ``batches`` is any iterator yielding (tokens, resumable_state) — the
    contract of ``runtime.data.batches`` and the native C++ loader — or a
    CALLABLE ``lambda state: iterator`` so a resumed run can rebuild the
    stream from the checkpointed cursor.  With ``checkpoint_dir`` set, an
    existing checkpoint resumes step, params, optimizer moments, and (for
    callable ``batches``) the data cursor — bitwise-identical to the
    uninterrupted run."""
    optimizer = make_optimizer(spec)
    params = init_params(jax.random.PRNGKey(seed), cfg)
    if mesh is not None:
        _check_tp_divisibility(cfg, mesh)
        params = jax.tree.map(
            jax.device_put, params,
            param_shardings(params, mesh, n_kv_heads=cfg.n_kv_heads))
    opt_state = optimizer.init(params)
    start_step = 0
    loader_state = None

    if checkpoint_dir is not None:
        last = ckpt_lib.latest_step(checkpoint_dir)
        if last is not None:
            restored, _ = ckpt_lib.restore_checkpoint(
                checkpoint_dir,
                {"params": params, "opt_state": opt_state,
                 "loader_cursor": np.zeros(2, np.int64), "step": 0},
                step=last,
            )
            params = restored["params"]
            opt_state = restored["opt_state"]
            cur = np.asarray(restored["loader_cursor"])
            loader_state = LoaderState(epoch=int(cur[0]), index=int(cur[1]))
            start_step = int(restored["step"])

    if callable(batches) and not hasattr(batches, "__next__"):
        batches = batches(loader_state)

    if spec.accum_steps > 1:
        step_fn = make_accum_train_step(
            cfg, optimizer, mesh, accum_steps=spec.accum_steps,
            interpret=interpret)
    else:
        from .train import make_train_step

        step_fn = make_train_step(cfg, optimizer, mesh, interpret=interpret)

    logger = MetricsLogger(metrics_path) if metrics_path else None
    meter = ThroughputMeter()
    loss = float("nan")
    for step in range(start_step, steps):
        tokens, loader_state = next(batches)
        tokens = jnp.asarray(tokens)
        args = (params, opt_state, tokens)
        if cfg.attn_dropout:
            args += (jnp.int32(step),)
        params, opt_state, loss = step_fn(*args)
        meter.update(int(tokens.size))
        if logger and (step % log_every == 0 or step == steps - 1):
            loss_f = float(loss)
            logger.log(step, loss=loss_f, tokens_per_s=meter.rate)
        if on_step is not None:
            on_step(step, loss)
        if checkpoint_dir and checkpoint_every and (
                (step + 1) % checkpoint_every == 0):
            ckpt_lib.save_checkpoint(
                checkpoint_dir,
                {"params": params, "opt_state": opt_state,
                 "loader_cursor": _cursor(loader_state), "step": step + 1},
                step=step + 1)
    if checkpoint_dir:
        ckpt_lib.save_checkpoint(
            checkpoint_dir,
            {"params": params, "opt_state": opt_state,
             "loader_cursor": _cursor(loader_state), "step": steps},
            step=steps)
    if logger:
        logger.close()
    return {"params": params, "opt_state": opt_state, "step": steps,
            "loader_state": loader_state}
