"""Batched token sampling for the decode engine.

North-star serving component (no reference counterpart — the reference has
no generation loop at all, SURVEY.md §0).  One jitted sampler handles a whole
decode batch with PER-SLOT parameters, so heterogeneous requests (greedy next
to top-p next to temperature-only) share the single static decode program:

- temperature == 0  → greedy argmax for that slot;
- top_k > 0         → keep the k highest-probability logits (k is dynamic
  per slot; the cutoff comes from one static ``lax.top_k`` over the batch's
  maximum k, so the program never recompiles);
- top_p < 1         → nucleus sampling: smallest probability mass ≥ p.

All filtering runs in fp32 on the [slots, vocab] logits; randomness comes
from one key folded with the step counter, split per slot.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional

import jax
import jax.numpy as jnp

_NEG = jnp.float32(-1e30)

# Static upper bound for per-slot top-k (lax.top_k needs a static k; slots
# requesting larger k fall back to no top-k filtering).
MAX_TOP_K = 64


@dataclasses.dataclass(frozen=True)
class SamplingParams:
    """Per-request sampling configuration.

    temperature=0 is greedy decoding (top_k / top_p ignored).
    """

    temperature: float = 0.0
    top_k: int = 0  # 0 = disabled
    top_p: float = 1.0  # 1 = disabled
    seed: int = 0

    def __post_init__(self):
        if self.temperature < 0:
            raise ValueError(f"temperature must be >= 0, got {self.temperature}")
        if self.top_k < 0:
            raise ValueError(f"top_k must be >= 0, got {self.top_k}")
        if not 0.0 < self.top_p <= 1.0:
            raise ValueError(f"top_p must be in (0, 1], got {self.top_p}")


GREEDY = SamplingParams()


@functools.partial(jax.jit, static_argnames=("vocab_pad",))
def sample_tokens(
    logits,  # [slots, vocab] any float dtype
    temperature,  # [slots] f32; 0 → greedy
    top_k,  # [slots] int32; 0 → disabled
    top_p,  # [slots] f32; 1 → disabled
    seeds,  # [slots] int32 per-request seeds
    positions,  # [slots] int32 — folded into the key for per-step streams
    vocab_pad: int = 0,  # trailing logits to ignore (padded vocab)
):
    """Per-slot filtered sampling; returns [slots] int32 token ids.

    Randomness is deterministic per (seed, position): re-running a request
    with the same seed reproduces its token stream regardless of which slot
    or batch it lands in.
    """
    logits = logits.astype(jnp.float32)
    slots, vocab = logits.shape
    if vocab_pad:
        pad_mask = jnp.arange(vocab) >= (vocab - vocab_pad)
        logits = jnp.where(pad_mask[None, :], _NEG, logits)

    greedy_tok = jnp.argmax(logits, axis=-1).astype(jnp.int32)

    # --- temperature ------------------------------------------------------
    safe_t = jnp.where(temperature > 0, temperature, 1.0)[:, None]
    scaled = logits / safe_t

    # --- top-k: cutoff at each slot's k-th highest logit -------------------
    kth_vals = jax.lax.top_k(scaled, MAX_TOP_K)[0]  # [slots, MAX_TOP_K] desc
    k_eff = jnp.clip(top_k, 1, MAX_TOP_K) - 1  # index of the cutoff
    cutoff = jnp.take_along_axis(kth_vals, k_eff[:, None], axis=1)
    use_top_k = jnp.logical_and(top_k > 0, top_k <= MAX_TOP_K)[:, None]
    scaled = jnp.where(
        jnp.logical_and(use_top_k, scaled < cutoff), _NEG, scaled
    )

    # --- top-p (nucleus): smallest prefix of sorted probs with mass >= p ---
    sorted_logits = jnp.sort(scaled, axis=-1)[:, ::-1]  # desc
    sorted_probs = jax.nn.softmax(sorted_logits, axis=-1)
    cum = jnp.cumsum(sorted_probs, axis=-1)
    # keep entries where the mass BEFORE them is < p (always keeps the top-1)
    keep_sorted = (cum - sorted_probs) < top_p[:, None]
    # threshold = smallest kept logit per slot
    thresh = jnp.min(
        jnp.where(keep_sorted, sorted_logits, jnp.inf), axis=-1, keepdims=True
    )
    scaled = jnp.where(scaled < thresh, _NEG, scaled)

    keys = jax.vmap(
        lambda s, pos: jax.random.fold_in(jax.random.PRNGKey(s), pos)
    )(seeds, positions)
    sampled = jax.vmap(jax.random.categorical)(keys, scaled).astype(jnp.int32)
    return jnp.where(temperature > 0, sampled, greedy_tok)


def batch_params(params_list, default: Optional[SamplingParams] = None):
    """Stack per-slot SamplingParams (None → default/greedy) into arrays."""
    default = default or GREEDY
    ps = [p or default for p in params_list]
    t = jnp.asarray([p.temperature for p in ps], jnp.float32)
    k = jnp.asarray([p.top_k for p in ps], jnp.int32)
    p_ = jnp.asarray([p.top_p for p in ps], jnp.float32)
    seeds = jnp.asarray([p.seed for p in ps], jnp.int32)
    return t, k, p_, seeds
