"""Batched token sampling for the decode engine.

North-star serving component (no reference counterpart — the reference has
no generation loop at all, SURVEY.md §0).  One jitted sampler handles a whole
decode batch with PER-SLOT parameters, so heterogeneous requests (greedy next
to top-p next to temperature-only) share the single static decode program:

- temperature == 0  → greedy argmax for that slot;
- top_k > 0         → keep the k highest-probability logits (k is dynamic
  per slot; the cutoff comes from one static ``lax.top_k`` over the batch's
  maximum k, so the program never recompiles; k is CLAMPED to MAX_TOP_K —
  clamping is closer to the requested behavior than silently disabling);
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
# requesting larger k are clamped to it).
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
    if vocab_pad:
        vocab = logits.shape[-1]
        pad_mask = jnp.arange(vocab) >= (vocab - vocab_pad)
        logits = jnp.where(pad_mask[None, :], _NEG, logits)

    greedy_tok = jnp.argmax(logits, axis=-1).astype(jnp.int32)
    scaled = filtered_logits(logits, temperature, top_k, top_p)
    keys = jax.vmap(
        lambda s, pos: jax.random.fold_in(jax.random.PRNGKey(s), pos)
    )(seeds, positions)
    sampled = jax.vmap(jax.random.categorical)(keys, scaled).astype(jnp.int32)
    return jnp.where(temperature > 0, sampled, greedy_tok)


def filtered_logits(logits, temperature, top_k, top_p):
    """Temperature-scaled logits with top-k / top-p filtering applied
    (_NEG where filtered).  softmax of the result is the EXACT distribution
    sampling draws from — speculative rejection sampling relies on that.

    ``logits`` is [slots, vocab] or [slots, steps, vocab]; the parameter
    arrays are per-slot and broadcast over intermediate axes.
    """
    param_shape = logits.shape[:1] + (1,) * (logits.ndim - 1)
    t = jnp.reshape(temperature, param_shape)
    k = jnp.reshape(top_k, param_shape)
    p = jnp.reshape(top_p, param_shape)

    safe_t = jnp.where(t > 0, t, 1.0)
    scaled = logits.astype(jnp.float32) / safe_t

    # --- top-k: cutoff at each slot's k-th highest logit (k clamped) -------
    kk = min(MAX_TOP_K, logits.shape[-1])
    kth_vals = jax.lax.top_k(scaled, kk)[0]  # [..., kk] desc
    k_eff = jnp.clip(k, 1, kk) - 1  # index of the cutoff
    cutoff = jnp.take_along_axis(
        kth_vals, jnp.broadcast_to(k_eff, scaled.shape[:-1] + (1,)), axis=-1
    )
    scaled = jnp.where(jnp.logical_and(k > 0, scaled < cutoff), _NEG, scaled)

    # --- top-p (nucleus): smallest prefix of sorted probs with mass >= p ---
    sorted_logits = jnp.flip(jnp.sort(scaled, axis=-1), axis=-1)  # desc
    sorted_probs = jax.nn.softmax(sorted_logits, axis=-1)
    cum = jnp.cumsum(sorted_probs, axis=-1)
    # keep entries where the mass BEFORE them is < p (always keeps the top-1)
    keep_sorted = (cum - sorted_probs) < p
    # threshold = smallest kept logit per slot
    thresh = jnp.min(
        jnp.where(keep_sorted, sorted_logits, jnp.inf), axis=-1, keepdims=True
    )
    return jnp.where(scaled < thresh, _NEG, scaled)


@jax.jit
def speculative_verify(
    target_logits,  # [slots, gamma, vocab] — logits after consuming proposals[:, :j+1]
    draft_logits,  # [slots, gamma-1, vocab] — the distributions that produced d_1..d_{γ-1}
    proposals,  # [slots, gamma] int32 — x0, d_1..d_{γ-1}
    temperature,  # [slots] f32; 0 → greedy verify (argmax match)
    top_k,  # [slots] int32
    top_p,  # [slots] f32
    seeds,  # [slots] int32
    base_positions,  # [slots] int32 — committed length before this round
):
    """Speculative-decoding verification (Leviathan et al.):

    accept d_{j+1} with prob min(1, p_j(d_{j+1}) / q_j(d_{j+1})); at the
    first rejection resample from the residual norm(max(p_j − q_j, 0)); if
    all γ−1 proposals are accepted, sample the bonus token from p_{γ−1}.
    The committed stream is distributed EXACTLY as plain sampling from the
    (filtered) target distribution, independent of draft quality.

    temperature == 0 degenerates to the greedy argmax-match rule.

    Returns (tokens [slots, gamma] int32, n_committed [slots] int32): the
    first n_committed[i] entries of tokens[i] are this round's output.
    """
    slots, gamma = proposals.shape
    p_f = filtered_logits(target_logits, temperature, top_k, top_p)
    q_f = filtered_logits(draft_logits, temperature, top_k, top_p)
    p_probs = jax.nn.softmax(p_f, axis=-1)  # [slots, gamma, vocab]
    q_probs = jax.nn.softmax(q_f, axis=-1)  # [slots, gamma-1, vocab]

    greedy = jnp.argmax(target_logits, axis=-1).astype(jnp.int32)

    # Acceptance tests for d_{j+1} (j = 0..γ-2).
    d_next = proposals[:, 1:].astype(jnp.int32)  # [slots, γ-1]
    p_at = jnp.take_along_axis(
        p_probs[:, : gamma - 1], d_next[..., None], axis=-1
    )[..., 0]
    q_at = jnp.take_along_axis(q_probs, d_next[..., None], axis=-1)[..., 0]
    keys = jax.vmap(
        lambda s, pos: jax.random.fold_in(
            jax.random.fold_in(jax.random.PRNGKey(s), pos), 2
        )
    )(seeds, base_positions)
    u = jax.vmap(lambda k_: jax.random.uniform(k_, (gamma - 1,)))(keys)
    accept_sampled = u * q_at <= p_at
    accept_greedy = d_next == greedy[:, : gamma - 1]
    accept = jnp.where(
        (temperature > 0)[:, None], accept_sampled, accept_greedy
    )
    m = jnp.sum(jnp.cumprod(accept.astype(jnp.int32), axis=-1), axis=-1)

    # Replacement distribution at index m: residual when a proposal was
    # rejected (m < γ-1), the target's bonus distribution when all accepted.
    p_m = jnp.take_along_axis(p_probs, m[:, None, None], axis=1)[:, 0]
    q_pad = jnp.concatenate(  # align: residual undefined at index γ-1
        [q_probs, jnp.zeros_like(q_probs[:, :1])], axis=1
    )
    q_m = jnp.take_along_axis(q_pad, m[:, None, None], axis=1)[:, 0]
    residual = jnp.maximum(p_m - q_m, 0.0)
    res_mass = jnp.sum(residual, axis=-1, keepdims=True)
    use_residual = jnp.logical_and(m < gamma - 1, res_mass[:, 0] > 0)
    dist = jnp.where(use_residual[:, None], residual, p_m)
    rep_keys = jax.vmap(
        lambda s, pos: jax.random.fold_in(
            jax.random.fold_in(jax.random.PRNGKey(s), pos), 3
        )
    )(seeds, base_positions + m)
    rep_sampled = jax.vmap(
        lambda k_, d: jax.random.categorical(k_, jnp.log(jnp.maximum(d, 1e-38)))
    )(rep_keys, dist).astype(jnp.int32)
    rep_greedy = jnp.take_along_axis(greedy, m[:, None], axis=1)[:, 0]
    replacement = jnp.where(temperature > 0, rep_sampled, rep_greedy)

    # tokens[:, :m] = accepted proposals d_1..d_m; tokens[:, m] = replacement.
    cols = jnp.arange(gamma)[None, :]
    toks = jnp.concatenate(
        [d_next, jnp.zeros((slots, 1), jnp.int32)], axis=1
    )
    tokens = jnp.where(cols == m[:, None], replacement[:, None], toks)
    return tokens, (m + 1).astype(jnp.int32)


def batch_params(params_list, default: Optional[SamplingParams] = None):
    """Stack per-slot SamplingParams (None → default/greedy) into arrays."""
    default = default or GREEDY
    ps = [p or default for p in params_list]
    t = jnp.asarray([p.temperature for p in ps], jnp.float32)
    k = jnp.asarray([p.top_k for p in ps], jnp.int32)
    p_ = jnp.asarray([p.top_p for p in ps], jnp.float32)
    seeds = jnp.asarray([p.seed for p in ps], jnp.int32)
    return t, k, p_, seeds
