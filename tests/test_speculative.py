"""Speculative decoding: output-equivalence with plain greedy decoding.

The defining correctness property: speculative greedy generation produces
EXACTLY the target model's greedy stream regardless of draft quality — the
draft only changes how many rounds it takes.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flash_attention_dlrs_tpu.models import ModelConfig, init_params
from flash_attention_dlrs_tpu.runtime.engine import DecodeEngine

CFG = dict(vocab_size=128, d_model=64, n_layers=2, n_q_heads=4,
           n_kv_heads=2, head_dim=32, d_ff=128, dtype=jnp.float32)


def _engine(params, cfg, **kw):
    return DecodeEngine(params, cfg, num_pages=64, page_size=64,
                        pages_per_seq=6, **kw)


PROMPTS = [[1, 2, 3, 4, 5], [9, 8, 7]]


@pytest.mark.parametrize("gamma", [2, 4])
def test_speculative_equals_greedy_perfect_draft(gamma):
    """Draft == target: everything accepted, output identical to greedy."""
    cfg = ModelConfig(**CFG)
    params = init_params(jax.random.PRNGKey(0), cfg)
    plain = _engine(params, cfg).generate(PROMPTS, max_new_tokens=12)
    target = _engine(params, cfg)
    draft = _engine(params, cfg)
    spec = target.generate_speculative(
        PROMPTS, draft=draft, gamma=gamma, max_new_tokens=12
    )
    assert spec == plain


def test_speculative_equals_greedy_bad_draft():
    """Draft with DIFFERENT weights: output must still equal target greedy."""
    cfg = ModelConfig(**CFG)
    params = init_params(jax.random.PRNGKey(0), cfg)
    draft_params = init_params(jax.random.PRNGKey(123), cfg)  # unrelated model
    plain = _engine(params, cfg).generate(PROMPTS, max_new_tokens=10)
    target = _engine(params, cfg)
    draft = _engine(draft_params, cfg)
    spec = target.generate_speculative(
        PROMPTS, draft=draft, gamma=3, max_new_tokens=10
    )
    assert spec == plain


def test_speculative_smaller_draft_model():
    """Draft can be a structurally smaller model (fewer layers/heads)."""
    cfg = ModelConfig(**CFG)
    dcfg = ModelConfig(**{**CFG, "n_layers": 1, "d_ff": 64})
    params = init_params(jax.random.PRNGKey(0), cfg)
    dparams = init_params(jax.random.PRNGKey(1), dcfg)
    plain = _engine(params, cfg).generate(PROMPTS, max_new_tokens=8)
    target = _engine(params, cfg)
    draft = _engine(dparams, dcfg)
    spec = target.generate_speculative(
        PROMPTS, draft=draft, gamma=4, max_new_tokens=8
    )
    assert spec == plain


def test_speculative_perfect_draft_minimal_rounds():
    """Draft == target must accept EVERY proposal: rounds == ceil((T-1)/γ).

    Regression for the stale-KV bug: when all γ−1 proposals were accepted the
    draft never wrote K/V for the final one, so the next round's draft
    decoded over a stale slot and acceptance silently degraded (extra
    rounds), even though the output stayed correct.
    """
    from flash_attention_dlrs_tpu.runtime.speculative import (
        make_draft_propose, make_verify_accept,
    )

    cfg = ModelConfig(**CFG)
    params = init_params(jax.random.PRNGKey(0), cfg)
    target = _engine(params, cfg)
    draft = _engine(params, cfg)
    gamma, max_new = 4, 13  # 12 post-admit tokens = 3 full rounds
    calls = []
    inner = make_verify_accept(cfg, gamma, interpret=target.interpret)

    def counting(*a, **k):
        calls.append(1)
        return inner(*a, **k)

    import weakref

    target._verify_cache[gamma] = (
        weakref.ref(draft),
        (
            make_draft_propose(cfg, gamma, draft.page_size,
                               interpret=draft.interpret),
            counting,
        ),
    )
    spec = target.generate_speculative(
        [[1, 2, 3, 4, 5]], draft=draft, gamma=gamma, max_new_tokens=max_new
    )
    assert len(spec[0]) == max_new
    assert len(calls) == -(-(max_new - 1) // gamma)  # == 3


def test_speculative_verify_preserves_target_distribution():
    """Rejection sampling: the first committed token's marginal equals the
    (filtered) target distribution, for an arbitrary (bad) draft."""
    from flash_attention_dlrs_tpu.runtime.sampling import (
        filtered_logits, speculative_verify,
    )

    rng = np.random.default_rng(7)
    vocab, gamma, trials = 8, 3, 4000
    t_logits = jnp.asarray(rng.normal(size=(1, gamma, vocab)), jnp.float32)
    d_logits = jnp.asarray(rng.normal(size=(1, gamma - 1, vocab)), jnp.float32)
    temp = jnp.ones(trials, jnp.float32)
    top_k = jnp.zeros(trials, jnp.int32)
    top_p = jnp.ones(trials, jnp.float32)
    seeds = jnp.arange(trials, dtype=jnp.int32)
    base = jnp.zeros(trials, jnp.int32)

    # Proposals drawn from the draft distribution q_0 (as the engine does).
    q0 = np.asarray(jax.nn.softmax(d_logits[0, 0]))
    d1 = rng.choice(vocab, size=trials, p=q0)
    proposals = jnp.asarray(
        np.stack([np.zeros(trials), d1, rng.integers(0, vocab, trials)], 1),
        jnp.int32,
    )
    tokens, n_committed = speculative_verify(
        jnp.broadcast_to(t_logits, (trials, gamma, vocab)),
        jnp.broadcast_to(d_logits, (trials, gamma - 1, vocab)),
        proposals, temp, top_k, top_p, seeds, base,
    )
    first = np.asarray(tokens[:, 0])
    assert np.all(np.asarray(n_committed) >= 1)

    expected = np.asarray(
        jax.nn.softmax(filtered_logits(
            t_logits[:, 0], temp[:1], top_k[:1], top_p[:1]))[0]
    )
    counts = np.bincount(first, minlength=vocab)
    # chi-square: sum (obs-exp)^2/exp ~ chi2(V-1); 99.9% quantile(7) ~ 24.3
    chi2 = float(np.sum((counts - trials * expected) ** 2
                        / (trials * expected)))
    assert chi2 < 24.3, (chi2, counts.tolist(), (trials * expected).tolist())


def test_speculative_verify_greedy_rule():
    """temperature=0 degenerates to the argmax-match rule."""
    from flash_attention_dlrs_tpu.runtime.sampling import speculative_verify

    vocab, gamma = 8, 3
    t_logits = np.zeros((2, gamma, vocab), np.float32)
    # slot 0: greedy tokens are [3, 5, 1]; proposals match d1=3, d2=5
    for j, g in enumerate([3, 5, 1]):
        t_logits[0, j, g] = 5.0
    # slot 1: greedy [2, 6, 4]; proposal d1=7 mismatches immediately
    for j, g in enumerate([2, 6, 4]):
        t_logits[1, j, g] = 5.0
    d_logits = np.zeros((2, gamma - 1, vocab), np.float32)
    proposals = jnp.asarray([[0, 3, 5], [0, 7, 6]], jnp.int32)
    zeros = jnp.zeros(2, jnp.int32)
    tokens, n_committed = speculative_verify(
        jnp.asarray(t_logits), jnp.asarray(d_logits), proposals,
        jnp.zeros(2, jnp.float32), zeros, jnp.ones(2, jnp.float32),
        zeros, zeros,
    )
    assert np.asarray(n_committed).tolist() == [3, 1]
    assert np.asarray(tokens)[0].tolist() == [3, 5, 1]  # d1 d2 + bonus
    assert np.asarray(tokens)[1, 0] == 2  # correction = greedy[0]


def test_speculative_sampling_engine_end_to_end():
    """temperature>0 through the engine: deterministic per seed, varies
    across seeds, and respects max_new_tokens."""
    from flash_attention_dlrs_tpu.runtime.sampling import SamplingParams

    cfg = ModelConfig(**CFG)
    params = init_params(jax.random.PRNGKey(0), cfg)
    draft_params = init_params(jax.random.PRNGKey(123), cfg)

    def run(seed):
        target = _engine(params, cfg)
        draft = _engine(draft_params, cfg)
        return target.generate_speculative(
            PROMPTS, draft=draft, gamma=3, max_new_tokens=10,
            sampling=SamplingParams(temperature=1.0, seed=seed),
        )

    a, b, c = run(5), run(5), run(11)
    assert a == b
    assert all(len(o) == 10 for o in a)
    assert a != c  # overwhelmingly likely with 20 sampled tokens


def test_speculative_with_quantized_kv():
    """Speculative loop over int8-KV pools (verify step writes quantized)."""
    cfg = ModelConfig(**CFG)
    params = init_params(jax.random.PRNGKey(0), cfg)

    def eng():
        return DecodeEngine(params, cfg, num_pages=64, page_size=64,
                            pages_per_seq=6, quantized_kv=True,
                            kv_dtype=jnp.int8)

    plain = eng().generate(PROMPTS, max_new_tokens=8)
    spec = eng().generate_speculative(
        PROMPTS, draft=eng(), gamma=3, max_new_tokens=8
    )
    assert spec == plain


def test_finished_slot_draft_lengths_bounded():
    """A slot that hits EOS early keeps riding the fixed-shape batched
    draft calls; its draft lengths must be rolled back every round —
    unchecked they grow by gamma per round and leak pages until the pool
    exhausts (regression test for that leak)."""
    cfg = ModelConfig(**CFG)
    params = init_params(jax.random.PRNGKey(0), cfg)
    p2 = init_params(jax.random.PRNGKey(1), cfg)  # bad draft → many rounds
    plain = _engine(params, cfg).generate(PROMPTS, max_new_tokens=12)
    eos = plain[0][1]  # finishes slot 0 after 2 tokens
    assert eos not in plain[1][:8], "pick different seeds"

    target = _engine(params, cfg, eos_token=eos)
    draft = _engine(p2, cfg, eos_token=eos, native_allocator=False)
    seen = {}
    orig = draft.allocator.ensure_capacity

    def spy(sid, n):
        seen[sid] = max(seen.get(sid, 0), n)
        return orig(sid, n)

    draft.allocator.ensure_capacity = spy
    out = target.generate_speculative(
        PROMPTS, draft=draft, gamma=4, max_new_tokens=12)
    assert out[0][:2] == plain[0][:2] and out[0][-1] == eos
    assert len(out[1]) == 12
    # slot 0's draft capacity stays near its short committed stream
    # (prompt 5 + ~2 tokens + one gamma window), nowhere near the
    # rounds*gamma growth of the leak
    assert seen["spec0"] <= len(PROMPTS[0]) + 2 + 2 * 4, seen


# ---------------------------------------------------------------------------
# Whole-generation fused programs (one dispatch for all rounds)
# ---------------------------------------------------------------------------


def test_fused_plain_equals_host_loop_generate():
    cfg = ModelConfig(**CFG)
    params = init_params(jax.random.PRNGKey(0), cfg)
    plain = _engine(params, cfg).generate(PROMPTS, max_new_tokens=12)
    fused = _engine(params, cfg).generate_fused(PROMPTS, max_new_tokens=12)
    assert fused == plain


@pytest.mark.parametrize("gamma", [2, 4])
def test_fused_spec_equals_greedy(gamma):
    """Single-dispatch speculative generation == plain greedy stream, with
    a structurally different draft (the defining property survives the
    device-side commit loop)."""
    cfg = ModelConfig(**CFG)
    dcfg = ModelConfig(**{**CFG, "n_layers": 1, "d_ff": 64})
    params = init_params(jax.random.PRNGKey(0), cfg)
    d_params = init_params(jax.random.PRNGKey(7), dcfg)
    plain = _engine(params, cfg).generate(PROMPTS, max_new_tokens=12)
    target = _engine(params, cfg)
    draft = _engine(d_params, dcfg)
    spec = target.generate_speculative_fused(
        PROMPTS, draft=draft, gamma=gamma, max_new_tokens=12
    )
    assert spec == plain
    st = target.spec_stats
    assert st["rounds"] >= 1 and 0 <= st["accepted"] <= st["proposed"]


def test_fused_spec_matches_per_round_spec():
    """The fused program and the 2-dispatch-per-round loop agree token for
    token AND on measured acceptance."""
    cfg = ModelConfig(**CFG)
    params = init_params(jax.random.PRNGKey(0), cfg)
    d_params = init_params(jax.random.PRNGKey(123), cfg)
    t1, d1 = _engine(params, cfg), _engine(d_params, cfg)
    per_round = t1.generate_speculative(
        PROMPTS, draft=d1, gamma=3, max_new_tokens=10
    )
    st1 = t1.spec_stats
    t2, d2 = _engine(params, cfg), _engine(d_params, cfg)
    fused = t2.generate_speculative_fused(
        PROMPTS, draft=d2, gamma=3, max_new_tokens=10
    )
    st2 = t2.spec_stats
    assert fused == per_round
    assert st1["accepted"] == st2["accepted"]
    assert st1["proposed"] == st2["proposed"]


def test_fused_plain_sampling_matches_host_loop():
    """temperature>0: the fused loop keys randomness on (seed, position)
    exactly like the host loop, so the sampled streams match token for
    token."""
    from flash_attention_dlrs_tpu.runtime.sampling import SamplingParams

    cfg = ModelConfig(**CFG)
    params = init_params(jax.random.PRNGKey(0), cfg)
    sp = SamplingParams(temperature=0.8, top_k=20, seed=41)
    host = _engine(params, cfg).generate(
        PROMPTS, max_new_tokens=12, sampling=sp
    )
    fused = _engine(params, cfg).generate_fused(
        PROMPTS, max_new_tokens=12, sampling=sp
    )
    assert fused == host
