"""Sampler contract: greedy equivalence, filtering, determinism."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flash_attention_dlrs_tpu.runtime.sampling import (
    GREEDY, MAX_TOP_K, SamplingParams, batch_params, sample_tokens,
)


def _logits(key, slots=4, vocab=997):
    return jax.random.normal(key, (slots, vocab), jnp.float32) * 3.0


def _sample(logits, params_list, positions=None):
    t, k, p, s = batch_params(params_list)
    if positions is None:
        positions = jnp.zeros(len(params_list), jnp.int32)
    return np.asarray(sample_tokens(logits, t, k, p, s, positions))


def test_temperature_zero_is_argmax():
    logits = _logits(jax.random.PRNGKey(0))
    toks = _sample(logits, [GREEDY] * 4)
    np.testing.assert_array_equal(toks, np.argmax(np.asarray(logits), -1))


def test_top_k_one_is_argmax_even_with_temperature():
    logits = _logits(jax.random.PRNGKey(1))
    sp = SamplingParams(temperature=5.0, top_k=1, seed=3)
    toks = _sample(logits, [sp] * 4)
    np.testing.assert_array_equal(toks, np.argmax(np.asarray(logits), -1))


def test_top_k_restricts_support():
    logits = _logits(jax.random.PRNGKey(2), slots=1)
    sp = SamplingParams(temperature=10.0, top_k=8, seed=0)
    top8 = set(np.argsort(np.asarray(logits[0]))[-8:].tolist())
    for seed in range(20):
        toks = _sample(logits, [SamplingParams(10.0, 8, 1.0, seed)])
        assert toks[0] in top8


def test_top_k_above_cap_clamps_not_disables():
    """top_k > MAX_TOP_K clamps to MAX_TOP_K (closer to the request than
    silently sampling the full distribution)."""
    from flash_attention_dlrs_tpu.runtime.sampling import MAX_TOP_K

    logits = _logits(jax.random.PRNGKey(4), slots=1)
    top = set(np.argsort(np.asarray(logits[0]))[-MAX_TOP_K:].tolist())
    for seed in range(20):
        sp = SamplingParams(10.0, MAX_TOP_K + 36, 1.0, seed)
        assert _sample(logits, [sp])[0] in top


def test_top_p_keeps_at_least_top1_and_restricts():
    # Sharp distribution: top_p=0.5 must reduce to near-greedy
    logits = jnp.asarray([[10.0, 1.0, 0.5, 0.1] + [-5.0] * 60], jnp.float32)
    for seed in range(10):
        sp = SamplingParams(temperature=1.0, top_p=0.5, seed=seed)
        toks = _sample(logits, [sp])
        assert toks[0] == 0


def test_seed_position_determinism_slot_independent():
    logits = _logits(jax.random.PRNGKey(3), slots=2)
    sp = SamplingParams(temperature=1.0, seed=42)
    pos = jnp.asarray([7, 7], jnp.int32)
    # same seed+position in different slots with same logits row -> same token
    same_row = jnp.stack([logits[0], logits[0]])
    toks = _sample(same_row, [sp, sp], pos)
    assert toks[0] == toks[1]
    # different position -> (almost surely) a different stream
    toks_a = _sample(same_row, [sp, sp], jnp.asarray([7, 8], jnp.int32))
    assert toks_a[0] == toks[0]


def test_mixed_batch_greedy_and_sampled():
    logits = _logits(jax.random.PRNGKey(4), slots=3)
    mixed = [GREEDY, SamplingParams(temperature=1.5, seed=1), None]
    toks = _sample(logits, mixed)
    arg = np.argmax(np.asarray(logits), -1)
    assert toks[0] == arg[0] and toks[2] == arg[2]


def test_param_validation():
    with pytest.raises(ValueError):
        SamplingParams(temperature=-1.0)
    with pytest.raises(ValueError):
        SamplingParams(top_p=0.0)
    with pytest.raises(ValueError):
        SamplingParams(top_k=-2)


def test_engine_sampled_generation_deterministic():
    from flash_attention_dlrs_tpu.models import ModelConfig, init_params
    from flash_attention_dlrs_tpu.runtime.engine import DecodeEngine

    cfg = ModelConfig(vocab_size=128, d_model=64, n_layers=1, n_q_heads=2,
                      n_kv_heads=1, head_dim=32, d_ff=128, dtype=jnp.float32)
    params = init_params(jax.random.PRNGKey(0), cfg)
    sp = SamplingParams(temperature=1.0, top_k=16, seed=9)

    def run():
        eng = DecodeEngine(params, cfg, num_pages=32, page_size=64,
                           pages_per_seq=4)
        return eng.generate([[1, 2, 3], [4, 5]], max_new_tokens=6, sampling=sp)

    a, b = run(), run()
    assert a == b
    assert all(len(x) == 6 for x in a)
