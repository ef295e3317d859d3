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
