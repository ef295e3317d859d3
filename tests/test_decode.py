"""Paged decode attention: correctness vs dense oracle, bf16/int8/fp8 KV."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flash_attention_dlrs_tpu.ops.decode import (
    paged_decode_attention,
    paged_reference_attention,
    quantize_kv_pages,
)


def _setup(seed, *, batch=4, hq=8, hkv=2, pages=32, page_size=128, d=128,
           pages_per_seq=8, dtype=jnp.float32):
    keys = jax.random.split(jax.random.PRNGKey(seed), 4)
    q = jax.random.normal(keys[0], (batch, hq, d), dtype)
    k_pages = jax.random.normal(keys[1], (hkv, pages, page_size, d), dtype)
    v_pages = jax.random.normal(keys[2], (hkv, pages, page_size, d), dtype)
    # Distinct random page assignment per sequence (pages can be shared
    # across sequences in principle; use disjoint here for clarity).
    perm = jax.random.permutation(keys[3], pages)[: batch * pages_per_seq]
    page_indices = perm.reshape(batch, pages_per_seq)
    max_len = pages_per_seq * page_size
    lengths = jnp.array(
        [max_len, max_len - 37, page_size + 5, 1][:batch], jnp.int32
    )
    return q, k_pages, v_pages, lengths, page_indices


@pytest.mark.parametrize("pages_per_block", [2, 4])
def test_paged_decode_fp32(pages_per_block):
    q, kp, vp, lengths, pidx = _setup(0)
    o = paged_decode_attention(
        q, kp, vp, lengths, pidx, pages_per_block=pages_per_block
    )
    o_ref = paged_reference_attention(q, kp, vp, lengths, pidx)
    np.testing.assert_allclose(o, o_ref, atol=2e-4, rtol=1e-4)


def test_paged_decode_gqa_group_sizes():
    for hq, hkv in [(2, 2), (16, 2), (4, 1)]:
        q, kp, vp, lengths, pidx = _setup(1, hq=hq, hkv=hkv, batch=2)
        o = paged_decode_attention(q, kp, vp, lengths, pidx)
        o_ref = paged_reference_attention(q, kp, vp, lengths, pidx)
        np.testing.assert_allclose(o, o_ref, atol=2e-4, rtol=1e-4)


def test_paged_decode_int8_kv():
    q, kp, vp, lengths, pidx = _setup(2, batch=2)
    kq = quantize_kv_pages(kp, jnp.int8)
    vq = quantize_kv_pages(vp, jnp.int8)
    o = paged_decode_attention(q, kq, vq, lengths, pidx)
    # Oracle on the dequantized pages: isolates kernel error from
    # quantization error.
    o_ref = paged_reference_attention(q, kq, vq, lengths, pidx)
    np.testing.assert_allclose(o, o_ref, atol=2e-3, rtol=1e-3)
    # And the end-to-end quantization error vs the fp32 pages stays small.
    o_fp = paged_reference_attention(q, kp, vp, lengths, pidx)
    assert float(jnp.max(jnp.abs(o - o_fp))) < 0.15


def test_paged_decode_fp8_kv():
    q, kp, vp, lengths, pidx = _setup(3, batch=2)
    kq = quantize_kv_pages(kp, jnp.float8_e4m3fn)
    vq = quantize_kv_pages(vp, jnp.float8_e4m3fn)
    o = paged_decode_attention(q, kq, vq, lengths, pidx)
    o_ref = paged_reference_attention(q, kq, vq, lengths, pidx)
    np.testing.assert_allclose(o, o_ref, atol=2e-3, rtol=1e-3)


def test_paged_decode_bf16():
    q, kp, vp, lengths, pidx = _setup(4, batch=2, dtype=jnp.bfloat16)
    o = paged_decode_attention(q, kp, vp, lengths, pidx)
    o_ref = paged_reference_attention(q, kp, vp, lengths, pidx)
    np.testing.assert_allclose(
        np.asarray(o, np.float32), np.asarray(o_ref, np.float32),
        atol=3e-2, rtol=3e-2,
    )


def test_paged_decode_zero_length():
    q, kp, vp, lengths, pidx = _setup(5, batch=4)
    lengths = lengths.at[1].set(0)
    o = paged_decode_attention(q, kp, vp, lengths, pidx)
    assert bool(jnp.all(o[1] == 0.0))
    o_ref = paged_reference_attention(q, kp, vp, lengths, pidx)
    np.testing.assert_allclose(o, o_ref, atol=2e-4, rtol=1e-4)
