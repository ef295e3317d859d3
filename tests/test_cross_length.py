"""Cross-length causal attention + the tiny-N XLA dispatch route.

Round-2 additions. Two behaviors pinned here:

1. Causal masking for Nq != Nkv is BOTTOM-RIGHT aligned (q row i sits at kv
   position i + Nkv - Nq, the flash-attn v2.1+ / suffix-query convention —
   what chunked prefill needs).  Round 1 left the kernels top-left aligned
   while the oracle (reference_attention, reference:
   src/test_correctness.py:33's role) was bottom-right; no test covered it.
   Rows with no visible keys (Nq > Nkv) produce O = 0 and zero grads —
   including when they share a block with visible rows (the finite
   mask-constant uniform-softmax trap).

2. Low-precision tiny-N inputs route to whole-fused XLA attention
   (ops/flash_attention.py XLA_SMALL_MAX_N) — same semantics, so everything
   here is exercised at fp32 (Pallas kernels) AND bf16 (XLA route).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flash_attention_dlrs_tpu import BlockSizes, flash_attention
from flash_attention_dlrs_tpu.ops import flash_attention_forward
from flash_attention_dlrs_tpu.ops.flash_attention import (
    XLA_SMALL_MAX_N,
    _use_xla_small,
    flash_attention_backward,
)


def _clean(q, k, v, n_q, n_kv, window=0):
    """Bottom-right-aligned causal oracle with exact zero for masked rows."""
    hq, hkv = q.shape[1], k.shape[1]
    if hq != hkv:
        k = jnp.repeat(k, hq // hkv, axis=1)
        v = jnp.repeat(v, hq // hkv, axis=1)
    d = q.shape[-1]
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k) * (d ** -0.5)
    row = jnp.arange(n_q)[:, None]
    col = jnp.arange(n_kv)[None, :]
    mask = (row + (n_kv - n_q)) >= col
    if window:
        mask = jnp.logical_and(mask, (row + (n_kv - n_q) - col) < window)
    p = jax.nn.softmax(jnp.where(mask, s, -1e30), axis=-1)
    p = jnp.where(mask.any(-1, keepdims=True), p, 0.0)
    return jnp.einsum("bhqk,bhkd->bhqd", p, v)


def _data(n_q, n_kv, hq=4, hkv=4, d=64, dtype=jnp.float32):
    ks = jax.random.split(jax.random.PRNGKey(0), 4)
    q = jax.random.normal(ks[0], (2, hq, n_q, d), dtype)
    k = jax.random.normal(ks[1], (2, hkv, n_kv, d), dtype)
    v = jax.random.normal(ks[2], (2, hkv, n_kv, d), dtype)
    do = jax.random.normal(ks[3], (2, hq, n_q, d), dtype)
    return q, k, v, do


_BS128 = BlockSizes(block_q=128, block_kv=128, block_q_bwd=128,
                    block_kv_bwd=128)


@pytest.mark.parametrize(
    "n_q,n_kv,blocks,window,hq,hkv",
    [
        (128, 384, None, 0, 4, 4),      # small path, q shorter
        (384, 128, None, 0, 4, 4),      # small path, fully-masked rows
        (128, 384, _BS128, 0, 4, 4),    # general kernel
        (384, 128, _BS128, 0, 4, 4),
        (256, 512, _BS128, 100, 4, 4),  # window, bottom-right aligned band
        (256, 1024, None, 0, 4, 4),     # fused backward route
        (1024, 256, None, 0, 4, 4),     # fused bwd + masked rows in-block
        (1024, 640, None, 0, 4, 2),     # GQA cross
    ],
)
def test_causal_cross_length_bottom_right(n_q, n_kv, blocks, window, hq, hkv):
    q, k, v, do = _data(n_q, n_kv, hq, hkv)
    o_ref = _clean(q, k, v, n_q, n_kv, window)
    g_ref = jax.grad(
        lambda a, b, c: (_clean(a, b, c, n_q, n_kv, window) * do).sum(),
        argnums=(0, 1, 2),
    )(q, k, v)

    kw = dict(causal=True, window=window)
    if blocks is not None:
        kw["block_sizes"] = blocks
    o = flash_attention(q, k, v, **kw)
    np.testing.assert_allclose(o, o_ref, atol=5e-6, rtol=1e-5)

    grads = jax.grad(
        lambda a, b, c: (flash_attention(a, b, c, **kw) * do).sum(),
        argnums=(0, 1, 2),
    )(q, k, v)
    for g, r in zip(grads, g_ref):
        np.testing.assert_allclose(g, r, atol=1e-5, rtol=1e-5)

    # functional backward (kernel path, honors the passed lse)
    o2, lse = flash_attention_forward(
        q, k, v, causal=True, window=window, block_sizes=blocks
    )
    outs = flash_attention_backward(
        q, k, v, o2, do, lse, causal=True, window=window, block_sizes=blocks
    )
    for g, r in zip(outs, g_ref):
        np.testing.assert_allclose(g, r, atol=1e-5, rtol=1e-5)


def test_masked_rows_zero_output_and_grads():
    """Nq > Nkv: leading q rows see no keys → O = 0 and zero grads, even
    when those rows share a kernel block with visible rows."""
    n_q, n_kv = 384, 128
    q, k, v, do = _data(n_q, n_kv)
    o = flash_attention(q, k, v, causal=True)
    n_masked = n_q - n_kv
    np.testing.assert_array_equal(np.asarray(o[:, :, :n_masked]), 0.0)
    dq = jax.grad(
        lambda a: (flash_attention(a, k, v, causal=True) * do).sum()
    )(q)
    np.testing.assert_array_equal(np.asarray(dq[:, :, :n_masked]), 0.0)


def test_xla_small_route_predicate():
    q, k, v, _ = _data(256, 256, dtype=jnp.bfloat16)
    assert _use_xla_small(q, k, None)
    assert not _use_xla_small(q, k, _BS128)  # pinned blocks → kernels
    qf, kf, _, _ = _data(256, 256, dtype=jnp.float32)
    assert not _use_xla_small(qf, kf, None)  # fp32 → kernels (golden gate)
    qb, kb, _, _ = _data(XLA_SMALL_MAX_N + 128, XLA_SMALL_MAX_N + 128,
                         dtype=jnp.bfloat16)
    assert not _use_xla_small(qb, kb, None)  # too long → kernels


@pytest.mark.parametrize("n_q,n_kv,window,softcap,hq,hkv", [
    (256, 256, 0, 0.0, 4, 4),
    (128, 128, 0, 0.0, 4, 2),     # GQA through fused SDPA
    (256, 256, 64, 0.0, 4, 4),    # window → explicit-math fallback
    (256, 256, 0, 20.0, 4, 4),    # softcap → explicit-math fallback
    (128, 384, 0, 0.0, 4, 4),     # cross-length → explicit-math fallback
    (384, 128, 0, 0.0, 4, 4),     # masked rows on the XLA route
])
def test_xla_small_route_matches_kernels(n_q, n_kv, window, softcap, hq, hkv):
    """bf16 tiny-N (XLA route) vs fp32 kernels: same semantics, bf16 tol."""
    q, k, v, do = _data(n_q, n_kv, hq, hkv, dtype=jnp.bfloat16)
    f32 = lambda x: x.astype(jnp.float32)
    kw = dict(causal=True, window=window, logit_softcap=softcap)
    o = flash_attention(q, k, v, **kw)
    o_ref = flash_attention(f32(q), f32(k), f32(v), **kw)
    np.testing.assert_allclose(f32(o), o_ref, atol=3e-2, rtol=2e-2)
    g = jax.grad(
        lambda a, b, c: (f32(flash_attention(a, b, c, **kw)) * f32(do)).sum(),
        argnums=(0, 1, 2),
    )(q, k, v)
    g_ref = jax.grad(
        lambda a, b, c: (flash_attention(a, b, c, **kw) * f32(do)).sum(),
        argnums=(0, 1, 2),
    )(f32(q), f32(k), f32(v))
    for a, b in zip(g, g_ref):
        np.testing.assert_allclose(f32(a), b, atol=8e-2, rtol=5e-2)


def test_xla_small_route_lse_matches_oracle():
    from flash_attention_dlrs_tpu.ops import reference_attention

    q, k, v, _ = _data(256, 256, dtype=jnp.bfloat16)
    o, lse = flash_attention_forward(q, k, v, causal=True)
    _, lse_ref = reference_attention(
        q.astype(jnp.float32), k.astype(jnp.float32), v.astype(jnp.float32),
        causal=True, sm_scale=q.shape[-1] ** -0.5, with_lse=True,
    )
    np.testing.assert_allclose(lse, lse_ref, atol=3e-2, rtol=1e-3)
