"""`flash_attention_dlrs_tpu.nn.dot_product_attention` vs `jax.nn`'s.

The adapter promises jax.nn semantics exactly on the kernel-routed
argument combinations; the oracle is `jax.nn.dot_product_attention` itself
(fp32, CPU, small shapes).  Fallback combinations must also keep working —
they ARE jax.nn — and `implementation='flash'` must refuse them loudly.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flash_attention_dlrs_tpu.nn import dot_product_attention

TOL = dict(atol=2e-5, rtol=2e-5)


def _mk(b, t, s, n, k, h, dtype=jnp.float32, seed=0):
    ks = jax.random.split(jax.random.PRNGKey(seed), 3)
    q = jax.random.normal(ks[0], (b, t, n, h), dtype)
    key = jax.random.normal(ks[1], (b, s, k, h), dtype)
    v = jax.random.normal(ks[2], (b, s, k, h), dtype)
    return q, key, v


@pytest.mark.parametrize("causal", [False, True])
def test_plain_self_attention(causal):
    q, k, v = _mk(2, 256, 256, 4, 4, 64)
    ours = dot_product_attention(q, k, v, is_causal=causal)
    ref = jax.nn.dot_product_attention(q, k, v, is_causal=causal)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref), **TOL)


def test_cross_length_non_causal():
    q, k, v = _mk(2, 128, 256, 4, 4, 64)
    ours = dot_product_attention(q, k, v)
    ref = jax.nn.dot_product_attention(q, k, v)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref), **TOL)


@pytest.mark.parametrize("window", [64, (64, 0), (64, 7)])
def test_causal_local_window(window):
    q, k, v = _mk(1, 256, 256, 4, 4, 64)
    ours = dot_product_attention(q, k, v, is_causal=True,
                                 local_window_size=window)
    ref = jax.nn.dot_product_attention(q, k, v, is_causal=True,
                                       local_window_size=window)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref), **TOL)


def test_gqa_and_scale():
    q, k, v = _mk(2, 256, 256, 8, 2, 64)
    ours = dot_product_attention(q, k, v, is_causal=True, scale=0.25)
    ref = jax.nn.dot_product_attention(q, k, v, is_causal=True, scale=0.25)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref), **TOL)


def test_seq_lengths_padding_mask():
    b, t = 2, 256
    q, k, v = _mk(b, t, t, 4, 4, 64)
    qlen = jnp.array([200, 256], jnp.int32)
    kvlen = jnp.array([130, 250], jnp.int32)
    ours = dot_product_attention(q, k, v, is_causal=True,
                                 query_seq_lengths=qlen,
                                 key_value_seq_lengths=kvlen)
    ref = jax.nn.dot_product_attention(q, k, v, is_causal=True,
                                       query_seq_lengths=qlen,
                                       key_value_seq_lengths=kvlen)
    for i in range(b):  # rows past qlen are unspecified garbage in both
        np.testing.assert_allclose(
            np.asarray(ours)[i, : int(qlen[i])],
            np.asarray(ref)[i, : int(qlen[i])], **TOL,
        )
    # our documented choice: padded query rows are zero, not mean(V)
    assert float(jnp.abs(jnp.asarray(ours)[0, int(qlen[0]):]).max()) == 0.0


def test_unbatched_tnh():
    q, k, v = _mk(1, 256, 256, 4, 4, 64)
    ours = dot_product_attention(q[0], k[0], v[0], is_causal=True)
    ref = jax.nn.dot_product_attention(q[0], k[0], v[0], is_causal=True)
    assert ours.shape == ref.shape == (256, 4, 64)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref), **TOL)


def test_grads_flow_through_kernel_path():
    q, k, v = _mk(1, 256, 256, 2, 2, 64)

    def loss(f):
        def g(q_, k_, v_):
            return (f(q_, k_, v_, is_causal=True) ** 2).sum()
        return g

    ours = jax.grad(loss(dot_product_attention), argnums=(0, 1, 2))(q, k, v)
    ref = jax.grad(
        loss(jax.nn.dot_product_attention), argnums=(0, 1, 2))(q, k, v)
    for a, r in zip(ours, ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(r),
                                   atol=1e-4, rtol=1e-4)


def test_bias_falls_back_and_matches():
    q, k, v = _mk(1, 128, 128, 2, 2, 64)
    bias = jax.random.normal(jax.random.PRNGKey(9), (1, 2, 128, 128))
    ours = dot_product_attention(q, k, v, bias)
    ref = jax.nn.dot_product_attention(q, k, v, bias)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref), **TOL)


def test_cross_length_causal_falls_back():
    # jax causal is top-left for T != S; the adapter must defer, not guess
    q, k, v = _mk(1, 128, 256, 2, 2, 64)
    ours = dot_product_attention(q, k, v, is_causal=True)
    ref = jax.nn.dot_product_attention(q, k, v, is_causal=True)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref), **TOL)


def test_implementation_flash_refuses_fallback_args():
    q, k, v = _mk(1, 128, 256, 2, 2, 64)
    with pytest.raises(ValueError, match="fallback"):
        dot_product_attention(q, k, v, is_causal=True,
                              implementation="flash")


def test_negative_window_falls_back():
    # jax defines left=-1 as "mask the row empty"; the kernels' window=0
    # means disabled — the adapter must defer, not silently run full causal
    q, k, v = _mk(1, 128, 128, 2, 2, 64)
    ours = dot_product_attention(q, k, v, is_causal=True,
                                 local_window_size=(-1, 0))
    ref = jax.nn.dot_product_attention(q, k, v, is_causal=True,
                                       local_window_size=(-1, 0))
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref), **TOL)


def test_implementation_validated():
    q, k, v = _mk(1, 128, 128, 2, 2, 64)
    with pytest.raises(ValueError, match="cudnn"):
        dot_product_attention(q, k, v, implementation="cudnn")
