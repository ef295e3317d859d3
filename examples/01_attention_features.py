"""Tour of the fused attention op: masking features, GQA, grads, adapter.

Runs anywhere — compiled Pallas kernels on TPU, interpret mode on CPU.

    python examples/01_attention_features.py
"""

import jax
import jax.numpy as jnp

import flash_attention_dlrs_tpu as fa


def main():
    b, hq, hkv, n, d = 2, 8, 2, 512, 64  # GQA: 4 query heads per KV head
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    q = jax.random.normal(ks[0], (b, hq, n, d))
    k = jax.random.normal(ks[1], (b, hkv, n, d))
    v = jax.random.normal(ks[2], (b, hkv, n, d))

    # Plain causal (sm_scale defaults to 1/sqrt(d)).
    o = fa.flash_attention(q, k, v, causal=True)
    print("causal GQA:", o.shape, o.dtype)

    # Sliding window: each token sees the last 128 tokens (incl. itself).
    o_w = fa.flash_attention(q, k, v, causal=True, window=128)
    print("window=128 delta vs full:", float(jnp.abs(o - o_w).max()))

    # Logit softcap (tanh capping, as in Gemma-2-style models).
    o_c = fa.flash_attention(q, k, v, causal=True, logit_softcap=30.0)
    print("softcap=30 delta vs none:", float(jnp.abs(o - o_c).max()))

    # Packed sequences: two documents per row, no cross-attention between
    # them.  SegmentIds masks structurally inside the kernel (no O(N^2)
    # mask array is ever materialized).
    seg = (jnp.arange(n)[None, :] >= n // 2).astype(jnp.int32)
    seg = jnp.broadcast_to(seg, (b, n))
    o_s = fa.flash_attention(q, k, v, causal=True, segment_ids=seg)
    print("packed-segments delta:", float(jnp.abs(o - o_s).max()))

    # Everything is differentiable through the custom_vjp (one fused
    # backward kernel, deterministic by construction).
    g = jax.grad(
        lambda q_: fa.flash_attention(q_, k, v, causal=True).sum()
    )(q)
    print("dQ:", g.shape, "finite:", bool(jnp.isfinite(g).all()))

    # Oracle check (the naive-XLA reference used by the test suite).
    ref = fa.reference_attention(q, k, v, causal=True, sm_scale=d**-0.5)
    print("max |O - oracle|:", float(jnp.abs(o - ref).max()))

    # jax.nn users: change one import.  BTNH layout, same semantics.
    qt, kt, vt = (x.transpose(0, 2, 1, 3) for x in (q, k, v))
    o_nn = fa.nn.dot_product_attention(qt, kt, vt, is_causal=True)
    print("nn adapter matches:",
          float(jnp.abs(o_nn.transpose(0, 2, 1, 3) - o).max()))


if __name__ == "__main__":
    main()
