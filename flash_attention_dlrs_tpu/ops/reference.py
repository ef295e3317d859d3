"""Naive XLA attention oracle.

Role of ``torch.nn.functional.scaled_dot_product_attention`` in the reference
correctness harness (reference: src/test_correctness.py:33) and of the
vendored OpenAI-tutorial competitor in its benchmark
(src/flash_attention_openai_tutorial.py:25-520): a straightforward,
materialize-the-scores softmax attention that XLA compiles natively, used
both as the numerical oracle and as a benchmark provider.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .fwd_kernel import MATMUL_PRECISION


def alibi_slopes_for(n_heads: int) -> tuple:
    """The standard ALiBi geometric slope schedule (Press et al. 2022):
    head i of H gets slope 2^(-8(i+1)/H), extended to non-power-of-2 head
    counts by interleaving the odd steps of the next power's schedule."""
    import math

    def pow2_slopes(n):
        start = 2.0 ** (-8.0 / n)
        return [start ** (i + 1) for i in range(n)]

    n_floor = 2 ** int(math.floor(math.log2(n_heads)))
    if n_floor == n_heads:
        return tuple(pow2_slopes(n_heads))
    extra = pow2_slopes(2 * n_floor)[0::2][: n_heads - n_floor]
    return tuple(pow2_slopes(n_floor) + extra)


def reference_attention(
    q,
    k,
    v,
    *,
    causal: bool = False,
    sm_scale: float = 1.0,
    segment_ids=None,
    window: int = 0,
    logit_softcap: float = 0.0,
    alibi_slopes=None,
    dropout_rate: float = 0.0,
    dropout_seed=None,
    with_lse: bool = False,
    precision=None,
):
    """O = softmax(scale * Q K^T + mask) V with fp32 softmax.

    q: [B, Hq, Nq, d]; k, v: [B, Hkv, Nkv, d] (GQA: Hq % Hkv == 0).
    ``segment_ids``: SegmentIds-like with .q [B, Nq] / .kv [B, Nkv], or a
    single [B, N] array — packed-sequence mask (attend within equal ids).
    ``precision`` defaults to HIGHEST (oracle duty: fp32-exact matmuls);
    the tiny-N production dispatch passes DEFAULT so bf16 inputs take the
    single-pass MXU path like the Pallas kernels do.
    """
    if precision is None:
        precision = MATMUL_PRECISION
    b, hq, n_q, d = q.shape
    hkv, n_kv = k.shape[1], k.shape[2]
    if hq != hkv:
        rep = hq // hkv
        k = jnp.repeat(k, rep, axis=1)
        v = jnp.repeat(v, rep, axis=1)
    s = jnp.einsum(
        "bhqd,bhkd->bhqk", q, k,
        preferred_element_type=jnp.float32,
        precision=precision,
    )
    s = s * sm_scale
    if logit_softcap:
        s = logit_softcap * jnp.tanh(s / logit_softcap)
    if alibi_slopes is not None:
        # True ALiBi bias −m_h·(qpos − col), bottom-right aligned like the
        # causal mask (qpos = row + n_kv − n_q).  The kernels implement the
        # softmax-equivalent separable form +m_h·col (the −m_h·qpos row term
        # cancels in softmax); outputs match, and the public lse is
        # un-shifted back to this true convention.
        slopes = jnp.asarray(alibi_slopes, jnp.float32)  # [Hq]
        qpos = jnp.arange(n_q, dtype=jnp.float32) + float(n_kv - n_q)
        col = jnp.arange(n_kv, dtype=jnp.float32)
        dist = qpos[:, None] - col[None, :]  # [Nq, Nkv]
        s = s - slopes[None, :, None, None] * dist[None, None]
    if causal:
        # Bottom-right aligned (q row i sits at kv position i + n_kv - n_q);
        # the window band is aligned the same way, hugging the diagonal.
        mask = jnp.tril(jnp.ones((n_q, n_kv), dtype=bool), k=n_kv - n_q)
        if window:
            row = jnp.arange(n_q)[:, None]
            col = jnp.arange(n_kv)[None, :]
            mask = jnp.logical_and(mask, (row + (n_kv - n_q) - col) < window)
        s = jnp.where(mask, s, -jnp.inf)
    if segment_ids is not None:
        qs = getattr(segment_ids, "q", segment_ids)
        ks = getattr(segment_ids, "kv", segment_ids)
        seg = qs[:, None, :, None] == ks[:, None, None, :]  # [B,1,Nq,Nkv]
        s = jnp.where(seg, s, -jnp.inf)
    # Max-subtract softmax (the same stabilization torch SDPA's math backend
    # and this repo's kernel use); computing p via exp(s - logsumexp) instead
    # shifts outputs by ~2e-4 at the reference's scale=1 workload.
    m = jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s - m)
    l = jnp.sum(e, axis=-1, keepdims=True)
    lse = (m + jnp.log(l))[..., 0]
    p = e / l
    if dropout_rate:
        # Same element-indexed mask the kernels generate (the oracle must be
        # bit-identical in WHICH elements drop; see fwd_kernel).  Applied
        # after normalization — the lse and softmax denominator are over
        # undropped probabilities, flash-attn semantics.
        from .fwd_kernel import dropout_keep_mask

        bi = jnp.arange(b, dtype=jnp.int32)[:, None, None, None]
        hi = jnp.arange(hq, dtype=jnp.int32)[None, :, None, None]
        rows = jnp.arange(n_q, dtype=jnp.int32)[None, None, :, None]
        cols = jnp.arange(n_kv, dtype=jnp.int32)[None, None, None, :]
        p = p * dropout_keep_mask(
            jnp.asarray(dropout_seed, jnp.int32), bi, hi, rows, cols,
            float(dropout_rate),
        )
    o = jnp.einsum(
        "bhqk,bhkd->bhqd", p.astype(v.dtype), v,
        preferred_element_type=jnp.float32,
        precision=precision,
    ).astype(q.dtype)
    if with_lse:
        return o, lse.astype(jnp.float32)
    return o


def reference_attention_grads(
    q, k, v, do, *, causal=False, sm_scale=1.0, segment_ids=None, window=0,
    logit_softcap=0.0, alibi_slopes=None, dropout_rate=0.0,
    dropout_seed=None,
):
    """Oracle gradients via jax.vjp through the naive attention
    (role of torch.autograd.grad in src/test_correctness.py:48)."""

    def f(q_, k_, v_):
        return reference_attention(
            q_, k_, v_, causal=causal, sm_scale=sm_scale,
            segment_ids=segment_ids, window=window,
            logit_softcap=logit_softcap, alibi_slopes=alibi_slopes,
            dropout_rate=dropout_rate, dropout_seed=dropout_seed,
        )

    _, vjp = jax.vjp(f, q, k, v)
    return vjp(do)
