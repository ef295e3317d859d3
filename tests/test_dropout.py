"""Attention dropout: counter-based in-kernel mask, fwd/bwd consistency.

The mask is a pure function of (seed, batch, head, row, col) — computed by
fwd_kernel.dropout_keep_mask via the lowbias32 integer mixer — so the
backward regenerates it bit-identically regardless of block geometry (the
role of flash-attn's philox offsets).  The oracle (reference_attention)
applies the SAME mask function densely, making kernel-vs-oracle comparisons
exact rather than statistical.

No reference counterpart (the reference has no dropout); feature modeled on
flash-attn's dropout_p.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flash_attention_dlrs_tpu import flash_attention
from flash_attention_dlrs_tpu.ops import (
    bwd_fused,
    flash_attention_backward,
    flash_attention_forward,
    reference,
)
from flash_attention_dlrs_tpu.ops.fwd_kernel import dropout_keep_mask

ATOL = 2e-4
RTOL = 1e-4


def _make(seed, shape_q, shape_kv, dtype=jnp.float32):
    k1, k2, k3, k4 = jax.random.split(jax.random.PRNGKey(seed), 4)
    return (jax.random.normal(k1, shape_q, dtype),
            jax.random.normal(k2, shape_kv, dtype),
            jax.random.normal(k3, shape_kv, dtype),
            jax.random.normal(k4, shape_q, dtype))


def test_mask_statistics_and_independence():
    rows = jnp.arange(2048, dtype=jnp.int32)[:, None]
    cols = jnp.arange(2048, dtype=jnp.int32)[None, :]
    zero = jnp.int32(0)
    for rate in (0.1, 0.5, 0.9):
        m = dropout_keep_mask(jnp.int32(3), zero, zero, rows, cols, rate)
        frac = float(jnp.mean(m == 0.0))
        assert abs(frac - rate) < 0.005, (rate, frac)
        # kept elements carry the 1/(1-rate) scale exactly
        kept = m[m != 0.0]
        np.testing.assert_allclose(kept, 1.0 / (1.0 - rate), rtol=1e-6)
    # different seeds / heads give (nearly) independent masks
    m1 = dropout_keep_mask(jnp.int32(3), zero, zero, rows, cols, 0.5)
    m2 = dropout_keep_mask(jnp.int32(4), zero, zero, rows, cols, 0.5)
    m3 = dropout_keep_mask(jnp.int32(3), zero, jnp.int32(1), rows, cols, 0.5)
    agree12 = float(jnp.mean((m1 == 0) == (m2 == 0)))
    agree13 = float(jnp.mean((m1 == 0) == (m3 == 0)))
    assert 0.49 < agree12 < 0.51 and 0.49 < agree13 < 0.51


@pytest.mark.parametrize("rate", [0.1, 0.5])
def test_fwd_matches_masked_oracle(rate):
    b, h, n, d = 2, 2, 512, 64
    q, k, v, _ = _make(0, (b, h, n, d), (b, h, n, d))
    o = flash_attention(q, k, v, causal=True, sm_scale=1.0,
                        dropout_rate=rate, dropout_seed=11)
    o_ref = reference.reference_attention(
        q, k, v, causal=True, sm_scale=1.0, dropout_rate=rate,
        dropout_seed=11,
    )
    np.testing.assert_allclose(o, o_ref, atol=ATOL, rtol=RTOL)
    # deterministic given the seed; different seed -> different output
    o2 = flash_attention(q, k, v, causal=True, sm_scale=1.0,
                         dropout_rate=rate, dropout_seed=11)
    assert bool(jnp.all(o == o2))
    o3 = flash_attention(q, k, v, causal=True, sm_scale=1.0,
                         dropout_rate=rate, dropout_seed=12)
    assert float(jnp.max(jnp.abs(o - o3))) > 1e-3


def test_rate_zero_is_identity():
    b, h, n, d = 1, 2, 256, 64
    q, k, v, _ = _make(1, (b, h, n, d), (b, h, n, d))
    o0 = flash_attention(q, k, v, causal=True, sm_scale=1.0)
    o1 = flash_attention(q, k, v, causal=True, sm_scale=1.0,
                         dropout_rate=0.0, dropout_seed=5)
    assert bool(jnp.all(o0 == o1))


def test_grads_match_oracle_fused_bwd():
    b, h, n, d = 1, 2, 512, 64
    q, k, v, do = _make(2, (b, h, n, d), (b, h, n, d))

    def loss(q_, k_, v_):
        o = flash_attention(q_, k_, v_, causal=True, sm_scale=1.0,
                            dropout_rate=0.3, dropout_seed=7)
        return jnp.sum(o * do)

    dq, dk, dv = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
    rq, rk, rv = reference.reference_attention_grads(
        q, k, v, do, causal=True, sm_scale=1.0, dropout_rate=0.3,
        dropout_seed=7,
    )
    np.testing.assert_allclose(dq, rq, atol=ATOL, rtol=RTOL)
    np.testing.assert_allclose(dk, rk, atol=ATOL, rtol=RTOL)
    np.testing.assert_allclose(dv, rv, atol=ATOL, rtol=RTOL)


def test_grads_two_sweep_bwd(monkeypatch):
    # Force the two-sweep dKV+dQ kernels; their block geometry differs from
    # the forward's — the element-indexed mask must still line up.
    monkeypatch.setattr(bwd_fused, "pick_fused_blocks", lambda *a, **kw: None)
    monkeypatch.setattr(bwd_fused, "fused_bwd_fits_vmem",
                        lambda *a, **kw: False)
    b, h, n, d = 1, 2, 256, 64
    q, k, v, do = _make(3, (b, h, n, d), (b, h, n, d))
    o, lse = flash_attention_forward(q, k, v, causal=True, sm_scale=1.0,
                                     dropout_rate=0.25, dropout_seed=9)
    dq, dk, dv = flash_attention_backward(
        q, k, v, o, do, lse, causal=True, sm_scale=1.0,
        dropout_rate=0.25, dropout_seed=9,
    )
    rq, rk, rv = reference.reference_attention_grads(
        q, k, v, do, causal=True, sm_scale=1.0, dropout_rate=0.25,
        dropout_seed=9,
    )
    np.testing.assert_allclose(dq, rq, atol=ATOL, rtol=RTOL)
    np.testing.assert_allclose(dk, rk, atol=ATOL, rtol=RTOL)
    np.testing.assert_allclose(dv, rv, atol=ATOL, rtol=RTOL)


def test_lse_is_dropout_independent():
    # The logsumexp residual is over UNDROPPED probabilities — identical with
    # and without dropout (flash-attn semantics).
    b, h, n, d = 1, 2, 512, 64
    q, k, v, _ = _make(4, (b, h, n, d), (b, h, n, d))
    _, lse0 = flash_attention_forward(q, k, v, causal=True, sm_scale=1.0)
    _, lse1 = flash_attention_forward(q, k, v, causal=True, sm_scale=1.0,
                                      dropout_rate=0.4, dropout_seed=1)
    np.testing.assert_allclose(lse0, lse1, atol=1e-6, rtol=1e-6)


def test_xla_small_route_bf16():
    # bf16 N<=384 dispatches to the whole-fused XLA math; same mask function,
    # so the (fp32-oracle) comparison needs only bf16 tolerance.
    b, h, n, d = 2, 4, 256, 64
    q, k, v, do = _make(5, (b, h, n, d), (b, h, n, d), jnp.bfloat16)
    o = flash_attention(q, k, v, causal=True, dropout_rate=0.2,
                        dropout_seed=13)
    o_ref = reference.reference_attention(
        q.astype(jnp.float32), k.astype(jnp.float32), v.astype(jnp.float32),
        causal=True, sm_scale=d ** -0.5, dropout_rate=0.2, dropout_seed=13,
    )
    np.testing.assert_allclose(o.astype(jnp.float32), o_ref, atol=3e-2,
                               rtol=3e-2)

    def loss(q_, k_, v_):
        out = flash_attention(q_, k_, v_, causal=True, dropout_rate=0.2,
                              dropout_seed=13)
        return jnp.sum(out.astype(jnp.float32) * do.astype(jnp.float32))

    dq, _, _ = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
    rq, _, _ = reference.reference_attention_grads(
        q.astype(jnp.float32), k.astype(jnp.float32), v.astype(jnp.float32),
        do.astype(jnp.float32), causal=True, sm_scale=d ** -0.5,
        dropout_rate=0.2, dropout_seed=13,
    )
    np.testing.assert_allclose(dq.astype(jnp.float32), rq, atol=6e-2,
                               rtol=6e-2)


def test_composes_with_alibi_and_gqa():
    from flash_attention_dlrs_tpu import alibi_slopes_for

    b, hq, hkv, n, d = 1, 4, 2, 512, 64
    slopes = alibi_slopes_for(hq)
    q, _, _, do = _make(6, (b, hq, n, d), (b, hq, n, d))
    _, k, v, _ = _make(7, (b, hkv, n, d), (b, hkv, n, d))

    def loss(q_, k_, v_):
        o = flash_attention(q_, k_, v_, causal=True, sm_scale=1.0,
                            alibi_slopes=slopes, dropout_rate=0.2,
                            dropout_seed=3)
        return jnp.sum(o * do)

    o = flash_attention(q, k, v, causal=True, sm_scale=1.0,
                        alibi_slopes=slopes, dropout_rate=0.2,
                        dropout_seed=3)
    o_ref = reference.reference_attention(
        q, k, v, causal=True, sm_scale=1.0, alibi_slopes=slopes,
        dropout_rate=0.2, dropout_seed=3,
    )
    np.testing.assert_allclose(o, o_ref, atol=ATOL, rtol=RTOL)
    dq, dk, dv = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
    rq, rk, rv = reference.reference_attention_grads(
        q, k, v, do, causal=True, sm_scale=1.0, alibi_slopes=slopes,
        dropout_rate=0.2, dropout_seed=3,
    )
    np.testing.assert_allclose(dq, rq, atol=ATOL, rtol=RTOL)
    np.testing.assert_allclose(dk, rk, atol=ATOL, rtol=RTOL)
    np.testing.assert_allclose(dv, rv, atol=ATOL, rtol=RTOL)


def test_validation():
    b, h, n, d = 1, 2, 128, 64
    q, k, v, _ = _make(8, (b, h, n, d), (b, h, n, d))
    with pytest.raises(ValueError, match="dropout_seed"):
        flash_attention(q, k, v, causal=True, dropout_rate=0.5)
    with pytest.raises(ValueError, match=r"\[0, 1\)"):
        flash_attention(q, k, v, causal=True, dropout_rate=1.0,
                        dropout_seed=1)
    with pytest.raises(ValueError, match=r"\[0, 1\)"):
        flash_attention(q, k, v, causal=True, dropout_rate=-0.1,
                        dropout_seed=1)
