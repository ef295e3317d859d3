"""ALiBi (Press et al. 2022) linear-bias attention: forward, lse, grads.

The kernels implement the bias in separable form — only the per-column
+m·col term is added in-kernel (the −m·q_pos row term cancels in softmax),
so no O(N²) bias tensor exists anywhere.  These tests pin that equivalence
against the true-bias oracle (reference_attention with alibi_slopes), across
every dispatch route the feature can take: the general Pallas kernel
(tri-grid, banded-window, rectangular cross-length), the fused and
two-sweep backwards, and the tiny-N XLA path.

No reference counterpart (the reference supports no attention bias);
feature modeled on flash-attn's alibi_slopes argument.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flash_attention_dlrs_tpu import alibi_slopes_for, flash_attention
from flash_attention_dlrs_tpu.ops import (
    bwd_fused,
    flash_attention_backward,
    flash_attention_forward,
    reference,
)

FWD_ATOL = 1e-4
FWD_RTOL = 1e-5
BWD_ATOL = 9e-4


def _make(key, shape_q, shape_kv, dtype=jnp.float32):
    k1, k2, k3, k4 = jax.random.split(key, 4)
    q = jax.random.normal(k1, shape_q, dtype)
    k = jax.random.normal(k2, shape_kv, dtype)
    v = jax.random.normal(k3, shape_kv, dtype)
    do = jax.random.normal(k4, shape_q, dtype)
    return q, k, v, do


def test_slope_schedule_power_of_two():
    slopes = alibi_slopes_for(8)
    np.testing.assert_allclose(slopes, [2.0 ** -(i + 1) for i in range(8)])


def test_slope_schedule_non_power_of_two():
    slopes = alibi_slopes_for(12)
    assert len(slopes) == 12
    # First 8 follow the 8-head schedule; the tail interleaves the 16-head
    # schedule's odd steps.
    np.testing.assert_allclose(slopes[:8], alibi_slopes_for(8))
    sixteen = alibi_slopes_for(16)
    np.testing.assert_allclose(slopes[8:], sixteen[0::2][:4])
    assert all(s > 0 for s in slopes)


@pytest.mark.parametrize("n", [256, 512])
def test_fwd_matches_oracle_general_kernel(n):
    # fp32 keeps the dispatch off the tiny-N XLA route; alibi bypasses the
    # small/mid kernels, so this exercises the general kernel's tri grid.
    b, h, d = 1, 4, 64
    slopes = alibi_slopes_for(h)
    q, k, v, _ = _make(jax.random.PRNGKey(0), (b, h, n, d), (b, h, n, d))
    o = flash_attention(q, k, v, causal=True, sm_scale=1.0,
                        alibi_slopes=slopes)
    o_ref = reference.reference_attention(
        q, k, v, causal=True, sm_scale=1.0, alibi_slopes=slopes
    )
    np.testing.assert_allclose(o, o_ref, atol=FWD_ATOL, rtol=FWD_RTOL)


def test_fwd_lse_is_true_logsumexp():
    # The kernel-internal lse is shifted by +m·q_pos (separable form); the
    # public lse must be the true logsumexp of scale·QKᵀ − m·dist.
    b, h, n, d = 1, 4, 256, 64
    slopes = alibi_slopes_for(h)
    q, k, v, _ = _make(jax.random.PRNGKey(1), (b, h, n, d), (b, h, n, d))
    o, lse = flash_attention_forward(q, k, v, causal=True, sm_scale=1.0,
                                     alibi_slopes=slopes)
    o_ref, lse_ref = reference.reference_attention(
        q, k, v, causal=True, sm_scale=1.0, alibi_slopes=slopes,
        with_lse=True,
    )
    np.testing.assert_allclose(o, o_ref, atol=FWD_ATOL, rtol=FWD_RTOL)
    np.testing.assert_allclose(lse, lse_ref, atol=1e-4, rtol=1e-5)


def test_fwd_cross_length_causal():
    # Rectangular grid with bottom-right alignment: q_off = n_kv - n_q shifts
    # both the causal mask and the alibi distance.
    b, h, n_q, n_kv, d = 1, 2, 256, 512, 64
    slopes = alibi_slopes_for(h)
    q, k, v, _ = _make(jax.random.PRNGKey(2), (b, h, n_q, d), (b, h, n_kv, d))
    o = flash_attention(q, k, v, causal=True, sm_scale=1.0,
                        alibi_slopes=slopes)
    o_ref = reference.reference_attention(
        q, k, v, causal=True, sm_scale=1.0, alibi_slopes=slopes
    )
    np.testing.assert_allclose(o, o_ref, atol=FWD_ATOL, rtol=FWD_RTOL)


def test_fwd_gqa_and_window():
    # GQA co-location + banded sliding-window grid, both composed with alibi.
    b, hq, hkv, n, d = 1, 4, 2, 512, 64
    slopes = alibi_slopes_for(hq)
    q, _, _, _ = _make(jax.random.PRNGKey(3), (b, hq, n, d), (b, hq, n, d))
    _, k, v, _ = _make(jax.random.PRNGKey(4), (b, hkv, n, d), (b, hkv, n, d))
    o = flash_attention(q, k, v, causal=True, sm_scale=1.0, window=200,
                        alibi_slopes=slopes)
    o_ref = reference.reference_attention(
        q, k, v, causal=True, sm_scale=1.0, window=200, alibi_slopes=slopes
    )
    np.testing.assert_allclose(o, o_ref, atol=FWD_ATOL, rtol=FWD_RTOL)


def test_fwd_segments():
    # Packed sequences: the alibi distance q_pos − kv_pos is measured in the
    # packed buffer, so within a segment it equals the per-sequence distance.
    b, h, n, d = 1, 2, 256, 64
    slopes = alibi_slopes_for(h)
    q, k, v, _ = _make(jax.random.PRNGKey(5), (b, h, n, d), (b, h, n, d))
    seg = (jnp.arange(n)[None, :] >= n // 2).astype(jnp.int32)
    o = flash_attention(q, k, v, causal=True, sm_scale=1.0, segment_ids=seg,
                        alibi_slopes=slopes)
    o_ref = reference.reference_attention(
        q, k, v, causal=True, sm_scale=1.0, segment_ids=seg,
        alibi_slopes=slopes,
    )
    np.testing.assert_allclose(o, o_ref, atol=FWD_ATOL, rtol=FWD_RTOL)


def test_grads_match_oracle_fused_bwd():
    # N=256/d=64 picks the fused single-sweep backward under jax.grad.
    b, h, n, d = 1, 4, 256, 64
    slopes = alibi_slopes_for(h)
    q, k, v, do = _make(jax.random.PRNGKey(6), (b, h, n, d), (b, h, n, d))

    def loss(q_, k_, v_):
        o = flash_attention(q_, k_, v_, causal=True, sm_scale=1.0,
                            alibi_slopes=slopes)
        return jnp.sum(o * do)

    dq, dk, dv = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
    rq, rk, rv = reference.reference_attention_grads(
        q, k, v, do, causal=True, sm_scale=1.0, alibi_slopes=slopes
    )
    np.testing.assert_allclose(dq, rq, atol=BWD_ATOL, rtol=1e-4)
    np.testing.assert_allclose(dk, rk, atol=BWD_ATOL, rtol=1e-4)
    np.testing.assert_allclose(dv, rv, atol=BWD_ATOL, rtol=1e-4)


def test_grads_two_sweep_bwd(monkeypatch):
    # Force the two-sweep dKV+dQ kernels (the fused path is None'd out).
    monkeypatch.setattr(bwd_fused, "pick_fused_blocks",
                        lambda *a, **kw: None)
    monkeypatch.setattr(bwd_fused, "fused_bwd_fits_vmem",
                        lambda *a, **kw: False)
    b, h, n, d = 1, 2, 256, 64
    slopes = alibi_slopes_for(h)
    q, k, v, do = _make(jax.random.PRNGKey(7), (b, h, n, d), (b, h, n, d))
    o, lse = flash_attention_forward(q, k, v, causal=True, sm_scale=1.0,
                                     alibi_slopes=slopes)
    dq, dk, dv = flash_attention_backward(
        q, k, v, o, do, lse, causal=True, sm_scale=1.0, alibi_slopes=slopes
    )
    rq, rk, rv = reference.reference_attention_grads(
        q, k, v, do, causal=True, sm_scale=1.0, alibi_slopes=slopes
    )
    np.testing.assert_allclose(dq, rq, atol=BWD_ATOL, rtol=1e-4)
    np.testing.assert_allclose(dk, rk, atol=BWD_ATOL, rtol=1e-4)
    np.testing.assert_allclose(dv, rv, atol=BWD_ATOL, rtol=1e-4)


def test_grads_two_sweep_bwd_lse_mode(monkeypatch):
    # Forced combined-lse mode (rederive_stats=False) with ALiBi: the TRUE
    # public lse must be re-shifted back to the kernels' separable
    # convention before lse_to_stats (regression: 6276631 dropped the
    # shift, NaN-ing every grad on this path).
    monkeypatch.setattr(bwd_fused, "pick_fused_blocks",
                        lambda *a, **kw: None)
    monkeypatch.setattr(bwd_fused, "fused_bwd_fits_vmem",
                        lambda *a, **kw: False)
    b, h, n, d = 1, 2, 256, 64
    slopes = alibi_slopes_for(h)
    q, k, v, do = _make(jax.random.PRNGKey(11), (b, h, n, d), (b, h, n, d))
    o, lse = flash_attention_forward(q, k, v, causal=True, sm_scale=1.0,
                                     alibi_slopes=slopes)
    dq, dk, dv = flash_attention_backward(
        q, k, v, o, do, lse, causal=True, sm_scale=1.0, alibi_slopes=slopes,
        rederive_stats=False,
    )
    rq, rk, rv = reference.reference_attention_grads(
        q, k, v, do, causal=True, sm_scale=1.0, alibi_slopes=slopes
    )
    assert not jnp.isnan(dq).any()
    # the combined-lse information floor is looser than the rederive path
    np.testing.assert_allclose(dq, rq, atol=4e-3, rtol=1e-3)
    np.testing.assert_allclose(dk, rk, atol=4e-3, rtol=1e-3)
    np.testing.assert_allclose(dv, rv, atol=BWD_ATOL, rtol=1e-4)


def test_grads_gqa_cross_length():
    b, hq, hkv, n_q, n_kv, d = 1, 4, 2, 128, 512, 64
    slopes = alibi_slopes_for(hq)
    q, _, _, do = _make(jax.random.PRNGKey(8), (b, hq, n_q, d), (b, hq, n_q, d))
    _, k, v, _ = _make(jax.random.PRNGKey(9), (b, hkv, n_kv, d), (b, hkv, n_kv, d))

    def loss(q_, k_, v_):
        o = flash_attention(q_, k_, v_, causal=True, sm_scale=1.0,
                            alibi_slopes=slopes)
        return jnp.sum(o * do)

    dq, dk, dv = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
    rq, rk, rv = reference.reference_attention_grads(
        q, k, v, do, causal=True, sm_scale=1.0, alibi_slopes=slopes
    )
    np.testing.assert_allclose(dq, rq, atol=BWD_ATOL, rtol=1e-4)
    np.testing.assert_allclose(dk, rk, atol=BWD_ATOL, rtol=1e-4)
    np.testing.assert_allclose(dv, rv, atol=BWD_ATOL, rtol=1e-4)


def test_xla_small_route_bf16():
    # bf16 at N<=384 dispatches to the whole-fused XLA math, which applies
    # the full (unseparated) bias; grads re-differentiate the same route.
    b, h, n, d = 2, 4, 256, 64
    slopes = alibi_slopes_for(h)
    q, k, v, do = _make(jax.random.PRNGKey(10), (b, h, n, d), (b, h, n, d),
                        jnp.bfloat16)

    def loss(q_, k_, v_):
        o = flash_attention(q_, k_, v_, causal=True, alibi_slopes=slopes)
        return jnp.sum(o.astype(jnp.float32) * do.astype(jnp.float32))

    o = flash_attention(q, k, v, causal=True, alibi_slopes=slopes)
    o_ref = reference.reference_attention(
        q.astype(jnp.float32), k.astype(jnp.float32), v.astype(jnp.float32),
        causal=True, sm_scale=d ** -0.5, alibi_slopes=slopes,
    )
    np.testing.assert_allclose(
        o.astype(jnp.float32), o_ref, atol=2e-2, rtol=2e-2
    )
    dq, dk, dv = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
    rq, rk, rv = reference.reference_attention_grads(
        q.astype(jnp.float32), k.astype(jnp.float32), v.astype(jnp.float32),
        do.astype(jnp.float32), causal=True, sm_scale=d ** -0.5,
        alibi_slopes=slopes,
    )
    np.testing.assert_allclose(dq.astype(jnp.float32), rq, atol=5e-2, rtol=5e-2)
    np.testing.assert_allclose(dk.astype(jnp.float32), rk, atol=5e-2, rtol=5e-2)
    np.testing.assert_allclose(dv.astype(jnp.float32), rv, atol=5e-2, rtol=5e-2)


def test_validation():
    b, h, n, d = 1, 4, 128, 64
    q, k, v, _ = _make(jax.random.PRNGKey(11), (b, h, n, d), (b, h, n, d))
    with pytest.raises(ValueError, match="causal"):
        flash_attention(q, k, v, causal=False,
                        alibi_slopes=alibi_slopes_for(h))
    with pytest.raises(ValueError, match="per q head"):
        flash_attention(q, k, v, causal=True,
                        alibi_slopes=alibi_slopes_for(h + 2))
    # A scalar slope broadcasts to every head.
    o = flash_attention(q, k, v, causal=True, sm_scale=1.0,
                        alibi_slopes=(0.25,))
    o_ref = reference.reference_attention(
        q, k, v, causal=True, sm_scale=1.0, alibi_slopes=(0.25,) * h
    )
    np.testing.assert_allclose(o, o_ref, atol=FWD_ATOL, rtol=FWD_RTOL)


# ---------------------------------------------------------------------------
# Paged decode / serving path
# ---------------------------------------------------------------------------


def _paged_setup(seed, *, batch=3, hq=8, hkv=2, pages=16, page_size=128,
                 d=64, pages_per_seq=4):
    from flash_attention_dlrs_tpu.ops.decode import paged_reference_attention

    keys = jax.random.split(jax.random.PRNGKey(seed), 4)
    q = jax.random.normal(keys[0], (batch, hq, d), jnp.float32)
    kp = jax.random.normal(keys[1], (hkv, pages, page_size, d), jnp.float32)
    vp = jax.random.normal(keys[2], (hkv, pages, page_size, d), jnp.float32)
    perm = jax.random.permutation(keys[3], pages)[: batch * pages_per_seq]
    pidx = perm.reshape(batch, pages_per_seq)
    max_len = pages_per_seq * page_size
    lengths = jnp.array([max_len, max_len - 37, page_size + 5][:batch],
                        jnp.int32)
    return q, kp, vp, lengths, pidx, paged_reference_attention


def test_paged_decode_alibi():
    from flash_attention_dlrs_tpu.ops.decode import paged_decode_attention

    q, kp, vp, lengths, pidx, oracle = _paged_setup(20)
    slopes = alibi_slopes_for(q.shape[1])
    o = paged_decode_attention(q, kp, vp, lengths, pidx,
                               alibi_slopes=slopes)
    o_ref = oracle(q, kp, vp, lengths, pidx, alibi_slopes=slopes)
    np.testing.assert_allclose(o, o_ref, atol=2e-4, rtol=1e-4)
    # and it actually differs from the unbiased result
    o_plain = paged_decode_attention(q, kp, vp, lengths, pidx)
    assert float(jnp.max(jnp.abs(o - o_plain))) > 1e-3


def test_paged_verify_alibi_matches_per_token_oracle():
    from flash_attention_dlrs_tpu.ops.decode import paged_verify_attention

    q1, kp, vp, lengths, pidx, oracle = _paged_setup(21)
    b, hq, d = q1.shape
    t = 3
    qt = jax.random.normal(jax.random.PRNGKey(22), (b, hq, t, d), jnp.float32)
    slopes = alibi_slopes_for(hq)
    o = paged_verify_attention(qt, kp, vp, lengths, pidx,
                               alibi_slopes=slopes)
    for ti in range(t):
        eff = lengths - (t - 1 - ti)
        o_ref = oracle(qt[:, :, ti], kp, vp, eff, pidx, alibi_slopes=slopes)
        np.testing.assert_allclose(o[:, :, ti], o_ref, atol=2e-4, rtol=1e-4)


def test_alibi_decode_step_matches_full_forward():
    # End-to-end serving consistency for an alibi model: prefill a prompt,
    # write its KV pages, decode one more token — the logits must match the
    # train-path forward() over the full sequence at the last position.
    from flash_attention_dlrs_tpu.models import (
        ModelConfig, forward, init_params,
    )
    from flash_attention_dlrs_tpu.models.decoding import (
        init_kv_pools, make_decode_step, make_prefill, write_prompt_kv,
    )

    cfg = ModelConfig(vocab_size=128, d_model=64, n_layers=2, n_q_heads=4,
                      n_kv_heads=2, head_dim=32, d_ff=128, dtype=jnp.float32,
                      position_encoding="alibi")
    params = init_params(jax.random.PRNGKey(0), cfg)
    ps = 64
    prompt = np.arange(1, 11)  # 10 tokens
    t0 = len(prompt)
    next_tok = 42

    pools = init_kv_pools(cfg, num_pages=8, page_size=ps, dtype=jnp.float32)
    prefill = make_prefill(cfg)
    toks = jnp.asarray(prompt[None, :], jnp.int32)
    logits_p, kvs = prefill(params, jnp.pad(toks, ((0, 0), (0, 128 - t0))),
                            jnp.asarray([t0], jnp.int32))
    pages = jnp.arange(2, dtype=jnp.int32)
    for li, (k, v) in enumerate(kvs):
        pools = write_prompt_kv(
            pools, li, (k[0, :, :2 * ps], v[0, :, :2 * ps]), pages, ps
        )

    step = make_decode_step(cfg)
    logits_d, pools = step(
        params, pools,
        jnp.asarray([next_tok], jnp.int32), jnp.asarray([t0], jnp.int32),
        jnp.asarray([t0 // ps], jnp.int32), jnp.asarray([t0 % ps], jnp.int32),
        jnp.arange(8, dtype=jnp.int32)[None, :],
        jnp.asarray([t0 + 1], jnp.int32),
    )

    full = jnp.asarray(np.concatenate([prompt, [next_tok]])[None, :],
                       jnp.int32)
    logits_full = forward(params, full, cfg)
    # prefill's last-prompt-token logits and the decode step's logits must
    # both match the dense forward.
    np.testing.assert_allclose(
        np.asarray(logits_p[0]), np.asarray(logits_full[0, t0 - 1]),
        atol=2e-4, rtol=1e-4,
    )
    np.testing.assert_allclose(
        np.asarray(logits_d[0]), np.asarray(logits_full[0, t0]),
        atol=2e-4, rtol=1e-4,
    )
