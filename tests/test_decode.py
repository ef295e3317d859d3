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


def test_tuned_pages_per_block_caches_and_runs(tmp_path, monkeypatch):
    """Decode block tuner: picks a feasible candidate, caches on the shape
    key, and the pick produces correct output."""
    import flash_attention_dlrs_tpu.tuning as tuning
    from flash_attention_dlrs_tpu.ops.decode import tuned_pages_per_block

    monkeypatch.setattr(tuning, "_CACHE_PATH", str(tmp_path / "cache.json"))
    tuning._TUNE_CACHE.clear()
    q, kp, vp, lengths, pidx = _setup(3, pages_per_seq=4)
    ppb = tuned_pages_per_block(q, kp, vp, lengths, pidx)
    assert ppb in (1, 2, 4)
    assert any('"decode"' in key for key in tuning._TUNE_CACHE)
    # cache hit on the second call — no re-timing
    timed = []
    monkeypatch.setattr(tuning, "_time_call",
                        lambda *a, **k_: timed.append(1) or 0.0)
    assert tuned_pages_per_block(q, kp, vp, lengths, pidx) == ppb
    assert not timed
    o = paged_decode_attention(q, kp, vp, lengths, pidx, pages_per_block=ppb)
    o_ref = paged_reference_attention(q, kp, vp, lengths, pidx)
    np.testing.assert_allclose(o, o_ref, atol=2e-4, rtol=1e-4)
    tuning._TUNE_CACHE.clear()


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


# ---------------------------------------------------------------------------
# Multi-token verify attention (speculative decoding / chunked prefill)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("quantized", [False, True])
def test_paged_verify_matches_per_token_reference(quantized):
    from flash_attention_dlrs_tpu.ops.decode import paged_verify_attention

    hq, hkv, d, ps = 8, 2, 128, 128
    b, t_new, ctx = 2, 4, 512  # final length after appending t_new tokens
    pages_per_seq = ctx // ps
    num_pages = b * pages_per_seq
    keys = jax.random.split(jax.random.PRNGKey(5), 3)
    kp = jax.random.normal(keys[0], (hkv, num_pages, ps, d), jnp.float32)
    vp = jax.random.normal(keys[1], (hkv, num_pages, ps, d), jnp.float32)
    if quantized:
        kp = quantize_kv_pages(kp, jnp.int8)
        vp = quantize_kv_pages(vp, jnp.int8)
    pidx = jnp.arange(num_pages, dtype=jnp.int32).reshape(b, pages_per_seq)
    lengths = jnp.asarray([ctx, ctx - 37], jnp.int32)
    q = jax.random.normal(keys[2], (b, hq, t_new, d), jnp.float32)

    o = paged_verify_attention(q, kp, vp, lengths, pidx)
    assert o.shape == (b, hq, t_new, d)
    # per-token oracle: token t sees lengths − (t_new−1−t)
    for t in range(t_new):
        o_t = paged_reference_attention(
            q[:, :, t], kp, vp, lengths - (t_new - 1 - t), pidx
        )
        np.testing.assert_allclose(
            np.asarray(o[:, :, t]), np.asarray(o_t), atol=2e-4, rtol=1e-4
        )


def test_paged_verify_single_token_equals_decode():
    from flash_attention_dlrs_tpu.ops.decode import paged_verify_attention

    hq, hkv, d, ps = 4, 2, 128, 128
    b, ctx = 2, 256
    pages_per_seq = ctx // ps
    num_pages = b * pages_per_seq
    keys = jax.random.split(jax.random.PRNGKey(6), 3)
    kp = jax.random.normal(keys[0], (hkv, num_pages, ps, d), jnp.float32)
    vp = jax.random.normal(keys[1], (hkv, num_pages, ps, d), jnp.float32)
    pidx = jnp.arange(num_pages, dtype=jnp.int32).reshape(b, pages_per_seq)
    lengths = jnp.asarray([ctx, ctx - 10], jnp.int32)
    q = jax.random.normal(keys[2], (b, hq, 1, d), jnp.float32)
    o_v = paged_verify_attention(q, kp, vp, lengths, pidx)
    o_d = paged_decode_attention(q[:, :, 0], kp, vp, lengths, pidx)
    np.testing.assert_allclose(
        np.asarray(o_v[:, :, 0]), np.asarray(o_d), atol=1e-5, rtol=1e-5
    )


def test_verify_step_matches_sequential_decode_steps():
    """Scoring T tokens with one verify step == T sequential decode steps."""
    import numpy as onp
    from flash_attention_dlrs_tpu.models import ModelConfig, init_params
    from flash_attention_dlrs_tpu.models.decoding import (
        init_kv_pools, make_decode_step, make_prefill, make_verify_step,
        write_prompt_kv,
    )

    cfg = ModelConfig(vocab_size=128, d_model=64, n_layers=2, n_q_heads=4,
                      n_kv_heads=2, head_dim=32, d_ff=128, dtype=jnp.float32)
    params = init_params(jax.random.PRNGKey(0), cfg)
    ps = 64
    prompt = onp.arange(1, 11)  # 10 tokens
    t0 = len(prompt)
    t_new = 3
    draft = onp.array([5, 7, 9])

    def fresh_pools_with_prompt():
        pools = init_kv_pools(cfg, num_pages=8, page_size=ps, dtype=jnp.float32)
        prefill = make_prefill(cfg)
        toks = jnp.asarray(prompt[None, :], jnp.int32)
        logits, kvs = prefill(params, jnp.pad(toks, ((0, 0), (0, 128 - t0))),
                              jnp.asarray([t0], jnp.int32))
        pages = jnp.arange(2, dtype=jnp.int32)  # pages 0,1 for this seq
        for li, (k, v) in enumerate(kvs):
            pools = write_prompt_kv(
                pools, li, (k[0, :, :2 * ps], v[0, :, :2 * ps]), pages, ps
            )
        return pools

    # path A: sequential single-token decode steps
    pools = fresh_pools_with_prompt()
    step = make_decode_step(cfg)
    logits_seq = []
    for i, tok in enumerate(draft):
        pos = t0 + i
        logits, pools = step(
            params, pools,
            jnp.asarray([tok], jnp.int32), jnp.asarray([pos], jnp.int32),
            jnp.asarray([pos // ps], jnp.int32), jnp.asarray([pos % ps], jnp.int32),
            jnp.arange(8, dtype=jnp.int32)[None, :],  # table rows 0..; seq uses 0,1
            jnp.asarray([pos + 1], jnp.int32),
        )
        logits_seq.append(np.asarray(logits[0]))

    # path B: one verify step over the same 3 tokens
    pools2 = fresh_pools_with_prompt()
    verify = make_verify_step(cfg, t_new)
    positions = jnp.asarray([[t0, t0 + 1, t0 + 2]], jnp.int32)
    rows = positions // ps
    offs = positions % ps
    logits_v, pools2 = verify(
        params, pools2,
        jnp.asarray(draft[None, :], jnp.int32), positions, rows, offs,
        jnp.arange(8, dtype=jnp.int32)[None, :],
        jnp.asarray([t0 + t_new], jnp.int32),
    )
    for t in range(t_new):
        np.testing.assert_allclose(
            np.asarray(logits_v[0, t]), logits_seq[t], atol=2e-4, rtol=1e-4
        )


def test_int4_pack_unpack_round_trip():
    from flash_attention_dlrs_tpu.ops.quantization import (
        pack_int4_rows, unpack_int4_rows,
    )

    vals = jax.random.randint(jax.random.PRNGKey(0), (3, 16, 8), -8, 8)
    packed = pack_int4_rows(vals)
    assert packed.shape == (3, 8, 8) and packed.dtype == jnp.int8
    np.testing.assert_array_equal(np.asarray(unpack_int4_rows(packed)),
                                  np.asarray(vals))


def test_int4_quantize_dequantize():
    from flash_attention_dlrs_tpu.ops.quantization import quantize_int4

    x = jax.random.normal(jax.random.PRNGKey(1), (2, 4, 64, 32))
    xq = quantize_int4(x)
    assert xq.values.shape == (2, 4, 32, 32)
    assert xq.shape == x.shape
    # per-row symmetric int4: worst-case error is half a step = amax/14
    err = jnp.abs(xq.dequantize() - x)
    bound = jnp.max(jnp.abs(x), axis=-1, keepdims=True) / 14 + 1e-6
    assert bool(jnp.all(err <= bound)), float(jnp.max(err - bound))


def test_paged_decode_int4_kv():
    q, kp, vp, lengths, pidx = _setup(5, batch=2)
    kq = quantize_kv_pages(kp, "int4")
    vq = quantize_kv_pages(vp, "int4")
    o = paged_decode_attention(q, kq, vq, lengths, pidx)
    # Oracle on the dequantized pages: isolates kernel error from
    # quantization error.
    o_ref = paged_reference_attention(q, kq, vq, lengths, pidx)
    np.testing.assert_allclose(o, o_ref, atol=2e-3, rtol=1e-3)
    # End-to-end int4 error vs fp32 pages: coarser than int8 but bounded.
    o_fp = paged_reference_attention(q, kp, vp, lengths, pidx)
    assert float(jnp.max(jnp.abs(o - o_fp))) < 0.6


def test_paged_verify_int4_kv():
    from flash_attention_dlrs_tpu.ops.decode import paged_verify_attention

    batch, hq, hkv, t, d = 2, 4, 2, 3, 128
    q, kp, vp, lengths, pidx = _setup(6, batch=batch, hq=hq, hkv=hkv, d=d)
    qt = jax.random.normal(jax.random.PRNGKey(7), (batch, hq, t, d))
    kq = quantize_kv_pages(kp, "int4")
    vq = quantize_kv_pages(vp, "int4")
    got = paged_verify_attention(qt, kq, vq, lengths, pidx)
    # per-token oracle: token i attends to lengths - (t-1-i)
    for i in range(t):
        li = lengths - (t - 1 - i)
        o_ref = paged_reference_attention(qt[:, :, i], kq, vq, li, pidx)
        np.testing.assert_allclose(got[:, :, i], o_ref, atol=2e-3, rtol=1e-3)


def test_int4_mixed_kind_rejected():
    q, kp, vp, lengths, pidx = _setup(7, batch=2)
    kq = quantize_kv_pages(kp, "int4")
    vq = quantize_kv_pages(vp, jnp.int8)
    with pytest.raises(ValueError, match="same kind"):
        paged_decode_attention(q, kq, vq, lengths, pidx)


def test_paged_decode_softcap_matches_reference():
    """Gemma-2 attention-logit soft-capping in the paged decode kernel."""
    q, kp, vp, lengths, pidx = _setup(11)
    o = paged_decode_attention(
        q, kp, vp, lengths, pidx, logit_softcap=50.0
    )
    o_ref = paged_reference_attention(
        q, kp, vp, lengths, pidx, logit_softcap=50.0)
    np.testing.assert_allclose(o, o_ref, atol=2e-4, rtol=1e-4)
    # the cap actually changes the output
    o_nocap = paged_decode_attention(q, kp, vp, lengths, pidx)
    assert not np.allclose(o, o_nocap)


def test_paged_verify_softcap_matches_multi_token_oracle():
    from flash_attention_dlrs_tpu.ops.decode import paged_verify_attention

    b, hq, hkv, d, t = 2, 4, 2, 64, 3
    keys = jax.random.split(jax.random.PRNGKey(12), 4)
    q = jax.random.normal(keys[0], (b, hq, t, d), jnp.float32)
    kp = jax.random.normal(keys[1], (hkv, 8, 128, d), jnp.float32)
    vp = jax.random.normal(keys[2], (hkv, 8, 128, d), jnp.float32)
    pidx = jax.random.permutation(keys[3], 8)[: b * 4].reshape(b, 4)
    lengths = jnp.array([200, 77], jnp.int32)  # FINAL lengths (t counted)
    o = paged_verify_attention(
        q, kp, vp, lengths, pidx, logit_softcap=30.0)
    # oracle: per token t', single-query reference at length - (T-1-t')
    for tt in range(t):
        l_t = lengths - (t - 1 - tt)
        o_ref = paged_reference_attention(
            q[:, :, tt], kp, vp, l_t, pidx, logit_softcap=30.0)
        np.testing.assert_allclose(o[:, :, tt], o_ref, atol=2e-4, rtol=1e-4)


def test_fp8_int_dequant_bit_exact():
    """fp8_to_f32_int matches the native convert on every normal bit
    pattern of both fp8 formats and flushes denormals to zero."""
    import numpy as np

    from flash_attention_dlrs_tpu.ops.quantization import fp8_to_f32_int

    for dt, denorm_edge in ((jnp.float8_e4m3fn, 2.0 ** -6),
                            (jnp.float8_e5m2, 2.0 ** -14)):
        raw = jax.lax.bitcast_convert_type(
            jnp.arange(256, dtype=jnp.uint8), dt)
        got = np.asarray(fp8_to_f32_int(raw))
        want = np.asarray(raw.astype(jnp.float32))
        finite = np.isfinite(want)
        denorm = np.abs(want) < denorm_edge
        np.testing.assert_array_equal(got[finite & ~denorm],
                                      want[finite & ~denorm])
        assert (np.abs(got[finite & denorm]) == 0.0).all()
