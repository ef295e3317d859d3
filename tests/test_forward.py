"""Forward correctness: seeded FP32 golden-reference harness.

Preserves the semantics of the reference harness
(reference: src/test_correctness.py:9-14,28-44): seeded trials, FP32, the
oracle is a naive softmax(QKᵀ)V, tolerance atol 1e-4 / rtol 1e-5, and the
reference's unscaled convention (sm_scale=1).  Trial count is reduced from
200 for CI speed; scripts/run_golden_gate.py runs the full 200.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flash_attention_dlrs_tpu import BlockSizes, flash_attention
from flash_attention_dlrs_tpu.ops import (
    flash_attention_forward,
    reference_attention,
)

FWD_ATOL = 1e-4  # ≙ src/test_correctness.py:40
FWD_RTOL = 1e-5


def _make_qkv(key, shape_q, shape_kv, dtype=jnp.float32):
    k1, k2, k3 = jax.random.split(key, 3)
    q = jax.random.normal(k1, shape_q, dtype)
    k = jax.random.normal(k2, shape_kv, dtype)
    v = jax.random.normal(k3, shape_kv, dtype)
    return q, k, v


@pytest.mark.parametrize("seed", range(5))
@pytest.mark.parametrize("causal", [False, True])
def test_fwd_golden_fp32(seed, causal):
    # Reference workload B=32,H=32,N=256,d=128 (src/test_correctness.py:9-12)
    # scaled down to keep interpret-mode CI fast; the shape family matches.
    b, h, n, d = 2, 4, 256, 128
    q, k, v = _make_qkv(jax.random.PRNGKey(seed), (b, h, n, d), (b, h, n, d))
    o = flash_attention(q, k, v, causal=causal, sm_scale=1.0)
    o_ref = reference_attention(q, k, v, causal=causal, sm_scale=1.0)
    np.testing.assert_allclose(o, o_ref, atol=FWD_ATOL, rtol=FWD_RTOL)


def test_fwd_logsumexp_matches_oracle():
    b, h, n, d = 1, 2, 256, 128
    q, k, v = _make_qkv(jax.random.PRNGKey(0), (b, h, n, d), (b, h, n, d))
    o, lse = flash_attention_forward(q, k, v, sm_scale=1.0)
    o_ref, lse_ref = reference_attention(q, k, v, sm_scale=1.0, with_lse=True)
    np.testing.assert_allclose(o, o_ref, atol=FWD_ATOL, rtol=FWD_RTOL)
    np.testing.assert_allclose(lse, lse_ref, atol=1e-4, rtol=1e-5)


@pytest.mark.parametrize("n_q,n_kv", [(128, 384), (384, 128), (256, 1024)])
def test_fwd_cross_attention_lengths(n_q, n_kv):
    b, h, d = 1, 2, 64
    q, k, v = _make_qkv(jax.random.PRNGKey(1), (b, h, n_q, d), (b, h, n_kv, d))
    o = flash_attention(q, k, v, sm_scale=1.0)
    o_ref = reference_attention(q, k, v, sm_scale=1.0)
    np.testing.assert_allclose(o, o_ref, atol=FWD_ATOL, rtol=FWD_RTOL)


@pytest.mark.parametrize("n", [100, 200, 257])
def test_fwd_ragged_lengths_masked_not_required_divisible(n):
    # The reference required N % block == 0 (src/autotune_configs.py:187);
    # here partial blocks are masked in-kernel.
    b, h, d = 1, 2, 64
    q, k, v = _make_qkv(jax.random.PRNGKey(2), (b, h, n, d), (b, h, n, d))
    for causal in (False, True):
        o = flash_attention(q, k, v, causal=causal, sm_scale=1.0)
        o_ref = reference_attention(q, k, v, causal=causal, sm_scale=1.0)
        np.testing.assert_allclose(o, o_ref, atol=FWD_ATOL, rtol=FWD_RTOL)


def test_fwd_head_dim_padding():
    # d=80 is not a lane multiple; wrapper pads to 128 and slices back
    # (≙ pad-to-pow2 in src/flash_attention_torch.py:38-47).
    b, h, n, d = 1, 2, 128, 80
    q, k, v = _make_qkv(jax.random.PRNGKey(3), (b, h, n, d), (b, h, n, d))
    o = flash_attention(q, k, v, sm_scale=1.0)
    o_ref = reference_attention(q, k, v, sm_scale=1.0)
    assert o.shape == (b, h, n, d)
    np.testing.assert_allclose(o, o_ref, atol=FWD_ATOL, rtol=FWD_RTOL)


def test_fwd_gqa_heads():
    b, hq, hkv, n, d = 1, 8, 2, 128, 64
    key = jax.random.PRNGKey(4)
    q, _, _ = _make_qkv(key, (b, hq, n, d), (b, hq, n, d))
    _, k, v = _make_qkv(key, (b, hq, n, d), (b, hkv, n, d))
    o = flash_attention(q, k, v, causal=True, sm_scale=1.0)
    o_ref = reference_attention(q, k, v, causal=True, sm_scale=1.0)
    np.testing.assert_allclose(o, o_ref, atol=FWD_ATOL, rtol=FWD_RTOL)


def test_fwd_bf16():
    b, h, n, d = 1, 2, 256, 128
    q, k, v = _make_qkv(
        jax.random.PRNGKey(5), (b, h, n, d), (b, h, n, d), jnp.bfloat16
    )
    o = flash_attention(q, k, v, causal=True)
    o_ref = reference_attention(q, k, v, causal=True, sm_scale=d**-0.5)
    np.testing.assert_allclose(
        o.astype(jnp.float32), o_ref.astype(jnp.float32), atol=2e-2, rtol=2e-2
    )


def test_fwd_default_scale_is_rsqrt_d():
    b, h, n, d = 1, 1, 128, 64
    q, k, v = _make_qkv(jax.random.PRNGKey(6), (b, h, n, d), (b, h, n, d))
    o = flash_attention(q, k, v)
    o_ref = reference_attention(q, k, v, sm_scale=d**-0.5)
    np.testing.assert_allclose(o, o_ref, atol=FWD_ATOL, rtol=FWD_RTOL)


def test_explicit_block_sizes():
    b, h, n, d = 1, 2, 512, 128
    q, k, v = _make_qkv(jax.random.PRNGKey(7), (b, h, n, d), (b, h, n, d))
    bs = BlockSizes(block_q=256, block_kv=128)
    o = flash_attention(q, k, v, sm_scale=1.0, block_sizes=bs)
    o_ref = reference_attention(q, k, v, sm_scale=1.0)
    np.testing.assert_allclose(o, o_ref, atol=FWD_ATOL, rtol=FWD_RTOL)


def test_validation_errors():
    q = jnp.zeros((1, 2, 128, 64))
    k = jnp.zeros((1, 3, 128, 64))
    with pytest.raises(ValueError):
        flash_attention(q, k, k)
    with pytest.raises(ValueError):
        flash_attention(q[0], q[0], q[0])
    with pytest.raises(ValueError):
        flash_attention(q, q.astype(jnp.bfloat16), q)


def test_tune_picks_and_caches(tmp_path, monkeypatch):
    # timed autotune path (≙ triton.autotune): runs candidates, caches winner
    import flash_attention_dlrs_tpu.tuning as tuning

    monkeypatch.setattr(tuning, "_CACHE_PATH", str(tmp_path / "cache.json"))
    tuning._TUNE_CACHE.clear()
    b, h, n, d = 1, 1, 256, 64
    q, k, v = _make_qkv(jax.random.PRNGKey(9), (b, h, n, d), (b, h, n, d))
    o = flash_attention(q, k, v, sm_scale=1.0, tune=True)
    o_ref = reference_attention(q, k, v, sm_scale=1.0)
    np.testing.assert_allclose(o, o_ref, atol=FWD_ATOL, rtol=FWD_RTOL)
    # BOTH directions are tuned (fwd + bwd keys), unlike round 1's fwd-only
    assert len(tuning._TUNE_CACHE) == 2
    assert any('"fwd"' in key for key in tuning._TUNE_CACHE)
    assert any('"bwd"' in key for key in tuning._TUNE_CACHE)
    # second call hits the cache (no new keys, and no re-timing)
    timed = []
    orig_time = tuning._time_call
    monkeypatch.setattr(
        tuning, "_time_call", lambda *a, **k_: timed.append(1) or orig_time(*a, **k_)
    )
    flash_attention(q, k, v, sm_scale=1.0, tune=True)
    assert len(tuning._TUNE_CACHE) == 2 and not timed
    # tracers are rejected with a clear error
    with pytest.raises(ValueError, match="concrete"):
        jax.jit(lambda a, b_, c: flash_attention(a, b_, c, tune=True))(q, k, v)
    tuning._TUNE_CACHE.clear()


def test_tuned_bwd_blocks_are_valid_and_dispatchable(tmp_path, monkeypatch):
    """tune=True returns measured backward blocks that the backward
    dispatcher accepts; grads through the tuned op stay golden."""
    import flash_attention_dlrs_tpu.tuning as tuning
    from flash_attention_dlrs_tpu.ops import reference_attention_grads
    from flash_attention_dlrs_tpu.ops.flash_attention import tuned_block_sizes

    monkeypatch.setattr(tuning, "_CACHE_PATH", str(tmp_path / "cache.json"))
    tuning._TUNE_CACHE.clear()
    b, h, n, d = 1, 1, 256, 64
    q, k, v = _make_qkv(jax.random.PRNGKey(10), (b, h, n, d), (b, h, n, d))
    bs = tuned_block_sizes(q, k, v, causal=True, sm_scale=1.0)
    cands = tuning.candidate_bwd_configs(n, n, d, q.dtype)
    assert (bs.block_q_bwd, bs.block_kv_bwd) in cands
    do = jax.random.normal(jax.random.PRNGKey(11), (b, h, n, d))
    _, vjp = jax.vjp(
        lambda a, b_, c: flash_attention(
            a, b_, c, causal=True, sm_scale=1.0, block_sizes=bs
        ), q, k, v,
    )
    dq, dk, dv = vjp(do)
    dq_r, dk_r, dv_r = reference_attention_grads(
        q, k, v, do, causal=True, sm_scale=1.0
    )
    np.testing.assert_allclose(dq, dq_r, atol=9e-4, rtol=1e-5)
    np.testing.assert_allclose(dk, dk_r, atol=7e-4, rtol=1e-5)
    np.testing.assert_allclose(dv, dv_r, atol=7e-5, rtol=1e-5)
    tuning._TUNE_CACHE.clear()


# ---------------------------------------------------------------------------
# Packed sequences (segment ids) — new capability, no reference counterpart
# ---------------------------------------------------------------------------


def _packed_segments(key, b, n, max_segs=4):
    """Random packed layout: each row split into 1..max_segs segments."""
    lens = jax.random.randint(key, (b, max_segs), 1, n)
    ids = []
    for row in np.asarray(lens):
        bounds = np.sort(row)[: max_segs - 1]
        seg = np.zeros((n,), np.int32)
        for bnd in bounds:
            seg[bnd:] += 1
        ids.append(seg)
    return jnp.asarray(np.stack(ids))


@pytest.mark.parametrize("causal", [False, True])
@pytest.mark.parametrize("blocks", [128, 256])
def test_fwd_segment_ids(causal, blocks):
    from flash_attention_dlrs_tpu import SegmentIds

    b, h, n, d = 2, 2, 384, 128  # non-dividing N exercises seg padding
    q, k, v = _make_qkv(jax.random.PRNGKey(7), (b, h, n, d), (b, h, n, d))
    seg = _packed_segments(jax.random.PRNGKey(8), b, n)
    bs = BlockSizes(block_q=blocks, block_kv=blocks)
    o = flash_attention(
        q, k, v, causal=causal, sm_scale=1.0, segment_ids=seg, block_sizes=bs
    )
    o_ref = reference_attention(
        q, k, v, causal=causal, sm_scale=1.0, segment_ids=seg
    )
    np.testing.assert_allclose(o, o_ref, atol=FWD_ATOL, rtol=FWD_RTOL)


def test_fwd_segment_ids_cross_attention_pair():
    """SegmentIds(q, kv) with distinct q/kv lengths."""
    from flash_attention_dlrs_tpu import SegmentIds

    b, h, d = 2, 2, 128
    n_q, n_kv = 256, 384
    q, k, v = _make_qkv(jax.random.PRNGKey(3), (b, h, n_q, d), (b, h, n_kv, d))
    qs = _packed_segments(jax.random.PRNGKey(4), b, n_q)
    ks = _packed_segments(jax.random.PRNGKey(4), b, n_kv)
    seg = SegmentIds(q=qs, kv=ks)
    o = flash_attention(q, k, v, sm_scale=1.0, segment_ids=seg)
    o_ref = reference_attention(q, k, v, sm_scale=1.0, segment_ids=seg)
    # rows whose segment id never occurs in kv are fully masked -> O = 0;
    # the oracle yields NaN there (0/0), so compare only finite rows.
    finite = np.isfinite(np.asarray(o_ref))
    np.testing.assert_allclose(
        np.asarray(o)[finite], np.asarray(o_ref)[finite],
        atol=FWD_ATOL, rtol=FWD_RTOL,
    )


# ---------------------------------------------------------------------------
# Sliding-window (local causal) attention
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("window", [1, 100, 256, 300])
@pytest.mark.parametrize("blocks", [128, 256])
def test_fwd_sliding_window(window, blocks):
    b, h, n, d = 2, 2, 512, 128
    q, k, v = _make_qkv(jax.random.PRNGKey(21), (b, h, n, d), (b, h, n, d))
    bs = BlockSizes(block_q=blocks, block_kv=blocks)
    o = flash_attention(
        q, k, v, causal=True, sm_scale=1.0, window=window, block_sizes=bs
    )
    o_ref = reference_attention(
        q, k, v, causal=True, sm_scale=1.0, window=window
    )
    np.testing.assert_allclose(o, o_ref, atol=FWD_ATOL, rtol=FWD_RTOL)


def test_fwd_window_ragged_and_gqa():
    b, hq, hkv, n, d = 2, 4, 2, 300, 128  # ragged N + GQA
    q, _, _ = _make_qkv(jax.random.PRNGKey(22), (b, hq, n, d), (b, hq, n, d))
    _, k, v = _make_qkv(jax.random.PRNGKey(23), (b, hkv, n, d), (b, hkv, n, d))
    o = flash_attention(q, k, v, causal=True, sm_scale=1.0, window=77)
    o_ref = reference_attention(q, k, v, causal=True, sm_scale=1.0, window=77)
    np.testing.assert_allclose(o, o_ref, atol=FWD_ATOL, rtol=FWD_RTOL)


def test_fwd_window_full_coverage_equals_causal():
    b, h, n, d = 1, 2, 256, 128
    q, k, v = _make_qkv(jax.random.PRNGKey(24), (b, h, n, d), (b, h, n, d))
    o_w = flash_attention(q, k, v, causal=True, sm_scale=1.0, window=n)
    o_c = flash_attention(q, k, v, causal=True, sm_scale=1.0)
    np.testing.assert_allclose(np.asarray(o_w), np.asarray(o_c))


def test_fwd_window_requires_causal():
    b, h, n, d = 1, 2, 128, 128
    q, k, v = _make_qkv(jax.random.PRNGKey(25), (b, h, n, d), (b, h, n, d))
    with pytest.raises(ValueError):
        flash_attention(q, k, v, causal=False, window=16)


@pytest.mark.parametrize("causal", [False, True])
def test_fwd_logit_softcap(causal):
    """Gemma-style cap·tanh(S/cap) pre-softmax vs oracle."""
    b, h, n, d = 2, 2, 256, 128
    q, k, v = _make_qkv(jax.random.PRNGKey(33), (b, h, n, d), (b, h, n, d))
    o = flash_attention(q, k, v, causal=causal, sm_scale=1.0,
                        logit_softcap=30.0)
    o_ref = reference_attention(q, k, v, causal=causal, sm_scale=1.0,
                                logit_softcap=30.0)
    np.testing.assert_allclose(o, o_ref, atol=FWD_ATOL, rtol=FWD_RTOL)
    # capping changes the result vs uncapped (sanity the flag is live)
    o_plain = flash_attention(q, k, v, causal=causal, sm_scale=1.0)
    assert float(jnp.max(jnp.abs(o - o_plain))) > 1e-3


# ---------------------------------------------------------------------------
# One-shot short-sequence path (no explicit blocks, N <= 512)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("n", [192, 256, 500])
@pytest.mark.parametrize("causal", [False, True])
def test_fwd_small_path(n, causal):
    b, hq, hkv, d = 2, 4, 2, 128
    q, _, _ = _make_qkv(jax.random.PRNGKey(51), (b, hq, n, d), (b, hq, n, d))
    _, k, v = _make_qkv(jax.random.PRNGKey(52), (b, hkv, n, d), (b, hkv, n, d))
    o = flash_attention(q, k, v, causal=causal, sm_scale=1.0)  # small path
    o_ref = reference_attention(q, k, v, causal=causal, sm_scale=1.0)
    np.testing.assert_allclose(o, o_ref, atol=FWD_ATOL, rtol=FWD_RTOL)


def test_fwd_small_path_window_segments_softcap():
    b, h, n, d = 2, 2, 320, 128
    q, k, v = _make_qkv(jax.random.PRNGKey(53), (b, h, n, d), (b, h, n, d))
    seg = _packed_segments(jax.random.PRNGKey(54), b, n)
    for kw in (dict(window=70), dict(segment_ids=seg),
               dict(logit_softcap=20.0),
               dict(window=90, logit_softcap=15.0)):
        o = flash_attention(q, k, v, causal=True, sm_scale=1.0, **kw)
        o_ref = reference_attention(q, k, v, causal=True, sm_scale=1.0, **kw)
        np.testing.assert_allclose(o, o_ref, atol=FWD_ATOL, rtol=FWD_RTOL,
                                   err_msg=str(kw))


def test_heads_per_cell_respects_gqa_multiple():
    """hb must stay a multiple of q_per_kv (and divisor of Hq) at every
    budget — a non-multiple (e.g. 6 with q_per_kv=4) makes the kernel index
    past the kv block."""
    from flash_attention_dlrs_tpu.ops.fwd_small import _heads_per_cell

    for hq, q_per_kv in [(12, 4), (12, 3), (16, 4), (8, 8), (24, 6), (9, 3)]:
        for frac in (1.0, 0.25, 0.05, 1e-6):
            hb = _heads_per_cell(512, 128, hq, q_per_kv, jnp.float32,
                                 budget_frac=frac)
            assert hq % hb == 0 and hb % q_per_kv == 0, (hq, q_per_kv, frac, hb)


def test_fwd_small_gqa_nonpow2_heads():
    """Hq=12/Hkv=3 fp32 N=512: the shape class where the old halving search
    could pick hb=6 with q_per_kv=4 and read past the kv block."""
    b, hq, hkv, n, d = 1, 12, 3, 512, 128
    q, _, _ = _make_qkv(jax.random.PRNGKey(57), (b, hq, n, d), (b, hq, n, d))
    _, k, v = _make_qkv(jax.random.PRNGKey(58), (b, hkv, n, d), (b, hkv, n, d))
    o = flash_attention(q, k, v, causal=True, sm_scale=1.0)
    o_ref = reference_attention(q, k, v, causal=True, sm_scale=1.0)
    np.testing.assert_allclose(o, o_ref, atol=FWD_ATOL, rtol=FWD_RTOL)


@pytest.mark.parametrize("dtype", [jnp.bfloat16, jnp.float16])
def test_fwd_bwd_half_precision_dtypes(dtype):
    """Sub-fp32 dtype surface: bf16 (TPU default) and fp16 (the reference's
    bench dtype, src/bench.py:24-25; mapped by convert_triton_dtype,
    src/flash_attention_torch.py:7-18).  Half-precision tolerances."""
    b, h, n, d = 1, 2, 256, 64
    q, k, v = _make_qkv(jax.random.PRNGKey(71), (b, h, n, d), (b, h, n, d),
                        dtype=dtype)
    o = flash_attention(q, k, v, causal=True, sm_scale=1.0)
    assert o.dtype == dtype
    o_ref = reference_attention(
        q.astype(jnp.float32), k.astype(jnp.float32), v.astype(jnp.float32),
        causal=True, sm_scale=1.0,
    )
    # unscaled scores (sm_scale=1) make softmax sharp; half-precision
    # rounding near zero blows up RELATIVE error, so gate on absolute only
    np.testing.assert_allclose(o.astype(jnp.float32), o_ref, atol=8e-2)
    # grads exist and come back in the input dtype
    g = jax.grad(
        lambda q_: flash_attention(q_, k, v, causal=True, sm_scale=1.0)
        .astype(jnp.float32).sum()
    )(q)
    assert g.dtype == dtype and bool(jnp.all(jnp.isfinite(
        g.astype(jnp.float32))))


def test_float64_refused_explicitly():
    """The reference's dtype map includes float64
    (src/flash_attention_torch.py:7-18) because GPUs have fp64 ALUs; the
    TPU MXU does not, so the surface is an explicit NotImplementedError
    rather than a silent downcast."""
    jax.config.update("jax_enable_x64", True)
    try:
        q = jnp.ones((1, 1, 128, 64), jnp.float64)
        with pytest.raises(NotImplementedError, match="float64"):
            flash_attention(q, q, q, causal=True)
    finally:
        jax.config.update("jax_enable_x64", False)


# ---------------------------------------------------------------------------
# Mid-length causal path (in-kernel sub-blocking, 512 < N <= 2048)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("n", [640, 1024, 1500])
def test_fwd_mid_path(n):
    b, hq, hkv, d = 1, 4, 2, 128
    q, _, _ = _make_qkv(jax.random.PRNGKey(61), (b, hq, n, d), (b, hq, n, d))
    _, k, v = _make_qkv(jax.random.PRNGKey(62), (b, hkv, n, d), (b, hkv, n, d))
    o = flash_attention(q, k, v, causal=True, sm_scale=1.0)  # mid path
    o_ref = reference_attention(q, k, v, causal=True, sm_scale=1.0)
    np.testing.assert_allclose(o, o_ref, atol=FWD_ATOL, rtol=FWD_RTOL)


def test_fwd_mid_window_softcap():
    b, h, n, d = 1, 2, 1024, 128
    q, k, v = _make_qkv(jax.random.PRNGKey(63), (b, h, n, d), (b, h, n, d))
    for kw in (dict(window=300), dict(logit_softcap=20.0),
               dict(window=700, logit_softcap=15.0)):
        o = flash_attention(q, k, v, causal=True, sm_scale=1.0, **kw)
        o_ref = reference_attention(q, k, v, causal=True, sm_scale=1.0, **kw)
        np.testing.assert_allclose(o, o_ref, atol=FWD_ATOL, rtol=FWD_RTOL,
                                   err_msg=str(kw))


def test_fwd_mid_lse_feeds_backward():
    from flash_attention_dlrs_tpu.ops import reference_attention_grads

    b, h, n, d = 1, 2, 768, 64
    q, k, v = _make_qkv(jax.random.PRNGKey(64), (b, h, n, d), (b, h, n, d))
    do = jax.random.normal(jax.random.PRNGKey(65), (b, h, n, d))
    _, vjp = jax.vjp(
        lambda a, b_, c: flash_attention(a, b_, c, causal=True, sm_scale=1.0),
        q, k, v,
    )
    dq, dk, dv = vjp(do)
    dq_r, dk_r, dv_r = reference_attention_grads(
        q, k, v, do, causal=True, sm_scale=1.0
    )
    np.testing.assert_allclose(dq, dq_r, atol=9e-4, rtol=1e-5)
    np.testing.assert_allclose(dk, dk_r, atol=7e-4, rtol=1e-5)
    np.testing.assert_allclose(dv, dv_r, atol=7e-5, rtol=1e-5)


# ---------------------------------------------------------------------------
# Strip path (K/V-resident, q/o streamed, 2048 < N <= 8192)
# ---------------------------------------------------------------------------


def test_fwd_strip_path_dispatch_and_value():
    """2048 < N routes to fwd_mid_strip_pallas and matches the reference,
    including a non-multiple-of-1024 length (padded tail)."""
    from unittest import mock

    from flash_attention_dlrs_tpu.ops import fwd_mid

    b, hq, hkv, n, d = 1, 2, 1, 2100, 64
    q, _, _ = _make_qkv(jax.random.PRNGKey(71), (b, hq, n, d), (b, hq, n, d))
    _, k, v = _make_qkv(jax.random.PRNGKey(72), (b, hkv, n, d), (b, hkv, n, d))
    with mock.patch.object(
        fwd_mid, "fwd_mid_strip_pallas", wraps=fwd_mid.fwd_mid_strip_pallas
    ) as spy:
        o = flash_attention(q, k, v, causal=True, sm_scale=0.5)
        assert spy.call_count == 1, "strip path not taken at N=2100"
    o_ref = reference_attention(q, k, v, causal=True, sm_scale=0.5)
    np.testing.assert_allclose(o, o_ref, atol=FWD_ATOL, rtol=FWD_RTOL)


def test_fwd_strip_window_softcap():
    b, h, n, d = 1, 1, 3072, 64
    q, k, v = _make_qkv(jax.random.PRNGKey(73), (b, h, n, d), (b, h, n, d))
    # window=300 < sub=512 exercises the diagonal sub-block's window mask
    # (regression: the strip kernel once only masked the interior blocks)
    for kw in (dict(window=900), dict(window=300), dict(logit_softcap=20.0)):
        o = flash_attention(q, k, v, causal=True, sm_scale=0.5, **kw)
        o_ref = reference_attention(q, k, v, causal=True, sm_scale=0.5, **kw)
        np.testing.assert_allclose(o, o_ref, atol=FWD_ATOL, rtol=FWD_RTOL,
                                   err_msg=str(kw))


def test_fwd_strip_lse_feeds_backward():
    """Grads through the strip forward's packed (m, 1/l) residuals."""
    from flash_attention_dlrs_tpu.ops import reference_attention_grads

    b, h, n, d = 1, 1, 2176, 64
    q, k, v = _make_qkv(jax.random.PRNGKey(74), (b, h, n, d), (b, h, n, d))
    do = jax.random.normal(jax.random.PRNGKey(75), (b, h, n, d))
    _, vjp = jax.vjp(
        lambda a, b_, c: flash_attention(a, b_, c, causal=True, sm_scale=0.5),
        q, k, v,
    )
    dq, dk, dv = vjp(do)
    dq_r, dk_r, dv_r = reference_attention_grads(
        q, k, v, do, causal=True, sm_scale=0.5
    )
    np.testing.assert_allclose(dq, dq_r, atol=9e-4, rtol=1e-5)
    np.testing.assert_allclose(dk, dk_r, atol=7e-4, rtol=1e-5)
    np.testing.assert_allclose(dv, dv_r, atol=7e-5, rtol=1e-5)


def test_fwd_small_lse_feeds_general_backward():
    """Grads through the small fwd (residual LSE) + general bwd kernels."""
    from flash_attention_dlrs_tpu.ops import reference_attention_grads

    b, h, n, d = 2, 2, 256, 128
    q, k, v = _make_qkv(jax.random.PRNGKey(55), (b, h, n, d), (b, h, n, d))
    do = jax.random.normal(jax.random.PRNGKey(56), (b, h, n, d))
    _, vjp = jax.vjp(
        lambda a, b_, c: flash_attention(a, b_, c, causal=True, sm_scale=1.0),
        q, k, v,
    )
    dq, dk, dv = vjp(do)
    dq_r, dk_r, dv_r = reference_attention_grads(
        q, k, v, do, causal=True, sm_scale=1.0
    )
    np.testing.assert_allclose(dq, dq_r, atol=9e-4, rtol=1e-5)
    np.testing.assert_allclose(dk, dk_r, atol=7e-4, rtol=1e-5)
    np.testing.assert_allclose(dv, dv_r, atol=7e-5, rtol=1e-5)


# ---------------------------------------------------------------------------
# fp8 V forward (inference): in-kernel integer dequant, all dispatch routes
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("n", [256, 640, 2100])  # xla-small, pane, strip
def test_fwd_fp8_v(n):
    b, h, d = 1, 2, 64
    q, k, v = _make_qkv(jax.random.PRNGKey(81), (b, h, n, d), (b, h, n, d))
    q = q.astype(jnp.bfloat16)
    k = k.astype(jnp.bfloat16)
    v8 = v.astype(jnp.float8_e4m3fn)
    o = flash_attention(q, k, v8, causal=True, sm_scale=0.5)
    o_ref = reference_attention(
        q.astype(jnp.float32), k.astype(jnp.float32),
        v8.astype(jnp.float32), causal=True, sm_scale=0.5,
    )
    np.testing.assert_allclose(
        np.asarray(o, np.float32), np.asarray(o_ref), atol=2e-2, rtol=2e-2,
    )


def test_fwd_fp8_v_grad_raises():
    b, h, n, d = 1, 1, 256, 64
    q, k, v = _make_qkv(jax.random.PRNGKey(82), (b, h, n, d), (b, h, n, d))
    v8 = v.astype(jnp.float8_e5m2)
    q = q.astype(jnp.bfloat16)
    k = k.astype(jnp.bfloat16)
    with pytest.raises(NotImplementedError, match="fp8 V"):
        jax.grad(
            lambda q_: jnp.sum(
                flash_attention(q_, k, v8, causal=True).astype(jnp.float32)
            )
        )(q)
