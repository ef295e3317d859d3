"""Backward correctness: golden gradients + autograd contract.

Preserves the reference's two backward harnesses:
- golden gradient comparison with the per-tensor tolerance ladder
  dQ 9e-4 / dK 7e-4 / dV 7e-5, rtol 1e-5
  (reference: src/test_correctness.py:48-76,60-62,74-76);
- the autograd-contract check, with jax.test_util.check_grads replacing
  torch.autograd.gradcheck (src/test_torch.py:21-46) — no warm-up backward
  needed because there is no first-run race to dodge (the reference's
  known bug at src/flash_attention_kernels.py:299-304).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flash_attention_dlrs_tpu import BlockSizes, flash_attention
from flash_attention_dlrs_tpu.ops import (
    flash_attention_backward,
    flash_attention_forward,
    reference_attention_grads,
)

DQ_ATOL, DK_ATOL, DV_ATOL = 9e-4, 7e-4, 7e-5  # ≙ src/test_correctness.py:60-62
RTOL = 1e-5


def _setup(seed, shape_q, shape_kv, dtype=jnp.float32):
    k1, k2, k3, k4 = jax.random.split(jax.random.PRNGKey(seed), 4)
    q = jax.random.normal(k1, shape_q, dtype)
    k = jax.random.normal(k2, shape_kv, dtype)
    v = jax.random.normal(k3, shape_kv, dtype)
    do = jax.random.normal(k4, shape_q, dtype)
    return q, k, v, do


def _grads_via_vjp(q, k, v, do, **kw):
    _, vjp = jax.vjp(lambda q_, k_, v_: flash_attention(q_, k_, v_, **kw), q, k, v)
    return vjp(do)


@pytest.mark.parametrize("seed", range(3))
@pytest.mark.parametrize("causal", [False, True])
def test_bwd_golden_fp32(seed, causal):
    b, h, n, d = 2, 2, 256, 128
    q, k, v, do = _setup(seed, (b, h, n, d), (b, h, n, d))
    dq, dk, dv = _grads_via_vjp(q, k, v, do, causal=causal, sm_scale=1.0)
    dq_r, dk_r, dv_r = reference_attention_grads(
        q, k, v, do, causal=causal, sm_scale=1.0
    )
    np.testing.assert_allclose(dq, dq_r, atol=DQ_ATOL, rtol=RTOL)
    np.testing.assert_allclose(dk, dk_r, atol=DK_ATOL, rtol=RTOL)
    np.testing.assert_allclose(dv, dv_r, atol=DV_ATOL, rtol=RTOL)


def test_bwd_functional_wrapper():
    # flash_attention_backward mirrors src/flash_attention_wrappers.py:66-176.
    b, h, n, d = 1, 2, 256, 64
    q, k, v, do = _setup(7, (b, h, n, d), (b, h, n, d))
    o, lse = flash_attention_forward(q, k, v, sm_scale=1.0)
    dq, dk, dv = flash_attention_backward(q, k, v, o, do, lse, sm_scale=1.0)
    dq_r, dk_r, dv_r = reference_attention_grads(q, k, v, do, sm_scale=1.0)
    np.testing.assert_allclose(dq, dq_r, atol=DQ_ATOL, rtol=RTOL)
    np.testing.assert_allclose(dk, dk_r, atol=DK_ATOL, rtol=RTOL)
    np.testing.assert_allclose(dv, dv_r, atol=DV_ATOL, rtol=RTOL)


@pytest.mark.parametrize("causal", [False, True])
def test_bwd_two_sweep_fallback_matches(causal, monkeypatch):
    """The two-sweep (dKV + dQ) kernels stay correct: force the dispatcher
    past the fused path (used when the pane dQ buffer would not fit VMEM)."""
    from flash_attention_dlrs_tpu.ops import bwd_fused

    monkeypatch.setattr(
        bwd_fused, "fused_bwd_fits_vmem", lambda *a, **k: False
    )
    b, h, n, d = 1, 2, 640, 128
    q, k, v, do = _setup(21, (b, h, n, d), (b, h, n, d))
    dq, dk, dv = _grads_via_vjp(q, k, v, do, causal=causal, sm_scale=1.0)
    dq_r, dk_r, dv_r = reference_attention_grads(
        q, k, v, do, causal=causal, sm_scale=1.0
    )
    np.testing.assert_allclose(dq, dq_r, atol=DQ_ATOL, rtol=RTOL)
    np.testing.assert_allclose(dk, dk_r, atol=DK_ATOL, rtol=RTOL)
    np.testing.assert_allclose(dv, dv_r, atol=DV_ATOL, rtol=RTOL)


def test_bwd_fused_matches_two_sweep_bitwise_inputs():
    """Fused and two-sweep paths agree to fp32 tolerance on the same
    (lse-honoring) contract, including GQA + window."""
    from flash_attention_dlrs_tpu.ops import bwd_fused

    b, hq, hkv, n, d = 1, 4, 2, 384, 64
    q, k, v, do = _setup(31, (b, hq, n, d), (b, hkv, n, d))
    o, lse = flash_attention_forward(q, k, v, causal=True, window=100,
                                     sm_scale=1.0)
    args = (q, k, v, o, do, lse)
    kw = dict(causal=True, window=100, sm_scale=1.0)
    g_fused = flash_attention_backward(*args, **kw)
    import unittest.mock as mock
    with mock.patch.object(bwd_fused, "fused_bwd_fits_vmem",
                           lambda *a, **k_: False):
        g_split = flash_attention_backward(*args, **kw)
    for a, b_ in zip(g_fused, g_split):
        np.testing.assert_allclose(a, b_, atol=2e-5, rtol=1e-5)


def test_bwd_gqa():
    b, hq, hkv, n, d = 1, 4, 2, 128, 64
    q, _, _, do = _setup(8, (b, hq, n, d), (b, hq, n, d))
    _, k, v, _ = _setup(9, (b, hq, n, d), (b, hkv, n, d))
    dq, dk, dv = _grads_via_vjp(q, k, v, do, causal=True, sm_scale=1.0)
    dq_r, dk_r, dv_r = reference_attention_grads(
        q, k, v, do, causal=True, sm_scale=1.0
    )
    assert dk.shape == k.shape and dv.shape == v.shape
    np.testing.assert_allclose(dq, dq_r, atol=DQ_ATOL, rtol=RTOL)
    np.testing.assert_allclose(dk, dk_r, atol=2 * DK_ATOL, rtol=RTOL)
    np.testing.assert_allclose(dv, dv_r, atol=2 * DV_ATOL, rtol=RTOL)


def test_bwd_ragged_and_cross_lengths():
    b, h, d = 1, 2, 64
    q, _, _, do = _setup(10, (b, h, 200, d), (b, h, 200, d))
    _, k, v, _ = _setup(11, (b, h, 200, d), (b, h, 333, d))
    dq, dk, dv = _grads_via_vjp(q, k, v, do, sm_scale=1.0)
    dq_r, dk_r, dv_r = reference_attention_grads(q, k, v, do, sm_scale=1.0)
    np.testing.assert_allclose(dq, dq_r, atol=DQ_ATOL, rtol=RTOL)
    np.testing.assert_allclose(dk, dk_r, atol=DK_ATOL, rtol=RTOL)
    np.testing.assert_allclose(dv, dv_r, atol=DV_ATOL, rtol=RTOL)


def test_gradcheck_contract():
    # ≙ torch.autograd.gradcheck at src/test_torch.py:30,39 — finite
    # differences vs VJP on a tiny workload (B=2,H=2,N=32,d=128 there;
    # N=128 here, the kernel's minimum block).
    from jax.test_util import check_grads

    b, h, n, d = 1, 2, 128, 32
    q, k, v, _ = _setup(12, (b, h, n, d), (b, h, n, d))
    check_grads(
        lambda q_, k_, v_: flash_attention(q_, k_, v_, causal=True),
        (q, k, v),
        order=1,
        modes=("rev",),
        atol=1e-2,
        rtol=1e-2,
        eps=2e-2,
    )


def test_bwd_deterministic_bitwise():
    # Determinism is structural on TPU's sequential grid (SURVEY §2.3) — the
    # property the reference chased with its broken ticket kernel
    # (src/flash_attention_kernels.py:343-496, README.md:49-53).
    b, h, n, d = 1, 2, 256, 64
    q, k, v, do = _setup(13, (b, h, n, d), (b, h, n, d))
    g1 = _grads_via_vjp(q, k, v, do, causal=True)
    g2 = _grads_via_vjp(q, k, v, do, causal=True)
    for a, b_ in zip(g1, g2):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b_))


def test_bwd_explicit_block_sizes():
    b, h, n, d = 1, 1, 512, 64
    q, k, v, do = _setup(14, (b, h, n, d), (b, h, n, d))
    bs = BlockSizes(block_q=128, block_kv=256, block_q_bwd=256, block_kv_bwd=128)
    dq, dk, dv = _grads_via_vjp(q, k, v, do, sm_scale=1.0, block_sizes=bs)
    dq_r, dk_r, dv_r = reference_attention_grads(q, k, v, do, sm_scale=1.0)
    np.testing.assert_allclose(dq, dq_r, atol=DQ_ATOL, rtol=RTOL)
    np.testing.assert_allclose(dk, dk_r, atol=DK_ATOL, rtol=RTOL)
    np.testing.assert_allclose(dv, dv_r, atol=DV_ATOL, rtol=RTOL)


# ---------------------------------------------------------------------------
# Packed sequences (segment ids)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("causal", [False, True])
def test_bwd_segment_ids(causal):
    from tests.test_forward import _packed_segments

    b, h, n, d = 2, 2, 384, 128
    q, k, v, do = _setup(11, (b, h, n, d), (b, h, n, d))
    seg = _packed_segments(jax.random.PRNGKey(12), b, n)
    bs = BlockSizes(block_q=128, block_kv=128,
                    block_q_bwd=128, block_kv_bwd=128)
    dq, dk, dv = _grads_via_vjp(
        q, k, v, do, causal=causal, sm_scale=1.0,
        segment_ids=seg, block_sizes=bs,
    )
    dq_r, dk_r, dv_r = reference_attention_grads(
        q, k, v, do, causal=causal, sm_scale=1.0, segment_ids=seg
    )
    np.testing.assert_allclose(dq, dq_r, atol=DQ_ATOL, rtol=RTOL)
    np.testing.assert_allclose(dk, dk_r, atol=DK_ATOL, rtol=RTOL)
    np.testing.assert_allclose(dv, dv_r, atol=DV_ATOL, rtol=RTOL)


def test_bwd_segment_ids_under_jit_and_grad():
    """segment_ids must compose with jit + grad (float0 cotangents)."""
    from tests.test_forward import _packed_segments

    b, h, n, d = 1, 2, 256, 128
    q, k, v, do = _setup(13, (b, h, n, d), (b, h, n, d))
    seg = _packed_segments(jax.random.PRNGKey(14), b, n)

    @jax.jit
    def loss(q_, k_, v_):
        o = flash_attention(q_, k_, v_, causal=True, segment_ids=seg)
        return jnp.sum(o.astype(jnp.float32) ** 2)

    g = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
    assert all(np.isfinite(np.asarray(x)).all() for x in g)


@pytest.mark.parametrize("window", [100, 256])
def test_bwd_sliding_window(window):
    b, h, n, d = 2, 2, 512, 128
    q, k, v, do = _setup(31, (b, h, n, d), (b, h, n, d))
    bs = BlockSizes(block_q=128, block_kv=128,
                    block_q_bwd=128, block_kv_bwd=128)
    dq, dk, dv = _grads_via_vjp(
        q, k, v, do, causal=True, sm_scale=1.0, window=window, block_sizes=bs
    )
    dq_r, dk_r, dv_r = reference_attention_grads(
        q, k, v, do, causal=True, sm_scale=1.0, window=window
    )
    np.testing.assert_allclose(dq, dq_r, atol=DQ_ATOL, rtol=RTOL)
    np.testing.assert_allclose(dk, dk_r, atol=DK_ATOL, rtol=RTOL)
    np.testing.assert_allclose(dv, dv_r, atol=DV_ATOL, rtol=RTOL)


def test_bwd_logit_softcap():
    b, h, n, d = 2, 2, 256, 128
    q, k, v, do = _setup(41, (b, h, n, d), (b, h, n, d))
    dq, dk, dv = _grads_via_vjp(
        q, k, v, do, causal=True, sm_scale=1.0, logit_softcap=30.0
    )
    dq_r, dk_r, dv_r = reference_attention_grads(
        q, k, v, do, causal=True, sm_scale=1.0, logit_softcap=30.0
    )
    np.testing.assert_allclose(dq, dq_r, atol=DQ_ATOL, rtol=RTOL)
    np.testing.assert_allclose(dk, dk_r, atol=DK_ATOL, rtol=RTOL)
    np.testing.assert_allclose(dv, dv_r, atol=DV_ATOL, rtol=RTOL)


def test_fused_bwd_dq_pane_envelope():
    """The fused backward only dispatches within its measured dQ-pane
    envelope (4MiB); longer sequences take the two-sweep kernels."""
    from flash_attention_dlrs_tpu.ops import bwd_fused

    assert bwd_fused.pick_fused_blocks(8192, 8192, 128, jnp.bfloat16)
    assert bwd_fused.pick_fused_blocks(16384, 16384, 128, jnp.bfloat16) is None


def test_bwd_fused_segmented_matches_oracle():
    """Long causal sequences (beyond the fused dQ-pane envelope) run the
    fused kernel once per Q row segment with partial dK/dV summed; segment
    boundaries (incl. a non-dividing final segment) must be invisible."""
    import importlib

    fam = importlib.import_module(
        "flash_attention_dlrs_tpu.ops.flash_attention"
    )
    b, hq, hkv, n, d = 1, 4, 2, 1024, 128
    q, k, v, do = _setup(57, (b, hq, n, d), (b, hkv, n, d))
    o, lse = flash_attention_forward(q, k, v, causal=True, sm_scale=1.0)
    dq_r, dk_r, dv_r = reference_attention_grads(
        q, k, v, do, causal=True, sm_scale=1.0
    )
    m2, linv = fam.lse_to_stats(lse)
    for seg_n in (512, 768):
        dq, dk, dv = fam._backward_fused_segmented(
            q, k, v, o, do, m2, linv, seg_n,
            sm_scale=1.0, softcap=0.0, alibi=None, rate=0.0, seed=None,
            num_kv_heads=hkv, d_est=d,
            interpret=True,
        )
        np.testing.assert_allclose(dq, dq_r, atol=DQ_ATOL, rtol=RTOL)
        np.testing.assert_allclose(dk, dk_r, atol=DK_ATOL, rtol=RTOL)
        np.testing.assert_allclose(dv, dv_r, atol=DV_ATOL, rtol=RTOL)


def test_bwd_segmented_dispatch_gate():
    """The segmented route only fires above max_fused_n and leaves the
    within-envelope dispatch untouched."""
    from flash_attention_dlrs_tpu.ops import bwd_fused

    assert bwd_fused.max_fused_n(128) == 8192
    assert bwd_fused.max_fused_n(256) == 4096
