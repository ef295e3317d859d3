"""Mesh-sharded attention on the virtual 8-device CPU mesh.

The multi-host story the reference lacked entirely (SURVEY.md §2.2): these
tests exercise real shard_map programs — head parallelism, ring attention
over a context axis, and the combine-based context parallelism — against the
single-device oracle, on 8 virtual devices
(XLA_FLAGS=--xla_force_host_platform_device_count, set in conftest).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flash_attention_dlrs_tpu.ops import reference_attention
from flash_attention_dlrs_tpu.parallel import (
    make_mesh,
    sharded_attention,
)

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 (virtual) devices"
)


def _qkv(seed, bq, h, n, d, hkv=None, dtype=jnp.float32):
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(seed), 3)
    q = jax.random.normal(k1, (bq, h, n, d), dtype)
    k = jax.random.normal(k2, (bq, hkv or h, n, d), dtype)
    v = jax.random.normal(k3, (bq, hkv or h, n, d), dtype)
    return q, k, v


def test_head_parallel_matches_reference():
    mesh = make_mesh([2, 4], ("data", "model"))
    q, k, v = _qkv(0, 2, 8, 128, 64)
    fn = sharded_attention(mesh, "head", causal=True, sm_scale=1.0)
    o = fn(q, k, v)
    o_ref = reference_attention(q, k, v, causal=True, sm_scale=1.0)
    np.testing.assert_allclose(o, o_ref, atol=1e-4, rtol=1e-5)


def test_head_parallel_gqa_colocated():
    # 8 q heads, 4 kv heads over model=4: 2 q heads + 1 kv head per chip.
    mesh = make_mesh([2, 4], ("data", "model"))
    q, k, v = _qkv(1, 2, 8, 128, 64, hkv=4)
    fn = sharded_attention(mesh, "head", sm_scale=1.0)
    o = fn(q, k, v)
    o_ref = reference_attention(q, k, v, sm_scale=1.0)
    np.testing.assert_allclose(o, o_ref, atol=1e-4, rtol=1e-5)


@pytest.mark.parametrize("causal", [False, True])
def test_ring_attention_matches_reference(causal):
    mesh = make_mesh([2, 4], ("data", "context"))
    n = 4 * 128  # 128 tokens per context shard
    q, k, v = _qkv(2, 2, 2, n, 64)
    fn = sharded_attention(
        mesh, "ring", causal=causal, sm_scale=1.0, model_axis=None
    )
    o = fn(q, k, v)
    o_ref = reference_attention(q, k, v, causal=causal, sm_scale=1.0)
    np.testing.assert_allclose(o, o_ref, atol=2e-4, rtol=1e-4)


def test_ring_attention_2d_heads_and_context():
    mesh = make_mesh([1, 2, 4], ("data", "model", "context"))
    n = 4 * 128
    q, k, v = _qkv(3, 1, 4, n, 64)
    fn = sharded_attention(
        mesh, "ring", causal=True, sm_scale=1.0, model_axis="model"
    )
    o = fn(q, k, v)
    o_ref = reference_attention(q, k, v, causal=True, sm_scale=1.0)
    np.testing.assert_allclose(o, o_ref, atol=2e-4, rtol=1e-4)


def test_zigzag_ring_matches_reference():
    mesh = make_mesh([2, 4], ("data", "context"))
    n = 4 * 256  # 2 chunks of 128 per chip
    q, k, v = _qkv(12, 2, 2, n, 64)
    fn = sharded_attention(mesh, "zigzag", sm_scale=1.0, model_axis=None)
    o = fn(q, k, v)
    o_ref = reference_attention(q, k, v, causal=True, sm_scale=1.0)
    np.testing.assert_allclose(o, o_ref, atol=2e-4, rtol=1e-4)


def test_zigzag_ring_gradients():
    from flash_attention_dlrs_tpu.ops import reference_attention_grads

    mesh = make_mesh([2, 4], ("data", "context"))
    n = 4 * 256
    q, k, v = _qkv(13, 2, 2, n, 64)
    do = jax.random.normal(jax.random.PRNGKey(77), q.shape, q.dtype)
    fn = sharded_attention(mesh, "zigzag", sm_scale=1.0, model_axis=None)
    _, vjp = jax.vjp(fn, q, k, v)
    dq, dk, dv = vjp(do)
    dq_r, dk_r, dv_r = reference_attention_grads(
        q, k, v, do, causal=True, sm_scale=1.0
    )
    np.testing.assert_allclose(dq, dq_r, atol=5e-4, rtol=1e-3)
    np.testing.assert_allclose(dk, dk_r, atol=5e-4, rtol=1e-3)
    np.testing.assert_allclose(dv, dv_r, atol=5e-4, rtol=1e-3)


def test_zigzag_work_balance():
    """Derive per-chip visible work from first principles (chunk
    visibility, diagonal = half) and assert the zigzag layout balances it
    where the contiguous layout skews 1:n."""
    n = 8

    def pairs(chunks_q, chunks_kv):
        w = 0.0
        for ga in chunks_q:
            for gb in chunks_kv:
                if gb < ga:
                    w += 1.0
                elif gb == ga:
                    w += 0.5
        return w

    # zigzag: chip i owns q chunks (i, 2n−1−i); kv block from chip s holds
    # chunks (s, 2n−1−s)
    zz = []
    for i in range(n):
        total = sum(
            pairs((i, 2 * n - 1 - i), (s, 2 * n - 1 - s)) for s in range(n)
        )
        zz.append(total)
    assert len(set(zz)) == 1, zz  # every chip identical

    # contiguous: chip i owns chunk i (of n); skew n:1
    ct = [sum(pairs((i,), (s,)) for s in range(n)) for i in range(n)]
    assert max(ct) / min(ct) > n - 1, ct


def test_zigzag_dropout_replays():
    mesh = make_mesh([2, 4], ("data", "context"))
    n = 4 * 256
    q, k, v = _qkv(14, 2, 2, n, 64)
    fn = sharded_attention(
        mesh, "zigzag", sm_scale=1.0, model_axis=None, dropout_rate=0.2
    )
    seed = jnp.int32(123)
    o1 = fn(q, k, v, seed)
    o2 = fn(q, k, v, seed)
    assert bool(jnp.all(o1 == o2))  # bitwise replay, fixed seed + mesh
    # and grads are finite through the masked path
    g = jax.grad(
        lambda q_: jnp.sum(fn(q_, k, v, seed).astype(jnp.float32))
    )(q)
    assert bool(jnp.all(jnp.isfinite(g)))


def test_combine_context_attention_matches_reference():
    mesh = make_mesh([2, 4], ("data", "context"))
    q, k, v = _qkv(4, 2, 2, 4 * 128, 64)
    fn = sharded_attention(mesh, "combine", sm_scale=1.0)
    o = fn(q, k, v)
    o_ref = reference_attention(q, k, v, sm_scale=1.0)
    np.testing.assert_allclose(o, o_ref, atol=2e-4, rtol=1e-4)


def test_data_parallel():
    mesh = make_mesh([8], ("data",))
    q, k, v = _qkv(5, 8, 2, 128, 64)
    fn = sharded_attention(mesh, "data", causal=True, sm_scale=1.0)
    o = fn(q, k, v)
    o_ref = reference_attention(q, k, v, causal=True, sm_scale=1.0)
    np.testing.assert_allclose(o, o_ref, atol=1e-4, rtol=1e-5)


def test_head_sharded_paged_decode():
    from flash_attention_dlrs_tpu.ops.decode import (
        paged_reference_attention,
        quantize_kv_pages,
    )
    from flash_attention_dlrs_tpu.parallel.sharded_decode import (
        head_sharded_paged_decode,
    )

    mesh = make_mesh([2, 4], ("data", "model"))
    B, Hq, Hkv, P_, ps, d, pps = 4, 8, 4, 32, 128, 64, 4
    keys = jax.random.split(jax.random.PRNGKey(7), 4)
    q = jax.random.normal(keys[0], (B, Hq, d), jnp.float32)
    kp = jax.random.normal(keys[1], (Hkv, P_, ps, d), jnp.float32)
    vp = jax.random.normal(keys[2], (Hkv, P_, ps, d), jnp.float32)
    pidx = jax.random.permutation(keys[3], P_)[: B * pps].reshape(B, pps)
    lengths = jnp.array([512, 300, 129, 1], jnp.int32)

    fn = head_sharded_paged_decode(mesh)
    o = fn(q, kp, vp, lengths, pidx)
    o_ref = paged_reference_attention(q, kp, vp, lengths, pidx)
    np.testing.assert_allclose(o, o_ref, atol=2e-4, rtol=1e-4)

    # quantized pages, same sharding.  int8 decode runs the native s8×s8
    # score dot with per-row q quantization (ops/decode.py): the q error is
    # |δq| ≤ qa/254 per element (qa = row max of sm_scale·q ≈ 0.125·2.6 at
    # d=64 unit normals), giving a √d random-walk score error
    # ≈ (qa/254)·√64·σ_k ≈ 1e-2 rms and an output error of a few e-3 —
    # tolerance pinned to that derivation, not to the dequant path's 2e-4.
    kq, vq = quantize_kv_pages(kp), quantize_kv_pages(vp)
    fnq = head_sharded_paged_decode(mesh, quantized=True)
    oq = fnq(q, kq, vq, lengths, pidx)
    oq_ref = paged_reference_attention(q, kq, vq, lengths, pidx)
    np.testing.assert_allclose(oq, oq_ref, atol=8e-3, rtol=1e-2)

    # int4-packed pages, same sharding.  int4 decode ALSO runs the native
    # s8 score dot (nibble-planar half-dots) with the same per-row
    # q-quantization error bound as int8 above — same derived tolerance.
    k4, v4 = quantize_kv_pages(kp, "int4"), quantize_kv_pages(vp, "int4")
    fn4 = head_sharded_paged_decode(mesh, quantized="int4")
    o4 = fn4(q, k4, v4, lengths, pidx)
    o4_ref = paged_reference_attention(q, k4, v4, lengths, pidx)
    np.testing.assert_allclose(o4, o4_ref, atol=8e-3, rtol=1e-2)


@pytest.mark.parametrize("causal", [False, True])
def test_ring_attention_gradients(causal):
    # Differentiable ring attention: grads through shard_map match the
    # single-device oracle (dk/dv accumulators complete a full ring lap).
    from flash_attention_dlrs_tpu.ops import reference_attention_grads

    mesh = make_mesh([2, 4], ("data", "context"))
    n = 4 * 128
    q, k, v = _qkv(6, 2, 2, n, 64)
    do = jax.random.normal(jax.random.PRNGKey(99), q.shape, q.dtype)
    fn = sharded_attention(
        mesh, "ring", causal=causal, sm_scale=1.0, model_axis=None
    )
    _, vjp = jax.vjp(fn, q, k, v)
    dq, dk, dv = vjp(do)
    dq_r, dk_r, dv_r = reference_attention_grads(
        q, k, v, do, causal=causal, sm_scale=1.0
    )
    np.testing.assert_allclose(dq, dq_r, atol=2e-3, rtol=1e-4)
    np.testing.assert_allclose(dk, dk_r, atol=2e-3, rtol=1e-4)
    np.testing.assert_allclose(dv, dv_r, atol=2e-4, rtol=1e-4)


def test_context_sharded_paged_decode_matches_single_device():
    """Flash-decoding split over a context axis == unsharded paged decode."""
    import numpy as onp
    from flash_attention_dlrs_tpu.ops.decode import (
        paged_decode_attention, quantize_kv_pages,
    )
    from flash_attention_dlrs_tpu.parallel import make_mesh
    from flash_attention_dlrs_tpu.parallel.sharded_decode import (
        context_sharded_paged_decode,
    )

    n_dev = 4
    mesh = make_mesh([n_dev], ("context",), devices=jax.devices()[:n_dev])
    hq, hkv, d, ps = 4, 2, 128, 128
    b = 2
    pages_per_chip = 4  # per-sequence pages on each chip
    pages_local_pool = b * pages_per_chip
    total_pages = n_dev * pages_local_pool

    key = jax.random.PRNGKey(0)
    kp = jax.random.normal(key, (hkv, total_pages, ps, d), jnp.float32)
    vp = jax.random.normal(jax.random.fold_in(key, 1),
                           (hkv, total_pages, ps, d), jnp.float32)
    q = jax.random.normal(jax.random.fold_in(key, 2), (b, hq, d), jnp.float32)

    # per-chip local tables: chip c, seq s owns local pages [s*ppc, (s+1)*ppc)
    # token counts: seq 0 full everywhere; seq 1 has tokens on chips 0-1 only
    tok = onp.zeros((b, n_dev), onp.int32)
    tok[0, :] = pages_per_chip * ps
    tok[1, 0] = pages_per_chip * ps
    tok[1, 1] = 100
    pidx_local = onp.zeros((b, n_dev, pages_per_chip), onp.int32)
    for s in range(b):
        for c in range(n_dev):
            pidx_local[s, c] = onp.arange(
                s * pages_per_chip, (s + 1) * pages_per_chip
            )
    fn = context_sharded_paged_decode(mesh)
    o = fn(q, kp, vp, jnp.asarray(tok), jnp.asarray(pidx_local))

    # unsharded reference: concatenate each sequence's resident tokens
    # (chip order) into one contiguous page list over the global pool
    glob_tbl = onp.zeros((b, n_dev * pages_per_chip), onp.int32)
    glob_len = onp.zeros((b,), onp.int32)
    for s in range(b):
        pages, total = [], 0
        for c in range(n_dev):
            t = int(tok[s, c])
            npg = -(-t // ps) if t else 0
            for j in range(npg):
                pages.append(c * pages_local_pool + pidx_local[s, c, j])
            total += t
        # NOTE: partial chip pages are only valid if the NEXT chip is empty
        # (true in this fixture: seq 1 ends on chip 1)
        glob_tbl[s, : len(pages)] = pages
        glob_len[s] = total
    o_ref = paged_decode_attention(
        q, kp, vp, jnp.asarray(glob_len), jnp.asarray(glob_tbl)
    )
    np.testing.assert_allclose(np.asarray(o), np.asarray(o_ref),
                               atol=2e-4, rtol=1e-4)


# ---------------------------------------------------------------------------
# Attention dropout over the mesh.  The oracle reconstructs the exact masks
# the sharded paths generate — dropout_keep_mask on LOCAL indices with the
# per-shard sub-seeds (ring.shard_seed / sharded_attention._fold_axes) —
# and applies them to dense softmax attention (denominator undropped,
# flash-attn semantics).
# ---------------------------------------------------------------------------


def _dense_dropped(q, k, v, M, causal, sm_scale):
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k) * sm_scale
    if causal:
        n = s.shape[-1]
        tri = jnp.tril(jnp.ones((n, n), bool))
        s = jnp.where(tri, s, -1e30)
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", p * M, v)


def _ring_oracle_mask(seed, b, h, n_dev, m, rate):
    """Masks as the ring wrapper generates them on a (data=b, context=n_dev)
    mesh: batch bi lives alone on data shard bi (local b index 0) with
    sub-seed seed + _DM_SEED_PRIME·bi, then ring folds the (q, kv) pair."""
    from flash_attention_dlrs_tpu.ops.fwd_kernel import dropout_keep_mask
    from flash_attention_dlrs_tpu.parallel.ring import shard_seed
    from flash_attention_dlrs_tpu.parallel.sharded_attention import (
        _DM_SEED_PRIME,
    )

    rows = jnp.arange(m, dtype=jnp.int32)[:, None]
    cols = jnp.arange(m, dtype=jnp.int32)[None, :]
    M = np.zeros((b, h, n_dev * m, n_dev * m), np.float32)
    for bi in range(b):
        seed_dm = jnp.int32(seed) + jnp.int32(_DM_SEED_PRIME) * bi
        for hi in range(h):
            for i in range(n_dev):
                for s in range(n_dev):
                    sd = shard_seed(seed_dm, jnp.int32(i),
                                    jnp.int32(s), n_dev)
                    blk = dropout_keep_mask(
                        sd, jnp.int32(0), jnp.int32(hi), rows, cols, rate)
                    M[bi, hi, i * m:(i + 1) * m, s * m:(s + 1) * m] = blk
    return jnp.asarray(M)


@pytest.mark.parametrize("causal", [False, True])
def test_ring_attention_dropout_matches_blockwise_oracle(causal):
    mesh = make_mesh([2, 4], ("data", "context"))
    n_dev, m, rate, seed = 4, 64, 0.3, 11
    q, k, v = _qkv(8, 2, 2, n_dev * m, 64)
    fn = sharded_attention(
        mesh, "ring", causal=causal, sm_scale=1.0, model_axis=None,
        dropout_rate=rate,
    )
    M = _ring_oracle_mask(seed, 2, 2, n_dev, m, rate)
    o = fn(q, k, v, jnp.int32(seed))
    o_ref = _dense_dropped(q, k, v, M, causal, 1.0)
    np.testing.assert_allclose(o, o_ref, atol=3e-4, rtol=1e-4)
    # bitwise repeatable; different seed reshuffles
    np.testing.assert_array_equal(o, fn(q, k, v, jnp.int32(seed)))
    assert not np.allclose(o, fn(q, k, v, jnp.int32(seed + 1)))
    # gradients replay the identical masks on the backward lap
    do = jax.random.normal(jax.random.PRNGKey(3), q.shape, q.dtype)
    _, vjp = jax.vjp(lambda a, b_, c: fn(a, b_, c, jnp.int32(seed)), q, k, v)
    dq, dk, dv = vjp(do)
    _, vjp_r = jax.vjp(
        lambda a, b_, c: _dense_dropped(a, b_, c, M, causal, 1.0), q, k, v)
    dq_r, dk_r, dv_r = vjp_r(do)
    np.testing.assert_allclose(dq, dq_r, atol=2e-3, rtol=1e-4)
    np.testing.assert_allclose(dk, dk_r, atol=2e-3, rtol=1e-4)
    np.testing.assert_allclose(dv, dv_r, atol=3e-4, rtol=1e-4)


def test_combine_context_dropout_matches_oracle():
    from flash_attention_dlrs_tpu.ops.fwd_kernel import dropout_keep_mask
    from flash_attention_dlrs_tpu.parallel.ring import shard_seed

    from flash_attention_dlrs_tpu.parallel.sharded_attention import (
        _DM_SEED_PRIME,
    )

    mesh = make_mesh([2, 4], ("data", "context"))
    n_dev, m, rate, seed = 4, 64, 0.25, 5
    q, k, v = _qkv(9, 2, 2, n_dev * m, 64)
    fn = sharded_attention(mesh, "combine", sm_scale=1.0, dropout_rate=rate)
    o = fn(q, k, v, jnp.int32(seed))
    # q replicated over context: rows are global; cols are shard-local with
    # sub-seed shard_seed(seed_dm, 0, shard, n); batch bi sits alone on data
    # shard bi (local b = 0) with seed_dm = seed + _DM_SEED_PRIME*bi.
    rows = jnp.arange(n_dev * m, dtype=jnp.int32)[:, None]
    cols = jnp.arange(m, dtype=jnp.int32)[None, :]
    M = np.zeros((2, 2, n_dev * m, n_dev * m), np.float32)
    for bi in range(2):
        seed_dm = jnp.int32(seed) + jnp.int32(_DM_SEED_PRIME) * bi
        for hi in range(2):
            for s in range(n_dev):
                sd = shard_seed(seed_dm, jnp.int32(0), jnp.int32(s), n_dev)
                M[bi, hi, :, s * m:(s + 1) * m] = dropout_keep_mask(
                    sd, jnp.int32(0), jnp.int32(hi), rows, cols, rate)
    o_ref = _dense_dropped(q, k, v, jnp.asarray(M), False, 1.0)
    np.testing.assert_allclose(o, o_ref, atol=3e-4, rtol=1e-4)


def test_head_parallel_dropout_decorrelated_across_shards():
    # Identical batch halves land on different data shards: independent
    # sub-seeds must produce DIFFERENT dropped outputs (a correlated mask
    # would reproduce the same output twice).  Heads likewise.
    mesh = make_mesh([2, 4], ("data", "model"))
    q, k, v = _qkv(10, 1, 8, 128, 64)
    q = jnp.concatenate([q, q]); k = jnp.concatenate([k, k])
    v = jnp.concatenate([v, v])
    fn = sharded_attention(mesh, "head", causal=True, sm_scale=1.0,
                           dropout_rate=0.4)
    o = fn(q, k, v, jnp.int32(21))
    assert not np.allclose(o[0], o[1])
    np.testing.assert_array_equal(o, fn(q, k, v, jnp.int32(21)))
    # zero-rate builder keeps the 3-arg signature and the exact output
    fn0 = sharded_attention(mesh, "head", causal=True, sm_scale=1.0)
    np.testing.assert_allclose(
        fn0(q, k, v), reference_attention(q, k, v, causal=True, sm_scale=1.0),
        atol=1e-4, rtol=1e-5)
