"""GSPMD partitioning of the flash-attention op (ops/partitioning.py).

Without these rules XLA all-gathers q/k/v and replicates the Pallas kernel
on every shard (verified: the dp×tp train step gathered over the model
axis).  With them, (batch, head)-sharded attention must compile with ZERO
all-gathers, keep outputs sharded, and match unsharded numerics bitwise on
local shards — including GQA head co-location and in-kernel dropout with
per-shard folded seeds.

Runs on the 8-virtual-device CPU mesh (conftest).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from flash_attention_dlrs_tpu import flash_attention
from flash_attention_dlrs_tpu.ops.flash_attention import (
    flash_attention_forward,
)

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 (virtual) devices"
)


def _mesh():
    return Mesh(np.array(jax.devices()).reshape(2, 4), ("data", "model"))


def _sharded_qkv(mesh, b=2, hq=8, hkv=4, n=1024, d=64, dtype=jnp.float32):
    sh = NamedSharding(mesh, P("data", "model", None, None))
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    q = jax.device_put(jax.random.normal(ks[0], (b, hq, n, d), dtype), sh)
    k = jax.device_put(jax.random.normal(ks[1], (b, hkv, n, d), dtype), sh)
    v = jax.device_put(jax.random.normal(ks[2], (b, hkv, n, d), dtype), sh)
    return q, k, v


def _all_gathers(compiled) -> int:
    return sum(
        1 for l in compiled.as_text().splitlines() if "all-gather" in l
    )


def test_forward_shards_without_allgather():
    mesh = _mesh()
    q, k, v = _sharded_qkv(mesh)

    f = jax.jit(lambda a, b_, c: flash_attention(a, b_, c, causal=True))
    compiled = f.lower(q, k, v).compile()
    assert _all_gathers(compiled) == 0, compiled.as_text()[:2000]
    o = f(q, k, v)
    # output stays (data, model)-sharded — not replicated
    assert o.sharding.spec == P("data", "model")

    o_ref = flash_attention(
        jax.device_get(q), jax.device_get(k), jax.device_get(v), causal=True)
    np.testing.assert_array_equal(jax.device_get(o), jax.device_get(o_ref))


def test_forward_lse_sharded():
    mesh = _mesh()
    q, k, v = _sharded_qkv(mesh)
    f = jax.jit(lambda a, b_, c: flash_attention_forward(a, b_, c, causal=True))
    compiled = f.lower(q, k, v).compile()
    assert _all_gathers(compiled) == 0
    o, lse = f(q, k, v)
    o_ref, lse_ref = flash_attention_forward(
        jax.device_get(q), jax.device_get(k), jax.device_get(v), causal=True)
    np.testing.assert_array_equal(jax.device_get(o), jax.device_get(o_ref))
    np.testing.assert_allclose(jax.device_get(lse), jax.device_get(lse_ref),
                               atol=1e-6, rtol=1e-6)


def test_grads_shard_without_allgather():
    mesh = _mesh()
    q, k, v = _sharded_qkv(mesh)

    def loss(a, b_, c):
        return jnp.sum(flash_attention(a, b_, c, causal=True) ** 2)

    g = jax.jit(jax.grad(loss, argnums=(0, 1, 2)))
    compiled = g.lower(q, k, v).compile()
    assert _all_gathers(compiled) == 0, "backward re-gathered an operand"
    dq, dk, dv = g(q, k, v)
    assert dq.sharding.spec == P("data", "model")
    assert dk.sharding.spec == P("data", "model")
    dq_r, dk_r, dv_r = jax.grad(loss, argnums=(0, 1, 2))(
        jax.device_get(q), jax.device_get(k), jax.device_get(v))
    np.testing.assert_allclose(dq, dq_r, atol=2e-5, rtol=1e-5)
    np.testing.assert_allclose(dk, dk_r, atol=2e-5, rtol=1e-5)
    np.testing.assert_allclose(dv, dv_r, atol=2e-5, rtol=1e-5)


def test_indivisible_head_sharding_falls_back():
    # q sharded 4-way over heads but hkv=2 % 4 != 0: the partition plan
    # must drop the head sharding (correctness over parallelism) and still
    # match the unsharded op.
    mesh = _mesh()
    ks = jax.random.split(jax.random.PRNGKey(5), 3)
    q = jax.device_put(
        jax.random.normal(ks[0], (2, 8, 1024, 64), jnp.float32),
        NamedSharding(mesh, P("data", "model", None, None)))
    kv_sh = NamedSharding(mesh, P("data", None, None, None))
    k = jax.device_put(jax.random.normal(ks[1], (2, 2, 1024, 64)), kv_sh)
    v = jax.device_put(jax.random.normal(ks[2], (2, 2, 1024, 64)), kv_sh)
    f = jax.jit(lambda a, b_, c: flash_attention(a, b_, c, causal=True))
    o = f(q, k, v)
    o_ref = flash_attention(
        jax.device_get(q), jax.device_get(k), jax.device_get(v), causal=True)
    np.testing.assert_allclose(jax.device_get(o), jax.device_get(o_ref),
                               atol=1e-6, rtol=1e-6)


def test_dropout_shards_and_decorrelates():
    from flash_attention_dlrs_tpu.ops.fwd_kernel import dropout_keep_mask
    from flash_attention_dlrs_tpu.ops.partitioning import _CP_SEED_PRIME

    mesh = _mesh()
    b, hq, hkv, n, d = 2, 8, 4, 1024, 64
    q, k, v = _sharded_qkv(mesh, b=b, hq=hq, hkv=hkv, n=n, d=d)
    seed = 13

    f = jax.jit(lambda a, b_, c: flash_attention(
        a, b_, c, causal=True, dropout_rate=0.3, dropout_seed=seed))
    compiled = f.lower(q, k, v).compile()
    assert _all_gathers(compiled) == 0
    o = f(q, k, v)
    np.testing.assert_array_equal(o, f(q, k, v))  # deterministic

    # Oracle: each shard (bi over data=2, hs over model=4) folds
    # seed + PRIME*(bi*4 + hs) and masks with LOCAL (b=0, h∈[0,2), rows).
    qf, kf, vf = map(jax.device_get, (q, k, v))
    s = jnp.einsum("bhqd,bhkd->bhqk", qf,
                   jnp.repeat(kf, hq // hkv, 1)) * d ** -0.5
    tri = jnp.tril(jnp.ones((n, n), bool))
    p = jax.nn.softmax(jnp.where(tri, s, -1e30), axis=-1)
    rows = jnp.arange(n, dtype=jnp.int32)[:, None]
    cols = jnp.arange(n, dtype=jnp.int32)[None, :]
    h_per = hq // 4
    M = np.zeros((b, hq, n, n), np.float32)
    for bi in range(b):
        for hs in range(4):
            sd = jnp.int32(seed) + jnp.int32(_CP_SEED_PRIME) * (bi * 4 + hs)
            for hl in range(h_per):
                M[bi, hs * h_per + hl] = dropout_keep_mask(
                    sd, jnp.int32(0), jnp.int32(hl), rows, cols, 0.3)
    o_ref = jnp.einsum("bhqk,bhkd->bhqd", p * jnp.asarray(M),
                       jnp.repeat(vf, hq // hkv, 1))
    np.testing.assert_allclose(jax.device_get(o), o_ref, atol=3e-4, rtol=1e-3)


def test_segment_ids_shard_with_batch():
    """Packed-sequence masking under the partitioned op: segment ids ride
    the batch sharding; fwd + grads match the unsharded op."""
    mesh = _mesh()
    b, h, n, d = 4, 8, 512, 64
    sh = NamedSharding(mesh, P("data", "model", None, None))
    ks = jax.random.split(jax.random.PRNGKey(7), 3)
    q = jax.device_put(jax.random.normal(ks[0], (b, h, n, d)), sh)
    k = jax.device_put(jax.random.normal(ks[1], (b, h, n, d)), sh)
    v = jax.device_put(jax.random.normal(ks[2], (b, h, n, d)), sh)
    seg = jax.device_put(
        jnp.repeat(jnp.arange(4), n // 4)[None, :].repeat(b, 0),
        NamedSharding(mesh, P("data", None)))

    def loss(a, b_, c, s):
        return jnp.sum(flash_attention(a, b_, c, causal=True,
                                       segment_ids=s) ** 2)

    f = jax.jit(jax.value_and_grad(loss, argnums=(0, 1, 2)))
    compiled = f.lower(q, k, v, seg).compile()
    assert _all_gathers(compiled) == 0
    val, (dq, dk, dv) = f(q, k, v, seg)
    val_r, (dq_r, dk_r, dv_r) = jax.value_and_grad(loss, argnums=(0, 1, 2))(
        *map(jax.device_get, (q, k, v, seg)))
    # sharded reduction order differs from the single-device sum
    assert float(val) == pytest.approx(float(val_r), rel=1e-4)
    np.testing.assert_allclose(dq, dq_r, atol=2e-5, rtol=1e-5)
    np.testing.assert_allclose(dk, dk_r, atol=2e-5, rtol=1e-5)
    np.testing.assert_allclose(dv, dv_r, atol=2e-5, rtol=1e-5)


def test_long_n_partitioned_backward_compiles():
    """Regression: the >8K segmented fused backward must trace under the
    custom_partitioning wrapper without closure-captured constants.

    Round 2 shipped a `.at[:, :, :kv_len].add(...)` in
    _backward_fused_segmented whose scatter-add embeds an empty int32 index
    array as a jaxpr const — custom_partitioning asserts `not len(consts)`
    and every sharded training step at N>8K died at trace time on hardware
    while the whole CPU suite (which stopped at ~2K tokens) stayed green.
    This traces + compiles the real N=12288 route on the mesh."""
    mesh = _mesh()
    b, h, n, d = 1, 4, 12288, 128
    sh = NamedSharding(mesh, P(None, "model", None, None))
    ks = jax.random.split(jax.random.PRNGKey(7), 3)
    q, k, v = (
        jax.device_put(
            jax.random.normal(kk, (b, h, n, d), jnp.bfloat16), sh
        )
        for kk in ks
    )

    def loss(a, b_, c):
        return jnp.sum(flash_attention(a, b_, c, causal=True)
                       .astype(jnp.float32))

    g = jax.jit(jax.grad(loss, argnums=(0, 1, 2)))
    compiled = g.lower(q, k, v).compile()  # round-2 bug: AssertionError here
    assert _all_gathers(compiled) == 0


def test_partitioned_backward_route_traces_const_free():
    """Every backward dispatch route must produce a const-free jaxpr — the
    invariant custom_partitioning enforces.  Cheap (abstract trace only),
    sweeping N across the small/fused/segmented route boundaries."""
    from flash_attention_dlrs_tpu.ops.flash_attention import (
        _backward_unpartitioned,
    )

    for n in (512, 2048, 12288, 20480):
        q = jax.ShapeDtypeStruct((1, 2, n, 128), jnp.bfloat16)
        stat = jax.ShapeDtypeStruct((1, 2, n), jnp.float32)

        def f(q_, k_, v_, o_, do_, m2_, linv_):
            return _backward_unpartitioned(
                q_, k_, v_, o_, do_, m2_, linv_, causal=True,
                sm_scale=0.0883, segment_ids=None, window=0,
                logit_softcap=0.0, alibi_slopes=None, dropout_rate=0.0,
                dropout_seed=None, block_sizes=None, interpret=None)

        closed = jax.make_jaxpr(f)(q, q, q, q, q, stat, stat)
        assert not closed.consts, (
            f"N={n}: backward captured {len(closed.consts)} consts "
            f"{[c.shape for c in closed.consts]} — will crash "
            "custom_partitioning")


def _paged_setup(b=4, hq=8, hkv=4, d=128, pages=16, ps=128, pps=4,
                 quantized=False):
    from flash_attention_dlrs_tpu.ops.decode import quantize_kv_pages

    ks = jax.random.split(jax.random.PRNGKey(11), 3)
    kp = jax.random.normal(ks[0], (hkv, pages, ps, d), jnp.float32)
    vp = jax.random.normal(ks[1], (hkv, pages, ps, d), jnp.float32)
    q = jax.random.normal(ks[2], (b, hq, d), jnp.float32)
    lengths = jnp.asarray([ps * pps, ps * 2, ps + 7, 3], jnp.int32)[:b]
    page_tbl = jnp.arange(b * pps, dtype=jnp.int32).reshape(b, pps) % pages
    if quantized:
        kp = quantize_kv_pages(kp)
        vp = quantize_kv_pages(vp)
    return q, kp, vp, lengths, page_tbl


@pytest.mark.parametrize("quantized", [False, True])
def test_paged_decode_shards_heads_and_batch(quantized):
    """Paged decode under jit with (batch, kv-head)-sharded operands must
    compile with zero all-gathers and match unsharded numerics."""
    from flash_attention_dlrs_tpu.ops.decode import paged_decode_attention
    from flash_attention_dlrs_tpu.ops.quantization import QuantizedTensor

    mesh = _mesh()
    q, kp, vp, lengths, page_tbl = _paged_setup(quantized=quantized)
    qs = jax.device_put(q, NamedSharding(mesh, P("data", "model", None)))
    pool_sh = NamedSharding(mesh, P("model", None, None, None))
    if quantized:
        kps = QuantizedTensor(jax.device_put(kp.values, pool_sh),
                              jax.device_put(kp.scales, pool_sh))
        vps = QuantizedTensor(jax.device_put(vp.values, pool_sh),
                              jax.device_put(vp.scales, pool_sh))
    else:
        kps = jax.device_put(kp, pool_sh)
        vps = jax.device_put(vp, pool_sh)
    len_s = jax.device_put(lengths, NamedSharding(mesh, P("data")))
    tbl_s = jax.device_put(page_tbl, NamedSharding(mesh, P("data", None)))

    f = jax.jit(lambda *a: paged_decode_attention(*a))
    compiled = f.lower(qs, kps, vps, len_s, tbl_s).compile()
    assert _all_gathers(compiled) == 0, compiled.as_text()[:2000]
    o = f(qs, kps, vps, len_s, tbl_s)
    o_ref = paged_decode_attention(q, kp, vp, lengths, page_tbl)
    np.testing.assert_allclose(jax.device_get(o), jax.device_get(o_ref),
                               atol=2e-6, rtol=1e-6)


def test_paged_decode_impl_traces_const_free():
    from flash_attention_dlrs_tpu.ops.decode import _paged_decode_local

    q, kp, vp, lengths, page_tbl = _paged_setup()

    def f(q_, k_, v_, l_, t_):
        return _paged_decode_local(
            q_, k_, v_, None, None, l_, t_, sm_scale=0.0883,
            pages_per_block=None, int4=False, return_lse=True, softcap=0.0,
            interpret=True)

    closed = jax.make_jaxpr(f)(q, kp, vp, lengths, page_tbl)
    assert not closed.consts, [c.shape for c in closed.consts]
