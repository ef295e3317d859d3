"""Runtime: paged KV cache manager + continuous-batching scheduler."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flash_attention_dlrs_tpu.ops.decode import (
    paged_decode_attention,
    paged_reference_attention,
)
from flash_attention_dlrs_tpu.runtime.kv_cache import PagedKVCache
from flash_attention_dlrs_tpu.runtime.scheduler import (
    ContinuousBatchingScheduler,
    Request,
)


def test_kv_cache_alloc_free_cycle():
    cache = PagedKVCache.create(
        num_kv_heads=2, head_dim=64, num_pages=8, page_size=128
    )
    cache.allocate("a", 300)  # 3 pages
    cache.allocate("b", 128)  # 1 page
    assert len(cache.free_pages) == 4
    with pytest.raises(MemoryError):
        cache.allocate("c", 128 * 5)
    cache.free("a")
    assert len(cache.free_pages) == 7
    cache.allocate("c", 128 * 5)
    assert len(cache.free_pages) == 2


def test_kv_cache_prompt_then_decode_matches_dense():
    hkv, d, ps = 2, 64, 128
    cache = PagedKVCache.create(
        num_kv_heads=hkv, head_dim=d, num_pages=16, page_size=ps,
        dtype=jnp.float32,
    )
    key = jax.random.PRNGKey(0)
    t = 200
    k_prompt = jax.random.normal(key, (hkv, t, d), jnp.float32)
    v_prompt = jax.random.normal(jax.random.fold_in(key, 1), (hkv, t, d))
    cache.allocate("s", t + 8)
    cache.write_prompt("s", k_prompt, v_prompt)
    # append 3 decode tokens
    ks, vs = [], []
    for step in range(3):
        kn = jax.random.normal(jax.random.fold_in(key, 10 + step), (1, hkv, d))
        vn = jax.random.normal(jax.random.fold_in(key, 20 + step), (1, hkv, d))
        cache.append_tokens(["s"], kn, vn)
        ks.append(kn[0])
        vs.append(vn[0])
    assert cache.seq_lengths["s"] == t + 3

    # paged attention over the cache == dense attention over prompt+appended
    q = jax.random.normal(jax.random.fold_in(key, 99), (1, 4, d), jnp.float32)
    pidx = jnp.asarray(cache.page_indices_for(["s"], 4))
    lengths = jnp.asarray(cache.lengths_for(["s"]))
    kp, vp = cache.kv_for_attention()
    o = paged_decode_attention(q, kp, vp, lengths, pidx)
    o_ref = paged_reference_attention(q, kp, vp, lengths, pidx)
    np.testing.assert_allclose(o, o_ref, atol=2e-4, rtol=1e-4)

    # and the dense K/V reconstructed from pages matches what we wrote
    # (pools are lane-padded to 128 in the head dim; slice back to d)
    k_dense = kp[:, np.asarray(cache.page_tables["s"])][..., :d].reshape(
        hkv, -1, d
    )
    np.testing.assert_allclose(k_dense[:, :t], k_prompt, rtol=1e-6)
    np.testing.assert_allclose(
        k_dense[:, t : t + 3], jnp.stack(ks, axis=1), rtol=1e-6
    )


def test_kv_cache_quantized_append():
    hkv, d, ps = 2, 64, 128
    cache = PagedKVCache.create(
        num_kv_heads=hkv, head_dim=d, num_pages=4, page_size=ps,
        dtype=jnp.int8, quantized=True,
    )
    key = jax.random.PRNGKey(1)
    cache.allocate("s", 4)
    kn = jax.random.normal(key, (1, hkv, d))
    vn = jax.random.normal(jax.random.fold_in(key, 1), (1, hkv, d))
    cache.append_tokens(["s"], kn, vn)
    kq, _ = cache.kv_for_attention()
    page = cache.page_tables["s"][0]
    recon = (
        kq.values[:, page, 0, :d].astype(jnp.float32) * kq.scales[:, page, 0]
    )
    np.testing.assert_allclose(recon, kn[0], atol=2e-2, rtol=2e-2)


def test_scheduler_continuous_batching_flow():
    # 4 slots, 12 requests, capacity gate admits when pages suffice.
    pages_free = {"n": 16}

    def can_alloc(tokens):
        return -(-tokens // 128) <= pages_free["n"]

    admitted, retired = [], []

    def on_admit(req, slot):
        pages_free["n"] -= -(-(len(req.prompt_tokens) + req.max_new_tokens) // 128)
        admitted.append((req.request_id, slot))

    def on_retire(req, slot):
        pages_free["n"] += -(-(len(req.prompt_tokens) + req.max_new_tokens) // 128)
        retired.append((req.request_id, slot))

    sched = ContinuousBatchingScheduler(
        num_slots=4, can_allocate=can_alloc, on_admit=on_admit, on_retire=on_retire
    )
    for i in range(12):
        sched.submit(Request(i, prompt_tokens=[1] * 64, max_new_tokens=3))

    steps = 0
    while sched.has_work and steps < 100:
        sched.schedule()
        # fake decode step: everyone emits one token
        for slot in sched.active_slots:
            sched.slots[slot].output_tokens.append(42)
        sched.record_step(len(sched.active_slots))
        steps += 1

    sched.schedule()  # final retirement
    assert len(retired) == 12 and len(admitted) == 12
    assert sched.stats.tokens_generated == 12 * 3
    assert not sched.has_work
    # slots were reused: more admissions than slots
    assert max(s for _, s in admitted) <= 3


def test_scheduler_fifo_blocks_on_capacity():
    sched = ContinuousBatchingScheduler(
        num_slots=2,
        can_allocate=lambda t: t <= 100,
        on_admit=lambda r, s: None,
        on_retire=lambda r, s: None,
    )
    sched.submit(Request(0, [1] * 200, max_new_tokens=1))  # too big
    sched.submit(Request(1, [1] * 10, max_new_tokens=1))  # would fit
    assert sched.schedule() == []  # head-of-line blocks (no starvation)
    assert sched.slots == [None, None]


def test_data_loader_sharding_and_resume():
    from flash_attention_dlrs_tpu.runtime.data import (
        LoaderState,
        TokenDataset,
        batches,
    )

    ds = TokenDataset(np.arange(10_001, dtype=np.int32), seq_len=100)
    assert ds.num_windows == 100

    # two hosts see disjoint windows
    it0 = batches(ds, batch_size=4, seed=1, process_index=0, process_count=2)
    it1 = batches(ds, batch_size=4, seed=1, process_index=1, process_count=2)
    b0, _ = next(it0)
    b1, _ = next(it1)
    assert b0.shape == (4, 101)
    assert set(b0[:, 0]).isdisjoint(set(b1[:, 0]))

    # deterministic resume: restart from a saved state reproduces the stream
    it = batches(ds, batch_size=4, seed=7, process_index=0, process_count=1)
    _, s1 = next(it)
    b2a, _ = next(it)
    it_resumed = batches(
        ds, batch_size=4, seed=7, state=s1, process_index=0, process_count=1
    )
    b2b, _ = next(it_resumed)
    np.testing.assert_array_equal(b2a, b2b)

    # epochs roll over without repeating within an epoch
    seen = set()
    it = batches(ds, batch_size=10, seed=3, process_index=0, process_count=1)
    for _ in range(10):  # one full epoch of 100 windows
        b, st = next(it)
        starts = tuple(b[:, 0].tolist())
        assert not (set(starts) & seen)
        seen.update(starts)
    assert st.epoch == 0
    _, st = next(it)
    assert st.epoch == 1
