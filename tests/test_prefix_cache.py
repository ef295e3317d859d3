"""Prefix caching: shared prompt prefixes, correctness and page accounting."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flash_attention_dlrs_tpu.models import ModelConfig, init_params
from flash_attention_dlrs_tpu.runtime.engine import DecodeEngine

CFG = dict(vocab_size=128, d_model=64, n_layers=2, n_q_heads=4,
           n_kv_heads=2, head_dim=32, d_ff=128, dtype=jnp.float32)
PS = 32


def _engine(params, cfg, **kw):
    return DecodeEngine(params, cfg, num_pages=64, page_size=PS,
                        pages_per_seq=8, num_slots=2, prefill_chunk=32, **kw)


def test_prefix_cache_reuses_pages_and_matches_uncached():
    cfg = ModelConfig(**CFG)
    params = init_params(jax.random.PRNGKey(0), cfg)
    shared = list(range(1, 1 + 3 * PS))  # exactly 3 full pages
    prompts = [shared + [100, 101], shared + [90, 91, 92]]

    plain = _engine(params, cfg).generate(prompts, max_new_tokens=5)
    eng = _engine(params, cfg, enable_prefix_cache=True)
    cached = eng.generate(prompts, max_new_tokens=5)
    assert cached == plain
    # second admission must have hit the cache
    assert eng.prefix_cache.hits >= 1
    # the 3 shared pages are registered and still referenced by the cache
    assert eng.prefix_cache.evictable() >= 3


def test_prefix_cache_skips_recompute():
    """The cached prefix is not re-prefilled: count chunk dispatches."""
    cfg = ModelConfig(**CFG)
    params = init_params(jax.random.PRNGKey(0), cfg)
    shared = list(range(1, 1 + 4 * PS))
    eng = _engine(params, cfg, enable_prefix_cache=True)
    calls = []
    orig = eng._chunk_prefill

    def counting(*a, **k):
        calls.append(1)
        return orig(*a, **k)

    eng._chunk_prefill = counting
    eng.generate([shared], max_new_tokens=2)
    first = len(calls)
    calls.clear()
    eng.generate([shared + [99]], max_new_tokens=2)
    second = len(calls)
    # 4*PS tokens = 4 chunks the first time; the second prompt shares 3 full
    # pages (the 4th holds its final token and stays private) -> fewer chunks
    assert first == 4
    assert second <= 2


def test_prefix_cache_eviction_under_pressure():
    cfg = ModelConfig(**CFG)
    params = init_params(jax.random.PRNGKey(0), cfg)
    eng = _engine(params, cfg, enable_prefix_cache=True)
    # fill the cache with several distinct prompts
    for i in range(5):
        eng.generate([[i + 1] * (3 * PS)], max_new_tokens=2)
    evictable_before = eng.prefix_cache.evictable()
    assert evictable_before > 0
    # a big request forces eviction rather than failing admission
    big = [[7] * (PS * 6)]
    out = eng.generate(big, max_new_tokens=4)
    assert len(out[0]) == 4


def test_evictable_counts_only_registry_only_pages():
    """Pages still referenced by a live sequence don't free on eviction, so
    they must not count as reclaimable (else admission admits work that
    allocate_mixed cannot satisfy)."""
    from flash_attention_dlrs_tpu.runtime.kv_cache import PageAllocator
    from flash_attention_dlrs_tpu.runtime.prefix_cache import PrefixCache

    alloc = PageAllocator(num_pages=8, page_size=PS)
    cache = PrefixCache(alloc, PS)
    prompt = list(range(3 * PS))  # 3 full pages
    alloc.allocate("live", len(prompt))
    table = alloc.page_tables["live"]
    cache.register(prompt, table)  # refcount 2: live seq + registry

    # nothing reclaimable while the sequence is alive
    assert cache.evictable() == 0
    assert not cache.can_allocate(6 * PS)  # 6 > 5 free
    # evict() must report 0 pages freed and keep the entries for later hits
    freed_before = len(alloc.free_pages)
    assert cache.evict(3) == 0
    assert len(alloc.free_pages) == freed_before
    assert len(cache._entries) == 3

    alloc.free("live")  # registry-only now (refcount 1)
    assert cache.evictable() == 3
    assert cache.can_allocate(8 * PS)
    assert cache.evict(2) == 2  # registry ref was the last one -> pages free
    assert len(alloc.free_pages) == freed_before + 2


def test_scheduler_requeues_on_memory_error():
    """A MemoryError out of admission defers the request, not crashes."""
    from flash_attention_dlrs_tpu.runtime.scheduler import (
        ContinuousBatchingScheduler, Request,
    )

    fails = {"n": 1}

    def on_admit(req, slot):
        if fails["n"]:
            fails["n"] -= 1
            raise MemoryError("out of pages")
        req.output_tokens.append(0)

    sched = ContinuousBatchingScheduler(
        num_slots=1, can_allocate=lambda t: True,
        on_admit=on_admit, on_retire=lambda r, s: None,
    )
    req = Request(request_id=1, prompt_tokens=[1, 2], max_new_tokens=1)
    sched.submit(req)
    assert sched.schedule() == []  # first try fails, requeued
    assert list(sched.queue) == [req] and sched.slots == [None]
    admitted = sched.schedule()  # second try succeeds
    assert [r for r, _ in admitted] == [req]


def test_prefix_cache_outputs_stable_across_many_admissions():
    cfg = ModelConfig(**CFG)
    params = init_params(jax.random.PRNGKey(0), cfg)
    shared = list(range(1, 1 + 2 * PS))
    eng = _engine(params, cfg, enable_prefix_cache=True)
    a = eng.generate([shared + [5]], max_new_tokens=4)
    b = eng.generate([shared + [5]], max_new_tokens=4)  # full prefix hit
    c = eng.generate([shared + [5]], max_new_tokens=4)
    assert a == b == c
