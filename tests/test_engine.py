"""End-to-end generation: DecodeEngine (paged cache + continuous batching)
vs dense re-forward oracle."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flash_attention_dlrs_tpu.models import ModelConfig, forward, init_params
from flash_attention_dlrs_tpu.runtime.engine import DecodeEngine

CFG = ModelConfig.tiny(dtype=jnp.float32, remat=False)


def _dense_greedy(params, prompt, steps):
    """Oracle: recompute the full causal forward per generated token."""
    toks = list(prompt)
    out = []
    for _ in range(steps):
        logits = forward(params, jnp.asarray([toks], jnp.int32), CFG)
        nxt = int(jnp.argmax(logits[0, len(toks) - 1]))
        out.append(nxt)
        toks.append(nxt)
    return out


@pytest.fixture(scope="module")
def params():
    return init_params(jax.random.PRNGKey(0), CFG)


def test_engine_matches_dense_greedy(params):
    prompts = [[5, 7, 11, 13, 17], [3, 1, 4, 1, 5, 9, 2, 6]]
    steps = 6
    eng = DecodeEngine(
        params, CFG, num_pages=16, page_size=128, num_slots=2,
        pages_per_seq=4, kv_dtype=jnp.float32,
    )
    got = eng.generate(prompts, max_new_tokens=steps)
    for prompt, toks in zip(prompts, got):
        assert toks == _dense_greedy(params, prompt, steps), (prompt, toks)


def test_engine_continuous_batching_more_requests_than_slots(params):
    prompts = [[i + 1, i + 2, i + 3] for i in range(5)]
    eng = DecodeEngine(
        params, CFG, num_pages=32, page_size=128, num_slots=2,
        pages_per_seq=4, kv_dtype=jnp.float32,
    )
    got = eng.generate(prompts, max_new_tokens=3)
    assert all(len(t) == 3 for t in got)
    assert eng.scheduler.stats.admitted == 5
    assert eng.scheduler.stats.retired == 5
    # pages fully reclaimed (only the reserved null page remains)
    assert len(eng.allocator.free_pages) == eng.pools.k[0].shape[1] - 1


def test_engine_int8_kv_close_to_fp(params):
    prompts = [[5, 7, 11, 13, 17]]
    eng_fp = DecodeEngine(
        params, CFG, num_pages=16, num_slots=1, pages_per_seq=4,
        kv_dtype=jnp.float32,
    )
    eng_q = DecodeEngine(
        params, CFG, num_pages=16, num_slots=1, pages_per_seq=4,
        kv_dtype=jnp.int8, quantized_kv=True,
    )
    t_fp = eng_fp.generate(prompts, max_new_tokens=4)[0]
    t_q = eng_q.generate(prompts, max_new_tokens=4)[0]
    # int8 KV should track the fp path closely on a tiny model; allow the
    # tail to diverge once any single argmax flips.
    assert t_fp[0] == t_q[0]


def test_engine_eos_stops_early(params):
    # Use the fp engine's own first token as the EOS to guarantee a hit.
    prompts = [[5, 7, 11]]
    probe = DecodeEngine(
        params, CFG, num_pages=16, num_slots=1, pages_per_seq=4,
        kv_dtype=jnp.float32,
    )
    first = probe.generate(prompts, max_new_tokens=1)[0][0]
    eng = DecodeEngine(
        params, CFG, num_pages=16, num_slots=1, pages_per_seq=4,
        kv_dtype=jnp.float32, eos_token=first,
    )
    toks = eng.generate(prompts, max_new_tokens=10)[0]
    assert toks[0] == first and len(toks) == 1


def test_chunked_prefill_matches_dense_prefill():
    """Engine with chunked admission generates the same greedy stream."""
    from flash_attention_dlrs_tpu.models import ModelConfig, init_params
    from flash_attention_dlrs_tpu.runtime.engine import DecodeEngine

    cfg = ModelConfig(vocab_size=128, d_model=64, n_layers=2, n_q_heads=4,
                      n_kv_heads=2, head_dim=32, d_ff=128, dtype=jnp.float32)
    params = init_params(jax.random.PRNGKey(0), cfg)
    prompts = [list(range(1, 40)), [7, 6, 5], list(range(60, 100))]

    def run(**kw):
        eng = DecodeEngine(params, cfg, num_pages=64, page_size=32,
                           pages_per_seq=8, num_slots=3, **kw)
        return eng.generate(prompts, max_new_tokens=6)

    dense = run()
    # chunk smaller than, equal to, and larger than prompt pieces
    for chunk in (16, 64):
        chunked = run(prefill_chunk=chunk)
        assert chunked == dense, (chunk, chunked, dense)


def test_fp8_kv_gated_to_int8_on_slow_parts(params, monkeypatch):
    """On parts without an fp8 datapath (v5e), requesting fp8 KV warns and
    falls back to int8 — no silent 10x-slower decode path."""
    import flash_attention_dlrs_tpu.geometry as geo
    from flash_attention_dlrs_tpu.ops.decode import quantize_kv_pages

    monkeypatch.setattr(geo, "supports_fast_fp8", lambda *a: False)
    with pytest.warns(UserWarning, match="falling\\s*back to int8"):
        eng = DecodeEngine(
            params, CFG, num_pages=16, num_slots=1, pages_per_seq=4,
            quantized_kv=True, kv_dtype=jnp.float8_e4m3fn,
        )
    assert jnp.dtype(eng.kv_dtype) == jnp.dtype(jnp.int8)
    assert eng.pools.k[0].dtype == jnp.int8
    out = eng.generate([[1, 2, 3]], max_new_tokens=3)
    assert len(out[0]) == 3

    # the low-level op warns but proceeds (callers may target v6 exports)
    with pytest.warns(UserWarning, match="bit surgery"):
        qt = quantize_kv_pages(
            jnp.ones((1, 2, 8, 128), jnp.float32), jnp.float8_e5m2
        )
    assert qt.values.dtype == jnp.float8_e5m2


def test_fp8_kv_allowed_on_fast_parts(params, monkeypatch):
    import warnings as _w

    import flash_attention_dlrs_tpu.geometry as geo

    monkeypatch.setattr(geo, "supports_fast_fp8", lambda *a: True)
    with _w.catch_warnings():
        _w.simplefilter("error")
        eng = DecodeEngine(
            params, CFG, num_pages=16, num_slots=1, pages_per_seq=4,
            quantized_kv=True, kv_dtype=jnp.float8_e4m3fn,
        )
    assert jnp.dtype(eng.kv_dtype) == jnp.dtype(jnp.float8_e4m3fn)


def test_generate_stream_matches_generate(params):
    from flash_attention_dlrs_tpu.runtime.engine import StreamEvent

    prompts = [[5, 7, 11], [2, 4, 6, 8, 10]]
    mk = lambda: DecodeEngine(
        params, CFG, num_pages=16, page_size=128, num_slots=2,
        pages_per_seq=4, kv_dtype=jnp.float32,
    )
    want = mk().generate(prompts, max_new_tokens=4)

    events = list(mk().generate_stream(prompts, max_new_tokens=4))
    assert all(isinstance(e, StreamEvent) for e in events)
    got = {f"req{i}": [] for i in range(len(prompts))}
    for e in events:
        if e.token is not None:
            got[e.request_id].append(e.token)
    assert [got[f"req{i}"] for i in range(len(prompts))] == want

    # exactly one done event per request, after its last token
    done_idx = {e.request_id: i for i, e in enumerate(events) if e.done}
    assert len(done_idx) == len(prompts)
    assert sum(e.done for e in events) == len(prompts)
    for i, e in enumerate(events):
        if e.token is not None:
            assert i < done_idx[e.request_id]

    # both requests stream concurrently: their token events interleave
    ids = [e.request_id for e in events if e.token is not None]
    assert len({*ids[:4]}) == 2, ids


def test_engine_int4_kv_generates_and_tracks_fp(params):
    prompts = [[5, 7, 11, 13, 17]]
    eng_fp = DecodeEngine(
        params, CFG, num_pages=16, num_slots=1, pages_per_seq=4,
        kv_dtype=jnp.float32,
    )
    eng_q = DecodeEngine(
        params, CFG, num_pages=16, num_slots=1, pages_per_seq=4,
        kv_dtype="int4", quantized_kv=True,
    )
    assert eng_q.pools.int4
    # packed payload: half the page rows, full-resolution scales
    assert eng_q.pools.k[0].shape[-2] * 2 == eng_q.pools.k_scales[0].shape[-2]
    t_fp = eng_fp.generate(prompts, max_new_tokens=4)[0]
    t_q = eng_q.generate(prompts, max_new_tokens=4)[0]
    # int4 is coarser than int8; on the tiny model the first greedy token
    # should still match the fp path before divergence is tolerated.
    assert t_fp[0] == t_q[0]


def test_engine_int4_requires_quantized_flag(params):
    with pytest.raises(ValueError, match="quantized_kv"):
        DecodeEngine(params, CFG, num_pages=16, num_slots=1,
                     pages_per_seq=4, kv_dtype="int4")


def test_generate_logprobs_match_dense(params):
    """return_logprobs: each reported value equals the dense forward's
    log-softmax at the generated token (greedy path, fp32)."""
    prompt = [5, 7, 11, 13, 17]
    eng = DecodeEngine(
        params, CFG, num_pages=16, page_size=128, num_slots=1,
        pages_per_seq=4, kv_dtype=jnp.float32,
    )
    toks, lps = eng.generate([prompt], max_new_tokens=4,
                             return_logprobs=True)
    toks, lps = toks[0], lps[0]
    assert len(lps) == len(toks) == 4
    ctx = list(prompt)
    for tok, lp in zip(toks, lps):
        logits = forward(params, jnp.asarray([ctx], jnp.int32), CFG)
        want = float(jax.nn.log_softmax(
            logits[0, len(ctx) - 1].astype(jnp.float32))[tok])
        assert lp == pytest.approx(want, abs=2e-4)
        assert lp <= 0.0
        ctx.append(tok)
    # stream events carry the same values when opted in, None otherwise
    evs = [ev for ev in eng.generate_stream([prompt], max_new_tokens=4,
                                            logprobs=True)
           if ev.token is not None]
    assert [ev.token for ev in evs] == toks
    np.testing.assert_allclose([ev.logprob for ev in evs], lps, atol=1e-6)
    evs0 = [ev for ev in eng.generate_stream([prompt], max_new_tokens=2)
            if ev.token is not None]
    assert all(ev.logprob is None for ev in evs0)


def test_rolling_window_serving_matches_dense():
    """Mistral-style uniformly-sliding model served with a rolling KV ring
    (window < max context): tokens match the dense windowed forward across
    the ring-wrap boundary, with only window/page_size pages per sequence."""
    import dataclasses

    w = 128
    cfg = dataclasses.replace(CFG, window=w)
    params = init_params(jax.random.PRNGKey(4), cfg)
    eng = DecodeEngine(
        params, cfg, num_pages=8, page_size=128, num_slots=1,
        pages_per_seq=4, kv_dtype=jnp.float32,
    )
    assert eng.rolling and eng.pages_per_seq == 1
    prompt = list(np.random.default_rng(5).integers(0, 256, 120))
    n_new = 20  # crosses length 128 at the 8th generated token
    got = eng.generate([prompt], max_new_tokens=n_new)[0]
    ctx = list(prompt)
    want = []
    for _ in range(n_new):
        logits = forward(params, jnp.asarray([ctx], jnp.int32), cfg)
        nxt = int(jnp.argmax(logits[0, len(ctx) - 1]))
        want.append(nxt)
        ctx.append(nxt)
    assert got == want
    # ring accounting: 1 page per sequence + the null page, fully reclaimed
    assert len(eng.allocator.free_pages) == 8 - 1


def test_rolling_window_guards():
    import dataclasses

    params = init_params(jax.random.PRNGKey(0), CFG)
    # window >= max context: plain exact serving, no ring
    cfg = dataclasses.replace(CFG, window=512)
    eng = DecodeEngine(params, cfg, num_pages=8, page_size=128,
                       num_slots=1, pages_per_seq=4, kv_dtype=jnp.float32)
    assert not eng.rolling
    # misaligned window
    with pytest.raises(ValueError, match="divisible"):
        DecodeEngine(params, dataclasses.replace(CFG, window=100),
                     num_pages=8, page_size=128, num_slots=1,
                     pages_per_seq=4, kv_dtype=jnp.float32)
    # Gemma-2 alternating pattern cannot share one ring
    with pytest.raises(NotImplementedError, match="window_pattern"):
        DecodeEngine(
            params,
            dataclasses.replace(CFG, window=128, window_pattern="even"),
            num_pages=8, page_size=128, num_slots=1, pages_per_seq=4,
            kv_dtype=jnp.float32)


def test_rolling_window_long_prompt_matches_dense():
    """Prompt LONGER than the ring: only its last-window KV stays resident
    (the last-window slice rolled by t % window makes the ring write
    page-aligned); tokens still match the dense windowed forward."""
    import dataclasses

    w = 128
    cfg = dataclasses.replace(CFG, window=w)
    params = init_params(jax.random.PRNGKey(6), cfg)
    eng = DecodeEngine(params, cfg, num_pages=8, page_size=128,
                       num_slots=1, pages_per_seq=4, kv_dtype=jnp.float32)
    assert eng.rolling
    prompt = list(np.random.default_rng(7).integers(0, 256, 150))  # > w
    n_new = 6
    got = eng.generate([prompt], max_new_tokens=n_new)[0]
    ctx = list(prompt)
    want = []
    for _ in range(n_new):
        logits = forward(params, jnp.asarray([ctx], jnp.int32), cfg)
        nxt = int(jnp.argmax(logits[0, len(ctx) - 1]))
        want.append(nxt)
        ctx.append(nxt)
    assert got == want


def test_engine_stats_snapshot(params):
    eng = DecodeEngine(
        params, CFG, num_pages=16, page_size=128, num_slots=2,
        pages_per_seq=4, kv_dtype=jnp.float32,
    )
    s0 = eng.stats()
    assert s0["pages_free"] == 15 and s0["active_slots"] == 0  # null page held
    eng.generate([[1, 2, 3], [4, 5, 6, 7]], max_new_tokens=2)
    s1 = eng.stats()
    assert s1["admitted"] == 2 and s1["retired"] == 2
    assert s1["tokens_generated"] >= 2
    assert s1["pages_free"] == 15  # fully reclaimed
    assert 0.0 < s1["page_utilization"] < 1.0 or s1["pages_free"] == 15


def test_streaming_sinks_exact_until_eviction(params):
    """StreamingLLM serving (sinks + recent ring) on a FULL-attention
    model: outputs are EXACT while len <= sinks+window (nothing evicted
    yet), stay finite and bounded-memory beyond it."""
    eng = DecodeEngine(
        params, CFG, num_pages=8, page_size=128, num_slots=1,
        pages_per_seq=4, kv_dtype=jnp.float32,
        streaming_window=128, attention_sinks=128,
    )
    assert eng.streaming and eng.pages_per_seq == 2
    prompt = list(np.random.default_rng(8).integers(0, 256, 200))
    n_new = 20  # 200 + 20 < 256 = sinks + window: exact regime
    got = eng.generate([prompt], max_new_tokens=n_new)[0]
    ctx = list(prompt)
    want = []
    for _ in range(n_new):
        logits = forward(params, jnp.asarray([ctx], jnp.int32), CFG)
        nxt = int(jnp.argmax(logits[0, len(ctx) - 1]))
        want.append(nxt)
        ctx.append(nxt)
    assert got == want
    s = eng.stats()
    assert s["attention_sinks"] == 128 and s["streaming_window"] == 128
    assert s["pages_free"] == 7  # reclaimed: 2 resident pages per seq

    # beyond the resident set: approximation regime — finite tokens,
    # memory still bounded at 2 pages/sequence
    long_prompt = list(np.random.default_rng(9).integers(0, 256, 300))
    out = eng.generate([long_prompt], max_new_tokens=8)[0]
    assert len(out) == 8 and all(0 <= t < 256 for t in out)
    assert len(eng.allocator.free_pages) == 7


def test_streaming_sinks_guards(params):
    import dataclasses

    with pytest.raises(ValueError, match="aligned"):
        DecodeEngine(params, CFG, num_pages=8, page_size=128, num_slots=1,
                     pages_per_seq=4, kv_dtype=jnp.float32,
                     streaming_window=100)
    with pytest.raises(ValueError, match="requires streaming_window"):
        DecodeEngine(params, CFG, num_pages=8, page_size=128, num_slots=1,
                     pages_per_seq=4, kv_dtype=jnp.float32,
                     attention_sinks=128)
    cfg_w = dataclasses.replace(CFG, window=128)
    with pytest.raises(ValueError, match="full-attention"):
        DecodeEngine(params, cfg_w, num_pages=8, page_size=128, num_slots=1,
                     pages_per_seq=4, kv_dtype=jnp.float32,
                     streaming_window=128)


def test_rolling_window_with_int8_kv():
    """Rolling ring + quantized KV: the per-token int8 scatter lands at the
    ring slots; tokens track the fp32 rolling engine closely."""
    import dataclasses

    cfg = dataclasses.replace(CFG, window=128)
    params = init_params(jax.random.PRNGKey(4), cfg)
    prompt = list(np.random.default_rng(5).integers(0, 256, 120))
    kw = dict(num_pages=8, page_size=128, num_slots=1, pages_per_seq=4)
    fp = DecodeEngine(params, cfg, kv_dtype=jnp.float32, **kw)
    q8 = DecodeEngine(params, cfg, kv_dtype=jnp.int8, quantized_kv=True,
                      **kw)
    assert fp.rolling and q8.rolling
    t_fp = fp.generate([prompt], max_new_tokens=12)[0]
    t_q8 = q8.generate([prompt], max_new_tokens=12)[0]
    assert t_fp[:4] == t_q8[:4]  # tail may diverge once an argmax flips


def test_engine_tensor_parallel_matches_single_device(params):
    """TP serving: engine on a model-axis mesh (params head-sharded, KV
    pools kv-head-sharded via the paged-decode partitioning rule) must
    reproduce single-device greedy outputs exactly."""
    from jax.sharding import Mesh

    if len(jax.devices()) < 2:
        pytest.skip("needs 2 devices")
    mesh = Mesh(np.array(jax.devices()[:2]), ("model",))
    prompts = [[5, 7, 11, 13, 17], [3, 1, 4, 1, 5, 9, 2, 6]]
    eng_tp = DecodeEngine(
        params, CFG, num_pages=16, page_size=128, num_slots=2,
        pages_per_seq=4, kv_dtype=jnp.float32, mesh=mesh,
    )
    got = eng_tp.generate(prompts, max_new_tokens=6)
    # pools stayed sharded through the donated step
    assert "model" in str(eng_tp.pools.k[0].sharding)
    eng = DecodeEngine(
        params, CFG, num_pages=16, page_size=128, num_slots=2,
        pages_per_seq=4, kv_dtype=jnp.float32,
    )
    assert got == eng.generate(prompts, max_new_tokens=6)


def test_engine_tp_rejects_indivisible_heads(params):
    from jax.sharding import Mesh

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    mesh = Mesh(np.array(jax.devices()[:8]), ("model",))  # 8 > n_kv_heads=2
    with pytest.raises(ValueError, match="model axis"):
        DecodeEngine(params, CFG, num_pages=16, page_size=128,
                     kv_dtype=jnp.float32, mesh=mesh)


def test_step_burst_matches_per_token_step(params):
    """generate(burst=k) must be token-for-token identical to the
    per-token step() loop, across continuous-batching admissions (more
    requests than slots), ragged budgets, and EOS stops mid-burst."""
    prompts = [[i + 1, i + 2, i + 3, i + 4] for i in range(5)]
    kw = dict(num_pages=64, page_size=128, num_slots=2, pages_per_seq=4,
              kv_dtype=jnp.float32)
    want = DecodeEngine(params, CFG, **kw).generate(
        prompts, max_new_tokens=9)
    got = DecodeEngine(params, CFG, **kw).generate(
        prompts, max_new_tokens=9, burst=4)
    assert got == want
    # budget not a multiple of the burst length
    want = DecodeEngine(params, CFG, **kw).generate(
        prompts[:2], max_new_tokens=7)
    got = DecodeEngine(params, CFG, **kw).generate(
        prompts[:2], max_new_tokens=7, burst=16)
    assert got == want


def test_step_burst_eos_stops_early(params):
    prompts = [[5, 7, 11, 13, 17]]
    base = DecodeEngine(
        params, CFG, num_pages=16, page_size=128, num_slots=1,
        pages_per_seq=4, kv_dtype=jnp.float32,
    )
    ref = base.generate(prompts, max_new_tokens=10)[0]
    eos = ref[3]  # forces an early stop mid-burst
    kw = dict(num_pages=16, page_size=128, num_slots=1, pages_per_seq=4,
              kv_dtype=jnp.float32, eos_token=eos)
    want = DecodeEngine(params, CFG, **kw).generate(
        prompts, max_new_tokens=10)[0]
    got = DecodeEngine(params, CFG, **kw).generate(
        prompts, max_new_tokens=10, burst=8)[0]
    assert got == want
    assert got[-1] == eos and len(got) < len(ref)


def test_speculative_serving_matches_plain(params):
    """attach_draft + burst serving: greedy output must be token-for-token
    identical to plain serving REGARDLESS of draft quality (rejection
    sampling guarantees the target distribution; greedy is exact), across
    continuous-batching admissions and ragged budgets."""
    from flash_attention_dlrs_tpu.models import init_params as init_p

    prompts = [[i + 1, i + 2, i + 3, i + 4] for i in range(5)]
    kw = dict(num_pages=64, page_size=128, num_slots=2, pages_per_seq=4,
              kv_dtype=jnp.float32)
    want = DecodeEngine(params, CFG, **kw).generate(prompts, max_new_tokens=9)

    # a BAD draft (different random init) — still must match exactly
    d_params = init_p(jax.random.PRNGKey(1), CFG)
    tgt = DecodeEngine(params, CFG, **kw)
    draft = DecodeEngine(d_params, CFG, **kw)
    tgt.attach_draft(draft, gamma=3)
    got = tgt.generate(prompts, max_new_tokens=9, burst=4)
    assert got == want
    assert tgt.spec_stats["rounds"] > 0
    # pages reclaimed on BOTH engines after retirement
    assert len(tgt.allocator.free_pages) == tgt.pools.k[0].shape[1] - 1
    assert len(draft.allocator.free_pages) == draft.pools.k[0].shape[1] - 1

    # a PERFECT draft (same params): high acceptance, same output
    tgt2 = DecodeEngine(params, CFG, **kw)
    draft2 = DecodeEngine(params, CFG, **kw)
    tgt2.attach_draft(draft2, gamma=3)
    got2 = tgt2.generate(prompts, max_new_tokens=9, burst=4)
    assert got2 == want
    s = tgt2.spec_stats
    assert s["accepted"] / max(s["proposed"], 1) > 0.9  # near-total acceptance


def test_speculative_serving_eos(params):
    prompts = [[5, 7, 11, 13, 17]]
    base = DecodeEngine(
        params, CFG, num_pages=16, page_size=128, num_slots=1,
        pages_per_seq=4, kv_dtype=jnp.float32,
    )
    ref = base.generate(prompts, max_new_tokens=10)[0]
    eos = ref[3]
    kw = dict(num_pages=32, page_size=128, num_slots=1, pages_per_seq=4,
              kv_dtype=jnp.float32, eos_token=eos)
    want = DecodeEngine(params, CFG, **kw).generate(
        prompts, max_new_tokens=10)[0]
    tgt = DecodeEngine(params, CFG, **kw)
    draft = DecodeEngine(params, CFG, **kw)
    tgt.attach_draft(draft, gamma=3)
    got = tgt.generate(prompts, max_new_tokens=10, burst=8)[0]
    assert got == want
    assert got[-1] == eos


def test_generate_fused_ragged_prompt_lengths(params):
    """_admit_batch pads ragged prompts to one prefill call and null-pads
    per-slot page rows — output must match the per-request admission path
    exactly."""
    prompts = [[5, 7, 11], [3, 1, 4, 1, 5, 9, 2, 6], [2, 7, 1, 8, 2, 8]]
    kw = dict(num_pages=32, page_size=128, num_slots=3, pages_per_seq=4,
              kv_dtype=jnp.float32)
    want = DecodeEngine(params, CFG, **kw).generate(prompts, max_new_tokens=6)
    got = DecodeEngine(params, CFG, **kw).generate_fused(
        prompts, max_new_tokens=6)
    assert got == want
