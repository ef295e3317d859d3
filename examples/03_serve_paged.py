"""Serve a model with the continuous-batching engine: paged KV cache,
greedy + sampled generation, int8 KV quantization, speculative decoding.

Runs anywhere; weights are random (the point is the serving machinery).

    python examples/03_serve_paged.py
"""

import jax
import jax.numpy as jnp

from flash_attention_dlrs_tpu.models import ModelConfig, init_params
from flash_attention_dlrs_tpu.runtime.engine import DecodeEngine
from flash_attention_dlrs_tpu.runtime.sampling import SamplingParams


def main():
    cfg = ModelConfig.tiny(dtype=jnp.float32, remat=False)
    params = init_params(jax.random.PRNGKey(0), cfg)

    # 16 pages x 128 tokens of paged KV, 2 concurrent slots; more requests
    # than slots exercises continuous batching (admit as slots free up).
    eng = DecodeEngine(params, cfg, num_pages=16, page_size=128,
                       num_slots=2, pages_per_seq=4,
                       kv_dtype=jnp.float32)
    prompts = [[5, 7, 11], [2, 4, 6, 8], [1, 2, 3]]
    print("greedy:", eng.generate(prompts, max_new_tokens=5))

    print("sampled:", eng.generate(
        prompts[:1], max_new_tokens=5,
        sampling=SamplingParams(temperature=0.8, top_k=20, top_p=0.95,
                                seed=42)))

    # Streaming: tokens arrive per batched step, interleaved across the
    # concurrently-decoding requests (what a serving front-end consumes).
    for ev in eng.generate_stream(prompts[:2], max_new_tokens=4):
        print("  stream:", ev.request_id,
              "done" if ev.done else f"token={ev.token}")

    # INT8 KV cache: ~2x the resident context per HBM byte; measured
    # perplexity gap vs fp is 0.0000 on the trained eval model (eval_ppl.py).
    eng8 = DecodeEngine(params, cfg, num_pages=16, page_size=128,
                        num_slots=2, pages_per_seq=4, kv_dtype=jnp.int8)
    print("int8 KV:", eng8.generate(prompts[:2], max_new_tokens=5))

    # Speculative decoding: a draft engine proposes gamma-1 tokens per
    # round, the target verifies them in ONE paged multi-token step
    # (rejection sampling preserves the target distribution at
    # temperature > 0).  Draft = the same tiny model here; in production
    # use a smaller one.
    draft = DecodeEngine(params, cfg, num_pages=16, page_size=128,
                         num_slots=2, pages_per_seq=4,
                         kv_dtype=jnp.float32)
    out = eng.generate_speculative(
        prompts[:1], draft=draft, gamma=3, max_new_tokens=6)
    print("speculative:", out)

    # Bounded-memory serving: a sliding-window model gets an EXACT rolling
    # KV ring (window/page_size pages per sequence, whatever the context);
    # a full-attention model can opt into StreamingLLM sinks+ring — an
    # APPROXIMATION that is exact until a sequence outgrows sinks+window.
    import dataclasses

    cfg_w = dataclasses.replace(cfg, window=128)
    params_w = init_params(jax.random.PRNGKey(0), cfg_w)
    ring = DecodeEngine(params_w, cfg_w, num_pages=8, page_size=128,
                        num_slots=2, pages_per_seq=4,
                        kv_dtype=jnp.float32)
    print("rolling-window ring:", ring.rolling,
          "pages/seq:", ring.pages_per_seq,
          "->", ring.generate(prompts[:1], max_new_tokens=5))
    stream_eng = DecodeEngine(params, cfg, num_pages=8, page_size=128,
                              num_slots=2, pages_per_seq=4,
                              kv_dtype=jnp.float32,
                              streaming_window=128, attention_sinks=128)
    print("streaming sinks:", stream_eng.generate(
        prompts[:1], max_new_tokens=5), stream_eng.stats()["pages_free"],
        "pages free")


if __name__ == "__main__":
    main()
