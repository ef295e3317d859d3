"""Decode benchmark: paged-attention step latency and tokens/s at 8K context
(the BASELINE.md decode metric: tokens/s/chip with INT8 KV @ 8K ctx).

Measures the attention-only decode step for a 7B-class head configuration
(Hq=32, Hkv=8, d=128) across batch sizes and KV formats (bf16 / int8 / fp8),
with the dispatch-amortized slope timing from bench/suite.py.
"""

import argparse
import json
import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/fa_tpu_jit_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ctx", type=int, default=8192)
    ap.add_argument("--batches", type=int, nargs="+", default=[8, 32])
    # Two page sizes by default: 128 (the engine default) and 256 — decode
    # is per-page-DMA-issue-bound once quantized KV halves the bytes
    # (measured v5e 8K B=8: int8 234 µs at ps=128 vs 197 µs at ps=256),
    # so larger pages are the recommended serving config at 8K+ contexts.
    ap.add_argument("--page-sizes", type=int, nargs="+", default=[128, 256])
    ap.add_argument("--pages-per-block", type=int, default=None)
    args = ap.parse_args()

    from flash_attention_dlrs_tpu.bench.suite import time_fn
    from flash_attention_dlrs_tpu.ops.decode import (
        paged_decode_attention,
        quantize_kv_pages,
    )

    hq, hkv, d = 32, 8, 128
    results = []
    for ps in args.page_sizes:
        run_one(args, ps, hq, hkv, d, time_fn, paged_decode_attention,
                quantize_kv_pages, results)
    with open("bench_out/decode_8k.json", "w") as f:
        json.dump(results, f, indent=2)


def run_one(args, ps, hq, hkv, d, time_fn, paged_decode_attention,
            quantize_kv_pages, results):
    pages_per_seq = args.ctx // ps
    for b in args.batches:
        num_pages = b * pages_per_seq
        keys = jax.random.split(jax.random.PRNGKey(0), 4)
        kp = jax.random.normal(keys[1], (hkv, num_pages, ps, d), jnp.bfloat16)
        vp = jax.random.normal(keys[2], (hkv, num_pages, ps, d), jnp.bfloat16)
        pidx = jnp.arange(num_pages, dtype=jnp.int32).reshape(b, pages_per_seq)
        lengths = jnp.full((b,), args.ctx, jnp.int32)
        q = jax.random.normal(keys[0], (b, hq, d), jnp.bfloat16)

        variants = {"bf16": (kp, vp)}
        variants["int8"] = (quantize_kv_pages(kp, jnp.int8), quantize_kv_pages(vp, jnp.int8))
        variants["int4"] = (quantize_kv_pages(kp, "int4"), quantize_kv_pages(vp, "int4"))
        variants["fp8"] = (
            quantize_kv_pages(kp, jnp.float8_e4m3fn),
            quantize_kv_pages(vp, jnp.float8_e4m3fn),
        )
        for name, (kq, vq) in variants.items():
            # KV pages must flow in as ARGUMENTS, not closure captures: a
            # captured array is baked into the jaxpr as a constant and
            # shipped with every compile request (hundreds of MB at 8K ctx).
            quantized = name != "bf16"
            if quantized:
                cls = type(kq)  # QuantizedTensor or Int4QuantizedTensor

                def step(q_, kv_, vv_, ks_, vs_, cls=cls):
                    return paged_decode_attention(
                        q_, cls(kv_, ks_), cls(vv_, vs_),
                        lengths, pidx, pages_per_block=args.pages_per_block,
                    )
                step_args = (q, kq.values, vq.values, kq.scales, vq.scales)
            else:
                def step(q_, kv_, vv_):
                    return paged_decode_attention(
                        q_, kv_, vv_, lengths, pidx,
                        pages_per_block=args.pages_per_block,
                    )
                step_args = (q, kq, vq)
            try:
                sec = time_fn(step, *step_args)
            except Exception as e:
                print(f"[decode] B={b} {name}: FAIL {type(e).__name__}")
                continue
            toks = b / sec
            # HBM bytes touched per step (the bound for decode): K+V pages
            payload = {"bf16": 2, "int8": 1, "fp8": 1, "int4": 0.5}[name]
            gb = 2 * b * args.ctx * d * hkv * payload / 1e9
            bw = gb / sec
            results.append(
                {"batch": b, "kv": name, "page_size": ps,
                 "us_per_step": sec * 1e6,
                 "tokens_per_s": toks, "hbm_gbps": bw}
            )
            print(
                f"[decode] ps={ps} B={b:3d} {name:5s}: {sec*1e6:8.1f} "
                f"us/step {toks:10.1f} tok/s  {bw:6.0f} GB/s KV read",
                flush=True,
            )


if __name__ == "__main__":
    os.makedirs("bench_out", exist_ok=True)
    main()
