"""End-to-end serving benchmark: DecodeEngine tokens/s, host overhead included.

Unlike bench_decode.py (attention-kernel-only), this drives the FULL loop —
prefill admission, per-step native-allocator bookkeeping, the fused decode
step over every layer, batched sampling, scheduler accounting — so the
number is what a serving deployment actually gets.  Reports tokens/s and
ms/step per (batch, kv_dtype) and the host-side share (wall − device).

Usage: python scripts/bench_serving.py [--layers 16 --d-model 2048 ...]
"""

import argparse
import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/fa_tpu_jit_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--layers", type=int, default=16)
    ap.add_argument("--d-model", type=int, default=2048)
    ap.add_argument("--q-heads", type=int, default=16)
    ap.add_argument("--kv-heads", type=int, default=8)
    ap.add_argument("--head-dim", type=int, default=128)
    ap.add_argument("--d-ff", type=int, default=5504)
    ap.add_argument("--vocab", type=int, default=32000)
    ap.add_argument("--ctx", type=int, default=2048, help="prompt length")
    ap.add_argument("--new-tokens", type=int, default=64)
    ap.add_argument("--batches", type=int, nargs="+", default=[8, 32])
    ap.add_argument("--kv", nargs="+", default=["bf16", "int8"],
                    choices=["bf16", "int8", "int4"])
    ap.add_argument("--window", type=int, default=0,
                    help=">0: sliding-window model served from the exact "
                         "rolling KV ring (O(window) memory)")
    ap.add_argument("--page-size", type=int, default=128)
    ap.add_argument("--burst", type=int, default=0,
                    help=">1: run the decode loop in device-side bursts of "
                         "this many steps per dispatch (engine.step_burst) "
                         "— amortizes the per-token host floor; 0/1 = "
                         "per-token step()")
    ap.add_argument("--out", default="bench_out/serving.json")
    args = ap.parse_args()

    from flash_attention_dlrs_tpu.models import ModelConfig, init_params
    from flash_attention_dlrs_tpu.runtime import DecodeEngine

    cfg = ModelConfig(
        vocab_size=args.vocab, d_model=args.d_model, n_layers=args.layers,
        n_q_heads=args.q_heads, n_kv_heads=args.kv_heads,
        head_dim=args.head_dim, d_ff=args.d_ff, dtype=jnp.bfloat16,
        remat=False, window=args.window,
    )
    params = init_params(jax.random.PRNGKey(0), cfg)
    n_params = sum(p.size for p in jax.tree.leaves(params))
    print(f"model: {n_params/1e9:.2f}B params, {args.layers}L d{args.d_model} "
          f"{args.q_heads}q/{args.kv_heads}kv", flush=True)

    pages_per_seq = (args.ctx + args.new_tokens + args.page_size - 1) \
        // args.page_size
    rng = np.random.default_rng(0)
    results = []
    for kv in args.kv:
        kv_dtype = {"bf16": jnp.bfloat16, "int8": jnp.int8, "int4": "int4"}[kv]
        quant = kv != "bf16"
        for b in args.batches:
            eng = DecodeEngine(
                params, cfg, num_pages=b * pages_per_seq + 1,
                page_size=args.page_size, num_slots=b,
                pages_per_seq=pages_per_seq, kv_dtype=kv_dtype,
                quantized_kv=quant,
            )
            prompts = [list(rng.integers(0, args.vocab, args.ctx))
                       for _ in range(b)]
            # warm: admit everything + run a few steps (compiles prefill +
            # decode programs)
            for p in prompts:
                from flash_attention_dlrs_tpu.runtime.scheduler import Request
                eng.scheduler.submit(Request(
                    request_id=f"warm{id(p)}", prompt_tokens=p,
                    max_new_tokens=args.new_tokens))
            eng.scheduler.schedule()
            burst = max(1, args.burst)
            for _ in range(3):
                # warm both programs (burst compiles its own fused loop)
                eng.step_burst(burst) if burst > 1 else eng.step()
            # timed region: the remaining decode steps
            jax.block_until_ready(eng.pools.k[0])
            steps = 0
            tok0 = eng.scheduler.stats.tokens_generated
            budget = args.new_tokens - 3 * burst
            t0 = time.perf_counter()
            while eng.scheduler.has_work and steps * burst < budget:
                eng.step_burst(burst) if burst > 1 else eng.step()
                eng.scheduler.schedule()
                steps += 1
            jax.block_until_ready(eng.pools.k[0])
            dt = time.perf_counter() - t0
            toks = eng.scheduler.stats.tokens_generated - tok0
            row = {
                "kv": kv, "batch": b, "ctx": args.ctx,
                "burst": burst,
                "rolling": bool(getattr(eng, "rolling", False)),
                "pages_per_seq": eng.pages_per_seq,
                "tokens_per_s": toks / dt,
                "ms_per_step": dt * b / max(1, toks) * 1e3,
            }
            results.append(row)
            # Device decode rate reference: the same engine's fully-fused
            # loop slope (two lengths differenced — drops the per-call
            # admission/prefill constant).  e2e/device is the serving
            # host-overhead ratio the north star tracks.
            if not getattr(eng, "rolling", False):
                lo, hi = 8, 40
                for mx in (lo, hi):
                    eng.generate_fused(prompts, max_new_tokens=mx)
                best = None
                for _ in range(3):
                    eng.generate_fused(prompts, max_new_tokens=lo)
                    t_lo = eng.last_fused_seconds
                    eng.generate_fused(prompts, max_new_tokens=hi)
                    t_hi = eng.last_fused_seconds
                    sl = (t_hi - t_lo) / (hi - lo)
                    best = sl if best is None else min(best, sl)
                row["device_tokens_per_s"] = b / best
                row["e2e_over_device"] = (
                    row["tokens_per_s"] / row["device_tokens_per_s"])
            print(f"kv={kv:5s} B={b:3d} burst={burst}: "
                  f"{row['tokens_per_s']:9.0f} tok/s  "
                  f"{row['ms_per_step']:7.2f} ms/step  "
                  f"dev_ratio={row.get('e2e_over_device', float('nan')):.2f}",
                  flush=True)
            # free engine state before the next config
            del eng

    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump({"config": vars(args), "results": results}, f, indent=1)
    print("wrote", args.out)


if __name__ == "__main__":
    main()
