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
    ap.add_argument("--speculative", action="store_true",
                    help="ALSO run each config with a draft engine attached "
                         "(engine.attach_draft): speculative rounds inside "
                         "the continuous-batching burst; prints spec/plain")
    ap.add_argument("--gamma", type=int, default=4)
    ap.add_argument("--target-ckpt", default=None,
                    help="scripts/train_lm.py run dir for the target model "
                         "(default: synthetic weights at the size flags)")
    ap.add_argument("--draft-ckpt", default=None,
                    help="trained draft for --speculative (required there)")
    ap.add_argument("--data", default=None,
                    help="corpus dir with val.bin: use real prompts "
                         "(recommended with --speculative; acceptance is "
                         "data-dependent)")
    ap.add_argument("--out", default="bench_out/serving.json")
    args = ap.parse_args()

    from flash_attention_dlrs_tpu.models import ModelConfig, init_params
    from flash_attention_dlrs_tpu.runtime import DecodeEngine

    if args.target_ckpt:
        from flash_attention_dlrs_tpu.models.convert import load_trained

        params, cfg = load_trained(args.target_ckpt)
        args.vocab = cfg.vocab_size
    else:
        cfg = ModelConfig(
            vocab_size=args.vocab, d_model=args.d_model,
            n_layers=args.layers, n_q_heads=args.q_heads,
            n_kv_heads=args.kv_heads, head_dim=args.head_dim,
            d_ff=args.d_ff, dtype=jnp.bfloat16, remat=False,
            window=args.window,
        )
        params = init_params(jax.random.PRNGKey(0), cfg)
    d_params = d_cfg = None
    if args.speculative:
        from flash_attention_dlrs_tpu.models.convert import load_trained

        if not args.draft_ckpt:
            raise SystemExit("--speculative requires --draft-ckpt")
        d_params, d_cfg = load_trained(args.draft_ckpt)
    n_params = sum(p.size for p in jax.tree.leaves(params))
    print(f"model: {n_params/1e9:.2f}B params, {cfg.n_layers}L "
          f"d{cfg.d_model} {cfg.n_q_heads}q/{cfg.n_kv_heads}kv", flush=True)

    slack = args.gamma if args.speculative else 0
    pages_per_seq = (args.ctx + args.new_tokens + slack
                     + args.page_size - 1) // args.page_size
    rng = np.random.default_rng(0)
    results = []
    spec_modes = [False, True] if args.speculative else [False]
    for kv in args.kv:
        kv_dtype = {"bf16": jnp.bfloat16, "int8": jnp.int8, "int4": "int4"}[kv]
        quant = kv != "bf16"
        for b in args.batches:
          for spec in spec_modes:
            eng = DecodeEngine(
                params, cfg, num_pages=b * pages_per_seq + 1,
                page_size=args.page_size, num_slots=b,
                pages_per_seq=pages_per_seq, kv_dtype=kv_dtype,
                quantized_kv=quant,
            )
            if spec:
                # the draft overshoots committed prefixes by gamma tokens
                d_pps = pages_per_seq + 1
                draft = DecodeEngine(
                    d_params, d_cfg, num_pages=b * d_pps + 1,
                    page_size=args.page_size, num_slots=b,
                    pages_per_seq=d_pps, kv_dtype=jnp.bfloat16,
                )
                eng.attach_draft(draft, gamma=args.gamma)
            if args.data:
                # real held-out prompts: speculative acceptance is DATA-
                # dependent (random-token contexts measured acc≈0.04 where
                # corpus prompts give the real draft agreement)
                val = np.memmap(os.path.join(args.data, "val.bin"),
                                dtype=np.uint16, mode="r")
                prompts = [
                    [int(t) for t in val[i * args.ctx:(i + 1) * args.ctx]]
                    for i in range(b)
                ]
            else:
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
                "burst": burst, "speculative": spec,
                "rolling": bool(getattr(eng, "rolling", False)),
                "pages_per_seq": eng.pages_per_seq,
                "tokens_per_s": toks / dt,
                "ms_per_step": dt * b / max(1, toks) * 1e3,
            }
            if spec:
                s = eng.spec_stats
                row["gamma"] = args.gamma
                row["acceptance"] = s["accepted"] / max(1, s["proposed"])
                row["rounds"] = s["rounds"]
                plain = next(
                    (r for r in results
                     if r["kv"] == kv and r["batch"] == b
                     and not r["speculative"]), None)
                if plain:
                    row["vs_plain"] = (
                        row["tokens_per_s"] / plain["tokens_per_s"])
            results.append(row)
            # Device decode rate reference: the same engine's fully-fused
            # loop slope (two lengths differenced — drops the per-call
            # admission/prefill constant).  e2e/device is the serving
            # host-overhead ratio the north star tracks.
            if not getattr(eng, "rolling", False) and not spec:
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
            tag = f" spec γ={args.gamma}" if spec else ""
            extra = (f"  acc={row['acceptance']:.2f} "
                     f"vs_plain={row.get('vs_plain', float('nan')):.2f}x"
                     if spec else
                     f"  dev_ratio="
                     f"{row.get('e2e_over_device', float('nan')):.2f}")
            print(f"kv={kv:5s} B={b:3d} burst={burst}{tag}: "
                  f"{row['tokens_per_s']:9.0f} tok/s  "
                  f"{row['ms_per_step']:7.2f} ms/step{extra}",
                  flush=True)
            # free engine state before the next config
            del eng

    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump({"config": vars(args), "results": results}, f, indent=1)
    print("wrote", args.out)


if __name__ == "__main__":
    main()
