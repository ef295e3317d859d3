"""Train a byte-level LM on the local code corpus (the eval-gate model).

The quantized-KV perplexity gate (BASELINE.json: int8 KV within 0.1 ppl)
needs a model with realistic attention statistics, not random weights.
This trains a ~50M-param GQA transformer (the flagship architecture,
models/transformer.py) on bytes of real source code at seq 2048 — byte-level
ppl lands far below the 256-way random baseline in a few thousand steps on
one v5e — and checkpoints it for scripts/eval_ppl.py and the speculative-
decoding benchmark (a --draft run trains the small companion model).

Usage (TPU, after scripts/make_corpus.py):
  python scripts/train_lm.py --data /tmp/code_corpus --steps 3000 \
      --ckpt bench_out/lm50m
  python scripts/train_lm.py --data /tmp/code_corpus --steps 1500 \
      --draft --ckpt bench_out/lm_draft
"""

import argparse
import json
import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/fa_tpu_jit_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def model_config(draft: bool, dtype, big: bool = False):
    from flash_attention_dlrs_tpu.models import ModelConfig

    if big:
        # ~180M params: the speculative-decoding TARGET.  At 50M scale the
        # fused per-step device floor makes any draft a wash (round-3
        # speculative.json: draft step 1.19x target); ~4x the compute puts
        # the target step well above the floor so the draft's cheapness
        # can show (VERDICT r3 task #3).
        return ModelConfig(
            vocab_size=512, d_model=1024, n_layers=16, n_q_heads=16,
            n_kv_heads=4, head_dim=64, d_ff=2816, dtype=dtype, remat=True,
        )
    if draft:
        # ~6M params: the speculative-decoding draft companion.
        return ModelConfig(
            vocab_size=512, d_model=256, n_layers=4, n_q_heads=4,
            n_kv_heads=2, head_dim=64, d_ff=768, dtype=dtype, remat=False,
        )
    # ~51M params: d768/L8, GQA 12q/4kv, head_dim 64, swiglu ff 2048.
    return ModelConfig(
        vocab_size=512, d_model=768, n_layers=8, n_q_heads=12,
        n_kv_heads=4, head_dim=64, d_ff=2048, dtype=dtype, remat=True,
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data", default="/tmp/code_corpus")
    ap.add_argument("--steps", type=int, default=3000)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--seq", type=int, default=2048)
    ap.add_argument("--lr", type=float, default=6e-4)
    ap.add_argument("--warmup", type=int, default=200)
    ap.add_argument("--draft", action="store_true",
                    help="train the small speculative-draft model instead")
    ap.add_argument("--big", action="store_true",
                    help="train the ~180M speculative-target model instead")
    ap.add_argument("--ckpt", default=None)
    ap.add_argument("--log-every", type=int, default=50)
    args = ap.parse_args()

    from flash_attention_dlrs_tpu.models.trainer import TrainSpec, fit
    from flash_attention_dlrs_tpu.runtime.data import (
        LoaderState, TokenDataset, batches,
    )
    from flash_attention_dlrs_tpu.runtime.native_data import (
        native_batches, native_loader_available,
    )

    dtype = jnp.bfloat16 if jax.default_backend() == "tpu" else jnp.float32
    cfg = model_config(args.draft, dtype, big=args.big)
    n_params = (
        cfg.vocab_size * cfg.d_model
        + cfg.n_layers * (
            cfg.d_model * (cfg.n_q_heads + 2 * cfg.n_kv_heads) * cfg.head_dim
            + cfg.n_q_heads * cfg.head_dim * cfg.d_model
            + 3 * cfg.d_model * cfg.d_ff))
    print(f"model: ~{n_params/1e6:.1f}M params, dtype {dtype.__name__}, "
          f"seq {args.seq}, batch {args.batch}")

    train_path = os.path.join(args.data, "train.bin")
    if native_loader_available():
        def make_batches(state):
            return native_batches(
                train_path, seq_len=args.seq, batch_size=args.batch,
                seed=0, state=state)
        print("using native C++ token loader")
    else:
        ds = TokenDataset.from_file(train_path, args.seq)

        def make_batches(state):
            return batches(ds, batch_size=args.batch, seed=0, state=state,
                           process_index=0, process_count=1)
        print("using python token loader")

    spec = TrainSpec(
        learning_rate=args.lr,
        warmup_steps=min(args.warmup, max(args.steps // 10, 1)),
        total_steps=args.steps, weight_decay=0.01, grad_clip_norm=1.0,
        optimizer="adamw8bit",
    )
    losses = []
    state = fit(
        cfg, make_batches, spec=spec, steps=args.steps,
        checkpoint_dir=args.ckpt,
        checkpoint_every=max(500, args.steps // 4),
        metrics_path=(os.path.join(args.ckpt, "metrics.jsonl")
                      if args.ckpt else None),
        log_every=args.log_every,
        on_step=lambda s, l: (
            losses.append(float(l)),
            print(f"step {s}: loss {float(l):.4f}", flush=True)
            if s % args.log_every == 0 else None,
        ),
    )
    final = sum(losses[-20:]) / max(1, len(losses[-20:]))
    import math

    print(f"final loss (20-step mean): {final:.4f}  "
          f"ppl {math.exp(final):.2f}  (random = {cfg.vocab_size // 2}-ish; "
          f"byte-random = 256)")
    if args.ckpt:
        with open(os.path.join(args.ckpt, "train_summary.json"), "w") as f:
            json.dump({"final_loss": final, "ppl": math.exp(final),
                       "steps": args.steps, "params_m": n_params / 1e6,
                       "seq": args.seq, "batch": args.batch,
                       "draft": args.draft}, f, indent=2)
        # params-only checkpoint: eval/serving loaders need no optimizer
        # template to restore from this one
        from flash_attention_dlrs_tpu.utils import checkpoint as ckpt_lib

        ckpt_lib.save_checkpoint(
            os.path.join(args.ckpt, "params_only"),
            {"params": state["params"]}, step=args.steps)
        # architecture record so eval/serving scripts rebuild the exact cfg
        with open(os.path.join(args.ckpt, "model_config.json"), "w") as f:
            json.dump({
                "vocab_size": cfg.vocab_size, "d_model": cfg.d_model,
                "n_layers": cfg.n_layers, "n_q_heads": cfg.n_q_heads,
                "n_kv_heads": cfg.n_kv_heads, "head_dim": cfg.head_dim,
                "d_ff": cfg.d_ff, "dtype": jnp.dtype(cfg.dtype).name,
            }, f, indent=2)
    return 0


if __name__ == "__main__":
    sys.exit(main())
