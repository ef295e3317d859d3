"""INT8/FP8-KV perplexity gate (north star: within 0.1 ppl of the
unquantized cache; BASELINE.md).

Runs teacher-forced perplexity through the REAL serving path (prefill +
paged decode steps) with fp, int8, and fp8 KV caches and reports the gaps.
Model size defaults small enough for CPU; pass --d-model etc. to scale up
on TPU.
"""

import argparse
import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/fa_tpu_jit_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--seq", type=int, default=96)
    ap.add_argument("--d-model", type=int, default=128)
    ap.add_argument("--layers", type=int, default=2)
    ap.add_argument("--gate", type=float, default=0.1)
    args = ap.parse_args()

    from flash_attention_dlrs_tpu.models import ModelConfig, init_params
    from flash_attention_dlrs_tpu.models.eval import (
        perplexity_dense,
        perplexity_paged,
    )

    cfg = ModelConfig(
        vocab_size=512, d_model=args.d_model, n_layers=args.layers,
        n_q_heads=max(4, args.d_model // 64), n_kv_heads=max(2, args.d_model // 128),
        head_dim=32, d_ff=args.d_model * 2, dtype=jnp.float32, remat=False,
    )
    params = init_params(jax.random.PRNGKey(0), cfg)
    tokens = jax.random.randint(
        jax.random.PRNGKey(1), (args.batch, args.seq), 0, cfg.vocab_size
    )

    ppl_dense = perplexity_dense(params, cfg, tokens)
    ppl_fp = perplexity_paged(params, cfg, tokens, kv_dtype=jnp.float32)
    ppl_i8 = perplexity_paged(params, cfg, tokens, kv_dtype=jnp.int8, quantized=True)
    ppl_f8 = perplexity_paged(
        params, cfg, tokens, kv_dtype=jnp.float8_e4m3fn, quantized=True
    )
    print(f"ppl dense         : {ppl_dense:.4f}")
    print(f"ppl paged fp      : {ppl_fp:.4f}  (machinery gap {abs(ppl_fp-ppl_dense):.2e})")
    print(f"ppl paged int8-KV : {ppl_i8:.4f}  (gap {abs(ppl_i8-ppl_fp):.4f})")
    print(f"ppl paged fp8-KV  : {ppl_f8:.4f}  (gap {abs(ppl_f8-ppl_fp):.4f})")
    ok = abs(ppl_i8 - ppl_fp) < args.gate
    print("GATE (int8 within", args.gate, "):", "PASS" if ok else "FAIL")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
