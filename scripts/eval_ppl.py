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
    ap.add_argument("--train-steps", type=int, default=300)
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

    # Structured synthetic data (noisy first-order Markov chain) so a short
    # training run reaches a realistic perplexity — a quantization gap gate
    # on a RANDOM model (ppl ≈ vocab) measures only rounding noise at an
    # arbitrary scale, not serving quality.
    import numpy as np

    rng = np.random.default_rng(0)
    succ = rng.integers(0, cfg.vocab_size, size=cfg.vocab_size)

    def draw(batch, seq, seed):
        r = np.random.default_rng(seed)
        out = np.zeros((batch, seq), np.int32)
        out[:, 0] = r.integers(0, cfg.vocab_size, size=batch)
        for t in range(1, seq):
            follow = r.random(batch) < 0.9
            out[:, t] = np.where(
                follow, succ[out[:, t - 1]],
                r.integers(0, cfg.vocab_size, size=batch),
            )
        return jnp.asarray(out)

    if args.train_steps:
        from flash_attention_dlrs_tpu.models import (
            make_train_state, make_train_step,
        )

        params, opt_state, optimizer = make_train_state(
            jax.random.PRNGKey(0), cfg, learning_rate=1e-3
        )
        step = make_train_step(cfg, optimizer)
        for i in range(args.train_steps):
            batch = draw(8, args.seq + 1, seed=100 + i)
            params, opt_state, loss = step(params, opt_state, batch)
            if i % 50 == 0:
                print(f"[train] step {i}: loss {float(loss):.3f}", flush=True)

    tokens = draw(args.batch, args.seq, seed=9999)

    ppl_dense = perplexity_dense(params, cfg, tokens)
    ppl_fp = perplexity_paged(params, cfg, tokens, kv_dtype=jnp.float32)
    ppl_i8 = perplexity_paged(params, cfg, tokens, kv_dtype=jnp.int8, quantized=True)
    ppl_i4 = perplexity_paged(params, cfg, tokens, kv_dtype="int4", quantized=True)
    ppl_f8 = perplexity_paged(
        params, cfg, tokens, kv_dtype=jnp.float8_e4m3fn, quantized=True
    )
    print(f"ppl dense         : {ppl_dense:.4f}")
    print(f"ppl paged fp      : {ppl_fp:.4f}  (machinery gap {abs(ppl_fp-ppl_dense):.2e})")
    print(f"ppl paged int8-KV : {ppl_i8:.4f}  (gap {abs(ppl_i8-ppl_fp):.4f})")
    print(f"ppl paged int4-KV : {ppl_i4:.4f}  (gap {abs(ppl_i4-ppl_fp):.4f})")
    print(f"ppl paged fp8-KV  : {ppl_f8:.4f}  (gap {abs(ppl_f8-ppl_fp):.4f})")
    ok = abs(ppl_i8 - ppl_fp) < args.gate
    print("GATE (int8 within", args.gate, "):", "PASS" if ok else "FAIL")
    # int4 is reported, not gated: it trades resolution for bandwidth and
    # its acceptability is a per-deployment call.
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
