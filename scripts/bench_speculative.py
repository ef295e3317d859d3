"""Speculative-decoding component benchmark.

Wall-clock end-to-end timing is meaningless in this environment — every
dispatch crosses a remote tunnel costing ~100 ms, which swamps sub-ms decode
steps — so this measures the DEVICE cost of the three speculative components
with dispatch-amortized chained timing and derives the speedup model:

    speedup(gamma, a) = tokens_per_round / round_cost_in_target_steps
      tokens_per_round = expected accepted prefix + 1   (a = acceptance rate)
      round_cost       = verify/decode + (gamma-1) * draft/decode

Output equality with plain greedy is exercised in tests/test_speculative.py.
"""

import argparse
import json
import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/fa_tpu_jit_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--layers", type=int, default=8)
    ap.add_argument("--draft-layers", type=int, default=1)
    ap.add_argument("--gamma", type=int, default=4)
    ap.add_argument("--ctx", type=int, default=2048)
    ap.add_argument("--slots", type=int, default=8)
    args = ap.parse_args()

    from flash_attention_dlrs_tpu.bench.suite import time_fn
    from flash_attention_dlrs_tpu.models import ModelConfig, init_params
    from flash_attention_dlrs_tpu.models.decoding import (
        init_kv_pools, make_decode_step, make_verify_step,
    )

    cfg = ModelConfig(
        vocab_size=2048, d_model=1024, n_layers=args.layers, n_q_heads=8,
        n_kv_heads=2, head_dim=128, d_ff=2816, dtype=jnp.bfloat16,
    )
    dcfg = ModelConfig(
        vocab_size=2048, d_model=256, n_layers=args.draft_layers,
        n_q_heads=2, n_kv_heads=2, head_dim=128, d_ff=512, dtype=jnp.bfloat16,
    )
    b = args.slots
    ps = 256
    pages_per_seq = args.ctx // ps

    def step_cost(c, params, verify_gamma=0):
        pools = init_kv_pools(
            c, num_pages=b * pages_per_seq + 1, page_size=ps,
            dtype=jnp.bfloat16,
        )
        if verify_gamma:
            step = make_verify_step(c, verify_gamma)
            g = verify_gamma
            tokens = jnp.ones((b, g), jnp.int32)
            positions = jnp.tile(
                args.ctx - g + jnp.arange(g, dtype=jnp.int32), (b, 1))
            base = (jnp.arange(b, dtype=jnp.int32) * pages_per_seq)[:, None]
        else:
            step = make_decode_step(c)
            tokens = jnp.ones((b,), jnp.int32)
            positions = jnp.full((b,), args.ctx - 1, jnp.int32)
            base = jnp.arange(b, dtype=jnp.int32) * pages_per_seq
        rows = positions // ps + base
        offs = positions % ps
        tbl = (jnp.arange(pages_per_seq, dtype=jnp.int32)[None, :]
               + (jnp.arange(b, dtype=jnp.int32) * pages_per_seq)[:, None])
        lens = jnp.full((b,), args.ctx, jnp.int32)

        # Custom chained timing: the pools MUST be loop-carried — a
        # loop-invariant pool makes every in-loop KV write copy the whole
        # pool (the real engine donates pools per dispatch).  The KV-write
        # chain also provides the cross-iteration data dependence.
        import functools as _ft
        import time as _time

        @_ft.partial(jax.jit, static_argnames=("iters",))
        def chain(pools_, iters):
            def body(_, carry):
                pools_c, acc = carry
                logits, pools_c = step(params, pools_c, tokens, positions,
                                       rows, offs, tbl, lens)
                acc = acc + jnp.sum(logits.astype(jnp.float32)) * 1e-30
                return (pools_c, acc)
            _, acc = jax.lax.fori_loop(0, iters, body, (pools_, jnp.float32(0)))
            return acc

        n1, n2 = 8, 64
        jax.device_get(chain(pools, n1))
        jax.device_get(chain(pools, n2))
        slopes = []
        for _ in range(3):
            t0 = _time.perf_counter(); jax.device_get(chain(pools, n1))
            t1 = _time.perf_counter(); jax.device_get(chain(pools, n2))
            t2 = _time.perf_counter()
            slopes.append(((t2 - t1) - (t1 - t0)) / (n2 - n1))
        slopes.sort()
        return max(slopes[1], 1e-9)

    params = init_params(jax.random.PRNGKey(0), cfg)
    dparams = init_params(jax.random.PRNGKey(1), dcfg)

    t_target = step_cost(cfg, params)
    t_draft = step_cost(dcfg, dparams)
    t_verify = step_cost(cfg, params, verify_gamma=args.gamma)

    g = args.gamma
    out = {
        "target_decode_us": t_target * 1e6,
        "draft_decode_us": t_draft * 1e6,
        "verify_gamma%d_us" % g: t_verify * 1e6,
        "batch": b, "ctx": args.ctx,
    }
    # γ draft steps per round: γ−1 proposals + one K/V-fill insert of the
    # final proposal (keeps the draft cache exact on full acceptance —
    # see runtime.engine.generate_speculative).
    round_cost = t_verify + g * t_draft
    for a in (0.5, 0.7, 0.9, 1.0):
        # expected committed tokens/round under per-token acceptance a
        exp_tokens = sum(a**j for j in range(1, g)) + 1
        out[f"speedup@accept={a}"] = (exp_tokens * t_target) / round_cost
    print(json.dumps(out, indent=2))
    os.makedirs("bench_out", exist_ok=True)
    with open("bench_out/speculative.json", "w") as f:
        json.dump(out, f, indent=2)


if __name__ == "__main__":
    main()
