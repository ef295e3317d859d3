"""Speculative-decoding benchmark: MEASURED end-to-end + component sanity.

With --target-ckpt/--draft-ckpt (scripts/train_lm.py run dirs) this runs
REAL generation through DecodeEngine on real held-out prompts and reports
measured wall-clock tokens/s for plain vs speculative decoding, plus the
MEASURED acceptance rate (engine.spec_stats) — the round-3 fused programs
(runtime/speculative.py: device-side draft scan + fused verify/accept)
keep the round at 2 dispatches, so wall-clock is meaningful even through
this environment's remote-dispatch tunnel.

Without checkpoints it falls back to the round-2 component cost model
(device step costs + derived speedup) — kept as the sanity column.

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
    ap.add_argument("--target-ckpt", default=None,
                    help="trained target run dir -> measured end-to-end mode")
    ap.add_argument("--draft-ckpt", default=None)
    ap.add_argument("--data", default="/tmp/code_corpus")
    ap.add_argument("--prompt-len", type=int, default=512)
    ap.add_argument("--max-new", type=int, default=256)
    ap.add_argument("--gammas", type=int, nargs="*", default=[3, 4, 6])
    args = ap.parse_args()

    if args.target_ckpt:
        return measured_end_to_end(args)

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
    out["mode"] = "component-cost-model (sanity only — see measured mode)"
    print(json.dumps(out, indent=2))
    os.makedirs("bench_out", exist_ok=True)
    with open("bench_out/speculative_cost_model.json", "w") as f:
        json.dump(out, f, indent=2)


def measured_end_to_end(args):
    """Measured mode: real prompts, real engines, wall-clock + acceptance."""
    import time

    import numpy as np

    from flash_attention_dlrs_tpu.models.convert import load_trained
    from flash_attention_dlrs_tpu.runtime.engine import DecodeEngine

    t_params, t_cfg = load_trained(args.target_ckpt)
    d_params, d_cfg = load_trained(args.draft_ckpt)
    assert t_cfg.vocab_size == d_cfg.vocab_size

    val = np.memmap(os.path.join(args.data, "val.bin"), dtype=np.uint16,
                    mode="r")
    b = args.slots
    prompts = [
        [int(t) for t in val[i * args.prompt_len:(i + 1) * args.prompt_len]]
        for i in range(b)
    ]
    ps = 256
    total = args.prompt_len + args.max_new + args.gammas[-1] * 2
    pps = -(-total // ps)

    def build(params, cfg):
        return DecodeEngine(
            params, cfg, num_pages=b * pps + 8, page_size=ps,
            num_slots=b, pages_per_seq=pps, kv_dtype=jnp.bfloat16,
        )

    # Plain greedy baseline with the whole decode loop fused into ONE
    # device program (generate_fused) — the same dispatch discipline the
    # speculative path gets, so the comparison measures the ALGORITHM, not
    # dispatch counts.  Warm-up and timed run share ONE engine: each
    # build() makes fresh jit closures that would recompile; generation
    # retires its requests, so reuse is clean.
    eng = build(t_params, t_cfg)
    eng.generate_fused(prompts, max_new_tokens=4)  # compile prefill+decode
    eng.generate_fused(prompts, max_new_tokens=args.max_new)  # compile full
    t0 = time.perf_counter()
    plain_out = eng.generate_fused(prompts, max_new_tokens=args.max_new)
    t_plain = time.perf_counter() - t0
    n_tokens = sum(len(o) for o in plain_out)
    out = {
        "mode": "measured",
        "model": {"target_ckpt": args.target_ckpt,
                  "draft_ckpt": args.draft_ckpt,
                  "prompt_len": args.prompt_len, "max_new": args.max_new,
                  "slots": b},
        "plain": {"tokens": n_tokens, "seconds": t_plain,
                  "tokens_per_s": n_tokens / t_plain},
    }
    print(f"plain greedy: {n_tokens} tok in {t_plain:.2f}s = "
          f"{n_tokens / t_plain:,.0f} tok/s", flush=True)

    for g in args.gammas:
        tgt = build(t_params, t_cfg)
        dft = build(d_params, d_cfg)
        tgt.generate_speculative_fused(  # compile pass (engines reused)
            prompts, draft=dft, gamma=g, max_new_tokens=4)
        tgt.generate_speculative_fused(
            prompts, draft=dft, gamma=g, max_new_tokens=args.max_new)
        t0 = time.perf_counter()
        spec_out = tgt.generate_speculative_fused(
            prompts, draft=dft, gamma=g, max_new_tokens=args.max_new)
        t_spec = time.perf_counter() - t0
        n_spec = sum(len(o) for o in spec_out)
        st = tgt.spec_stats
        acc = st["accepted"] / max(1, st["proposed"])
        assert spec_out == plain_out, "greedy speculative output diverged"
        out[f"gamma{g}"] = {
            "tokens": n_spec, "seconds": t_spec,
            "tokens_per_s": n_spec / t_spec,
            "speedup_vs_plain": (n_spec / t_spec) / out["plain"]["tokens_per_s"],
            "rounds": st["rounds"], "measured_acceptance": acc,
            "tokens_per_round": n_spec / max(1, st["rounds"]) / b,
        }
        print(f"gamma={g}: {n_spec / t_spec:,.0f} tok/s "
              f"({out[f'gamma{g}']['speedup_vs_plain']:.2f}x plain), "
              f"acceptance {acc:.1%}, {st['rounds']} rounds", flush=True)

    os.makedirs("bench_out", exist_ok=True)
    with open("bench_out/speculative.json", "w") as f:
        json.dump(out, f, indent=2)
    print("wrote bench_out/speculative.json")
    return 0


if __name__ == "__main__":
    main()
