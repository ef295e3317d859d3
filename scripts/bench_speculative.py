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
    #
    # Two timed lengths separate the DECODE-PHASE cost (the loop slope,
    # what speculation accelerates) from the per-call fixed cost
    # (admission + prefill dispatches — ~1 s/engine through this
    # environment's remote tunnel, identical for both algorithms and
    # amortized away over long generations).
    mx_lo = max(8, args.max_new // 8)

    def timed_min(eng_, fn, reps=3):
        # Decode-phase cost = the fused DEVICE program's wall time
        # (engine.last_fused_seconds — excludes the admission/prefill
        # dispatches, whose multi-second tunnel jitter would swamp the
        # slope); min-of-N for the residual dispatch jitter, two lengths
        # differenced to drop the per-call dispatch constant.
        best, out, tot = None, None, None
        for _ in range(reps):
            t0 = time.perf_counter()
            r = fn()
            dt_tot = time.perf_counter() - t0
            dt = eng_.last_fused_seconds
            if best is None or dt < best:
                best, out, tot = dt, r, dt_tot
        return best, out, tot

    eng = build(t_params, t_cfg)
    for mx in (mx_lo, args.max_new):  # compile both lengths
        eng.generate_fused(prompts, max_new_tokens=mx)
    t_lo, _, _ = timed_min(
        eng, lambda: eng.generate_fused(prompts, max_new_tokens=mx_lo))
    t_dev, plain_out, t_plain = timed_min(
        eng, lambda: eng.generate_fused(prompts, max_new_tokens=args.max_new))
    n_tokens = sum(len(o) for o in plain_out)
    plain_step = (t_dev - t_lo) / (args.max_new - mx_lo)
    plain_decode_tps = b / plain_step
    # Draft step cost (same fused discipline) for the crossover analysis.
    deng = build(d_params, d_cfg)
    deng.generate_fused(prompts, max_new_tokens=4)
    deng.generate_fused(prompts, max_new_tokens=args.max_new)
    t0 = time.perf_counter()
    deng.generate_fused(prompts, max_new_tokens=args.max_new)
    t_draft = time.perf_counter() - t0
    step_t = t_plain / (args.max_new - 1)
    step_d = t_draft / (args.max_new - 1)
    out = {
        "mode": "measured",
        "model": {"target_ckpt": args.target_ckpt,
                  "draft_ckpt": args.draft_ckpt,
                  "prompt_len": args.prompt_len, "max_new": args.max_new,
                  "slots": b},
        "plain": {"tokens": n_tokens, "seconds": t_plain,
                  "tokens_per_s": n_tokens / t_plain,
                  "decode_ms_per_step": plain_step * 1e3,
                  "decode_tokens_per_s": plain_decode_tps},
        # Why speculation can lose at sub-scale: a fixed ~5 ms/step device
        # floor (kernel-launch + loop overhead, NOT model compute) makes a
        # 3M draft cost half a 50M target step instead of 1/15th.  gamma=4
        # at the measured acceptance needs step_draft < ~0.4*step_target
        # to win; production-size targets clear that easily.
        "step_cost": {"target_ms": step_t * 1e3, "draft_ms": step_d * 1e3,
                      "draft_over_target": step_d / step_t},
    }
    print(f"plain greedy: {n_tokens} tok in {t_plain:.2f}s = "
          f"{n_tokens / t_plain:,.0f} tok/s end-to-end; decode phase "
          f"{plain_step*1e3:.3f} ms/step = {plain_decode_tps:,.0f} tok/s",
          flush=True)

    for g in args.gammas:
        tgt = build(t_params, t_cfg)
        dft = build(d_params, d_cfg)
        for mx in (mx_lo, args.max_new):  # compile both lengths
            tgt.generate_speculative_fused(
                prompts, draft=dft, gamma=g, max_new_tokens=mx)
        ts_lo, _, _ = timed_min(
            tgt, lambda: tgt.generate_speculative_fused(
                prompts, draft=dft, gamma=g, max_new_tokens=mx_lo))
        r_lo = tgt.spec_stats["rounds"]
        ts_dev, spec_out, t_spec = timed_min(
            tgt, lambda: tgt.generate_speculative_fused(
                prompts, draft=dft, gamma=g, max_new_tokens=args.max_new))
        n_spec = sum(len(o) for o in spec_out)
        st = tgt.spec_stats
        acc = st["accepted"] / max(1, st["proposed"])
        assert spec_out == plain_out, "greedy speculative output diverged"
        round_ms = (ts_dev - ts_lo) / max(1, st["rounds"] - r_lo)
        toks_per_round = n_spec / max(1, st["rounds"]) / b
        decode_tps = b * toks_per_round / round_ms
        out[f"gamma{g}"] = {
            "tokens": n_spec, "seconds": t_spec,
            "tokens_per_s": n_spec / t_spec,
            "end_to_end_speedup_vs_plain": (
                (n_spec / t_spec) / out["plain"]["tokens_per_s"]),
            "decode_ms_per_round": round_ms * 1e3,
            "decode_tokens_per_s": decode_tps,
            "decode_speedup_vs_plain": decode_tps / plain_decode_tps,
            "rounds": st["rounds"], "measured_acceptance": acc,
            "tokens_per_round": toks_per_round,
        }
        print(f"gamma={g}: decode {decode_tps:,.0f} tok/s "
              f"({decode_tps / plain_decode_tps:.2f}x plain decode; "
              f"end-to-end {n_spec / t_spec:,.0f}), "
              f"acceptance {acc:.1%}, {st['rounds']} rounds", flush=True)

    os.makedirs("bench_out", exist_ok=True)
    with open("bench_out/speculative.json", "w") as f:
        json.dump(out, f, indent=2)
    print("wrote bench_out/speculative.json")
    return 0


if __name__ == "__main__":
    main()
