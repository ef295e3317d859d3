"""Decode-throughput scaling harness: tokens/s/chip at 1 chip vs N chips.

The north-star target (BASELINE.json) is >=80% tokens/s/chip efficiency
going 1 chip -> 1 host -> N hosts.  This is the one-command measurement for
whenever multi-chip hardware is attached: it times the DecodeEngine's jitted
decode step (the serving hot loop — prefill excluded) single-chip, then
tensor-parallel over the model axis on N chips, and reports

    efficiency = (tokens/s/chip @ N) / (tokens/s @ 1 chip)

With a batch scaled by N (weak scaling: serving adds replicas/slots as chips
arrive), >=0.8 passes the gate.  On this 1-real-chip environment run it on
the virtual CPU mesh for plumbing validation only:

    PYTHONPATH= JAX_PLATFORMS=cpu \
    XLA_FLAGS=--xla_force_host_platform_device_count=8 \
    python scripts/bench_scaling.py --steps 4 --batch 4

(Reference protocol analogue: warmup+rep timing, src/bench.py:61-62,99.)
"""

import argparse
import json
import time

import jax
import jax.numpy as jnp
import numpy as np


def _build_engine(cfg, params, mesh, batch, pages_per_seq, page_size,
                  kv_dtype, quantized):
    from flash_attention_dlrs_tpu.runtime.engine import DecodeEngine

    return DecodeEngine(
        params, cfg,
        num_pages=batch * pages_per_seq + 8, page_size=page_size,
        num_slots=batch, pages_per_seq=pages_per_seq,
        kv_dtype=kv_dtype, quantized_kv=quantized, mesh=mesh,
    )


def _time_decode_steps(eng, batch, prompt_len, steps, reps):
    """Seconds per decode step (median of reps), after prefill + warmup."""
    from flash_attention_dlrs_tpu.runtime.scheduler import Request

    prompts = [[(7 * i + j) % eng.cfg.vocab_size for j in range(prompt_len)]
               for i in range(batch)]
    for i, p in enumerate(prompts):
        eng.scheduler.submit(Request(
            request_id=i, prompt_tokens=p,
            max_new_tokens=steps * (reps + 4)))
    eng.scheduler.schedule()  # admit + prefill every slot
    eng.step()  # warmup decode (compile) at steady state
    eng.step()
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(steps):
            n = eng.step()
            assert n > 0, "engine drained mid-benchmark"
        times.append((time.perf_counter() - t0) / steps)
    times.sort()
    return times[len(times) // 2]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--d-model", type=int, default=1024)
    ap.add_argument("--layers", type=int, default=8)
    ap.add_argument("--q-heads", type=int, default=16)
    ap.add_argument("--kv-heads", type=int, default=8)
    ap.add_argument("--head-dim", type=int, default=128)
    ap.add_argument("--d-ff", type=int, default=4096)
    ap.add_argument("--batch", type=int, default=8,
                    help="decode slots per chip (weak scaling)")
    ap.add_argument("--prompt-len", type=int, default=512)
    ap.add_argument("--pages-per-seq", type=int, default=8)
    ap.add_argument("--page-size", type=int, default=256)
    ap.add_argument("--kv", choices=["bf16", "int8"], default="int8")
    ap.add_argument("--steps", type=int, default=16,
                    help="decode steps per timed rep")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--out", default="bench_out/scaling.json")
    args = ap.parse_args()

    from jax.sharding import Mesh

    from flash_attention_dlrs_tpu.models import ModelConfig, init_params

    devices = jax.devices()
    n = len(devices)
    cfg = ModelConfig(
        vocab_size=32000, d_model=args.d_model, n_layers=args.layers,
        n_q_heads=args.q_heads, n_kv_heads=args.kv_heads,
        head_dim=args.head_dim, d_ff=args.d_ff,
        dtype=jnp.bfloat16 if jax.default_backend() == "tpu"
        else jnp.float32,
    )
    params = init_params(jax.random.PRNGKey(0), cfg)
    kv_dtype = jnp.int8 if args.kv == "int8" else jnp.bfloat16
    quantized = args.kv == "int8"

    results = {"devices": n, "backend": jax.default_backend(),
               "config": vars(args), "points": []}

    # 1 chip
    eng1 = _build_engine(cfg, params, None, args.batch, args.pages_per_seq,
                         args.page_size, kv_dtype, quantized)
    t1 = _time_decode_steps(eng1, args.batch, args.prompt_len, args.steps,
                            args.reps)
    tps1 = args.batch / t1
    results["points"].append(
        {"chips": 1, "mode": "single", "tokens_per_s": tps1,
         "tokens_per_s_per_chip": tps1})
    print(f"1 chip: {tps1:,.0f} tok/s")

    if n > 1:
        # N chips, tensor-parallel over the model axis, batch scaled by N.
        tp = n
        while cfg.n_kv_heads % tp or cfg.n_q_heads % tp:
            tp -= 1
        mesh = Mesh(np.array(devices[:tp]), ("model",))
        batch_n = args.batch * tp
        engN = _build_engine(cfg, params, mesh, batch_n, args.pages_per_seq,
                             args.page_size, kv_dtype, quantized)
        tN = _time_decode_steps(engN, batch_n, args.prompt_len, args.steps,
                                args.reps)
        tpsN = batch_n / tN
        eff = (tpsN / tp) / tps1
        results["points"].append(
            {"chips": tp, "mode": "tensor-parallel",
             "tokens_per_s": tpsN, "tokens_per_s_per_chip": tpsN / tp,
             "efficiency_vs_1chip": eff})
        print(f"{tp} chips (tp): {tpsN:,.0f} tok/s total, "
              f"{tpsN / tp:,.0f} tok/s/chip, efficiency {eff:.1%} "
              f"(target >=80%)")

    import os

    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(results, f, indent=2)
    print("wrote", args.out)


if __name__ == "__main__":
    main()
