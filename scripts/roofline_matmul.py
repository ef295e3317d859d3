"""Measure the v5e's ACHIEVABLE bf16 matmul peak — the roofline the fused
attention headline is judged against.

The datasheet bf16 peak (~197 TF/s on v5e) assumes an ideal MXU issue
stream; what a real kernel can reach is bounded by what XLA's own best
matmuls reach at comparable shapes.  This script measures:

  1. square   — M=K=N square jnp.dot sweep (the absolute achievable peak)
  2. score    — batched [G,n,d]·[G,m,d]ᵀ with d=128 contraction
                (flash-attention's structurally shallow score dot)
  3. pv       — batched [G,n,m]·[G,m,d] with m-deep contraction
                (the P·V dot)
  4. attn-mix — score+pv chained per block at the strip kernel's block
                shapes (the dots-only attention ceiling, XLA edition)

All bf16 inputs; f32 accumulation (preferred_element_type) where flash
attention requires it, plus a bf16-out square variant to expose the
accumulate-precision cost.  Timing uses bench.suite.time_fn (chained
slope protocol — tunnel dispatch overhead cancels).

Output: JSON lines + a summary block written to
bench_out/roofline_matmul.json.  Protocol anchor: the headline bench
(`bench.py`) measures 2·2·B·H·N²·d·0.5 causal FLOPs at B=8 H=16 N=4096
d=128 — the same FLOPs model as /root/reference/src/bench.py:61-62,99.
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

from flash_attention_dlrs_tpu.bench.suite import time_fn


def tf(flops, sec):
    return flops / sec / 1e12


def measure_square(n, out_dtype):
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    a = jax.random.normal(k1, (n, n), jnp.bfloat16)
    b = jax.random.normal(k2, (n, n), jnp.bfloat16)

    def fn(a_, b_):
        return jax.lax.dot_general(
            a_, b_, (((1,), (0,)), ((), ())),
            preferred_element_type=out_dtype,
        )

    sec = time_fn(fn, a, b)
    return tf(2.0 * n * n * n, sec)


def measure_score(g, n, m, d):
    k1, k2 = jax.random.split(jax.random.PRNGKey(1))
    q = jax.random.normal(k1, (g, n, d), jnp.bfloat16)
    kk = jax.random.normal(k2, (g, m, d), jnp.bfloat16)

    def fn(q_, k_):
        return jax.lax.dot_general(
            q_, k_, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )

    sec = time_fn(fn, q, kk)
    return tf(2.0 * g * n * m * d, sec)


def measure_pv(g, n, m, d):
    k1, k2 = jax.random.split(jax.random.PRNGKey(2))
    p = jax.random.normal(k1, (g, n, m), jnp.bfloat16)
    v = jax.random.normal(k2, (g, m, d), jnp.bfloat16)

    def fn(p_, v_):
        return jax.lax.dot_general(
            p_, v_, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )

    sec = time_fn(fn, p, v)
    return tf(2.0 * g * n * m * d, sec)


def measure_attn_mix(g, n, m, d):
    """score + cast + pv chained — the dots-only attention ceiling with
    XLA scheduling both dots (no softmax at all)."""
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(3), 3)
    q = jax.random.normal(k1, (g, n, d), jnp.bfloat16)
    kk = jax.random.normal(k2, (g, m, d), jnp.bfloat16)
    v = jax.random.normal(k3, (g, m, d), jnp.bfloat16)

    def fn(q_, k_, v_):
        s = jax.lax.dot_general(
            q_, k_, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        p = s.astype(jnp.bfloat16)
        return jax.lax.dot_general(
            p, v_, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )

    sec = time_fn(fn, q, kk, v)
    return tf(4.0 * g * n * m * d, sec)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="bench_out/roofline_matmul.json")
    args = ap.parse_args()

    results = {"device": str(jax.devices()[0]), "entries": []}

    def rec(kind, cfg, tfs):
        e = {"kind": kind, **cfg, "tflops": round(tfs, 2)}
        results["entries"].append(e)
        print(json.dumps(e), flush=True)

    for n in (1024, 2048, 4096, 8192):
        rec("square_f32acc", {"n": n}, measure_square(n, jnp.float32))
    for n in (2048, 4096, 8192):
        rec("square_bf16out", {"n": n}, measure_square(n, jnp.bfloat16))

    # Attention shapes: B=8 H=16 → G=128 heads; d=128.
    for (n, m) in ((512, 512), (1024, 1024), (4096, 4096), (512, 4096)):
        rec("score_d128", {"g": 128, "n": n, "m": m, "d": 128},
            measure_score(128, n, m, 128))
    for (n, m) in ((512, 512), (512, 4096)):
        rec("pv", {"g": 128, "n": n, "m": m, "d": 128},
            measure_pv(128, n, m, 128))
    # Strip-kernel block mix: sub=256 rows × wide=1024-ish K columns.
    for (n, m) in ((256, 1024), (512, 1024), (512, 2048)):
        rec("attn_mix", {"g": 128, "n": n, "m": m, "d": 128},
            measure_attn_mix(128, n, m, 128))

    best_sq = max(e["tflops"] for e in results["entries"]
                  if e["kind"] == "square_f32acc")
    best_mix = max(e["tflops"] for e in results["entries"]
                   if e["kind"] == "attn_mix")
    results["summary"] = {
        "achievable_square_f32acc": best_sq,
        "achievable_attn_dot_mix": best_mix,
        "datasheet_bf16_peak": 197.0,
    }
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(results["summary"]), flush=True)


if __name__ == "__main__":
    main()
