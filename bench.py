"""Headline benchmark: fused attention TFLOP/s on one TPU chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"} where
value is this repo's Pallas flash-attention throughput on the headline
workload and vs_baseline is the speedup over the naive XLA attention
(softmax(QKᵀ)V materializing the scores) on the same workload — the
strongest baseline a user gets without custom kernels.

Workload: B=8, H=16, d=128 (the reference's bench family,
reference: src/bench.py:8-10), N=4096, bf16, causal.
Full sweep (N=2^7..2^15, fwd+bwd, CSVs): python -m scripts.run_bench_suite
"""

import json
import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/fa_tpu_jit_cache")

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    from flash_attention_dlrs_tpu.bench.suite import attention_flops, time_fn
    from flash_attention_dlrs_tpu.ops.flash_attention import flash_attention
    from flash_attention_dlrs_tpu.ops.reference import reference_attention

    b, h, n, d = 8, 16, 4096, 128
    causal = True
    keys = jax.random.split(jax.random.PRNGKey(0), 3)
    q = jax.random.normal(keys[0], (b, h, n, d), jnp.bfloat16)
    k = jax.random.normal(keys[1], (b, h, n, d), jnp.bfloat16)
    v = jax.random.normal(keys[2], (b, h, n, d), jnp.bfloat16)

    # anchor="elem": the timed fn ends in an opaque Pallas custom call, so
    # the single-element anchor is DCE-safe and doesn't charge the kernel
    # an extra full-output HBM read (~3% at this size).
    sec_ours = time_fn(
        lambda q_, k_, v_: flash_attention(q_, k_, v_, causal=causal),
        q, k, v, anchor="elem",
    )
    fl = attention_flops(b, h, n, n, d, causal=causal, mode="fwd")
    tflops_ours = fl / sec_ours / 1e12

    try:
        sec_xla = time_fn(
            lambda q_, k_, v_: reference_attention(
                q_, k_, v_, causal=causal, sm_scale=d**-0.5
            ),
            q, k, v,
        )
        vs_baseline = sec_xla / sec_ours
    except Exception:
        vs_baseline = float("nan")

    print(
        json.dumps(
            {
                "metric": f"fused causal flash-attention fwd TFLOP/s "
                          f"(bf16, B={b} H={h} N={n} d={d}, 1 chip)",
                "value": round(tflops_ours, 2),
                "unit": "TFLOP/s",
                "vs_baseline": round(vs_baseline, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
