"""Hardware probe: compile + correctness-check every kernel route that
touches the packed lse/D stat layout (ops/layout.py) on the real TPU.

The relayout helpers lower to broadcast/select/reduce/concat — all core
Mosaic ops — but scoped-VMEM and layout legality are only proven by a real
compile (see docs: interpret mode accepts anything).  Run this FIRST after
a layout change, before the full bench sweep.

Usage: python scripts/probe_layout_tpu.py [quick]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import time

import jax
import jax.numpy as jnp

from flash_attention_dlrs_tpu.ops.flash_attention import (
    flash_attention,
    flash_attention_backward,
    flash_attention_forward,
)
from flash_attention_dlrs_tpu.ops.reference import reference_attention

quick = len(sys.argv) > 1 and sys.argv[1] == "quick"


def check(name, b, h, n, d, dtype, causal=True, hkv=None, window=0,
          softcap=0.0, n_kv=None, tol=None, segments=False):
    t0 = time.time()
    hkv = hkv or h
    n_kv = n_kv or n
    ks = jax.random.split(jax.random.PRNGKey(0), 4)
    q = jax.random.normal(ks[0], (b, h, n, d), dtype)
    k = jax.random.normal(ks[1], (b, hkv, n_kv, d), dtype)
    v = jax.random.normal(ks[2], (b, hkv, n_kv, d), dtype)
    do = jax.random.normal(ks[3], (b, h, n, d), dtype)
    sm = d ** -0.5
    seg = None
    if segments:  # two packed sequences per row (requires n == n_kv)
        seg = (jnp.arange(n)[None, :] >= n // 2).astype(jnp.int32)
        seg = jnp.broadcast_to(seg, (b, n))

    f = lambda a, b_, c: (flash_attention(
        a, b_, c, causal=causal, window=window, logit_softcap=softcap,
        segment_ids=seg,
    ) * do).sum()
    fr = lambda a, b_, c: (reference_attention(
        a.astype(jnp.float32), b_.astype(jnp.float32), c.astype(jnp.float32),
        causal=causal, sm_scale=sm, window=window, logit_softcap=softcap,
        segment_ids=seg,
    ) * do.astype(jnp.float32)).sum()
    o = flash_attention(q, k, v, causal=causal, window=window,
                        logit_softcap=softcap, segment_ids=seg)
    oref = reference_attention(
        q.astype(jnp.float32), k.astype(jnp.float32), v.astype(jnp.float32),
        causal=causal, sm_scale=sm, window=window, logit_softcap=softcap,
        segment_ids=seg)
    g = jax.grad(f, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(fr, argnums=(0, 1, 2))(q, k, v)
    errs = [float(jnp.max(jnp.abs(o.astype(jnp.float32) - oref)))] + [
        float(jnp.max(jnp.abs(a.astype(jnp.float32) - r)))
        for a, r in zip(g, gr)
    ]
    tol = tol or (5e-2 if dtype == jnp.bfloat16 else 5e-3)
    ok = all(e < tol for e in errs)
    print(f"{'OK ' if ok else 'FAIL'} {name}: max errs "
          f"{' '.join(f'{e:.2e}' for e in errs)}  ({time.time()-t0:.0f}s)",
          flush=True)
    return ok


def main():
    print("device:", jax.devices()[0].device_kind, flush=True)
    ok = True
    bf = jnp.bfloat16
    # one route per line: (small fp32 golden shape), small bf16, mid fwd/bwd,
    # tri fwd + fused bwd, banded window, softcap, GQA, cross-length causal,
    # segmented fused (>8K)
    ok &= check("fp32 small N=256 (golden)", 2, 4, 256, 128, jnp.float32)
    ok &= check("bf16 N=512 small/mid route", 2, 4, 512, 128, bf)
    ok &= check("bf16 N=1024 mid fwd+bwd", 2, 4, 1024, 128, bf)
    ok &= check("bf16 N=2048 mid bwd ceiling", 2, 4, 2048, 128, bf)
    ok &= check("bf16 N=4096 tri fwd + fused bwd", 2, 4, 4096, 128, bf)
    if not quick:
        ok &= check("bf16 N=4096 window=1024 banded", 1, 4, 4096, 128, bf,
                    window=1024)
        ok &= check("bf16 N=2048 softcap=30", 1, 4, 2048, 128, bf,
                    softcap=30.0)
        ok &= check("bf16 N=2048 GQA 8q/2kv", 1, 8, 2048, 128, bf, hkv=2)
        ok &= check("bf16 cross-len q=1024 kv=2048", 1, 4, 1024, 128, bf,
                    n_kv=2048)
        ok &= check("bf16 N=2048 packed segments", 1, 4, 2048, 128, bf,
                    segments=True)
        ok &= check("bf16 N=12288 segmented fused bwd", 1, 2, 12288, 128, bf)
        # non-causal large-N: the split dkv/dq kernels (packed lse + dpre)
        ok &= check("bf16 N=4096 non-causal split bwd", 1, 2, 4096, 128, bf,
                    causal=False)
    print("ALL OK" if ok else "FAILURES", flush=True)
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
