"""Probe: fused backward kernel block-size sweep on the live TPU.

Usage: python scripts/probe_bwd_fused.py N BQ BKV [split]
Times the backward alone (no forward), printing ms and bwd-only TF/s.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


import jax
import jax.numpy as jnp

from flash_attention_dlrs_tpu.bench.suite import time_fn
from flash_attention_dlrs_tpu.ops import (
    bwd_fused,
    flash_attention_forward,
)
from flash_attention_dlrs_tpu.ops import bwd_kernel as bwdk
from flash_attention_dlrs_tpu.ops import layout

n, bq, bkv = int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3])
split = len(sys.argv) > 4 and sys.argv[4] == "split"
b, h, d = 8, 16, 128

keys = jax.random.split(jax.random.PRNGKey(0), 4)
q = jax.random.normal(keys[0], (b, h, n, d), jnp.bfloat16)
k = jax.random.normal(keys[1], (b, h, n, d), jnp.bfloat16)
v = jax.random.normal(keys[2], (b, h, n, d), jnp.bfloat16)
do = jax.random.normal(keys[3], (b, h, n, d), jnp.bfloat16)
from flash_attention_dlrs_tpu.ops.flash_attention import lse_to_stats

o, lse = flash_attention_forward(q, k, v, causal=True)
m2, linv = lse_to_stats(lse)
m_pk = layout.pack_stat_grouped(m2.astype(jnp.float32), bq)
linv_pk = layout.pack_stat_grouped(linv.astype(jnp.float32), bq)

sm = float(d) ** -0.5


def fn(q_, k_, v_, do_, o_, m_, li_):
    if split:
        dpre = bwdk.bwd_d_pallas(o_, do_, block_q=bq)
        dk, dv = bwdk.bwd_dkv_pallas(
            q_, k_, v_, do_, m_, li_, dpre,
            sm_scale=sm, causal=True, block_q=bq, block_kv=bkv, kv_len=n)
        dq = bwdk.bwd_dq_pallas(
            q_, k_, v_, do_, m_, li_, dpre,
            sm_scale=sm, causal=True, block_q=bq, block_kv=bkv, kv_len=n)
    else:
        dq, dk, dv = bwd_fused.bwd_fused_pallas(
            q_, k_, v_, o_, do_, m_, li_,
            sm_scale=sm, causal=True, block_q=bq, block_kv=bkv, kv_len=n)
    return dq.sum() + dk.sum() + dv.sum()


sec = time_fn(fn, q, k, v, do, o, m_pk, linv_pk)
fl = 2.5 * 2 * 2.0 * b * h * n * n * d * 0.5
mode = "split" if split else "fused"
print(f"{mode} N={n} bq={bq} bkv={bkv}: {sec*1e3:8.3f} ms  {fl/sec/1e12:6.1f} TF/s")
