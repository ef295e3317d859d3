"""Probe: forward kernel block sweep on the live TPU.

Usage: python scripts/probe_fwd.py N BQ BKV
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


import jax
import jax.numpy as jnp

from flash_attention_dlrs_tpu.bench.suite import time_fn
from flash_attention_dlrs_tpu import tuning
from flash_attention_dlrs_tpu.ops.flash_attention import flash_attention

n, bq, bkv = int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3])
b, h, d = 8, 16, 128
keys = jax.random.split(jax.random.PRNGKey(0), 3)
q = jax.random.normal(keys[0], (b, h, n, d), jnp.bfloat16)
k = jax.random.normal(keys[1], (b, h, n, d), jnp.bfloat16)
v = jax.random.normal(keys[2], (b, h, n, d), jnp.bfloat16)
bs = tuning.BlockSizes(block_q=bq, block_kv=bkv,
                       block_q_bwd=bq, block_kv_bwd=bkv)


def fn(q_, k_, v_):
    return flash_attention(q_, k_, v_, causal=True, block_sizes=bs)


sec = time_fn(fn, q, k, v)
fl = 2 * 2.0 * b * h * n * n * d * 0.5
print(f"fwd N={n} bq={bq} bkv={bkv}: {sec*1e3:8.3f} ms  {fl/sec/1e12:6.1f} TF/s")
