"""Hardware probe: compile + oracle-check the INT4 paged-decode route.

The in-kernel nibble unpack (shift/mask/concat on int32) is interpret-clean
but only a real Mosaic compile proves legality and VMEM fit.  Run before
benching int4.

Usage: python scripts/probe_int4_tpu.py
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import time

import jax
import jax.numpy as jnp

from flash_attention_dlrs_tpu.ops.decode import (
    paged_decode_attention,
    paged_reference_attention,
    paged_verify_attention,
    quantize_kv_pages,
)


def main():
    print("device:", jax.devices()[0].device_kind, flush=True)
    b, hq, hkv, d, ps, pps = 4, 32, 8, 128, 128, 16
    keys = jax.random.split(jax.random.PRNGKey(0), 4)
    kp = jax.random.normal(keys[0], (hkv, b * pps, ps, d), jnp.bfloat16)
    vp = jax.random.normal(keys[1], (hkv, b * pps, ps, d), jnp.bfloat16)
    q = jax.random.normal(keys[2], (b, hq, d), jnp.bfloat16)
    pidx = jnp.arange(b * pps, dtype=jnp.int32).reshape(b, pps)
    lengths = jnp.full((b,), pps * ps, jnp.int32)
    kq = quantize_kv_pages(kp, "int4")
    vq = quantize_kv_pages(vp, "int4")

    ok = True
    t0 = time.time()
    o = paged_decode_attention(q, kq, vq, lengths, pidx)
    oref = paged_reference_attention(q, kq, vq, lengths, pidx)
    err = float(jnp.max(jnp.abs(o.astype(jnp.float32) - oref.astype(jnp.float32))))
    ok &= err < 5e-2
    print(f"{'OK ' if err < 5e-2 else 'FAIL'} int4 decode: err {err:.2e} "
          f"({time.time()-t0:.0f}s)", flush=True)

    t0 = time.time()
    qt = jax.random.normal(keys[3], (b, hq, 4, d), jnp.bfloat16)
    ov = paged_verify_attention(qt, kq, vq, lengths, pidx)
    ovr = paged_reference_attention(qt[:, :, -1], kq, vq, lengths, pidx)
    errv = float(jnp.max(jnp.abs(
        ov[:, :, -1].astype(jnp.float32) - ovr.astype(jnp.float32))))
    ok &= errv < 5e-2
    print(f"{'OK ' if errv < 5e-2 else 'FAIL'} int4 verify: err {errv:.2e} "
          f"({time.time()-t0:.0f}s)", flush=True)
    print("ALL OK" if ok else "FAILURES", flush=True)
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
