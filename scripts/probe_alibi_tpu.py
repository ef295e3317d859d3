"""Hardware probe: compile + oracle-check the ALiBi kernel routes.

The separable slope term is interpret-clean (tests/test_alibi.py) but only a
real Mosaic compile proves the scalar slope-ref read and the extra iota
legalize on hardware, across every grid the feature can ride: tri, banded,
rectangular cross-length, fused and two-sweep backward.

Usage: python scripts/probe_alibi_tpu.py
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import time

import jax
import jax.numpy as jnp

from flash_attention_dlrs_tpu import alibi_slopes_for, flash_attention
from flash_attention_dlrs_tpu.ops import (
    bwd_fused,
    flash_attention_backward,
    flash_attention_forward,
    reference,
)


def _check(name, got, want, tol, t0):
    err = float(jnp.max(jnp.abs(
        jnp.asarray(got, jnp.float32) - jnp.asarray(want, jnp.float32))))
    ok = err < tol
    print(f"{'OK ' if ok else 'FAIL'} {name}: err {err:.2e} "
          f"({time.time()-t0:.0f}s)", flush=True)
    return ok


def main():
    print("device:", jax.devices()[0].device_kind, flush=True)
    ok = True
    slopes4 = alibi_slopes_for(4)

    # 1. General kernel, tri grid, bf16 (the training hot path).
    t0 = time.time()
    b, h, n, d = 2, 4, 1024, 128
    ks = jax.random.split(jax.random.PRNGKey(0), 4)
    q = jax.random.normal(ks[0], (b, h, n, d), jnp.bfloat16)
    k = jax.random.normal(ks[1], (b, h, n, d), jnp.bfloat16)
    v = jax.random.normal(ks[2], (b, h, n, d), jnp.bfloat16)
    do = jax.random.normal(ks[3], (b, h, n, d), jnp.bfloat16)
    o = flash_attention(q, k, v, causal=True, alibi_slopes=slopes4)
    oref = reference.reference_attention(
        q.astype(jnp.float32), k.astype(jnp.float32), v.astype(jnp.float32),
        causal=True, sm_scale=d ** -0.5, alibi_slopes=slopes4,
    )
    ok &= _check("fwd tri bf16 N=1024", o, oref, 3e-2, t0)

    # 2. lse contract + fused backward (jax.grad route).
    t0 = time.time()

    def loss(q_, k_, v_):
        out = flash_attention(q_, k_, v_, causal=True, alibi_slopes=slopes4)
        return jnp.sum(out.astype(jnp.float32) * do.astype(jnp.float32))

    dq, dk, dv = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
    rq, rk, rv = reference.reference_attention_grads(
        q.astype(jnp.float32), k.astype(jnp.float32), v.astype(jnp.float32),
        do.astype(jnp.float32), causal=True, sm_scale=d ** -0.5,
        alibi_slopes=slopes4,
    )
    ok &= _check("bwd fused dq", dq, rq, 6e-2, t0)
    ok &= _check("bwd fused dk", dk, rk, 6e-2, t0)
    ok &= _check("bwd fused dv", dv, rv, 6e-2, t0)

    # 3. Banded window grid.
    t0 = time.time()
    ow = flash_attention(q, k, v, causal=True, window=300,
                         alibi_slopes=slopes4)
    owref = reference.reference_attention(
        q.astype(jnp.float32), k.astype(jnp.float32), v.astype(jnp.float32),
        causal=True, sm_scale=d ** -0.5, window=300, alibi_slopes=slopes4,
    )
    ok &= _check("fwd banded window", ow, owref, 3e-2, t0)

    # 4. Rectangular cross-length grid (q_off != 0), fp32.
    t0 = time.time()
    nq = 512
    qs = jax.random.normal(ks[0], (1, 4, nq, d), jnp.float32)
    kf = jax.random.normal(ks[1], (1, 4, n, d), jnp.float32)
    vf = jax.random.normal(ks[2], (1, 4, n, d), jnp.float32)
    oc = flash_attention(qs, kf, vf, causal=True, sm_scale=1.0,
                         alibi_slopes=slopes4)
    ocref = reference.reference_attention(
        qs, kf, vf, causal=True, sm_scale=1.0, alibi_slopes=slopes4
    )
    ok &= _check("fwd cross-length fp32", oc, ocref, 2e-4, t0)

    # 5. Two-sweep backward (fused path disabled).
    t0 = time.time()
    orig_pick, orig_fit = bwd_fused.pick_fused_blocks, bwd_fused.fused_bwd_fits_vmem
    bwd_fused.pick_fused_blocks = lambda *a, **kw: None
    bwd_fused.fused_bwd_fits_vmem = lambda *a, **kw: False
    try:
        of, lse = flash_attention_forward(qs, kf, vf, causal=True,
                                          sm_scale=1.0, alibi_slopes=slopes4)
        dof = jax.random.normal(ks[3], (1, 4, nq, d), jnp.float32)
        # Default path: ALiBi auto-rederives raw (m, 1/l) stats on-device
        # (bit-cancelling recompute — no combined-lse roundtrip).
        dq2, dk2, dv2 = flash_attention_backward(
            qs, kf, vf, of, dof, lse, causal=True, sm_scale=1.0,
            alibi_slopes=slopes4,
        )
        # Forced combined-lse mode: the reference-parity contract, which
        # carries an intrinsic information floor — exp2(s − lse·log2e)
        # loses ulp(lse), and the ALiBi bias raises |lse| to O(slope·col)
        # ≈ 256 here, so ulp ≈ 3e-5 relative P error amplifies through
        # (dP − D) into ~2e-3 gradients (measured 1.95-2.09e-3 across
        # round 3; the floor, not a kernel defect).
        dq3, dk3, dv3 = flash_attention_backward(
            qs, kf, vf, of, dof, lse, causal=True, sm_scale=1.0,
            alibi_slopes=slopes4, rederive_stats=False,
        )
    finally:
        bwd_fused.pick_fused_blocks = orig_pick
        bwd_fused.fused_bwd_fits_vmem = orig_fit
    rq2, rk2, rv2 = reference.reference_attention_grads(
        qs, kf, vf, dof, causal=True, sm_scale=1.0, alibi_slopes=slopes4
    )
    # Rederived-stat path: the raw-stat floor — same 1e-3 class as the
    # plain two-sweep; dv (no stat roundtrip either way) pins the
    # slope-replay exactness.
    ok &= _check("bwd two-sweep dq", dq2, rq2, 1e-3, t0)
    ok &= _check("bwd two-sweep dk", dk2, rk2, 1e-3, t0)
    ok &= _check("bwd two-sweep dv", dv2, rv2, 1e-3, t0)
    ok &= _check("bwd two-sweep dq (lse mode)", dq3, rq2, 4e-3, t0)
    ok &= _check("bwd two-sweep dk (lse mode)", dk3, rk2, 4e-3, t0)

    print("ALL OK" if ok else "FAILURES", flush=True)
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
