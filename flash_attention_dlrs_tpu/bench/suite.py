"""Benchmark suite: provider sweep over sequence lengths, CSV output.

TPU rebuild of the reference benchmark harness (reference: src/bench.py):
same workload family (B=8, H=16, d=128, N = 2^7..2^15, fwd/bwd,
src/bench.py:8-20,36), same OOM→NaN policy (src/bench.py:100-109), same
CSV-per-config output layout (src/bench.py:14,29,113).  Providers follow the
reference's competitor pattern (author kernel vs vendored tutorial vs torch
SDPA backends, src/bench.py:38-42,67-89), translated to TPU:

- ``ours``        — this repo's Pallas flash attention
- ``xla``         — naive XLA softmax(QKᵀ)V (materializes scores)
- ``jax-flash``   — jax.experimental.pallas.ops.tpu flash attention, when
                    importable (the "vendored competitor" analogue)

Timing amortizes dispatch overhead by chaining R dependent iterations inside
one jit (the axon tunnel's per-dispatch cost would otherwise dominate) —
the role of triton.testing.do_bench's warmup/rep protocol
(src/bench.py:61-62,99).
"""

from __future__ import annotations

import dataclasses
import functools
import math
import os
import time
from typing import Callable, Optional

import jax
import jax.numpy as jnp


@dataclasses.dataclass
class BenchResult:
    provider: str
    mode: str
    n: int
    ms: float
    tflops: float


def attention_flops(b, h, n_q, n_kv, d, *, causal: bool, mode: str) -> float:
    """Analytic FLOPs model: 2 matmuls × 2·B·H·Nq·Nkv·d, halved for causal,
    ×2.5 for bwd (reference model: src/flash_attention_openai_tutorial.py:630-636)."""
    if mode not in ("fwd", "bwd", "fwd+bwd"):
        raise ValueError(f"unknown mode {mode!r}")
    fl = 2 * 2.0 * b * h * n_q * n_kv * d
    if causal:
        fl *= 0.5
    if mode == "bwd":
        fl *= 2.5
    elif mode == "fwd+bwd":
        fl *= 3.5
    return fl


def _chained(fn: Callable, iters: int, anchor: str = "sum"):
    """One jit executing `iters` data-dependent calls of fn, returning a
    scalar anchor — a single dispatch + single tiny fetch regardless of
    iters.

    anchor="sum" consumes EVERY output element: a single-element anchor
    lets XLA slice pure-XLA providers down to computing one row (measured:
    jax.nn.dot_product_attention "reached" 262 TF/s at N=128 — past
    hardware peak).  anchor="elem" reads one element — valid ONLY when the
    timed fn ends in an opaque Pallas custom call (XLA cannot see through
    it to DCE), and avoids charging the kernel an extra full-output HBM
    read (~3% on a 5.7 ms kernel at B8·H16·N4096·d128 bf16)."""

    @functools.partial(jax.jit, static_argnames=())
    def chained(*a):
        def body(i, c):
            first = a[0] + c.astype(a[0].dtype)
            o = fn(first, *a[1:])
            if anchor == "elem":
                return jnp.real(jnp.ravel(o)[0]).astype(jnp.float32) * 1e-30
            return jnp.real(jnp.sum(o.astype(jnp.float32))) * 1e-30

        return jax.lax.fori_loop(
            0, iters, body, jnp.float32(0.0)
        )

    return chained


def time_fn(
    fn: Callable,
    *args,
    iters: int | None = None,
    reps: int = 5,
    min_window: float = 0.08,
    anchor: str = "sum",
) -> float:
    """Median seconds per call of fn(*args).

    The execution environment dispatches asynchronously through a tunnel
    where block_until_ready is unreliable and every dispatch/fetch costs
    milliseconds, so: run the op chained N1 and N2 times inside single jits
    (data-dependent, can't be CSE'd), force completion by fetching the
    scalar result, and take the slope (t2−t1)/(N2−N1) — constant dispatch
    and fetch overheads cancel exactly.

    With ``iters=None`` the chain length auto-calibrates so the measured
    window (N2−N1 calls) is at least ``min_window`` seconds — sub-ms ops
    through the tunnel are otherwise dominated by jitter.  N2 is rounded to
    a power of two to reuse compiled chains across providers.
    """
    def run(c):
        t0 = time.perf_counter()
        jax.device_get(c(*args))
        return time.perf_counter() - t0

    if iters is None:
        # Per-call estimate from the DIFFERENCE of two probe lengths — a
        # single probe would fold the ~ms tunnel dispatch overhead into the
        # estimate and keep the chain far too short for sub-ms ops.
        p1, p2 = _chained(fn, 4, anchor), _chained(fn, 36, anchor)
        jax.device_get(p1(*args))  # compile + warm
        jax.device_get(p2(*args))
        d1 = min(run(p1), run(p1))
        d2 = min(run(p2), run(p2))
        est = max((d2 - d1) / 32, 1e-7)
        n2 = 8
        while (n2 - n2 // 4) * est < min_window and n2 < 8192:
            n2 *= 2
    else:
        n2 = iters
    n1 = max(2, n2 // 4)
    c1, c2 = _chained(fn, n1, anchor), _chained(fn, n2, anchor)
    jax.device_get(c1(*args))  # compile + warm
    jax.device_get(c2(*args))

    slopes = []
    for _ in range(reps):
        t1, t2 = run(c1), run(c2)
        slopes.append((t2 - t1) / (n2 - n1))
    slopes.sort()
    return max(slopes[len(slopes) // 2], 1e-9)


# ---------------------------------------------------------------------------
# Providers
# ---------------------------------------------------------------------------


def _provider_ours(causal):
    from ..ops.flash_attention import flash_attention

    def fwd(q, k, v):
        return flash_attention(q, k, v, causal=causal)

    return fwd


def _provider_xla(causal):
    from ..ops.reference import reference_attention

    def fwd(q, k, v):
        if q.shape[2] >= 8192:
            # Materialized scores need B·H·N²·4 bytes (34GB at N=8192):
            # the fwd attempt OOMs quickly but the BACKWARD's grad compile
            # hangs the remote compiler for tens of minutes — don't try.
            raise NotImplementedError("naive XLA attention capped below 8K")
        return reference_attention(q, k, v, causal=causal, sm_scale=q.shape[-1] ** -0.5)

    return fwd


def _provider_jax_flash(causal):
    try:
        from jax.experimental.pallas.ops.tpu.flash_attention import (
            BlockSizes as JaxBlockSizes,
            flash_attention as jax_flash,
        )
    except ImportError:
        return None

    def fwd(q, k, v):
        # Give the competitor its best measured config (1024 blocks, same as
        # ours) rather than its conservative defaults — we compare against
        # the strongest version of it.
        n = q.shape[2]
        blk = max(128, min(1024, n))
        bs = JaxBlockSizes(
            block_q=blk, block_k_major=blk, block_k=blk, block_b=1,
            block_q_major_dkv=blk, block_k_major_dkv=blk,
            block_k_dkv=blk, block_q_dkv=blk,
            block_k_major_dq=blk, block_k_dq=blk, block_q_dq=blk,
        )
        return jax_flash(
            q, k, v, causal=causal, sm_scale=q.shape[-1] ** -0.5, block_sizes=bs
        )

    return fwd


def _provider_splash(causal):
    """jax's splash-attention Pallas kernel — the strongest public TPU
    attention, restoring the reference's independent-implementation
    cross-check role (≙ flash_attn in src/bench.py:38-42)."""
    try:
        from jax.experimental.pallas.ops.tpu.splash_attention import (
            splash_attention_kernel as sk,
            splash_attention_mask as sm,
        )
    except ImportError:
        return None

    def fwd(q, k, v):
        b, h, n, d = q.shape
        if n >= 16384:
            # measured: splash hard-crashes the TPU worker process (kernel
            # fault) at N=32K fwd and N=16K bwd, poisoning every later row —
            # record NaN without dispatching
            raise NotImplementedError("splash provider capped below N=16384")
        mask = sm.CausalMask((n, n)) if causal else sm.FullMask((n, n))
        kernel = sk.make_splash_mha_single_device(
            sm.MultiHeadMask([mask] * h)
        )
        scale = jnp.asarray(d ** -0.5, q.dtype)
        return jax.vmap(kernel)(q * scale, k, v)

    return fwd


def _provider_dpa(causal):
    """jax.nn.dot_product_attention (XLA's fused SDPA) — ≙ the torch SDPA
    backends in the reference bench (src/bench.py:76-85).  Takes BNHD, so
    the layout transposes are part of its measured cost."""

    def fwd(q, k, v):
        if q.shape[2] >= 8192:
            raise NotImplementedError("XLA SDPA capped below 8K (OOM; the "
                                      "grad compile can hang the compiler)")
        o = jax.nn.dot_product_attention(
            q.transpose(0, 2, 1, 3),
            k.transpose(0, 2, 1, 3),
            v.transpose(0, 2, 1, 3),
            is_causal=causal,
        )
        return o.transpose(0, 2, 1, 3)

    return fwd


PROVIDERS = {
    "ours": _provider_ours,
    "xla": _provider_xla,
    "jax-flash": _provider_jax_flash,
    "splash": _provider_splash,
    "dpa": _provider_dpa,
}


def run_bench(
    *,
    batch: int = 8,
    heads: int = 16,
    head_dim: int = 128,
    seq_lens=tuple(2**i for i in range(7, 16)),
    providers=("ours", "xla", "jax-flash", "splash", "dpa"),
    modes=("fwd", "bwd", "fwd+bwd"),
    causal: bool = True,
    dtype=jnp.bfloat16,
    out_dir: str = "bench_out",
    iters: int | None = None,
) -> list:
    """Sweep and write one CSV per (mode) to out_dir; failures → NaN rows
    (reference policy src/bench.py:100-109)."""
    os.makedirs(out_dir, exist_ok=True)
    results = []
    for mode in modes:
        rows = []
        for n in seq_lens:
            try:
                keys = jax.random.split(jax.random.PRNGKey(0), 3)
                q = jax.random.normal(keys[0], (batch, heads, n, head_dim), dtype)
                k = jax.random.normal(keys[1], (batch, heads, n, head_dim), dtype)
                v = jax.random.normal(keys[2], (batch, heads, n, head_dim), dtype)
            except Exception:
                q = k = v = None
            for name in providers:
                builder = PROVIDERS[name]
                fwd = builder(causal)
                ms = float("nan")
                if fwd is not None and q is not None:
                    if mode == "fwd":
                        fn = fwd
                    else:
                        def fn(q_, k_, v_, _fwd=fwd):
                            def scalar(qq, kk, vv):
                                return jnp.sum(
                                    _fwd(qq, kk, vv).astype(jnp.float32)
                                )
                            g = jax.grad(scalar, argnums=(0, 1, 2))(q_, k_, v_)
                            # consume ALL grads: returning only dq lets XLA
                            # dead-code-eliminate the dK/dV kernel entirely
                            return g[0] + g[1] + g[2]
                    # Pallas-backed providers end in opaque custom calls, so
                    # the cheap single-element anchor is DCE-safe and avoids
                    # charging them a full-output HBM read ("ours" routes
                    # tiny N to pure-XLA paths — keep the sum anchor there).
                    from ..ops.flash_attention import XLA_SMALL_MAX_N

                    pallas_backed = name in ("jax-flash", "splash") or (
                        name == "ours" and n > XLA_SMALL_MAX_N
                    )
                    anchor = "elem" if pallas_backed else "sum"
                    try:
                        sec = time_fn(fn, q, k, v, iters=iters, anchor=anchor)
                        if mode == "bwd":
                            # grad-of-scalar executes fwd+bwd; subtract the
                            # separately-timed forward so the row reports the
                            # backward alone (≙ the reference's
                            # O.backward(retain_graph=True), src/bench.py:91-94)
                            sec_f = time_fn(fwd, q, k, v, iters=iters,
                                            anchor=anchor)
                            sec = max(sec - sec_f, 1e-9)
                        ms = sec * 1e3
                    except Exception as e:  # OOM / compile failure → NaN
                        print(f"[bench] {name} {mode} N={n}: {type(e).__name__}")
                fl = attention_flops(
                    batch, heads, n, n, head_dim, causal=causal, mode=mode
                )
                tflops = fl / (ms * 1e-3) / 1e12 if ms == ms and ms > 0 else float("nan")
                rows.append((name, mode, n, ms, tflops))
                results.append(BenchResult(name, mode, n, ms, tflops))
                print(f"[bench] {name:10s} {mode} N={n:6d}: {ms:9.3f} ms  {tflops:7.1f} TF/s")
        path = os.path.join(
            out_dir, f"attn_B{batch}_H{heads}_d{head_dim}_{mode}"
            f"{'_causal' if causal else ''}.csv"
        )
        with open(path, "w") as f:
            f.write("provider,mode,N,ms,tflops\n")
            for r in rows:
                f.write(",".join(str(x) for x in r) + "\n")
    return results
