"""Isolate Mosaic's MXU dot throughput vs XLA's, at the strip kernel's
shapes (round-5 scratch probe).

Cases (all bf16 operands, f32 accum, one [B·H]-cell grid like the strip
kernel, K/V panes VMEM-resident):

  score-only   — per column block: ONE tall score dot, accumulate raw
  score+pv     — + bf16 cast + PV dot (the dots-only attention skeleton)
  onedot       — one [n, d]·[d, n] whole-pane score dot per cell
  deepchain    — score dots with d-contraction chained as one
                 [n,d]·[d,wide] per column but column width 1024

Prints TF/s against the PLAIN dot FLOPs (no causal discount — these are
full rectangles).  Reference: XLA batched dot at the same shape measures
~190 TF/s (bench_out/roofline_matmul.json); the strip kernel's in-kernel
dots-only ablation measures ~157-162.
"""

import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/fa_tpu_jit_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from flash_attention_dlrs_tpu.bench.suite import time_fn
from flash_attention_dlrs_tpu import geometry as geo
from flash_attention_dlrs_tpu.ops.fwd_kernel import mxu_dot


def make_kernel(mode, n, d, wide):
    t = n // wide

    def kernel(q_ref, k_ref, v_ref, o_ref):
        q = q_ref[0, 0]
        acc = jnp.zeros((n, d), jnp.float32)
        if mode == "onedot":
            k_all = k_ref[0, 0]
            s = mxu_dot(q, k_all, (((1,), (1,)), ((), ())))
            acc = mxu_dot(
                s.astype(jnp.bfloat16), v_ref[0, 0], (((1,), (0,)), ((), ()))
            )
        else:
            for jb in range(t):
                kb = k_ref[0, 0, jb * wide:(jb + 1) * wide, :]
                s = mxu_dot(q, kb, (((1,), (1,)), ((), ())))
                if mode == "score-only":
                    acc = acc + s[:, :d]
                else:  # score+pv
                    vb = v_ref[0, 0, jb * wide:(jb + 1) * wide, :]
                    acc = acc + mxu_dot(
                        s.astype(jnp.bfloat16), vb, (((1,), (0,)), ((), ()))
                    )
        o_ref[0, 0] = acc.astype(o_ref.dtype)

    return kernel


def make_flash_kernel(n, d, wide, stagger):
    """Full online softmax, NON-causal, state kept tall — no per-chain
    slicing, no concat, scale pre-folded into q.  Measures the ceiling of
    a softmax-bearing tall kernel."""
    t = n // wide

    def kernel(q_ref, k_ref, v_ref, o_ref):
        q = q_ref[0, 0]

        def score(jb):
            return mxu_dot(
                q, k_ref[0, 0, jb * wide:(jb + 1) * wide, :],
                (((1,), (1,)), ((), ())),
            )

        def merge(jb, s, carry):
            m, l, acc = carry
            m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
            alpha = jnp.exp2(m - m_new)
            p = jnp.exp2(s - m_new)
            l = l * alpha + jnp.sum(p, axis=-1, keepdims=True)
            vb = v_ref[0, 0, jb * wide:(jb + 1) * wide, :]
            acc = acc * alpha + mxu_dot(
                p.astype(jnp.bfloat16), vb, (((1,), (0,)), ((), ()))
            )
            return m_new, l, acc

        carry = (
            jnp.full((n, 1), -1e30, jnp.float32),
            jnp.zeros((n, 1), jnp.float32),
            jnp.zeros((n, d), jnp.float32),
        )
        if stagger:
            s_cur = score(0)
            for jb in range(t):
                s_next = score(jb + 1) if jb + 1 < t else None
                carry = merge(jb, s_cur, carry)
                s_cur = s_next
        else:
            for jb in range(t):
                carry = merge(jb, score(jb), carry)
        m, l, acc = carry
        o_ref[0, 0] = (acc / l).astype(o_ref.dtype)

    return kernel


def run_flash(b, h, n, d, wide, stagger):
    keys = jax.random.split(jax.random.PRNGKey(0), 3)
    q = jax.random.normal(keys[0], (b, h, n, d), jnp.bfloat16)
    k = jax.random.normal(keys[1], (b, h, n, d), jnp.bfloat16)
    v = jax.random.normal(keys[2], (b, h, n, d), jnp.bfloat16)
    spec = pl.BlockSpec((1, 1, n, d), lambda b_, h_: (b_, h_, 0, 0))

    @jax.jit
    def fn(q_, k_, v_):
        return pl.pallas_call(
            make_flash_kernel(n, d, wide, stagger),
            grid=(b, h),
            in_specs=[spec, spec, spec],
            out_specs=spec,
            out_shape=jax.ShapeDtypeStruct(q_.shape, jnp.bfloat16),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel"),
                vmem_limit_bytes=geo.scoped_vmem_limit(),
            ),
        )(q_, k_, v_)

    sec = time_fn(fn, q, k, v, anchor="elem")
    fl = 4.0 * b * h * n * n * d
    print(f"flash-nc{'-stag' if stagger else ''} n={n} wide={wide}: "
          f"{fl/sec/1e12:7.1f} TF/s ({sec*1e3:.3f} ms)")


def make_bands_kernel(n, d, wide, bh):
    """flash-nc with band-height state: nb = n/bh independent row bands,
    each doing t = n/wide serial merges; emission column-sync (cross-band
    ILP).  Non-causal — measures how merge HEIGHT affects throughput."""
    t = n // wide
    nb = n // bh

    def kernel(q_ref, k_ref, v_ref, o_ref):
        def merge(r, jb, carry):
            m, l, acc = carry
            qb = q_ref[0, 0, r * bh:(r + 1) * bh, :]
            s = mxu_dot(
                qb, k_ref[0, 0, jb * wide:(jb + 1) * wide, :],
                (((1,), (1,)), ((), ())),
            )
            m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
            alpha = jnp.exp2(m - m_new)
            p = jnp.exp2(s - m_new)
            l = l * alpha + jnp.sum(p, axis=-1, keepdims=True)
            vb = v_ref[0, 0, jb * wide:(jb + 1) * wide, :]
            acc = acc * alpha + mxu_dot(
                p.astype(jnp.bfloat16), vb, (((1,), (0,)), ((), ()))
            )
            return m_new, l, acc

        carries = [
            (
                jnp.full((bh, 1), -1e30, jnp.float32),
                jnp.zeros((bh, 1), jnp.float32),
                jnp.zeros((bh, d), jnp.float32),
            )
            for _ in range(nb)
        ]
        for jb in range(t):
            for r in range(nb):
                carries[r] = merge(r, jb, carries[r])
        for r, (m, l, acc) in enumerate(carries):
            o_ref[0, 0, r * bh:(r + 1) * bh, :] = (acc / l).astype(
                o_ref.dtype
            )

    return kernel


def make_causal_bands_kernel(n, d, wide, bh, diag_sub):
    """TRUE causal band kernel: visible [bh, wide] merges below the
    diagonal + a masked diagonal block.  diag_sub == bh → one masked
    [bh, bh] merge (50% MXU waste on the diagonal block); diag_sub < bh →
    the diagonal block is decomposed into diag_sub-edge sub-blocks (waste
    bh·diag_sub/2) at the cost of smaller ops."""
    nb = n // bh
    assert wide == bh, "probe: columns == bands"

    def kernel(q_ref, k_ref, v_ref, o_ref):
        row = jax.lax.broadcasted_iota(jnp.int32, (bh, bh), 0)
        col = jax.lax.broadcasted_iota(jnp.int32, (bh, bh), 1)
        dmask = row >= col

        def merge(r, jb, carry, masked):
            m, l, acc = carry
            qb = q_ref[0, 0, r * bh:(r + 1) * bh, :]
            s = mxu_dot(
                qb, k_ref[0, 0, jb * wide:(jb + 1) * wide, :],
                (((1,), (1,)), ((), ())),
            )
            if masked:
                s = jnp.where(dmask, s, -1e30)
            m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
            alpha = jnp.exp2(m - m_new)
            p = jnp.exp2(s - m_new)
            l = l * alpha + jnp.sum(p, axis=-1, keepdims=True)
            vb = v_ref[0, 0, jb * wide:(jb + 1) * wide, :]
            acc = acc * alpha + mxu_dot(
                p.astype(jnp.bfloat16), vb, (((1,), (0,)), ((), ()))
            )
            return m_new, l, acc

        carries = [
            (
                jnp.full((bh, 1), -1e30, jnp.float32),
                jnp.zeros((bh, 1), jnp.float32),
                jnp.zeros((bh, d), jnp.float32),
            )
            for _ in range(nb)
        ]
        # diagonal blocks first (seed), then column-sync visible merges
        for r in range(nb):
            carries[r] = merge(r, r, carries[r], True)
        for jb in range(nb - 1):
            for r in range(jb + 1, nb):
                carries[r] = merge(r, jb, carries[r], False)
        for r, (m, l, acc) in enumerate(carries):
            o_ref[0, 0, r * bh:(r + 1) * bh, :] = (acc / l).astype(
                o_ref.dtype
            )

    return kernel


def make_p5sim_kernel(n, d, bh, sub, concat_where):
    """Exact emulation of fwd_mid pipeline=5's static structure: fine
    sub-chains on the diagonal band (diag mask + partial in-band merges),
    concat into band state (concat_where='seed') or keep separate and
    lse-combine at the end (concat_where='end'), then [bh, bh] band
    interior merges column-sync."""
    nb = n // bh
    spb = bh // sub

    def kernel(q_ref, k_ref, v_ref, o_ref):
        row = jax.lax.broadcasted_iota(jnp.int32, (sub, sub), 0)
        col = jax.lax.broadcasted_iota(jnp.int32, (sub, sub), 1)
        dmask = row >= col

        def merge(qb, col0, width, carry, masked=False):
            m, l, acc = carry
            s = mxu_dot(
                qb, k_ref[0, 0, col0:col0 + width, :],
                (((1,), (1,)), ((), ())),
            )
            if masked:
                s = jnp.where(dmask, s, -1e30)
            m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
            alpha = jnp.exp2(m - m_new)
            p = jnp.exp2(s - m_new)
            l = l * alpha + jnp.sum(p, axis=-1, keepdims=True)
            vb = v_ref[0, 0, col0:col0 + width, :]
            acc = acc * alpha + mxu_dot(
                p.astype(jnp.bfloat16), vb, (((1,), (0,)), ((), ()))
            )
            return m_new, l, acc

        def init(hgt):
            return (
                jnp.full((hgt, 1), -1e30, jnp.float32),
                jnp.zeros((hgt, 1), jnp.float32),
                jnp.zeros((hgt, d), jnp.float32),
            )

        # fine diagonal phase
        diag_states = []
        for r in range(nb):
            subchains = []
            for c in range(spb):
                iq = r * spb + c
                qi = q_ref[0, 0, iq * sub:(iq + 1) * sub, :]
                carry = merge(qi, iq * sub, sub, init(sub), True)
                if c:
                    carry = merge(qi, r * bh, c * sub, carry)
                subchains.append(carry)
            diag_states.append(tuple(
                jnp.concatenate([s[i] for s in subchains], axis=0)
                for i in range(3)
            ))
        # band interior phase
        if concat_where == "seed":
            bands = diag_states
        else:
            bands = [init(bh) for _ in range(nb)]
        for g in range(nb - 1):
            for r in range(g + 1, nb):
                qb = q_ref[0, 0, r * bh:(r + 1) * bh, :]
                bands[r] = merge(qb, g * bh, bh, bands[r])
        if concat_where == "end":
            out = []
            for r in range(nb):
                m_a, l_a, acc_a = bands[r]
                m_d, l_d, acc_d = diag_states[r]
                m_t = jnp.maximum(m_a, m_d)
                a_a = jnp.exp2(m_a - m_t)
                a_d = jnp.exp2(m_d - m_t)
                out.append((m_t, l_a * a_a + l_d * a_d,
                            acc_a * a_a + acc_d * a_d))
            bands = out
        for r, (m, l, acc) in enumerate(bands):
            o_ref[0, 0, r * bh:(r + 1) * bh, :] = (acc / l).astype(
                o_ref.dtype
            )

    return kernel


def make_p5i_kernel(n, d, bh, sub):
    """p5sim with END-combine and the fine diagonal chains' ops
    INTERLEAVED into the band-interior emission: fine ops are independent
    of band merges, so they can fill the scheduler's MXU/VPU gaps."""
    nb = n // bh
    spb = bh // sub

    def kernel(q_ref, k_ref, v_ref, o_ref):
        row = jax.lax.broadcasted_iota(jnp.int32, (sub, sub), 0)
        col = jax.lax.broadcasted_iota(jnp.int32, (sub, sub), 1)
        dmask = row >= col

        def merge(qb, col0, width, carry, masked=False):
            m, l, acc = carry
            s = mxu_dot(
                qb, k_ref[0, 0, col0:col0 + width, :],
                (((1,), (1,)), ((), ())),
            )
            if masked:
                s = jnp.where(dmask, s, -1e30)
            m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
            alpha = jnp.exp2(m - m_new)
            p = jnp.exp2(s - m_new)
            l = l * alpha + jnp.sum(p, axis=-1, keepdims=True)
            vb = v_ref[0, 0, col0:col0 + width, :]
            acc = acc * alpha + mxu_dot(
                p.astype(jnp.bfloat16), vb, (((1,), (0,)), ((), ()))
            )
            return m_new, l, acc

        def init(hgt):
            return (
                jnp.full((hgt, 1), -1e30, jnp.float32),
                jnp.zeros((hgt, 1), jnp.float32),
                jnp.zeros((hgt, d), jnp.float32),
            )

        # fine-chain op queue: (chain_id, thunk) in dependency order per
        # chain; chains round-robin
        fine = {}
        fine_ops = []
        for r in range(nb):
            for c in range(spb):
                iq = r * spb + c
                qi = q_ref[0, 0, iq * sub:(iq + 1) * sub, :]
                fine_ops.append(
                    (iq, functools.partial(merge, qi, iq * sub, sub,
                                           masked=True))
                )
                if c:
                    fine_ops.append(
                        (iq, functools.partial(merge, qi, r * bh, c * sub))
                    )
        fine = {iq: init(sub) for iq in range(nb * spb)}
        band_ops = []
        for g in range(nb - 1):
            for r in range(g + 1, nb):
                qb = q_ref[0, 0, r * bh:(r + 1) * bh, :]
                band_ops.append(
                    (r, functools.partial(merge, qb, g * bh, bh))
                )
        bands = [init(bh) for _ in range(nb)]
        # interleave: ~len(fine_ops)/len(band_ops) fine ops per band op
        fi = 0
        for bi, (r, op) in enumerate(band_ops):
            bands[r] = op(carry=bands[r])
            lim = (bi + 1) * len(fine_ops) // len(band_ops)
            while fi < lim:
                iq, fop = fine_ops[fi]
                fine[iq] = fop(carry=fine[iq])
                fi += 1
        while fi < len(fine_ops):
            iq, fop = fine_ops[fi]
            fine[iq] = fop(carry=fine[iq])
            fi += 1
        # end-combine fine chains into their band rows
        out = []
        for r in range(nb):
            m_d = jnp.concatenate(
                [fine[r * spb + c][0] for c in range(spb)], axis=0)
            l_d = jnp.concatenate(
                [fine[r * spb + c][1] for c in range(spb)], axis=0)
            acc_d = jnp.concatenate(
                [fine[r * spb + c][2] for c in range(spb)], axis=0)
            m_a, l_a, acc_a = bands[r]
            m_t = jnp.maximum(m_a, m_d)
            a_a = jnp.exp2(m_a - m_t)
            a_d = jnp.exp2(m_d - m_t)
            out.append((m_t, l_a * a_a + l_d * a_d,
                        acc_a * a_a + acc_d * a_d))
        for r, (m, l, acc) in enumerate(out):
            o_ref[0, 0, r * bh:(r + 1) * bh, :] = (acc / l).astype(
                o_ref.dtype
            )

    return kernel


def run_p5i(b, h, n, d, bh, sub):
    keys = jax.random.split(jax.random.PRNGKey(0), 3)
    q = jax.random.normal(keys[0], (b, h, n, d), jnp.bfloat16)
    k = jax.random.normal(keys[1], (b, h, n, d), jnp.bfloat16)
    v = jax.random.normal(keys[2], (b, h, n, d), jnp.bfloat16)
    spec = pl.BlockSpec((1, 1, n, d), lambda b_, h_: (b_, h_, 0, 0))

    @jax.jit
    def fn(q_, k_, v_):
        return pl.pallas_call(
            make_p5i_kernel(n, d, bh, sub),
            grid=(b, h),
            in_specs=[spec, spec, spec],
            out_specs=spec,
            out_shape=jax.ShapeDtypeStruct(q_.shape, jnp.bfloat16),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel"),
                vmem_limit_bytes=geo.scoped_vmem_limit(),
            ),
        )(q_, k_, v_)

    sec = time_fn(fn, q, k, v, anchor="elem")
    fl = 2.0 * b * h * n * n * d
    print(f"p5i n={n} bh={bh} sub={sub}: {fl/sec/1e12:7.1f} TF/s "
          f"({sec*1e3:.3f} ms) [causal FLOPs]")


def make_p2sim_kernel(n, d, sub, hb):
    """Exact emulation of fwd_mid pipeline=2 (sub-granular chains, diag
    seeds, column-sync ws=1 merges) with ``hb`` heads per grid cell —
    chains from different heads interleave in emission, multiplying the
    independent-op pool for Mosaic's static scheduler."""
    t = n // sub

    def kernel(q_ref, k_ref, v_ref, o_ref):
        row = jax.lax.broadcasted_iota(jnp.int32, (sub, sub), 0)
        col = jax.lax.broadcasted_iota(jnp.int32, (sub, sub), 1)
        dmask = row >= col

        def merge(j, qb, col0, width, carry, masked=False):
            m, l, acc = carry
            s = mxu_dot(
                qb, k_ref[0, j, col0:col0 + width, :],
                (((1,), (1,)), ((), ())),
            )
            if masked:
                s = jnp.where(dmask, s, -1e30)
            m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
            alpha = jnp.exp2(m - m_new)
            p = jnp.exp2(s - m_new)
            l = l * alpha + jnp.sum(p, axis=-1, keepdims=True)
            vb = v_ref[0, j, col0:col0 + width, :]
            acc = acc * alpha + mxu_dot(
                p.astype(jnp.bfloat16), vb, (((1,), (0,)), ((), ()))
            )
            return m_new, l, acc

        chains = {}
        for j in range(hb):
            for iq in range(t):
                qi = q_ref[0, j, iq * sub:(iq + 1) * sub, :]
                chains[(j, iq)] = merge(
                    j, qi, iq * sub, sub,
                    (
                        jnp.full((sub, 1), -1e30, jnp.float32),
                        jnp.zeros((sub, 1), jnp.float32),
                        jnp.zeros((sub, d), jnp.float32),
                    ),
                    True,
                )
        for jk in range(t - 1):
            for j in range(hb):
                for iq in range(jk + 1, t):
                    qi = q_ref[0, j, iq * sub:(iq + 1) * sub, :]
                    chains[(j, iq)] = merge(
                        j, qi, jk * sub, sub, chains[(j, iq)]
                    )
        for (j, iq), (m, l, acc) in chains.items():
            o_ref[0, j, iq * sub:(iq + 1) * sub, :] = (acc / l).astype(
                o_ref.dtype
            )

    return kernel


def run_p2sim(b, h, n, d, sub, hb):
    keys = jax.random.split(jax.random.PRNGKey(0), 3)
    q = jax.random.normal(keys[0], (b, h, n, d), jnp.bfloat16)
    k = jax.random.normal(keys[1], (b, h, n, d), jnp.bfloat16)
    v = jax.random.normal(keys[2], (b, h, n, d), jnp.bfloat16)
    spec = pl.BlockSpec((1, hb, n, d), lambda b_, h_: (b_, h_, 0, 0))

    @jax.jit
    def fn(q_, k_, v_):
        return pl.pallas_call(
            make_p2sim_kernel(n, d, sub, hb),
            grid=(b, h // hb),
            in_specs=[spec, spec, spec],
            out_specs=spec,
            out_shape=jax.ShapeDtypeStruct(q_.shape, jnp.bfloat16),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel"),
                vmem_limit_bytes=geo.scoped_vmem_limit(),
            ),
        )(q_, k_, v_)

    sec = time_fn(fn, q, k, v, anchor="elem")
    fl = 2.0 * b * h * n * n * d
    print(f"p2sim n={n} sub={sub} hb={hb}: {fl/sec/1e12:7.1f} TF/s "
          f"({sec*1e3:.3f} ms) [causal FLOPs]")


def run_p5sim(b, h, n, d, bh, sub, concat_where):
    keys = jax.random.split(jax.random.PRNGKey(0), 3)
    q = jax.random.normal(keys[0], (b, h, n, d), jnp.bfloat16)
    k = jax.random.normal(keys[1], (b, h, n, d), jnp.bfloat16)
    v = jax.random.normal(keys[2], (b, h, n, d), jnp.bfloat16)
    spec = pl.BlockSpec((1, 1, n, d), lambda b_, h_: (b_, h_, 0, 0))

    @jax.jit
    def fn(q_, k_, v_):
        return pl.pallas_call(
            make_p5sim_kernel(n, d, bh, sub, concat_where),
            grid=(b, h),
            in_specs=[spec, spec, spec],
            out_specs=spec,
            out_shape=jax.ShapeDtypeStruct(q_.shape, jnp.bfloat16),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel"),
                vmem_limit_bytes=geo.scoped_vmem_limit(),
            ),
        )(q_, k_, v_)

    sec = time_fn(fn, q, k, v, anchor="elem")
    fl = 2.0 * b * h * n * n * d
    print(f"p5sim n={n} bh={bh} sub={sub} {concat_where}: "
          f"{fl/sec/1e12:7.1f} TF/s ({sec*1e3:.3f} ms) [causal FLOPs]")


def run_causal_bands(b, h, n, d, bh):
    keys = jax.random.split(jax.random.PRNGKey(0), 3)
    q = jax.random.normal(keys[0], (b, h, n, d), jnp.bfloat16)
    k = jax.random.normal(keys[1], (b, h, n, d), jnp.bfloat16)
    v = jax.random.normal(keys[2], (b, h, n, d), jnp.bfloat16)
    spec = pl.BlockSpec((1, 1, n, d), lambda b_, h_: (b_, h_, 0, 0))

    @jax.jit
    def fn(q_, k_, v_):
        return pl.pallas_call(
            make_causal_bands_kernel(n, d, bh, bh, bh),
            grid=(b, h),
            in_specs=[spec, spec, spec],
            out_specs=spec,
            out_shape=jax.ShapeDtypeStruct(q_.shape, jnp.bfloat16),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel"),
                vmem_limit_bytes=geo.scoped_vmem_limit(),
            ),
        )(q_, k_, v_)

    sec = time_fn(fn, q, k, v, anchor="elem")
    fl = 2.0 * b * h * n * n * d  # causal FLOPs model (headline-comparable)
    print(f"causal-bands n={n} bh={bh}: {fl/sec/1e12:7.1f} TF/s "
          f"({sec*1e3:.3f} ms) [causal FLOPs model]")


def run_bands(b, h, n, d, wide, bh):
    keys = jax.random.split(jax.random.PRNGKey(0), 3)
    q = jax.random.normal(keys[0], (b, h, n, d), jnp.bfloat16)
    k = jax.random.normal(keys[1], (b, h, n, d), jnp.bfloat16)
    v = jax.random.normal(keys[2], (b, h, n, d), jnp.bfloat16)
    spec = pl.BlockSpec((1, 1, n, d), lambda b_, h_: (b_, h_, 0, 0))

    @jax.jit
    def fn(q_, k_, v_):
        return pl.pallas_call(
            make_bands_kernel(n, d, wide, bh),
            grid=(b, h),
            in_specs=[spec, spec, spec],
            out_specs=spec,
            out_shape=jax.ShapeDtypeStruct(q_.shape, jnp.bfloat16),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel"),
                vmem_limit_bytes=geo.scoped_vmem_limit(),
            ),
        )(q_, k_, v_)

    sec = time_fn(fn, q, k, v, anchor="elem")
    fl = 4.0 * b * h * n * n * d
    print(f"flash-nc-bands n={n} wide={wide} bh={bh}: "
          f"{fl/sec/1e12:7.1f} TF/s ({sec*1e3:.3f} ms)")


def run(mode, b, h, n, d, wide):
    keys = jax.random.split(jax.random.PRNGKey(0), 3)
    q = jax.random.normal(keys[0], (b, h, n, d), jnp.bfloat16)
    k = jax.random.normal(keys[1], (b, h, n, d), jnp.bfloat16)
    v = jax.random.normal(keys[2], (b, h, n, d), jnp.bfloat16)
    spec = pl.BlockSpec((1, 1, n, d), lambda b_, h_: (b_, h_, 0, 0))

    @jax.jit
    def fn(q_, k_, v_):
        return pl.pallas_call(
            make_kernel(mode, n, d, wide),
            grid=(b, h),
            in_specs=[spec, spec, spec],
            out_specs=spec,
            out_shape=jax.ShapeDtypeStruct(q_.shape, jnp.bfloat16),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel"),
                vmem_limit_bytes=geo.scoped_vmem_limit(),
            ),
        )(q_, k_, v_)

    sec = time_fn(fn, q, k, v, anchor="elem")
    fl = 2.0 * b * h * n * n * d * (1 if mode == "score-only" else 2)
    print(f"{mode:12s} n={n} wide={wide}: {fl/sec/1e12:7.1f} TF/s "
          f"({sec*1e3:.3f} ms)")


if __name__ == "__main__":
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", default="flash")
    args = ap.parse_args()
    b, h, n, d = 8, 16, 4096, 128
    if args.mode == "dots":
        for mode in ("score-only", "score+pv"):
            for wide in (256, 1024, 4096):
                run(mode, b, h, n, d, wide)
        run("onedot", b, h, n, d, 4096)
    elif args.mode == "causal":
        for bh in (512, 1024, 2048):
            run_causal_bands(b, h, n, d, bh)
    elif args.mode == "p5sim":
        for cw in ("seed", "end"):
            run_p5sim(b, h, n, d, 1024, 256, cw)
    elif args.mode == "p5i":
        for bh in (1024, 512):
            run_p5i(b, h, n, d, bh, 256)
    elif args.mode == "p2sim":
        run_p2sim(b, h, n, d, 256, 1)
        run_p2sim(b, h, n, d, 256, 2)
    elif args.mode == "p2sim512":
        run_p2sim(b, h, n, d, 512, 2)
        run_p2sim(b, h, n, d, 512, 4)
    elif args.mode == "bands":
        for wide, bh in ((1024, 512), (1024, 1024), (1024, 2048),
                         (2048, 1024), (2048, 2048), (512, 1024)):
            run_bands(b, h, n, d, wide, bh)
    else:
        for wide in (256, 512, 1024):
            for stagger in (False, True):
                run_flash(b, h, n, d, wide, stagger)
