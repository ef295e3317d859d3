"""Pallas backward kernels for flash attention (recomputation-based).

TPU-native redesign of the reference backward path:

- ``bwd_d_pallas`` ≙ the D-preprocess kernel ``bwd_D_kernel``
  (reference: src/flash_attention_kernels.py:120-166): D = rowsum(O ∘ dO).
- ``bwd_dkv_pallas`` + ``bwd_dq_pallas`` replace BOTH reference backward
  variants (lock-based ``bwd_kernel``, src/flash_attention_kernels.py:175-334,
  and the broken ticket-ordered ``bwd_deterministic_kernel``, :343-496).
  The entire lock/ticket apparatus (spinlock via atomic_cas :305-320,
  first-writer-initializes :308-315, ticket ordering :470-484) is
  deliberately NOT ported: the dQ reduction is restructured as its own
  kernel with the KV dimension as a sequential ("arbitrary") grid axis, so
  determinism is a structural property of the TPU grid, not a kernel
  variant.

Both kernels recompute P from the saved logsumexp exactly as the reference
does (src/flash_attention_kernels.py:283-285), with fp32 accumulators.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .. import geometry as geo
from . import layout
from .fwd_kernel import (
    DEFAULT_MASK_VALUE, LN2, LOG2E, _tri_decode, adapt_optional_refs,
    dropout_keep_mask, mxu_dot, seed_block_spec, seed_input,
    slope_block_spec, slope_input,
)


def _tri_decode_upper(p_id, num_q_blocks: int):
    """Map a linear index over the upper-triangular (jkv, iq) block space
    (iq ≥ jkv) to coordinates: row jkv owns T − jkv steps, iq = jkv, …, T−1.

    The dK/dV mirror of :func:`fwd_kernel._tri_decode` — same compacted-grid
    trick, transposed to the KV-parallel/Q-sequential loop structure.
    """
    T = num_q_blocks
    jkv = jnp.int32(0)
    for t in range(1, T):
        jkv = jnp.where(p_id >= t * T - t * (t - 1) // 2, jnp.int32(t), jkv)
    iq = jkv + (p_id - (jkv * T - jkv * (jkv - 1) // 2))
    return jkv, iq


# ---------------------------------------------------------------------------
# D preprocess: D = rowsum(O ∘ dO)
# ---------------------------------------------------------------------------


def _bwd_d_kernel(o_ref, do_ref, d_ref):
    o = o_ref[0, 0].astype(jnp.float32)
    do = do_ref[0, 0].astype(jnp.float32)
    d = jnp.sum(o * do, axis=-1, keepdims=True)  # [block_q, 1]
    k = o_ref.shape[2] // geo.NUM_LANES  # dense stat rows of this q block
    d_ref[0, 0, :k, :] = layout.column_to_lanes(d)


@functools.partial(jax.jit, static_argnames=("block_q", "interpret"))
def bwd_d_pallas(o, do, *, block_q: int, interpret: bool = False):
    """D = rowsum(O ∘ dO), fp32, GROUPED packed stat layout (layout.py):
    [B, H, (Nq/block_q)·stat_rows, 128], the same block_q grouping the
    consuming dKV/dQ kernels read."""
    batch, heads, n_q, head_dim = o.shape
    grid = (batch, heads, n_q // block_q)
    s_rows = layout.stat_rows(block_q)
    spec = pl.BlockSpec((1, 1, block_q, head_dim), lambda b, h, i: (b, h, i, 0))
    return pl.pallas_call(
        _bwd_d_kernel,
        grid=grid,
        in_specs=[spec, spec],
        out_specs=pl.BlockSpec(
            (1, 1, s_rows, geo.NUM_LANES),
            lambda b, h, i: (b, h, i, 0),
        ),
        out_shape=jax.ShapeDtypeStruct(
            (batch, heads, (n_q // block_q) * s_rows, geo.NUM_LANES),
            jnp.float32,
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel"),
        ),
        interpret=interpret,
    )(o, do)


# ---------------------------------------------------------------------------
# Shared masked-P recomputation
# ---------------------------------------------------------------------------


def _recompute_p(q, k, m2, linv, iq, jkv, *, scale2, causal, kv_len,
                 block_q, block_kv, apply_mask, window=0, softcap=0.0,
                 qseg=None, kvseg=None, q_off=0, slope=None):
    """P = exp2(c·QKᵀ − m₂)·(1/l) with causal/length masking, where
    c = scale2 = sm_scale·log2e is applied to the f32 scores POST-dot
    (same op order as every forward kernel — no q round-trip, no bf16
    re-rounding of scaled q) and (m₂, 1/l) are the forward's RAW softmax
    stats ([block_q, 1] columns).

    ≙ src/flash_attention_kernels.py:283-285, but recomputing from the raw
    stats instead of the combined logsumexp: exp2's argument (s − m₂) is
    then BIT-IDENTICAL to the forward's, so the recompute error cancels in
    dS (measured v5e fp32: max|ΔP| 3e-8 vs 5e-5 via lse — which amplified
    to ~3e-3 in dQ/dK through the (dP−D) cancellation).  The public
    lse-only path synthesizes (m₂ = lse·log2e, 1/l = 1), reproducing the
    combined-lse behavior.

    Empty (fully-masked) rows carry m₂ = +BIG, 1/l = 0 ⇒ p = 0 with no
    inf/NaN.

    ``slope`` (scalar fp32, base-2 units m·log2e, or None) enables ALiBi in
    separable form: the caller's stats must then be the SEPARABLE-convention
    ones (the forward kernels' own output) so that
    exp2(s + m₂·col − m₂_sep)·(1/l_sep) reproduces the forward's P exactly.
    The bias has no Q/K dependence, so the dS chain rule is unchanged.
    """
    s = mxu_dot(q, k, (((1,), (1,)), ((), ()))) * scale2
    grad_cap = None
    if softcap:
        c2 = softcap * LOG2E
        s = c2 * jnp.tanh(s * (1.0 / c2))
        # d(cap·tanh(S/cap))/dS = 1 − tanh² = 1 − (S_c/cap)², scale-invariant
        grad_cap = 1.0 - (s * (1.0 / c2)) ** 2
    if slope is not None:
        colp = (
            jax.lax.broadcasted_iota(jnp.int32, (block_q, block_kv), 1)
            + jkv * block_kv
        )
        s = s + slope * colp.astype(jnp.float32)
    if apply_mask:
        mask = None
        if causal:
            row = jax.lax.broadcasted_iota(jnp.int32, (block_q, block_kv), 0)
            col = jax.lax.broadcasted_iota(jnp.int32, (block_q, block_kv), 1)
            # Bottom-right alignment (q_off = kv_len - q_len, see fwd_kernel)
            mask = (row + iq * block_q + q_off) >= (col + jkv * block_kv)
            if window:
                wm = (row + iq * block_q + q_off) - (
                    col + jkv * block_kv) < window
                mask = jnp.logical_and(mask, wm)
        if kv_len % block_kv != 0:
            col = jax.lax.broadcasted_iota(jnp.int32, (block_q, block_kv), 1)
            lm = (col + jkv * block_kv) < kv_len
            mask = lm if mask is None else jnp.logical_and(mask, lm)
        if qseg is not None:
            seg = qseg[:, :1] == kvseg[:1, :]  # [block_q, block_kv]
            mask = seg if mask is None else jnp.logical_and(mask, seg)
        s = jnp.where(mask, s, DEFAULT_MASK_VALUE)
        if q_off or qseg is not None:
            # Synthesized stats (public path) give fully-masked rows
            # m₂ = −BIG with 1/l = 1: exp2(s − (−BIG)) would be +inf.
            # Their p must be exactly 0 — mask it.  (Internal raw stats
            # are inf-safe via 1/l = 0, but the select is off the hot
            # path and keeps both conventions correct.)
            return jnp.where(mask, jnp.exp2(s - m2) * linv, 0.0), grad_cap
        return jnp.exp2(s - m2) * linv, grad_cap
    return jnp.exp2(s - m2) * linv, grad_cap


def _mask_split(causal, kv_len, block_q, block_kv, iq, jkv, should_run, body,
                segmented=False, window=0, q_off=0):
    """Run `body(apply_mask)` under pl.when, masking only diagonal-crossing
    and KV-tail blocks (interior blocks skip the iota/select work).  Packed
    segments have data-dependent boundaries, so every block masks."""
    if segmented:
        if should_run is True:
            body(True)
        else:
            pl.when(should_run)(lambda: body(True))
        return
    needs = None
    if causal:
        needs = (jkv + 1) * block_kv - 1 > iq * block_q + q_off
        if window:
            edge = jkv * block_kv < (iq + 1) * block_q + q_off - window
            needs = jnp.logical_or(needs, edge)
    if kv_len % block_kv != 0:
        tail = (jkv + 1) * block_kv > kv_len
        needs = tail if needs is None else jnp.logical_or(needs, tail)
    if needs is None:
        pl.when(should_run)(lambda: body(False))
    else:
        pl.when(jnp.logical_and(should_run, needs))(lambda: body(True))
        pl.when(jnp.logical_and(should_run, jnp.logical_not(needs)))(
            lambda: body(False)
        )


# ---------------------------------------------------------------------------
# dK/dV kernel: parallel over KV blocks, sequential over Q blocks
# ---------------------------------------------------------------------------


def _bwd_dkv_kernel(
    q_ref,
    k_ref,
    v_ref,
    do_ref,
    m_ref,  # grouped-packed fwd row-max stats (base-2)
    linv_ref,  # grouped-packed fwd 1/l stats
    dpre_ref,
    qseg_ref,  # [1, block_q // LANES, LANES] int32 packed (flat = q rows) or None
    kvseg_ref,  # [1, SUBLANES, block_kv] int32 or None
    slope_ref,  # [1, LANES] fp32 per-head ALiBi slope (m·log2e), or None
    seed_ref,  # [1, LANES] int32 dropout seed, or None
    dk_ref,
    dv_ref,
    dk_acc,
    dv_acc,
    *,
    sm_scale,
    causal,
    kv_len,
    block_q,
    block_kv,
    num_q_blocks,
    tri=False,
    window=0,
    band_w=0,
    softcap=0.0,
    q_off=0,
    dropout_rate=0.0,
):
    _pid_b, _pid_h = pl.program_id(0), pl.program_id(1)
    if band_w:
        # Transposed band: for kv block jkv, walk q rows iq = jkv … jkv+W−1
        # (only rows whose window reaches back into jkv).
        jkv = pl.program_id(2)
        j = pl.program_id(3)
        iq = jkv + j
        is_first = j == 0  # iq == jkv, always valid
        should_run = jnp.logical_and(
            iq <= num_q_blocks - 1,
            (jkv + 1) * block_kv - 1 >= iq * block_q - window + 1,
        )
    elif tri:
        jkv, iq = _tri_decode_upper(pl.program_id(2), num_q_blocks)
        is_first = iq == jkv
        should_run = True
    else:
        jkv = pl.program_id(2)
        iq = pl.program_id(3)
        is_first = iq == 0
        if causal:
            should_run = (iq + 1) * block_q - 1 + q_off >= jkv * block_kv
            if window:
                should_run = jnp.logical_and(
                    should_run,
                    (jkv + 1) * block_kv - 1 >= iq * block_q + q_off
                    - window + 1,
                )
        else:
            should_run = True

    @pl.when(is_first)
    def _init():
        dk_acc[...] = jnp.zeros_like(dk_acc)
        dv_acc[...] = jnp.zeros_like(dv_acc)

    def _compute(apply_mask):
        q = q_ref[0, 0]
        k = k_ref[0, 0]
        v = v_ref[0, 0]
        do = do_ref[0, 0]
        # Grouped packed stat layout (layout.py): the block's dense
        # block_q/128 rows of the stat_rows-tall tile -> [block_q, 1].
        _k = block_q // geo.NUM_LANES
        m2 = layout.lanes_to_column(m_ref[0, 0, :_k, :])
        linv = layout.lanes_to_column(linv_ref[0, 0, :_k, :])
        dpre = layout.lanes_to_column(dpre_ref[0, 0, :_k, :])

        p, grad_cap = _recompute_p(
            q, k, m2, linv, iq, jkv,
            scale2=sm_scale * LOG2E,
            causal=causal, kv_len=kv_len,
            block_q=block_q, block_kv=block_kv, apply_mask=apply_mask,
            window=window, softcap=softcap,
            # Packed q seg ids -> [block_q, 1] column (same relayout as the
            # stats above; only runs on mask-applying steps).
            qseg=None if qseg_ref is None
            else layout.lanes_to_column(qseg_ref[0]),
            kvseg=None if kvseg_ref is None else kvseg_ref[0],
            q_off=q_off,
            slope=None if slope_ref is None else slope_ref[0, 0, 0],
        )
        pd, m_drop = p, None
        if dropout_rate:
            # Regenerate the forward's exact element-indexed mask (see
            # fwd_kernel.dropout_keep_mask); block geometry is irrelevant.
            rowg = jax.lax.broadcasted_iota(
                jnp.int32, (block_q, block_kv), 0) + iq * block_q
            colg = jax.lax.broadcasted_iota(
                jnp.int32, (block_q, block_kv), 1) + jkv * block_kv
            m_drop = dropout_keep_mask(
                seed_ref[0, 0], _pid_b, _pid_h,
                rowg, colg, dropout_rate,
            )
            pd = p * m_drop
        # dV += P_dropᵀ dO  (≙ src/flash_attention_kernels.py:287)
        dv_acc[...] += mxu_dot(pd.astype(do.dtype), do, (((0,), (0,)), ((), ())))
        # dP = dO Vᵀ   (≙ :289)
        dp = mxu_dot(do, v, (((1,), (1,)), ((), ())))
        # dS = P ∘ (M∘dP − D)  (≙ :291; M = dropout keep/scale, D already
        # equals rowsum(P_drop∘dP) = rowsum(O∘dO)).  No per-element scale
        # here: q is RAW, so dK = sm_scale·dSᵀQ — sm_scale lives in the
        # epilogue.
        if m_drop is not None:
            dp = dp * m_drop
        ds = p * (dp - dpre)
        if grad_cap is not None:  # soft-cap chain rule
            ds = ds * grad_cap
        # dK += dSᵀ Q  (≙ :293)
        dk_acc[...] += mxu_dot(ds.astype(q.dtype), q, (((0,), (0,)), ((), ())))

    _mask_split(causal, kv_len, block_q, block_kv, iq, jkv, should_run,
                _compute, segmented=qseg_ref is not None, window=window,
                q_off=q_off)

    # Banded mode: the last steps of a row can be skipped (window ran out or
    # iq fell off the grid), so write the running accumulators on every
    # active step — the buffer's final content is flushed when the output
    # block index changes.
    store_now = should_run if band_w else (iq == num_q_blocks - 1)

    @pl.when(store_now)
    def _store():
        dk_ref[0, 0] = (dk_acc[...] * sm_scale).astype(dk_ref.dtype)
        dv_ref[0, 0] = dv_acc[...].astype(dv_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=(
        "sm_scale", "causal", "block_q", "block_kv", "kv_len", "window",
        "softcap", "interpret", "q_off", "alibi_slopes", "dropout_rate"
    ),
)
def bwd_dkv_pallas(
    q, k, v, do, m2, linv, dpre, q_seg=None, kv_seg=None,
    dropout_seed=None, *,
    sm_scale, causal, block_q, block_kv, kv_len, window=0, softcap=0.0,
    interpret=False, q_off=0, alibi_slopes=None, dropout_rate=0.0,
):
    """dK, dV per *query* head: [B, Hq, Nkv_pad, d] fp32.

    ``m2``/``linv``: the forward's grouped-packed raw stats (row max in
    base-2 units; 1/l) — see _recompute_p.

    GQA note: outputs are per-q-head; the caller group-sums over the q-head
    axis to get per-kv-head grads (one cheap XLA reduction) — writing
    directly to shared KV-head blocks from a head-parallel grid would race.
    """
    batch, num_q_heads, n_q, head_dim = q.shape
    _, num_kv_heads, n_kv, _ = k.shape
    q_per_kv = num_q_heads // num_kv_heads
    grid = (batch, num_q_heads, n_kv // block_kv, n_q // block_q)


    num_q_blocks = n_q // block_q
    banded = (causal and window > 0 and n_q == n_kv and block_q == block_kv
              and q_off == 0)
    band_w = 0
    if banded:
        band_w = min((block_kv + window - 2) // block_q + 1, num_q_blocks)
    tri = (causal and window == 0 and n_q == n_kv and block_q == block_kv
           and q_off == 0)
    kernel = functools.partial(
        _bwd_dkv_kernel,
        sm_scale=float(sm_scale),
        causal=causal, kv_len=kv_len,
        block_q=block_q, block_kv=block_kv,
        num_q_blocks=num_q_blocks, tri=tri, window=window, band_w=band_w,
        softcap=float(softcap), q_off=q_off,
        dropout_rate=float(dropout_rate),
    )
    if banded:
        grid = (batch, num_q_heads, n_kv // block_kv, band_w)

        def q_index(b, h, jkv, j):
            iq = jnp.minimum(jkv + j, num_q_blocks - 1)
            return (b, h, iq, 0)

        def kv_index(b, h, jkv, j):
            return (b, h // q_per_kv, jkv, 0)

        def dkv_index(b, h, jkv, j):
            return (b, h, jkv, 0)

        dimension_semantics = ("parallel", "parallel", "parallel", "arbitrary")
    elif tri:
        # Compacted upper-triangular grid (see fwd_kernel): only the
        # iq ≥ jkv steps exist; no skipped grid steps, no index clamping.
        grid = (batch, num_q_heads, num_q_blocks * (num_q_blocks + 1) // 2)

        def q_index(b, h, p):
            return (b, h, _tri_decode_upper(p, num_q_blocks)[1], 0)

        def kv_index(b, h, p):
            return (b, h // q_per_kv, _tri_decode_upper(p, num_q_blocks)[0], 0)

        def dkv_index(b, h, p):
            return (b, h, _tri_decode_upper(p, num_q_blocks)[0], 0)

        dimension_semantics = ("parallel", "parallel", "arbitrary")
    else:
        if causal:
            # Early (above-diagonal) Q blocks are skipped; clamp their index
            # so the pipeline doesn't fetch them (see fwd_kernel.py kv_index).
            def iq_c(jkv, iq):
                lo = jnp.clip(
                    (jkv * block_kv - q_off) // block_q, 0, num_q_blocks - 1
                )
                return jnp.maximum(iq, lo)
        else:
            def iq_c(jkv, iq):
                return iq

        def q_index(b, h, jkv, iq):
            return (b, h, iq_c(jkv, iq), 0)

        def kv_index(b, h, jkv, iq):
            return (b, h // q_per_kv, jkv, 0)

        def dkv_index(b, h, jkv, iq):
            return (b, h, jkv, 0)

        dimension_semantics = ("parallel", "parallel", "parallel", "arbitrary")

    q_spec = pl.BlockSpec((1, 1, block_q, head_dim), q_index)
    kv_spec = pl.BlockSpec((1, 1, block_kv, head_dim), kv_index)
    stat_spec = pl.BlockSpec(
        (1, 1, layout.stat_rows(block_q), geo.NUM_LANES), q_index
    )
    dkv_spec = pl.BlockSpec((1, 1, block_kv, head_dim), dkv_index)
    in_specs = [q_spec, kv_spec, kv_spec, q_spec, stat_spec, stat_spec,
                stat_spec]
    inputs = [q, k, v, do, m2, linv, dpre]
    if q_seg is not None:
        # Grouped packed q seg ids (layout.py; same grouping as the stats) —
        # >= 16x less HBM traffic than the round-1 lane replication.  kv
        # stays sublane-replicated (8x only; the kernel wants a row).
        qseg_packed = layout.pack_stat_grouped(
            q_seg.astype(jnp.int32)[:, None, :], block_q
        )[:, 0]
        kvseg_rep = jnp.broadcast_to(
            kv_seg.astype(jnp.int32)[:, None, :],
            (batch, geo.NUM_SUBLANES, n_kv),
        )
        in_specs.append(pl.BlockSpec(
            (1, layout.stat_rows(block_q), geo.NUM_LANES),
            lambda *idx: (idx[0], q_index(*idx)[2], 0),
        ))
        in_specs.append(pl.BlockSpec(
            (1, geo.NUM_SUBLANES, block_kv),
            lambda *idx: (idx[0], 0, kv_index(*idx)[2]),
        ))
        inputs += [qseg_packed, kvseg_rep]
    if alibi_slopes is not None:
        in_specs.append(slope_block_spec())
        inputs.append(slope_input(alibi_slopes, num_q_heads))
    if dropout_rate > 0.0:
        in_specs.append(seed_block_spec())
        inputs.append(seed_input(dropout_seed))
    kernel = adapt_optional_refs(
        kernel, n_lead=7, segmented=q_seg is not None,
        has_slope=alibi_slopes is not None,
        has_seed=dropout_rate > 0.0,
    )
    dk, dv = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=[dkv_spec, dkv_spec],
        out_shape=[
            jax.ShapeDtypeStruct((batch, num_q_heads, n_kv, head_dim), jnp.float32),
            jax.ShapeDtypeStruct((batch, num_q_heads, n_kv, head_dim), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((block_kv, head_dim), jnp.float32),
            pltpu.VMEM((block_kv, head_dim), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=dimension_semantics,
        ),
        interpret=interpret,
    )(*inputs)
    return dk, dv


# ---------------------------------------------------------------------------
# dQ kernel: parallel over Q blocks, sequential over KV blocks
# ---------------------------------------------------------------------------


def _bwd_dq_kernel(
    q_ref,
    k_ref,
    v_ref,
    do_ref,
    m_ref,  # grouped-packed fwd row-max stats (base-2)
    linv_ref,  # grouped-packed fwd 1/l stats
    dpre_ref,
    qseg_ref,  # [1, block_q, LANES] int32 or None
    kvseg_ref,  # [1, SUBLANES, block_kv] int32 or None
    slope_ref,  # [1, LANES] fp32 per-head ALiBi slope (m·log2e), or None
    seed_ref,  # [1, LANES] int32 dropout seed, or None
    dq_ref,
    dq_acc,
    *,
    sm_scale,
    causal,
    kv_len,
    block_q,
    block_kv,
    num_kv_blocks,
    tri=False,
    window=0,
    band_w=0,
    softcap=0.0,
    q_off=0,
    dropout_rate=0.0,
):
    _pid_b, _pid_h = pl.program_id(0), pl.program_id(1)
    if band_w:
        # Banded sliding-window grid: axis 3 walks the ≤ band_w kv blocks a
        # q row's window can touch (see fwd_kernel).
        iq = pl.program_id(2)
        j = pl.program_id(3)
        jkv = iq - (band_w - 1) + j
        is_last = j == band_w - 1  # diagonal block, always valid
        should_run = jnp.logical_and(
            jkv >= 0,
            (jkv + 1) * block_kv - 1 >= iq * block_q - window + 1,
        )
    elif tri:
        iq, jkv = _tri_decode(pl.program_id(2), num_kv_blocks)
        is_last = jkv == iq
        should_run = True
    else:
        iq = pl.program_id(2)
        jkv = pl.program_id(3)
        is_last = jkv == num_kv_blocks - 1
        if causal:
            should_run = (iq + 1) * block_q - 1 + q_off >= jkv * block_kv
            if window:
                should_run = jnp.logical_and(
                    should_run,
                    (jkv + 1) * block_kv - 1 >= iq * block_q + q_off
                    - window + 1,
                )
        else:
            should_run = True

    @pl.when((j == 0) if band_w else (jkv == 0))
    def _init():
        dq_acc[...] = jnp.zeros_like(dq_acc)

    def _compute(apply_mask):
        q = q_ref[0, 0]
        k = k_ref[0, 0]
        v = v_ref[0, 0]
        do = do_ref[0, 0]
        # Grouped packed stat layout (layout.py): the block's dense
        # block_q/128 rows of the stat_rows-tall tile -> [block_q, 1].
        _k = block_q // geo.NUM_LANES
        m2 = layout.lanes_to_column(m_ref[0, 0, :_k, :])
        linv = layout.lanes_to_column(linv_ref[0, 0, :_k, :])
        dpre = layout.lanes_to_column(dpre_ref[0, 0, :_k, :])

        p, grad_cap = _recompute_p(
            q, k, m2, linv, iq, jkv,
            scale2=sm_scale * LOG2E,
            causal=causal, kv_len=kv_len,
            block_q=block_q, block_kv=block_kv, apply_mask=apply_mask,
            window=window, softcap=softcap,
            qseg=None if qseg_ref is None
            else layout.lanes_to_column(qseg_ref[0, :_k, :]),
            kvseg=None if kvseg_ref is None else kvseg_ref[0],
            q_off=q_off,
            slope=None if slope_ref is None else slope_ref[0, 0, 0],
        )
        dp = mxu_dot(do, v, (((1,), (1,)), ((), ())))
        if dropout_rate:
            rowg = jax.lax.broadcasted_iota(
                jnp.int32, (block_q, block_kv), 0) + iq * block_q
            colg = jax.lax.broadcasted_iota(
                jnp.int32, (block_q, block_kv), 1) + jkv * block_kv
            dp = dp * dropout_keep_mask(
                seed_ref[0, 0], _pid_b, _pid_h,
                rowg, colg, dropout_rate,
            )
        # No per-element sm_scale multiply: k is unscaled here, so the true
        # scale is applied once to dQ in the store epilogue (O(B_r·d)).
        ds = p * (dp - dpre)
        if grad_cap is not None:  # soft-cap chain rule
            ds = ds * grad_cap
        # dQ += dS K — accumulated over the sequential KV grid axis; this is
        # the reduction the reference serialized with a spinlock
        # (src/flash_attention_kernels.py:305-320).  No lock needed here.
        dq_acc[...] += mxu_dot(ds.astype(k.dtype), k, (((1,), (0,)), ((), ())))

    _mask_split(causal, kv_len, block_q, block_kv, iq, jkv, should_run,
                _compute, segmented=qseg_ref is not None, window=window,
                q_off=q_off)

    @pl.when(is_last)
    def _store():
        dq_ref[0, 0] = (dq_acc[...] * sm_scale).astype(dq_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=(
        "sm_scale", "causal", "block_q", "block_kv", "kv_len", "window",
        "softcap", "interpret", "q_off", "alibi_slopes", "dropout_rate"
    ),
)
def bwd_dq_pallas(
    q, k, v, do, m2, linv, dpre, q_seg=None, kv_seg=None,
    dropout_seed=None, *,
    sm_scale, causal, block_q, block_kv, kv_len, window=0, softcap=0.0,
    interpret=False, q_off=0, alibi_slopes=None, dropout_rate=0.0,
):
    """dQ: [B, Hq, Nq_pad, d] fp32 (``m2``/``linv``: grouped-packed raw
    fwd stats, see _recompute_p)."""
    batch, num_q_heads, n_q, head_dim = q.shape
    _, num_kv_heads, n_kv, _ = k.shape
    q_per_kv = num_q_heads // num_kv_heads
    grid = (batch, num_q_heads, n_q // block_q, n_kv // block_kv)


    num_kv_blocks = n_kv // block_kv
    banded = (causal and window > 0 and n_q == n_kv and block_q == block_kv
              and q_off == 0)
    band_w = 0
    if banded:
        band_w = min((block_q + window - 2) // block_kv + 1, num_kv_blocks)
    tri = (causal and window == 0 and n_q == n_kv and block_q == block_kv
           and q_off == 0)
    kernel = functools.partial(
        _bwd_dq_kernel,
        sm_scale=sm_scale, causal=causal, kv_len=kv_len,
        block_q=block_q, block_kv=block_kv,
        num_kv_blocks=num_kv_blocks, tri=tri, window=window, band_w=band_w,
        softcap=float(softcap), q_off=q_off,
        dropout_rate=float(dropout_rate),
    )
    if banded:
        num_q_blocks = n_q // block_q
        grid = (batch, num_q_heads, num_q_blocks, band_w)

        def q_index(b, h, iq, j):
            return (b, h, iq, 0)

        def kv_index(b, h, iq, j):
            jkv = jnp.clip(iq - (band_w - 1) + j, 0, num_kv_blocks - 1)
            return (b, h // q_per_kv, jkv, 0)

        dimension_semantics = ("parallel", "parallel", "parallel", "arbitrary")
    elif tri:
        # Compacted lower-triangular grid (see fwd_kernel._tri_decode).
        num_q_blocks = n_q // block_q
        grid = (batch, num_q_heads, num_q_blocks * (num_q_blocks + 1) // 2)

        def q_index(b, h, p):
            return (b, h, _tri_decode(p, num_q_blocks)[0], 0)

        def kv_index(b, h, p):
            return (b, h // q_per_kv, _tri_decode(p, num_q_blocks)[1], 0)

        dimension_semantics = ("parallel", "parallel", "arbitrary")
    else:
        if causal:
            def jkv_c(iq, jkv):
                hi = jnp.clip(
                    ((iq + 1) * block_q - 1 + q_off) // block_kv,
                    0, num_kv_blocks - 1,
                )
                return jnp.minimum(jkv, hi)
        else:
            def jkv_c(iq, jkv):
                return jkv

        def q_index(b, h, iq, jkv):
            return (b, h, iq, 0)

        def kv_index(b, h, iq, jkv):
            return (b, h // q_per_kv, jkv_c(iq, jkv), 0)

        dimension_semantics = ("parallel", "parallel", "parallel", "arbitrary")

    q_spec = pl.BlockSpec((1, 1, block_q, head_dim), q_index)
    kv_spec = pl.BlockSpec((1, 1, block_kv, head_dim), kv_index)
    stat_spec = pl.BlockSpec(
        (1, 1, layout.stat_rows(block_q), geo.NUM_LANES), q_index
    )
    in_specs = [q_spec, kv_spec, kv_spec, q_spec, stat_spec, stat_spec,
                stat_spec]
    inputs = [q, k, v, do, m2, linv, dpre]
    if q_seg is not None:
        # Grouped packed q seg ids (layout.py; same grouping as the stats).
        qseg_packed = layout.pack_stat_grouped(
            q_seg.astype(jnp.int32)[:, None, :], block_q
        )[:, 0]
        kvseg_rep = jnp.broadcast_to(
            kv_seg.astype(jnp.int32)[:, None, :],
            (batch, geo.NUM_SUBLANES, n_kv),
        )
        in_specs.append(pl.BlockSpec(
            (1, layout.stat_rows(block_q), geo.NUM_LANES),
            lambda *idx: (idx[0], q_index(*idx)[2], 0),
        ))
        in_specs.append(pl.BlockSpec(
            (1, geo.NUM_SUBLANES, block_kv),
            lambda *idx: (idx[0], 0, kv_index(*idx)[2]),
        ))
        inputs += [qseg_packed, kvseg_rep]
    if alibi_slopes is not None:
        in_specs.append(slope_block_spec())
        inputs.append(slope_input(alibi_slopes, num_q_heads))
    if dropout_rate > 0.0:
        in_specs.append(seed_block_spec())
        inputs.append(seed_input(dropout_seed))
    kernel = adapt_optional_refs(
        kernel, n_lead=7, segmented=q_seg is not None,
        has_slope=alibi_slopes is not None,
        has_seed=dropout_rate > 0.0,
    )
    dq = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, 1, block_q, head_dim), q_index),
        out_shape=jax.ShapeDtypeStruct(
            (batch, num_q_heads, n_q, head_dim), jnp.float32
        ),
        scratch_shapes=[pltpu.VMEM((block_q, head_dim), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=dimension_semantics,
        ),
        interpret=interpret,
    )(*inputs)
    return dq
