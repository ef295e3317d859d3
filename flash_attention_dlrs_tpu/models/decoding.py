"""Prefill + decode-step programs for the flagship model.

Inference data path (north star): prefill runs the causal flash kernel over
the prompt and emits per-layer K/V for the paged cache; the decode step is
ONE jitted dispatch per token — embeds the batch's current tokens, and per
layer (unrolled Python loop, static): projects QKV, applies RoPE at the
absolute position, scatters the new K/V into the donated page pools
(quantizing on write for INT8/FP8 caches), and attends over the pages with
:func:`..ops.decode.paged_decode_attention`.  Static shapes everywhere
(slots × max pages), so XLA compiles exactly one decode program.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from ..ops.decode import paged_decode_attention
from ..ops.quantization import (
    INT4_QMAX,
    Int4QuantizedTensor,
    QuantizedTensor,
    pack_int4_rows,
    qmax_for,
)
from ..ops.reference import alibi_slopes_for
from .transformer import (
    ModelConfig, _proj, layer_window, mlp_block, rms_norm, rope,
    unembed_matrix,
)


class KVPools(NamedTuple):
    """Per-layer page pools (tuples of [Hkv, P, page_size, d] arrays)."""

    k: Tuple[jax.Array, ...]
    v: Tuple[jax.Array, ...]
    k_scales: Optional[Tuple[jax.Array, ...]]  # [Hkv, P, page_size, 1]
    v_scales: Optional[Tuple[jax.Array, ...]]

    @property
    def quantized(self) -> bool:
        return self.k_scales is not None

    @property
    def int4(self) -> bool:
        """INT4-packed pools: payload rows are HALF the scale rows (two
        tokens per byte; ops.quantization split-half packing)."""
        return (
            self.k_scales is not None
            and self.k[0].shape[-2] * 2 == self.k_scales[0].shape[-2]
        )


def init_kv_pools(
    cfg: ModelConfig,
    *,
    num_pages: int,
    page_size: int = 128,
    dtype=jnp.bfloat16,
    quantized: bool = False,
) -> KVPools:
    # Pools pad head_dim to the 128-lane multiple: the decode kernel's page
    # DMA requires a lane-aligned trailing dim (Mosaic tiling constraint).
    from .. import geometry as geo
    d_pad = geo.current_geometry().round_up(cfg.head_dim)
    int4 = isinstance(dtype, str) and dtype == "int4"
    if int4:
        if page_size % 2:
            raise ValueError(f"int4 pools need an even page_size, got {page_size}")
        quantized, dtype = True, jnp.int8  # packed payload bytes
    store_ps = page_size // 2 if int4 else page_size
    shape = (cfg.n_kv_heads, num_pages, store_ps, d_pad)
    k = tuple(jnp.zeros(shape, dtype) for _ in range(cfg.n_layers))
    v = tuple(jnp.zeros(shape, dtype) for _ in range(cfg.n_layers))
    if quantized:
        sshape = (cfg.n_kv_heads, num_pages, page_size, 1)
        ks = tuple(jnp.ones(sshape, jnp.float32) for _ in range(cfg.n_layers))
        vs = tuple(jnp.ones(sshape, jnp.float32) for _ in range(cfg.n_layers))
        return KVPools(k, v, ks, vs)
    return KVPools(k, v, None, None)


def _quantize_rows(x: jax.Array, dtype) -> Tuple[jax.Array, jax.Array]:
    """Per-row symmetric quantization along the last axis."""
    x = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(x), axis=-1, keepdims=True)
    scale = jnp.where(amax == 0.0, 1.0, amax / qmax_for(dtype))
    payload = x / scale
    if jnp.dtype(dtype) == jnp.dtype(jnp.int8):
        payload = jnp.round(payload)
    return payload.astype(dtype), scale


def _quantize_rows_int4(x: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Per-row symmetric int4: values int32 in [-8, 7] (unpacked) + scale."""
    x = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(x), axis=-1, keepdims=True)
    scale = jnp.where(amax == 0.0, 1.0, amax / INT4_QMAX)
    q = jnp.clip(jnp.round(x / scale), -8, INT4_QMAX).astype(jnp.int32)
    return q, scale


def _int4_insert(pool, rows, offs, vals_q):
    """Read-modify-write per-token int4 values into a packed pool.

    pool: [Hkv, P, page_size/2, d] int8 (split-half packed); rows/offs:
    [N] page row + in-page token offset per insert; vals_q: [Hkv, N, d]
    int32 in [-8, 7].  Token offset o lives at byte row o (low nibble) when
    o < page_size/2, else byte row o - page_size/2 (high nibble) — the
    other nibble is preserved, so concurrent halves never clobber.
    """
    half = pool.shape[-2]
    brow = jnp.where(offs < half, offs, offs - half)
    is_low = (offs < half)[None, :, None]
    old = pool[:, rows, brow].astype(jnp.int32)
    v = vals_q & 0xF
    merged = jnp.where(is_low, (old & ~0xF) | v, (old & 0xF) | (v << 4))
    return pool.at[:, rows, brow].set(merged.astype(jnp.int8))


# ---------------------------------------------------------------------------
# Prefill
# ---------------------------------------------------------------------------


def _cfg_slopes(cfg: ModelConfig):
    """Per-head ALiBi slopes for an alibi-positioned config, else None (rope
    applies rotations instead).  Every serving step threads this through to
    the paged kernels' separable slope term (ops/decode.py)."""
    if cfg.position_encoding == "alibi":
        return alibi_slopes_for(cfg.n_q_heads)
    if cfg.position_encoding != "rope":
        raise ValueError(
            f"unknown position_encoding {cfg.position_encoding!r} "
            f"(expected 'rope' or 'alibi')"
        )
    return None


def make_prefill(cfg: ModelConfig, *, interpret: Optional[bool] = None):
    """jitted (params, tokens [B,T], lengths [B]) -> (last-token logits [B,V],
    per-layer K/V [L][B, Hkv, T, d]).  T is padded; `lengths` masks RoPE-side
    nothing (positions are absolute), attention is causal so padding rows
    only attend backwards and are discarded."""
    slopes = _cfg_slopes(cfg)

    @jax.jit
    def prefill(params, tokens, lengths):
        from ..ops.flash_attention import flash_attention

        b, t = tokens.shape
        positions = jnp.broadcast_to(jnp.arange(t), (b, t))
        x = params["embed"][tokens]
        if cfg.embed_scale:
            x = x * jnp.asarray(cfg.d_model ** 0.5, x.dtype)
        kvs = []
        for li, layer in enumerate(params["layers"]):
            h = rms_norm(x, layer["attn_norm"], cfg.norm_eps)
            q = _proj(h, layer["wq"], layer.get("bq")).reshape(
                b, t, cfg.n_q_heads, cfg.head_dim)
            k = _proj(h, layer["wk"], layer.get("bk")).reshape(
                b, t, cfg.n_kv_heads, cfg.head_dim)
            v = _proj(h, layer["wv"], layer.get("bv")).reshape(
                b, t, cfg.n_kv_heads, cfg.head_dim)
            if slopes is None:
                q = rope(q, positions, cfg.rope_theta, cfg.rope_scaling)
                k = rope(k, positions, cfg.rope_theta, cfg.rope_scaling)
            kvs.append((k.transpose(0, 2, 1, 3), v.transpose(0, 2, 1, 3)))
            o = flash_attention(
                q.transpose(0, 2, 1, 3),
                kvs[-1][0],
                kvs[-1][1],
                causal=True,
                sm_scale=cfg.sm_scale,
                window=layer_window(cfg, li),
                logit_softcap=cfg.attn_softcap,
                alibi_slopes=slopes,
                interpret=interpret,
            )
            o = o.transpose(0, 2, 1, 3).reshape(b, t, -1)
            out = _proj(o, layer["wo"])
            if "post_attn_norm" in layer:
                out = rms_norm(out, layer["post_attn_norm"], cfg.norm_eps)
            x = x + out
            x = mlp_block(layer, x, cfg.norm_eps, cfg.mlp_act)
        x = rms_norm(x, params["final_norm"], cfg.norm_eps)
        last = jnp.take_along_axis(
            x, (lengths - 1)[:, None, None].astype(jnp.int32), axis=1
        )[:, 0]
        logits = jnp.dot(
            last, unembed_matrix(params).T, preferred_element_type=jnp.float32
        )
        if cfg.final_softcap:
            c = cfg.final_softcap
            logits = c * jnp.tanh(logits / c)
        return logits, kvs

    return prefill


# ---------------------------------------------------------------------------
# Decode step
# ---------------------------------------------------------------------------


def make_decode_step(
    cfg: ModelConfig,
    *,
    pages_per_block: int | None = None,
    interpret: Optional[bool] = None,
    _jit: bool = True,
):
    """jitted decode step, KV pools donated (in-place page scatter).
    ``_jit=False`` returns the raw traceable body (for composition inside a
    larger jitted program, e.g. the fused speculative draft loop).

    (params, pools, tokens [B], positions [B], page_rows [B], page_offs [B],
     page_tbl [B, pages_per_seq], lengths [B]) -> (logits [B, V], pools)

    `positions` is the absolute index of the incoming token; `lengths` must
    already count it (attention covers the token itself).
    """
    slopes = _cfg_slopes(cfg)

    def decode_step(params, pools: KVPools, tokens, positions, page_rows,
                    page_offs, page_tbl, lengths):
        b = tokens.shape[0]
        x = params["embed"][tokens]  # [B, dm]
        if cfg.embed_scale:
            x = x * jnp.asarray(cfg.d_model ** 0.5, x.dtype)
        new_k, new_v = list(pools.k), list(pools.v)
        new_ks = list(pools.k_scales) if pools.quantized else None
        new_vs = list(pools.v_scales) if pools.quantized else None

        for li, layer in enumerate(params["layers"]):
            h = rms_norm(x, layer["attn_norm"], cfg.norm_eps)
            q = _proj(h, layer["wq"], layer.get("bq")).reshape(
                b, cfg.n_q_heads, cfg.head_dim)
            k = _proj(h, layer["wk"], layer.get("bk")).reshape(
                b, cfg.n_kv_heads, cfg.head_dim)
            v = _proj(h, layer["wv"], layer.get("bv")).reshape(
                b, cfg.n_kv_heads, cfg.head_dim)
            if slopes is None:
                # RoPE at absolute positions ([B,1] sequence of length 1).
                q = rope(q[:, None], positions[:, None], cfg.rope_theta, cfg.rope_scaling)[:, 0]
                k = rope(k[:, None], positions[:, None], cfg.rope_theta, cfg.rope_scaling)[:, 0]

            # Scatter this token's K/V into the pools: [Hkv, B] rows.
            kT = jnp.swapaxes(k, 0, 1)  # [Hkv, B, d]
            vT = jnp.swapaxes(v, 0, 1)
            d_pool = pools.k[li].shape[-1]
            if kT.shape[-1] != d_pool:
                pad = ((0, 0), (0, 0), (0, d_pool - kT.shape[-1]))
                kT = jnp.pad(kT, pad)
                vT = jnp.pad(vT, pad)
            if pools.int4:
                kq, ks = _quantize_rows_int4(kT)
                vq, vs = _quantize_rows_int4(vT)
                new_k[li] = _int4_insert(new_k[li], page_rows, page_offs, kq)
                new_v[li] = _int4_insert(new_v[li], page_rows, page_offs, vq)
                new_ks[li] = new_ks[li].at[:, page_rows, page_offs].set(ks)
                new_vs[li] = new_vs[li].at[:, page_rows, page_offs].set(vs)
                k_att = Int4QuantizedTensor(new_k[li], new_ks[li])
                v_att = Int4QuantizedTensor(new_v[li], new_vs[li])
            elif pools.quantized:
                kq, ks = _quantize_rows(kT, pools.k[li].dtype)
                vq, vs = _quantize_rows(vT, pools.v[li].dtype)
                new_k[li] = new_k[li].at[:, page_rows, page_offs].set(kq)
                new_v[li] = new_v[li].at[:, page_rows, page_offs].set(vq)
                new_ks[li] = new_ks[li].at[:, page_rows, page_offs].set(ks)
                new_vs[li] = new_vs[li].at[:, page_rows, page_offs].set(vs)
                k_att = QuantizedTensor(new_k[li], new_ks[li])
                v_att = QuantizedTensor(new_v[li], new_vs[li])
            else:
                new_k[li] = new_k[li].at[:, page_rows, page_offs].set(
                    kT.astype(new_k[li].dtype)
                )
                new_v[li] = new_v[li].at[:, page_rows, page_offs].set(
                    vT.astype(new_v[li].dtype)
                )
                k_att, v_att = new_k[li], new_v[li]

            o = paged_decode_attention(
                q, k_att, v_att, lengths, page_tbl,
                sm_scale=cfg.sm_scale,
                logit_softcap=cfg.attn_softcap,
                pages_per_block=pages_per_block, alibi_slopes=slopes,
                interpret=interpret,
            )  # [B, Hq, d]
            out = _proj(o.reshape(b, -1), layer["wo"])
            if "post_attn_norm" in layer:
                out = rms_norm(out, layer["post_attn_norm"], cfg.norm_eps)
            x = x + out
            x = mlp_block(layer, x[:, None, :], cfg.norm_eps, cfg.mlp_act)[:, 0]

        x = rms_norm(x, params["final_norm"], cfg.norm_eps)
        logits = jnp.dot(
            x, unembed_matrix(params).T, preferred_element_type=jnp.float32
        )
        if cfg.final_softcap:
            c = cfg.final_softcap
            logits = c * jnp.tanh(logits / c)
        pools_out = KVPools(
            tuple(new_k), tuple(new_v),
            tuple(new_ks) if new_ks is not None else None,
            tuple(new_vs) if new_vs is not None else None,
        )
        return logits, pools_out

    if not _jit:
        return decode_step
    return jax.jit(decode_step, donate_argnums=(1,))


# ---------------------------------------------------------------------------
# Verify step (speculative decoding): score T tokens in one dispatch
# ---------------------------------------------------------------------------


def make_verify_step(
    cfg: ModelConfig,
    num_tokens: int,
    *,
    pages_per_block: int | None = None,
    interpret: Optional[bool] = None,
    _jit: bool = True,
):
    """jitted multi-token step for speculative verification / chunked prefill.

    (params, pools, tokens [B, T], positions [B, T], page_rows [B, T],
     page_offs [B, T], page_tbl [B, pages_per_seq], lengths [B])
     -> (logits [B, T, V], pools)

    Writes all T tokens' K/V into the pools, then scores every position with
    :func:`ops.decode.paged_verify_attention` — token t attends to positions
    < lengths − (T−1−t).  ``lengths`` is the FINAL length (all T counted).
    """
    from ..ops.decode import paged_verify_attention

    slopes = _cfg_slopes(cfg)
    t_new = num_tokens

    def verify_step(params, pools: KVPools, tokens, positions, page_rows,
                    page_offs, page_tbl, lengths):
        b = tokens.shape[0]
        x = params["embed"][tokens.reshape(-1)].reshape(b, t_new, -1)
        if cfg.embed_scale:
            x = x * jnp.asarray(cfg.d_model ** 0.5, x.dtype)
        new_k, new_v = list(pools.k), list(pools.v)
        new_ks = list(pools.k_scales) if pools.quantized else None
        new_vs = list(pools.v_scales) if pools.quantized else None

        rows_f = page_rows.reshape(-1)
        offs_f = page_offs.reshape(-1)

        for li, layer in enumerate(params["layers"]):
            h = rms_norm(x, layer["attn_norm"], cfg.norm_eps)
            q = _proj(h, layer["wq"], layer.get("bq")).reshape(
                b, t_new, cfg.n_q_heads, cfg.head_dim)
            k = _proj(h, layer["wk"], layer.get("bk")).reshape(
                b, t_new, cfg.n_kv_heads, cfg.head_dim)
            v = _proj(h, layer["wv"], layer.get("bv")).reshape(
                b, t_new, cfg.n_kv_heads, cfg.head_dim)
            if slopes is None:
                q = rope(q, positions, cfg.rope_theta, cfg.rope_scaling)  # [B, T, Hq, d]
                k = rope(k, positions, cfg.rope_theta, cfg.rope_scaling)

            # Scatter all B·T tokens' K/V: [Hkv, B·T, d]
            kT = k.reshape(b * t_new, cfg.n_kv_heads, -1).swapaxes(0, 1)
            vT = v.reshape(b * t_new, cfg.n_kv_heads, -1).swapaxes(0, 1)
            d_pool = pools.k[li].shape[-1]
            if kT.shape[-1] != d_pool:
                pad = ((0, 0), (0, 0), (0, d_pool - kT.shape[-1]))
                kT = jnp.pad(kT, pad)
                vT = jnp.pad(vT, pad)
            if pools.int4:
                # Safe for T <= page_size/2: two tokens of one scatter only
                # share a byte when their offsets differ by page_size/2
                # (low/high nibble of the same row), which T consecutive
                # positions cannot reach.
                kq, ks = _quantize_rows_int4(kT)
                vq, vs = _quantize_rows_int4(vT)
                new_k[li] = _int4_insert(new_k[li], rows_f, offs_f, kq)
                new_v[li] = _int4_insert(new_v[li], rows_f, offs_f, vq)
                new_ks[li] = new_ks[li].at[:, rows_f, offs_f].set(ks)
                new_vs[li] = new_vs[li].at[:, rows_f, offs_f].set(vs)
                k_att = Int4QuantizedTensor(new_k[li], new_ks[li])
                v_att = Int4QuantizedTensor(new_v[li], new_vs[li])
            elif pools.quantized:
                kq, ks = _quantize_rows(kT, pools.k[li].dtype)
                vq, vs = _quantize_rows(vT, pools.v[li].dtype)
                new_k[li] = new_k[li].at[:, rows_f, offs_f].set(kq)
                new_v[li] = new_v[li].at[:, rows_f, offs_f].set(vq)
                new_ks[li] = new_ks[li].at[:, rows_f, offs_f].set(ks)
                new_vs[li] = new_vs[li].at[:, rows_f, offs_f].set(vs)
                k_att = QuantizedTensor(new_k[li], new_ks[li])
                v_att = QuantizedTensor(new_v[li], new_vs[li])
            else:
                new_k[li] = new_k[li].at[:, rows_f, offs_f].set(
                    kT.astype(new_k[li].dtype)
                )
                new_v[li] = new_v[li].at[:, rows_f, offs_f].set(
                    vT.astype(new_v[li].dtype)
                )
                k_att, v_att = new_k[li], new_v[li]

            o = paged_verify_attention(
                q.transpose(0, 2, 1, 3),  # [B, Hq, T, d]
                k_att, v_att, lengths, page_tbl,
                sm_scale=cfg.sm_scale,
                logit_softcap=cfg.attn_softcap,
                pages_per_block=pages_per_block, alibi_slopes=slopes,
                interpret=interpret,
            )
            o = o.transpose(0, 2, 1, 3).reshape(b, t_new, -1)
            out = _proj(o, layer["wo"])
            if "post_attn_norm" in layer:
                out = rms_norm(out, layer["post_attn_norm"], cfg.norm_eps)
            x = x + out
            x = mlp_block(layer, x, cfg.norm_eps, cfg.mlp_act)

        x = rms_norm(x, params["final_norm"], cfg.norm_eps)
        logits = jnp.einsum(
            "btd,vd->btv", x, unembed_matrix(params),
            preferred_element_type=jnp.float32,
        )
        if cfg.final_softcap:
            c = cfg.final_softcap
            logits = c * jnp.tanh(logits / c)
        pools_out = KVPools(
            tuple(new_k), tuple(new_v),
            tuple(new_ks) if new_ks is not None else None,
            tuple(new_vs) if new_vs is not None else None,
        )
        return logits, pools_out

    if not _jit:
        return verify_step
    return jax.jit(verify_step, donate_argnums=(1,))


def write_prompt_kv(
    pools: KVPools,
    layer: int,
    kv: Tuple[jax.Array, jax.Array],  # [Hkv, T, d] each
    pages: jax.Array,  # [n_pages] int32
    page_size: int,
) -> KVPools:
    """Write one sequence's prompt K/V into its pages (admission path)."""
    k, v = kv
    d_pool = pools.k[layer].shape[-1]
    if k.shape[-1] != d_pool:
        pad = d_pool - k.shape[-1]
        k = jnp.pad(k, ((0, 0), (0, 0), (0, pad)))
        v = jnp.pad(v, ((0, 0), (0, 0), (0, pad)))
    hkv, t, d = k.shape
    n_pages = pages.shape[0]
    pad = n_pages * page_size - t
    if pad:
        k = jnp.pad(k, ((0, 0), (0, pad), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, pad), (0, 0)))
    k = k.reshape(hkv, n_pages, page_size, d)
    v = v.reshape(hkv, n_pages, page_size, d)
    new_k, new_v = list(pools.k), list(pools.v)
    if pools.int4:
        new_ks, new_vs = list(pools.k_scales), list(pools.v_scales)
        kq, ks = _quantize_rows_int4(k)  # [hkv, n_pages, ps, d] int32
        vq, vs = _quantize_rows_int4(v)
        new_k[layer] = new_k[layer].at[:, pages].set(pack_int4_rows(kq))
        new_v[layer] = new_v[layer].at[:, pages].set(pack_int4_rows(vq))
        new_ks[layer] = new_ks[layer].at[:, pages].set(ks)
        new_vs[layer] = new_vs[layer].at[:, pages].set(vs)
        return KVPools(tuple(new_k), tuple(new_v), tuple(new_ks), tuple(new_vs))
    if pools.quantized:
        new_ks, new_vs = list(pools.k_scales), list(pools.v_scales)
        kq, ks = _quantize_rows(k, pools.k[layer].dtype)
        vq, vs = _quantize_rows(v, pools.v[layer].dtype)
        new_k[layer] = new_k[layer].at[:, pages].set(kq)
        new_v[layer] = new_v[layer].at[:, pages].set(vq)
        new_ks[layer] = new_ks[layer].at[:, pages].set(ks)
        new_vs[layer] = new_vs[layer].at[:, pages].set(vs)
        return KVPools(tuple(new_k), tuple(new_v), tuple(new_ks), tuple(new_vs))
    new_k[layer] = new_k[layer].at[:, pages].set(k.astype(new_k[layer].dtype))
    new_v[layer] = new_v[layer].at[:, pages].set(v.astype(new_v[layer].dtype))
    return KVPools(tuple(new_k), tuple(new_v), None, None)


@functools.partial(jax.jit, static_argnames=("page_size",),
                   donate_argnums=(0,))
def write_prompt_kv_all(
    pools: KVPools,
    kvs,  # tuple of (k, v) per layer, each [1, Hkv, T_pad, d]
    pages: jax.Array,  # [n_pages] int32
    page_size: int,
) -> KVPools:
    """All-layers admission write in ONE device dispatch.

    The eager per-layer write_prompt_kv loop costs 4+ dispatches per layer
    per admission (slice, quantize, two scatters) — ~140 ms of pure
    dispatch overhead per admit on a 16-layer model through the remote
    tunnel, vs ~6 ms of actual prefill compute.  Tracing the whole loop
    under one jit collapses it to a single program."""
    n = pages.shape[0]
    for li, (k, v) in enumerate(kvs):
        pools = write_prompt_kv(
            pools, li,
            (k[0, :, : n * page_size], v[0, :, : n * page_size]),
            pages, page_size,
        )
    return pools


@functools.partial(jax.jit, static_argnames=("page_size",),
                   donate_argnums=(0,))
def write_prompt_kv_batch(
    pools: KVPools,
    kvs,  # tuple of (k, v) per layer, each [n, Hkv, T_pad, d]
    pages_b: jax.Array,  # [n, max_pages] int32, NULL-page padded rows
    page_size: int,
) -> KVPools:
    """Batched admission write: every slot's every layer in ONE dispatch
    (offline fixed-batch admission).  Rows of ``pages_b`` are padded to a
    common width with the null page — padding writes land there and are
    never read (the same scratch contract as frozen burst slots)."""
    n, max_pages = pages_b.shape
    for i in range(n):
        for li, (k, v) in enumerate(kvs):
            kw = k[i, :, : max_pages * page_size]
            vw = v[i, :, : max_pages * page_size]
            pools = write_prompt_kv(pools, li, (kw, vw), pages_b[i],
                                    page_size)
    return pools
