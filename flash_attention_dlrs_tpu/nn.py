"""`jax.nn.dot_product_attention`-compatible adapter over the flash kernels.

Adoption surface: code written against `jax.nn.dot_product_attention`
(query/key/value in BTNH layout, `is_causal`, `local_window_size`,
per-batch `*_seq_lengths`, GQA-by-head-count) switches to the Pallas flash
path by changing one import.  The reference exposes the analogous
convenience layer as a `torch.autograd.Function` over its wrappers
(src/flash_attention_torch.py:21-158); here the convenience layer is a pure
function because the underlying op already carries its `jax.custom_vjp`.

Dispatch contract — the adapter routes to the flash kernels ONLY where the
semantics match `jax.nn.dot_product_attention` exactly, and otherwise calls
`jax.nn.dot_product_attention` itself (so every argument combination keeps
working, just without the kernel speedup):

- general `bias` / `mask` arrays: fallback (the kernels mask structurally —
  causal/window/segment — and do not take dense score-space arrays).
- `is_causal` with T != S: fallback.  JAX's causal mask is top-left aligned
  (`tril(ones(T, S))`); the kernels' cross-length causal is bottom-right
  aligned (the flash-attn >= 2.1 convention), so the two disagree whenever
  T != S.
- `local_window_size` without `is_causal`: fallback (the kernels implement
  the sliding window as a causal band).  With `is_causal`, JAX's
  `(left, right)` window composes with the causal mask into "attend the
  last `left + 1` tokens" — exactly the kernels' `window = left + 1`.
- float64: fallback (the MXU has no fp64 path; the kernels refuse it, but
  this surface promises jax.nn semantics, which include fp64 on CPU).
- `return_residual=True`: fallback (the kernels' lse output feeds the
  ring/backward contract and is not differentiable as a user-facing value).

Per-batch `query_seq_lengths` / `key_value_seq_lengths` lower onto the
kernels' packed-segment masking: valid positions get segment id 1, padding
id 0, so valid<->valid survives and valid<->pad is masked — identical to
JAX's padding-mask logits for all valid rows.  Rows beyond
`query_seq_lengths` are zeroed here (JAX leaves them as the softmax of a
fully-masked row, i.e. mean(V) — garbage either way; zero is the cheaper
and safer garbage).
"""

from __future__ import annotations

from typing import Optional, Union

import jax
import jax.numpy as jnp

from .ops.flash_attention import SegmentIds, flash_attention

__all__ = ["dot_product_attention"]


def _window_left(local_window_size):
    if local_window_size is None:
        return None
    if isinstance(local_window_size, int):
        return local_window_size
    return int(local_window_size[0])


def _needs_fallback(bias, mask, is_causal, t, s, local_window_size,
                    return_residual, implementation, dtype) -> bool:
    if implementation == "xla":
        return True
    if bias is not None or mask is not None:
        return True
    if return_residual:
        return True
    if dtype == jnp.float64:
        return True
    if is_causal and t != s:
        return True  # top-left (jax) vs bottom-right (kernels) alignment
    if local_window_size is not None and not is_causal:
        return True
    left = _window_left(local_window_size)
    if left is not None and left < 0:
        # jax defines negative left windows (they mask rows empty); the
        # kernels' window=0 means "disabled" — semantics diverge, defer.
        return True
    return False


def dot_product_attention(
    query,
    key,
    value,
    bias=None,
    mask=None,
    *,
    scale: Optional[float] = None,
    is_causal: bool = False,
    query_seq_lengths=None,
    key_value_seq_lengths=None,
    local_window_size: Union[int, tuple, None] = None,
    implementation: Optional[str] = None,
    return_residual: bool = False,
):
    """Drop-in `jax.nn.dot_product_attention` running on the flash kernels.

    Layouts, defaults, and masking semantics follow `jax.nn` exactly:
    `query` is BTNH (or TNH unbatched), `key`/`value` are BSKH with
    N % K == 0 for GQA/MQA, `scale` defaults to 1/sqrt(H).  See the module
    docstring for the exact dispatch contract; `implementation` accepts
    "flash" (require the kernel path — raises if the arguments force a
    fallback), "xla" (force `jax.nn`), or None (auto).
    """
    if implementation not in (None, "flash", "xla"):
        raise ValueError(
            f"implementation must be None, 'flash', or 'xla'; got "
            f"{implementation!r} (the cudnn backend is a GPU concept)"
        )

    unbatched = query.ndim == 3
    if unbatched:
        query, key, value = (x[None] for x in (query, key, value))

    b, t, n_heads, h = query.shape
    s = key.shape[1]

    fallback = _needs_fallback(
        bias, mask, is_causal, t, s, local_window_size, return_residual,
        implementation, query.dtype,
    )
    if fallback:
        if implementation == "flash":
            raise ValueError(
                "implementation='flash' but the arguments require the XLA "
                "fallback (general bias/mask, return_residual, fp64, "
                "cross-length causal, or non-causal window) — see "
                "flash_attention_dlrs_tpu.nn docstring"
            )
        out = jax.nn.dot_product_attention(
            query, key, value, bias, mask, scale=scale, is_causal=is_causal,
            query_seq_lengths=query_seq_lengths,
            key_value_seq_lengths=key_value_seq_lengths,
            local_window_size=local_window_size,
            return_residual=return_residual,
        )
        if unbatched:
            out = (tuple(o[0] for o in out) if isinstance(out, tuple)
                   else out[0])
        return out

    window = 0
    if local_window_size is not None:
        # jax: attend [i-left, i+right]; causal kills the right side.
        # kernels: `window` = tokens visible including self.
        window = _window_left(local_window_size) + 1

    segment_ids = None
    seg_q = None
    if query_seq_lengths is not None or key_value_seq_lengths is not None:
        q_len = (jnp.asarray(query_seq_lengths, jnp.int32)
                 if query_seq_lengths is not None
                 else jnp.full((b,), t, jnp.int32))
        kv_len = (jnp.asarray(key_value_seq_lengths, jnp.int32)
                  if key_value_seq_lengths is not None
                  else jnp.full((b,), s, jnp.int32))
        seg_q = (jnp.arange(t, dtype=jnp.int32)[None, :]
                 < q_len[:, None]).astype(jnp.int32)
        seg_kv = (jnp.arange(s, dtype=jnp.int32)[None, :]
                  < kv_len[:, None]).astype(jnp.int32)
        segment_ids = SegmentIds(q=seg_q, kv=seg_kv)

    # BTNH -> BHTD (kernel layout), run, transpose back.
    o = flash_attention(
        query.transpose(0, 2, 1, 3),
        key.transpose(0, 2, 1, 3),
        value.transpose(0, 2, 1, 3),
        causal=is_causal,
        sm_scale=scale,
        segment_ids=segment_ids,
        window=window,
    )
    o = o.transpose(0, 2, 1, 3)

    if query_seq_lengths is not None:
        valid = seg_q.astype(bool)  # the same mask that drove the kernel
        o = jnp.where(valid[:, :, None, None], o, jnp.zeros((), o.dtype))

    return o[0] if unbatched else o
