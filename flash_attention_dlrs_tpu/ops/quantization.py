"""Quantization: INT8/FP8 tensors with per-row scales, for KV caches and
weight-only projections.

Generalizes the reference's dtype plumbing — its ``convert_triton_dtype``
fp8e5 support (reference: src/flash_attention_torch.py:7-18) and the vendored
tutorial's fp8-V path (src/flash_attention_openai_tutorial.py:127-135) — into
a first-class quantized-tensor representation designed for TPU:

- payloads in int8 / float8_e4m3fn / float8_e5m2 (half the HBM->VMEM DMA
  bandwidth of bf16, the usual decode bottleneck);
- scales per *trailing-axis row* (one scale per token for KV caches, one per
  output channel for weights), kept separate so kernels can fold the scale
  into the score/probability tensors instead of materializing dequantized
  operands;
- symmetric scaling (no zero points) so dequantization is a single multiply.
"""

from __future__ import annotations

import dataclasses
from typing import Union

import jax
import jax.numpy as jnp

# Supported payload dtypes and their max representable magnitude.
_QMAX = {
    jnp.dtype(jnp.int8): 127.0,
    jnp.dtype(jnp.float8_e4m3fn): 448.0,
    jnp.dtype(jnp.float8_e5m2): 57344.0,
}


def qmax_for(dtype) -> float:
    return _QMAX[jnp.dtype(dtype)]


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class QuantizedTensor:
    """Payload + per-row scales; logically ``values * scales``.

    values: [..., rows, cols] in int8/fp8.
    scales: [..., rows, 1] in fp32 (broadcasts over the trailing axis).
    """

    values: jax.Array
    scales: jax.Array

    @property
    def shape(self):
        return self.values.shape

    @property
    def dtype(self):
        return self.values.dtype

    def dequantize(self, dtype=jnp.float32) -> jax.Array:
        return (self.values.astype(jnp.float32) * self.scales).astype(dtype)

    def tree_flatten(self):
        return (self.values, self.scales), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)


def quantize(
    x: jax.Array,
    dtype=jnp.int8,
    *,
    axis: int = -1,
) -> QuantizedTensor:
    """Symmetric per-row quantization along ``axis`` (the contracted axis
    stays full precision via the scale)."""
    x = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(x), axis=axis, keepdims=True)
    scale = jnp.where(amax == 0.0, 1.0, amax / qmax_for(dtype))
    q = x / scale
    if jnp.dtype(dtype) == jnp.dtype(jnp.int8):
        q = jnp.round(q)
    q = jnp.clip(q, -qmax_for(dtype), qmax_for(dtype))
    return QuantizedTensor(values=q.astype(dtype), scales=scale)


ArrayOrQuantized = Union[jax.Array, QuantizedTensor]


# ---------------------------------------------------------------------------
# INT4 (packed two-per-byte)
# ---------------------------------------------------------------------------

INT4_QMAX = 7.0  # symmetric int4 range [-8, 7]; ±7 keeps the scale symmetric


def unpack_int4_rows(packed: jax.Array) -> jax.Array:
    """[..., R/2, C] int8 -> [..., R, C] int32 values in [-8, 7].

    Split-half convention (see :class:`Int4QuantizedTensor`): byte row r
    holds logical row r in its low nibble and logical row r + R/2 in its
    high nibble, so unpacking is two shifts plus one contiguous concat —
    no sublane interleave.  int32 arithmetic only (TPU kernels cannot
    legalize sub-32-bit shifts), so this helper is safe inside Pallas.
    """
    xi = packed.astype(jnp.int32)
    low = (xi << 28) >> 28  # sign-extend the low nibble
    high = xi >> 4  # arithmetic shift sign-extends the high nibble
    return jnp.concatenate([low, high], axis=-2)


def pack_int4_rows(values: jax.Array) -> jax.Array:
    """[..., R, C] ints in [-8, 7] -> [..., R/2, C] int8 (inverse of
    :func:`unpack_int4_rows`)."""
    r = values.shape[-2]
    assert r % 2 == 0, f"row axis must be even to pack int4, got {r}"
    vi = values.astype(jnp.int32)
    low = vi[..., : r // 2, :] & 0xF
    high = vi[..., r // 2:, :] << 4
    return (low | high).astype(jnp.int8)


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class Int4QuantizedTensor:
    """INT4 payload packed two-per-byte + per-row fp32 scales.

    Logically ``unpack(values) * scales`` for a [..., rows, cols] tensor;
    ``values`` is [..., rows/2, cols] int8 with the split-half row packing
    of :func:`pack_int4_rows` (chosen over nibble-interleave so kernels
    unpack with shifts + one contiguous concat), ``scales`` is
    [..., rows, 1] fp32 — one scale per LOGICAL row, same contract as
    :class:`QuantizedTensor`.  Halves the HBM->VMEM DMA traffic of int8 —
    the decode bottleneck is bandwidth, so packed bits buy throughput at
    the cost of 4-bit resolution (gate with the perplexity eval before
    serving with it).
    """

    values: jax.Array  # [..., rows/2, cols] int8, packed
    scales: jax.Array  # [..., rows, 1] fp32

    @property
    def shape(self):  # the LOGICAL shape
        s = list(self.values.shape)
        s[-2] *= 2
        return tuple(s)

    @property
    def dtype(self):
        return self.values.dtype

    def dequantize(self, dtype=jnp.float32) -> jax.Array:
        vals = unpack_int4_rows(self.values).astype(jnp.float32)
        return (vals * self.scales).astype(dtype)

    def tree_flatten(self):
        return (self.values, self.scales), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)


def quantize_int4(x: jax.Array, *, axis: int = -1) -> Int4QuantizedTensor:
    """Symmetric per-row int4 quantization along ``axis`` (must be the
    trailing axis), packed two-per-byte along the row axis (−2)."""
    if axis not in (-1, x.ndim - 1):
        raise ValueError("quantize_int4 scales along the trailing axis only")
    if x.shape[-2] % 2:
        raise ValueError(
            f"row axis must be even to pack int4, got {x.shape[-2]}"
        )
    x = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(x), axis=-1, keepdims=True)
    scale = jnp.where(amax == 0.0, 1.0, amax / INT4_QMAX)
    q = jnp.clip(jnp.round(x / scale), -8, INT4_QMAX)
    return Int4QuantizedTensor(
        values=pack_int4_rows(q.astype(jnp.int32)), scales=scale
    )


# ---------------------------------------------------------------------------
# Weight-only INT8 projections
# ---------------------------------------------------------------------------


def quantize_weight(w: jax.Array, dtype=jnp.int8) -> QuantizedTensor:
    """Per-output-channel symmetric quantization of a [in, out] weight."""
    # scale per output column: quantize along the input (contraction) axis.
    wq = quantize(w.T, dtype=dtype, axis=-1)  # [out, in] rows = out channels
    return QuantizedTensor(values=wq.values.T, scales=wq.scales.T)  # [1, out]


def int8_matmul(x: jax.Array, w: QuantizedTensor) -> jax.Array:
    """x [.., in] @ int8 weight [in, out] with fold-in of per-channel scales.

    The int8 payload is upcast to the activation dtype at the MXU input; the
    per-channel scale multiplies the fp32 product — one multiply per output
    element, fused by XLA into the matmul epilogue.
    """
    acc = jnp.dot(
        x, w.values.astype(x.dtype), preferred_element_type=jnp.float32
    )
    return (acc * w.scales).astype(x.dtype)

def fp8_to_f32_int(x: jax.Array) -> jax.Array:
    """fp8 -> f32 by integer bit surgery (Mosaic-legal int32 ops only).

    v2-v5 TPUs have no fp8 datapath, so XLA lowers fp8 converts to a
    cast-bound path (measured on v5e: 69 GB/s fp8-KV decode vs int8's
    686).  This route widens the byte, shifts sign/exponent/mantissa into
    f32 bit positions, rebiases the exponent, and bitcasts — a handful of
    VPU int32 ops per element.  Denormals flush to zero (the largest e4m3
    denormal is 2**-6 * 7/8 ~ 1.7e-4 of the format's 448 max, far below
    KV quantization noise); NaN/Inf payloads cannot occur in quantized KV
    (quantize() clamps to the finite range).
    """
    dt = jnp.dtype(x.dtype)
    if dt == jnp.dtype(jnp.float8_e4m3fn):
        man_bits, bias = 3, 7
    elif dt == jnp.dtype(jnp.float8_e5m2):
        man_bits, bias = 2, 15
    else:
        raise NotImplementedError(f"not an fp8 dtype: {dt}")
    u = jax.lax.bitcast_convert_type(x, jnp.int8).astype(jnp.int32) & 0xFF
    sign = (u & 0x80) << 24
    expman = u & 0x7F
    bits = sign | ((expman << (23 - man_bits)) + ((127 - bias) << 23))
    bits = jnp.where(expman < (1 << man_bits), sign, bits)
    return jax.lax.bitcast_convert_type(bits, jnp.float32)
