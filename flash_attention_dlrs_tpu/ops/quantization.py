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
