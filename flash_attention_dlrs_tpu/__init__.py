"""flash_attention_dlrs_tpu — a TPU-native flash-attention framework.

Brand-new JAX/Pallas re-expression of the capabilities of the reference
Triton Flash Attention v2 implementation (17ex/flash_attention_dlrs), built
TPU-first: Pallas kernels on the MXU, VMEM-geometry block tuning, custom_vjp
autograd, quantized paged-KV decode, and mesh-sharded / ring attention for
scale-out.  See SURVEY.md at the repo root for the reference layer map this
package covers.
"""

from . import nn
from .geometry import TpuGeometry, current_geometry
from .ops import (
    SegmentIds,
    alibi_slopes_for,
    flash_attention,
    flash_attention_backward,
    flash_attention_forward,
    reference_attention,
)
from .tuning import BlockSizes, default_block_sizes

__version__ = "0.1.0"

__all__ = [
    "nn",
    "SegmentIds",
    "alibi_slopes_for",
    "flash_attention",
    "flash_attention_forward",
    "flash_attention_backward",
    "reference_attention",
    "BlockSizes",
    "default_block_sizes",
    "TpuGeometry",
    "current_geometry",
    "__version__",
]
