from .flash_attention import (
    SegmentIds,
    flash_attention,
    flash_attention_backward,
    flash_attention_forward,
)
from .reference import (
    alibi_slopes_for,
    reference_attention,
    reference_attention_grads,
)

__all__ = [
    "SegmentIds",
    "alibi_slopes_for",
    "flash_attention",
    "flash_attention_forward",
    "flash_attention_backward",
    "reference_attention",
    "reference_attention_grads",
]
