from .mesh import initialize_distributed, local_mesh_1d, make_mesh
from .ring import context_parallel_attention, merge_partials, ring_attention
from .sharded_attention import (
    combine_context_attention,
    head_parallel_attention,
    ring_context_attention,
    sharded_attention,
)

__all__ = [
    "make_mesh",
    "local_mesh_1d",
    "initialize_distributed",
    "ring_attention",
    "context_parallel_attention",
    "merge_partials",
    "sharded_attention",
    "head_parallel_attention",
    "ring_context_attention",
    "combine_context_attention",
]
