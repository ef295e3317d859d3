"""TPU hardware geometry model and block-shape pruning.

TPU-native replacement for the reference's GA102 SRAM autotune model
(reference: src/autotune_configs.py:10,18,169-245).  Where the reference
hand-codes ``SRAM = 99 * 1024`` bytes and a 0.4 safety margin for one NVIDIA
part, this module derives the budget from the *running* device
(``jax.devices()[0].device_kind`` + known per-generation VMEM tables) and
models the actual VMEM footprint of a Pallas flash-attention grid cell:
Q/K/V tiles, the fp32 scores tile, and the (m, l, acc) scratch accumulators.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp

# Lane/sublane geometry is uniform across TPU generations.
NUM_LANES = 128
NUM_SUBLANES = 8
MXU_TILE = (128, 128)
MIN_BLOCK = 128  # minimum useful block edge: one MXU tile / lane count

# Minimum (sublane, lane) tile per dtype — packing along sublanes.
_MIN_TILE_SUBLANES = {
    4: 8,    # fp32/int32: (8, 128)
    2: 16,   # bf16/fp16: (16, 128)
    1: 32,   # int8/fp8:  (32, 128)
}

# Per-core VMEM bytes by device generation.  Values are deliberately
# conservative; the safety margin below covers compiler spills and the
# double-buffered pipeline Pallas inserts for blocked operands.
_VMEM_BYTES = {
    "v4": 128 * 1024 * 1024,
    "v5 lite": 128 * 1024 * 1024,
    "v5e": 128 * 1024 * 1024,
    "v5p": 128 * 1024 * 1024,
    "v6": 128 * 1024 * 1024,
    "default": 64 * 1024 * 1024,
}

# Like the reference's SAFETY_MARGIN_MEM_FACTOR (autotune_configs.py:18)
# but applied to a VMEM budget instead of GA102 SRAM.
SAFETY_MARGIN = 0.25

# Mosaic's DEFAULT scoped-VMEM stack limit per kernel (blocks + scratch
# must fit a 16 MiB scoped allocation unless the kernel raises it; measured
# empirically — an fp32 1024x1024 backward cell fails compile at 16.89M vs
# this limit).  It is only a default: CompilerParams(vmem_limit_bytes=...)
# raises it toward the physical per-core VMEM (measured honored up to
# >=100 MiB on v5e) — see scoped_vmem_limit().
SCOPED_VMEM_BYTES = 16 * 1024 * 1024


def scoped_vmem_limit(geom: "TpuGeometry | None" = None) -> int:
    """vmem_limit_bytes value for kernels that outgrow Mosaic's 16 MiB
    default scoped stack: 3/4 of physical VMEM, leaving headroom for
    Mosaic's own pipeline buffers and the runtime."""
    geom = geom or current_geometry()
    return int(geom.vmem_bytes * 3) // 4


@dataclasses.dataclass(frozen=True)
class TpuGeometry:
    """Static model of one TPU core, queried from the live device when possible."""

    device_kind: str
    vmem_bytes: int
    num_lanes: int = NUM_LANES
    num_sublanes: int = NUM_SUBLANES
    mxu_tile: tuple = MXU_TILE

    @property
    def vmem_budget(self) -> int:
        return min(
            int(self.vmem_bytes * SAFETY_MARGIN),
            int(SCOPED_VMEM_BYTES * 0.95),
        )

    def min_sublane_tile(self, dtype) -> int:
        itemsize = jnp.dtype(dtype).itemsize
        return _MIN_TILE_SUBLANES.get(itemsize, 8)

    def round_up(self, n: int, multiple: int = NUM_LANES) -> int:
        return -(-n // multiple) * multiple


@functools.lru_cache(maxsize=None)
def current_geometry() -> TpuGeometry:
    """Query the first visible device and build a geometry model for it."""
    try:
        dev = jax.devices()[0]
        kind = getattr(dev, "device_kind", "unknown") or "unknown"
    except Exception:  # no devices at import time (e.g. docs build)
        kind = "unknown"
    kind_l = kind.lower()
    vmem = _VMEM_BYTES["default"]
    for key, val in _VMEM_BYTES.items():
        if key != "default" and key in kind_l:
            vmem = val
            break
    return TpuGeometry(device_kind=kind, vmem_bytes=vmem)


def supports_fast_fp8(geom: TpuGeometry | None = None) -> bool:
    """Whether fp8 payloads are worth using on this part.

    v4/v5-class TPUs have no fp8 datapath.  The decode kernel works around
    XLA's cast-bound fp8 convert with integer bit surgery
    (ops.quantization.fp8_to_f32_int, measured 69 → 263 GB/s on v5e), but
    the extra VPU work still leaves fp8 behind int8 there, so callers use
    this to prefer int8.  v6-class and later handle fp8 natively.  Non-TPU
    backends (CPU interpret mode) return True — nothing to guard there.
    """
    kind = (geom or current_geometry()).device_kind.lower()
    if "v5" in kind or "v4" in kind or "v3" in kind or "v2" in kind:
        return False
    return True


def attention_fwd_vmem_bytes(
    block_q: int, block_kv: int, head_dim: int, dtype
) -> int:
    """VMEM footprint of one forward grid cell.

    Counterpart of the reference's ``fwd_SRAM_needed`` formula
    (src/autotune_configs.py:169-173), rebuilt for the Pallas forward kernel:
    Q tile + double-buffered K/V tiles + fp32 scores + (m, l, acc) scratch.
    """
    isz = jnp.dtype(dtype).itemsize
    q = block_q * head_dim * isz
    kv = 2 * (2 * block_kv * head_dim * isz)  # K and V, double-buffered
    # scores ×3: S, P, and the iota/mask temporaries the compiler keeps live
    scores = 3 * block_q * block_kv * 4
    scratch = block_q * NUM_LANES * 4 * 2 + block_q * head_dim * 4  # m, l, acc
    out = block_q * head_dim * isz
    return q + kv + scores + scratch + out


def attention_bwd_vmem_bytes(
    block_q: int, block_kv: int, head_dim: int, dtype
) -> int:
    """VMEM footprint of one backward (dKV or dQ) grid cell.

    Counterpart of ``bwd_SRAM_needed`` (src/autotune_configs.py:204-208):
    Q/K/V/dO tiles + two fp32 score-sized temporaries + fp32 grad accumulators.
    """
    isz = jnp.dtype(dtype).itemsize
    # Q/dO + K/V input tiles plus lane-replicated L and D rows, all
    # double-buffered by the Pallas pipeline.
    inputs = (
        2 * block_q * head_dim * isz
        + 2 * block_kv * head_dim * isz
        + 2 * block_q * NUM_LANES * 4
    ) * 2
    scores = 2 * block_q * block_kv * 4  # p and dp/ds
    accs = 2 * block_kv * head_dim * 4 + block_q * head_dim * 4
    outs = 2 * block_kv * head_dim * 4  # dK/dV output blocks
    return inputs + scores + accs + outs


def fits_vmem(nbytes: int, geom: TpuGeometry | None = None) -> bool:
    geom = geom or current_geometry()
    return nbytes <= geom.vmem_budget
