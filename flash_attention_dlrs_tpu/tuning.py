"""Block-shape tuner: enumerate → prune by VMEM model → (optionally) time.

TPU-native rebuild of the reference autotuner (src/autotune_configs.py:24-140
enumerates ~114 Triton configs, :169-245 prunes them against a GA102 SRAM
model, and triton.autotune times the survivors, cached per (B,H,N,d) key —
src/flash_attention_kernels.py:11-15).  Here the candidate space is spanned by
MXU-tile multiples, the prune model is the VMEM footprint from
:mod:`.geometry`, and timed search is an explicit opt-in (``tune=True``)
cached on the same shape key.
"""

from __future__ import annotations

import dataclasses
import functools
import json
import os
import time

import jax
import jax.numpy as jnp

from . import geometry as geo

# Candidate block edges: multiples of the 128-wide MXU tile, like the
# reference's {16..512} powers-of-two space (autotune_configs.py:24-140)
# rescaled to TPU lane geometry.
_CANDIDATE_EDGES = (128, 256, 512, 1024, 2048)


@dataclasses.dataclass(frozen=True)
class BlockSizes:
    """Block shapes for the attention kernels (fwd + both bwd kernels)."""

    block_q: int = 128
    block_kv: int = 128
    block_q_bwd: int = 128
    block_kv_bwd: int = 128

    def __post_init__(self):
        for name in ("block_q", "block_kv", "block_q_bwd", "block_kv_bwd"):
            v = getattr(self, name)
            if v % geo.MIN_BLOCK != 0:
                raise ValueError(f"{name}={v} must be a multiple of {geo.MIN_BLOCK}")


def candidate_fwd_configs(n_q: int, n_kv: int, head_dim: int, dtype) -> list:
    """Enumerate + prune forward (block_q, block_kv) candidates.

    Mirrors the enumerate-then-prune structure of get_autotune_config /
    fwd_conf_prune (autotune_configs.py:197,176-194) with the divisibility
    rule relaxed: partial blocks are masked in-kernel, so candidates only
    need to not exceed the (padded) sequence lengths.
    """
    g = geo.current_geometry()
    out = []
    for bq in _CANDIDATE_EDGES:
        if bq > max(n_q, geo.MIN_BLOCK):
            continue
        for bkv in _CANDIDATE_EDGES:
            if bkv > max(n_kv, geo.MIN_BLOCK):
                continue
            need = geo.attention_fwd_vmem_bytes(bq, bkv, head_dim, dtype)
            if geo.fits_vmem(need, g):
                out.append((bq, bkv))
    return out or [(geo.MIN_BLOCK, geo.MIN_BLOCK)]


def default_block_sizes(
    n_q: int, n_kv: int, head_dim: int, dtype=jnp.bfloat16
) -> BlockSizes:
    """Heuristic pick without timing: largest VMEM-feasible blocks, biased
    towards wide KV blocks (fewer HBM round-trips for the streamed operand)."""
    fwd = candidate_fwd_configs(n_q, n_kv, head_dim, dtype)
    # Measured on v5e (N=4096, d=128): (1024,1024) is the sweet spot — big
    # blocks amortize grid/bookkeeping overhead, beyond 1024 VMEM pressure
    # kills compilation.  Prefer the largest product with edges capped at
    # 1024, tie-breaking toward a wide KV block (the streamed operand).
    bq, bkv = max(
        fwd, key=lambda c: (min(c[0], 1024) * min(c[1], 1024), min(c[1], 1024))
    )
    # Backward keeps both score-sized temporaries live; halve if needed.
    bqb, bkvb = bq, bkv
    g = geo.current_geometry()
    while not geo.fits_vmem(
        geo.attention_bwd_vmem_bytes(bqb, bkvb, head_dim, dtype), g
    ) and (bqb > geo.MIN_BLOCK or bkvb > geo.MIN_BLOCK):
        if bkvb >= bqb and bkvb > geo.MIN_BLOCK:
            bkvb //= 2
        else:
            bqb //= 2
    return BlockSizes(
        block_q=bq, block_kv=bkv, block_q_bwd=bqb, block_kv_bwd=bkvb
    )


# ---------------------------------------------------------------------------
# Timed search (explicit opt-in), cached per shape key like Triton's
# per-(B,H,N,d) autotune cache (flash_attention_kernels.py:13).
# ---------------------------------------------------------------------------

_TUNE_CACHE: dict = {}
_CACHE_PATH = os.path.join(
    os.path.expanduser(os.environ.get("FA_TPU_CACHE_DIR", "~/.cache/fa_tpu")),
    "tune_cache.json",
)


def _load_disk_cache() -> dict:
    try:
        with open(_CACHE_PATH) as f:
            return json.load(f)
    except Exception:
        return {}


def _save_disk_cache(cache: dict) -> None:
    try:
        os.makedirs(os.path.dirname(_CACHE_PATH), exist_ok=True)
        with open(_CACHE_PATH, "w") as f:
            json.dump(cache, f)
    except Exception:
        pass


# Phrases that specifically mean "this candidate does not FIT" — full
# resource-exhaustion sentences, not bare nouns like "vmem"/"scratch" that
# genuine lowering bugs also mention in passing (a Mosaic layout bug whose
# message references a scratch operand must still propagate).
_RESOURCE_ERROR_MARKERS = (
    "resource_exhausted",
    "resource exhausted",
    "out of memory",
    "out of resource",
    "exceeds available",
    "exceeds the vmem limit",
    "vmem limit exceeded",
    "failed to allocate",
    "allocation failure",
    "not enough vmem",
    "not enough smem",
    "insufficient vmem",
    "scoped vmem limit",
    "scratch memory limit",
)


def _is_resource_error(e: Exception) -> bool:
    """True iff the exception reports the candidate not FITTING (OOM,
    VMEM/scratch overflow) — the only failure class the timed search may
    legitimately skip.  Everything else must propagate (see _tune_cached)."""
    msg = f"{type(e).__name__}: {e}".lower()
    return any(m in msg for m in _RESOURCE_ERROR_MARKERS)


def _time_call(fn, *args, warmup: int = 2, reps: int = 5) -> float:
    """Median wall time of fn(*args) with device sync, in seconds."""
    for _ in range(warmup):
        jax.block_until_ready(fn(*args))
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        times.append(time.perf_counter() - t0)
    times.sort()
    return times[len(times) // 2]


def _tune_cached(key_parts, candidates, build_fn, args):
    """Shared timed search: time build_fn(*cand)(*args) for each candidate,
    cache the winner on the JSON key (in-process + on disk)."""
    key = json.dumps([geo.current_geometry().device_kind, *key_parts])
    if not _TUNE_CACHE:
        _TUNE_CACHE.update(_load_disk_cache())
    if key in _TUNE_CACHE:
        v = _TUNE_CACHE[key]
        return tuple(v) if isinstance(v, list) else v
    best, best_t = candidates[0], float("inf")
    for cand in candidates:
        try:
            fn = build_fn(*cand) if isinstance(cand, tuple) else build_fn(cand)
            t = _time_call(fn, *args)
        except Exception as e:  # noqa: BLE001 — classified below
            if _is_resource_error(e):
                continue  # candidate doesn't fit — skip, like NaN-on-OOM
            # Anything else is a real bug in a kernel route (bad lowering,
            # partitioning crash, shape error).  Round 2 swallowed these and
            # a broken >8K backward hid inside the timed search until it
            # crashed on hardware — fail loudly instead.
            raise RuntimeError(
                f"tuning candidate {cand!r} for key {key_parts!r} failed "
                f"with a non-resource error: {type(e).__name__}: {e}"
            ) from e
        if t < best_t:
            best, best_t = cand, t
    _TUNE_CACHE[key] = list(best) if isinstance(best, tuple) else best
    _save_disk_cache(_TUNE_CACHE)
    return best


def tune_fwd_blocks(
    build_fn,
    q,
    k,
    v,
    *,
    max_candidates: int = 8,
    key_extra=None,
) -> tuple:
    """Time VMEM-feasible (block_q, block_kv) candidates for the forward
    kernel and cache the winner on the (B, H, Nq, Nkv, d, dtype) key.

    ``build_fn(block_q, block_kv)`` must return a jitted callable taking
    (q, k, v).
    """
    n_q, n_kv, d = q.shape[-2], k.shape[-2], q.shape[-1]
    cands = candidate_fwd_configs(n_q, n_kv, d, q.dtype)[:max_candidates]
    return _tune_cached(
        ["fwd", list(q.shape), list(k.shape), str(q.dtype), key_extra],
        cands, build_fn, (q, k, v),
    )


def candidate_bwd_configs(n_q: int, n_kv: int, head_dim: int, dtype) -> list:
    """(block_q, block_kv) candidates for the backward: every pair where
    EITHER the fused single-sweep kernel fits VMEM (the dispatcher will use
    it) or the two-sweep kernels do (the fallback) — pruned like the
    reference's bwd_conf_prune (src/autotune_configs.py:204-225), against
    the VMEM model instead of the GA102 SRAM model."""
    from .ops import bwd_fused  # local import: ops imports tuning

    g = geo.current_geometry()
    out = []
    for bq in _CANDIDATE_EDGES:
        if bq > max(n_q, geo.MIN_BLOCK):
            continue
        for bkv in _CANDIDATE_EDGES:
            if bkv > max(n_kv, geo.MIN_BLOCK):
                continue
            n_q_pad = -(-n_q // bq) * bq
            fused_ok = bwd_fused.fused_bwd_fits_vmem(
                n_q_pad, head_dim, bq, bkv, dtype
            )
            split_ok = geo.fits_vmem(
                geo.attention_bwd_vmem_bytes(bq, bkv, head_dim, dtype), g
            )
            if fused_ok or split_ok:
                out.append((bq, bkv))
    return out or [(geo.MIN_BLOCK, geo.MIN_BLOCK)]


def tune_bwd_blocks(
    build_fn,
    q,
    k,
    v,
    do,
    *,
    max_candidates: int = 10,
    key_extra=None,
) -> tuple:
    """Time backward (block_q_bwd, block_kv_bwd) candidates and cache the
    winner — the reference autotunes its backward kernels the same way
    (src/flash_attention_kernels.py:169-173,337-341); the round-1 build only
    tuned the forward.

    ``build_fn(bq, bkv)`` must return a jitted callable taking (q, k, v, do)
    that executes the backward (and consumes all three grads).
    """
    n_q, n_kv, d = q.shape[-2], k.shape[-2], q.shape[-1]
    cands = candidate_bwd_configs(n_q, n_kv, d, q.dtype)[:max_candidates]
    return _tune_cached(
        ["bwd", list(q.shape), list(k.shape), str(q.dtype), key_extra],
        cands, build_fn, (q, k, v, do),
    )


def tune_decode_pages_per_block(
    build_fn,
    candidates,
    key_parts,
    args,
):
    """Time paged-decode ``pages_per_block`` candidates (the decode kernel's
    only block knob) and cache the winner on the given shape key.

    ``build_fn(ppb)`` must return a jitted callable taking ``args``."""
    return _tune_cached(["decode", *key_parts], list(candidates),
                        build_fn, args)
