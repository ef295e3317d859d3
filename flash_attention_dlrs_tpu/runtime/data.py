"""Token data pipeline: memory-mapped corpus → sharded, shuffled batches.

The reference has no input pipeline at all (SURVEY.md §0 — no training
loop).  This loader follows the TPU-friendly shape: a flat token file is
memory-mapped on the host, windows are sampled with a seeded permutation
(deterministic resume via `state`), each host reads ONLY its shard
(process_index-strided), and batches are yielded as numpy for the train
step to device_put (or as jax arrays sharded over a mesh's data axis).
"""

from __future__ import annotations

import dataclasses
from typing import Iterator, Optional

import jax
import numpy as np


@dataclasses.dataclass
class LoaderState:
    """Deterministic-resume cursor (epoch + position within the epoch)."""

    epoch: int = 0
    index: int = 0


class TokenDataset:
    """Flat int array of tokens, windowed into [seq_len+1] samples."""

    def __init__(self, tokens: np.ndarray, seq_len: int):
        self.tokens = np.asarray(tokens)
        self.seq_len = seq_len
        self.num_windows = (len(self.tokens) - 1) // seq_len

    @classmethod
    def from_file(cls, path: str, seq_len: int, dtype=np.uint16) -> "TokenDataset":
        return cls(np.memmap(path, dtype=dtype, mode="r"), seq_len)

    def window(self, idx: int) -> np.ndarray:
        lo = idx * self.seq_len
        return np.asarray(self.tokens[lo : lo + self.seq_len + 1], np.int32)


def batches(
    dataset: TokenDataset,
    *,
    batch_size: int,
    seed: int = 0,
    state: Optional[LoaderState] = None,
    process_index: Optional[int] = None,
    process_count: Optional[int] = None,
    drop_remainder: bool = True,
) -> Iterator[tuple]:
    """Yields (tokens [batch, seq_len+1], LoaderState).  Each host sees a
    disjoint strided shard of every epoch's permutation."""
    state = state or LoaderState()
    pi = jax.process_index() if process_index is None else process_index
    pc = jax.process_count() if process_count is None else process_count
    while True:
        rng = np.random.default_rng(seed + state.epoch)
        order = rng.permutation(dataset.num_windows)
        shard = order[pi::pc]
        usable = (len(shard) // batch_size) * batch_size if drop_remainder else len(shard)
        while state.index + batch_size <= usable:
            idxs = shard[state.index : state.index + batch_size]
            batch = np.stack([dataset.window(i) for i in idxs])
            state.index += batch_size
            yield batch, dataclasses.replace(state)
        state = LoaderState(epoch=state.epoch + 1, index=0)
