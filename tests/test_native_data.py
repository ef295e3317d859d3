"""Native (C++) prefetching token loader vs. its contract.

The loader's promises (runtime/native_data.py): deterministic seeded order,
per-host-disjoint epoch coverage, (epoch, index) resume round-trip, int32
widening from every supported storage dtype.  Windows are identified by
content: the corpus is arange, so window i's first token is i*seq_len.
"""

import numpy as np
import pytest

from flash_attention_dlrs_tpu.runtime.data import LoaderState
from flash_attention_dlrs_tpu.runtime.native_data import (
    NativeTokenLoader,
    native_batches,
    native_loader_available,
)

pytestmark = pytest.mark.skipif(
    not native_loader_available(), reason="native toolchain unavailable"
)

SEQ = 16


def _corpus(tmp_path, n_tokens=4001, dtype=np.uint16):
    path = tmp_path / "tokens.bin"
    np.arange(n_tokens, dtype=dtype).tofile(path)
    return str(path)


def _window_ids(batch):
    assert batch.dtype == np.int32 and batch.shape[1] == SEQ + 1
    # each row must be a contiguous arange slice starting on a window edge
    assert np.all(batch - batch[:, :1] == np.arange(SEQ + 1))
    assert np.all(batch[:, 0] % SEQ == 0)
    return set(int(t) // SEQ for t in batch[:, 0])


def test_deterministic_and_seed_sensitive(tmp_path):
    path = _corpus(tmp_path)
    with NativeTokenLoader(path, seq_len=SEQ, batch_size=8, seed=3) as a, \
            NativeTokenLoader(path, seq_len=SEQ, batch_size=8, seed=3) as b, \
            NativeTokenLoader(path, seq_len=SEQ, batch_size=8, seed=4) as c:
        diff = False
        for _ in range(3):
            ba, sa = a.next_batch()
            bb, sb = b.next_batch()
            bc, _ = c.next_batch()
            np.testing.assert_array_equal(ba, bb)
            assert sa == sb
            diff = diff or not np.array_equal(ba, bc)
        assert diff  # a different seed reorders the epoch


def test_epoch_covers_each_window_once_disjoint_across_hosts(tmp_path):
    path = _corpus(tmp_path)
    n_windows = (4001 - 1) // SEQ  # 250
    seen = {}
    for pi in range(2):
        with NativeTokenLoader(
            path, seq_len=SEQ, batch_size=5, seed=0,
            process_index=pi, process_count=2,
        ) as ld:
            assert ld.num_windows == n_windows
            ids = set()
            for _ in range(125 // 5):  # one full host shard
                batch, state = ld.next_batch()
                assert state.epoch == 0
                ids |= _window_ids(batch)
            seen[pi] = ids
    assert len(seen[0]) == 125 and len(seen[1]) == 125
    assert not (seen[0] & seen[1])
    assert seen[0] | seen[1] == set(range(n_windows))


def test_resume_round_trip_and_epoch_rollover(tmp_path):
    path = _corpus(tmp_path, n_tokens=16 * 20 + 1)  # 20 windows
    kw = dict(seq_len=SEQ, batch_size=4, seed=7)
    with NativeTokenLoader(path, **kw) as ld:
        run = [ld.next_batch() for _ in range(9)]
    # 5 batches/epoch: batch 5 (index 5) starts epoch 1 with a new shuffle
    assert [s.epoch for _, s in run] == [0] * 5 + [1] * 4
    epoch0 = set().union(*(_window_ids(b) for b, _ in run[:5]))
    assert epoch0 == set(range(20))
    order0 = [b[:, 0].tolist() for b, _ in run[:5]]
    order1 = [b[:, 0].tolist() for b, _ in run[5:]]
    assert order0[:4] != order1[:4]  # reshuffled across epochs
    # resume from the cursor after batch 2 reproduces batches 3..8
    _, state = run[2]
    with NativeTokenLoader(path, state=state, **kw) as ld:
        for want, want_state in run[3:]:
            got, got_state = ld.next_batch()
            np.testing.assert_array_equal(got, want)
            assert got_state == want_state


@pytest.mark.parametrize("dtype", [np.uint8, np.uint16, np.int32, np.int64])
def test_dtype_widening(tmp_path, dtype):
    path = tmp_path / f"tok_{np.dtype(dtype).name}.bin"
    np.arange(200, dtype=dtype).tofile(path)
    gen = native_batches(str(path), seq_len=8, batch_size=2, dtype=dtype)
    batch, state = next(gen)
    assert batch.dtype == np.int32
    assert np.all(batch - batch[:, :1] == np.arange(9))
    gen.close()


def test_rejects_missing_file_and_short_corpus(tmp_path):
    with pytest.raises(ValueError, match="rejected"):
        NativeTokenLoader(str(tmp_path / "nope.bin"), seq_len=8, batch_size=2)
    path = _corpus(tmp_path, n_tokens=40)  # 2 windows of 16 < batch 4
    with pytest.raises(ValueError, match="rejected"):
        NativeTokenLoader(path, seq_len=SEQ, batch_size=4)
    with pytest.raises(ValueError, match="dtype"):
        NativeTokenLoader(_corpus(tmp_path), seq_len=SEQ, batch_size=2,
                          dtype=np.float32)


def test_resume_past_epoch_end_rolls_over(tmp_path):
    path = _corpus(tmp_path, n_tokens=16 * 20 + 1)
    kw = dict(seq_len=SEQ, batch_size=4, seed=1)
    # cursor at the exact epoch boundary: next batch must be epoch 1
    with NativeTokenLoader(path, state=LoaderState(0, 20), **kw) as ld:
        _, state = ld.next_batch()
    assert state.epoch == 1 and state.index == 4
