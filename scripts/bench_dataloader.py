"""Data-loader throughput: Python (runtime.data.batches) vs native C++
prefetcher (runtime.native_data) on a synthetic token corpus.

Host-side bench (no TPU needed): measures batches/s and tokens/s for each
loader, plus the native loader's *overlap* advantage — the time the train
loop sees when it does fake "compute" between batches (the native worker
fills the ready queue during compute; the Python loader gathers inline).

Usage: python scripts/bench_dataloader.py [--tokens 200e6] [--out FILE]
"""

import argparse
import json
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from flash_attention_dlrs_tpu.runtime.data import TokenDataset, batches
from flash_attention_dlrs_tpu.runtime.native_data import (
    NativeTokenLoader,
    native_loader_available,
)


def timed(fn, n_batches):
    t0 = time.perf_counter()
    fn(n_batches)
    return time.perf_counter() - t0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tokens", type=float, default=50e6)
    ap.add_argument("--seq-len", type=int, default=2048)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--n-batches", type=int, default=200)
    ap.add_argument("--compute-ms", type=float, default=5.0,
                    help="fake per-step compute for the overlap measurement")
    ap.add_argument("--out", default="bench_out/dataloader.json")
    args = ap.parse_args()

    n_tokens = int(args.tokens)
    with tempfile.TemporaryDirectory() as td:
        path = os.path.join(td, "tokens.bin")
        # uint16 synthetic corpus, written in chunks to bound host RSS
        rng = np.random.default_rng(0)
        with open(path, "wb") as f:
            left = n_tokens
            while left > 0:
                n = min(left, 1 << 24)
                f.write(rng.integers(0, 50000, n, np.uint16).tobytes())
                left -= n

        tok_per_batch = args.batch * (args.seq_len + 1)
        results = {}

        def py_drain(n):
            ds = TokenDataset.from_file(path, args.seq_len)
            it = batches(ds, batch_size=args.batch, seed=0,
                         process_index=0, process_count=1)
            for _ in range(n):
                next(it)

        def native_drain(n):
            with NativeTokenLoader(path, seq_len=args.seq_len,
                                   batch_size=args.batch, seed=0) as ld:
                for _ in range(n):
                    ld.next_batch()

        def native_overlap(n):
            with NativeTokenLoader(path, seq_len=args.seq_len,
                                   batch_size=args.batch, seed=0) as ld:
                for _ in range(n):
                    ld.next_batch()
                    time.sleep(args.compute_ms / 1e3)

        def py_overlap(n):
            ds = TokenDataset.from_file(path, args.seq_len)
            it = batches(ds, batch_size=args.batch, seed=0,
                         process_index=0, process_count=1)
            for _ in range(n):
                next(it)
                time.sleep(args.compute_ms / 1e3)

        for name, fn in [("python", py_drain), ("native", native_drain)]:
            if name == "native" and not native_loader_available():
                print("native loader unavailable; skipping")
                continue
            timed(fn, 10)  # warm the page cache fairly
            dt = timed(fn, args.n_batches)
            results[name] = {
                "batches_per_s": args.n_batches / dt,
                "tokens_per_s": args.n_batches * tok_per_batch / dt,
            }
            print(f"{name:8s}: {results[name]['batches_per_s']:8.1f} "
                  f"batches/s  {results[name]['tokens_per_s']/1e6:7.2f} "
                  "Mtok/s")

        # Overlap: wall time minus the injected compute = what the input
        # pipeline adds to a train loop that computes compute_ms per step.
        budget = args.n_batches * args.compute_ms / 1e3
        for name, fn in [("python", py_overlap), ("native", native_overlap)]:
            if name == "native" and not native_loader_available():
                continue
            dt = timed(fn, args.n_batches)
            results[name]["loop_overhead_ms_per_step"] = (
                (dt - budget) / args.n_batches * 1e3)
            print(f"{name:8s}: {results[name]['loop_overhead_ms_per_step']:.3f} "
                  f"ms/step input-pipeline overhead at {args.compute_ms} ms "
                  "compute")

        os.makedirs(os.path.dirname(args.out), exist_ok=True)
        with open(args.out, "w") as f:
            json.dump({"config": vars(args), "results": results}, f, indent=1)
        print("wrote", args.out)


if __name__ == "__main__":
    main()
