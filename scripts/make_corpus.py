"""Build a byte-level token corpus from local source trees (zero-egress).

The quantized-KV perplexity gate needs a model whose perplexity is
meaningfully below random — which needs real, learnable data, not a Markov
toy.  With no network in this environment, the ~500 MB of installed Python
source under site-packages IS a real corpus: byte-level language modeling
over code is a standard benchmark family (enwik8-style), and its attention
statistics at seq 2K are exactly what KV quantization error accumulation
needs to be measured on.

Tokenization: raw bytes 0..255, EOS=256 between files, vocab padded to 512
(lane-friendly unembed).  Writes train.bin / val.bin (uint16, memmap-ready
for runtime.data.TokenDataset and the native C++ loader).

Usage: python scripts/make_corpus.py --out /tmp/code_corpus --max-mb 256
"""

import argparse
import os
import sys

import numpy as np

EOS = 256


def iter_files(roots, exts, max_file_kb):
    for root in roots:
        for dirpath, dirnames, filenames in os.walk(root):
            dirnames.sort()
            for name in sorted(filenames):
                if not any(name.endswith(e) for e in exts):
                    continue
                p = os.path.join(dirpath, name)
                try:
                    size = os.path.getsize(p)
                except OSError:
                    continue
                if 0 < size <= max_file_kb * 1024:
                    yield p


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--roots", nargs="*", default=[
        "/opt/venv/lib/python3.12/site-packages",
    ])
    ap.add_argument("--exts", nargs="*", default=[".py"])
    ap.add_argument("--out", default="/tmp/code_corpus")
    ap.add_argument("--max-mb", type=int, default=256)
    ap.add_argument("--max-file-kb", type=int, default=512,
                    help="skip generated monsters")
    ap.add_argument("--val-frac", type=float, default=0.01)
    args = ap.parse_args()

    os.makedirs(args.out, exist_ok=True)
    budget = args.max_mb * (1 << 20)
    chunks, total, nfiles = [], 0, 0
    for p in iter_files(args.roots, tuple(args.exts), args.max_file_kb):
        try:
            with open(p, "rb") as f:
                data = f.read()
        except OSError:
            continue
        arr = np.frombuffer(data, np.uint8).astype(np.uint16)
        chunks.append(arr)
        chunks.append(np.array([EOS], np.uint16))
        total += len(arr) + 1
        nfiles += 1
        if total >= budget:
            break
    tokens = np.concatenate(chunks)
    # deterministic split: tail fraction is validation (different files)
    n_val = int(len(tokens) * args.val_frac)
    train, val = tokens[:-n_val], tokens[-n_val:]
    train.tofile(os.path.join(args.out, "train.bin"))
    val.tofile(os.path.join(args.out, "val.bin"))
    print(f"{nfiles} files, {total/1e6:.1f}M tokens -> "
          f"train {len(train)/1e6:.1f}M / val {len(val)/1e6:.1f}M at {args.out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
