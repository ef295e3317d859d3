"""Full benchmark sweep + plots (reference protocol: N=2^7..2^15, fwd/bwd).

Run on the TPU:  python scripts/run_bench_suite.py [--quick]
"""

import argparse
import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/fa_tpu_jit_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true", help="N up to 2^12, fwd only")
    ap.add_argument("--no-plots", action="store_true")
    args = ap.parse_args()

    from flash_attention_dlrs_tpu.bench.suite import run_bench

    seq_lens = tuple(2**i for i in range(7, 13 if args.quick else 16))
    modes = ("fwd",) if args.quick else ("fwd", "bwd", "fwd+bwd")
    run_bench(seq_lens=seq_lens, modes=modes)

    if not args.no_plots:
        from flash_attention_dlrs_tpu.bench.plots import plot_bench_data

        for mode in modes:
            for y in ("tflops", "ms"):
                path = plot_bench_data(mode=mode, y=y, rerun_if_missing=False)
                print("plot:", path)


if __name__ == "__main__":
    main()
