"""Profile the 1-chip train step and print a per-op device-time breakdown.

The reference has no profiler integration (SURVEY.md §5: "tracing/profiling:
none beyond benchmarking"); this is the TPU-native equivalent — capture a
jax.profiler trace around steady-state train steps and reduce the XLA device
track to a table of op-category self-times, so "where does the step time go"
is a one-command question (feeds the MFU tuning loop in bench_train.py).

Run on TPU:  python scripts/profile_train.py [--seq 2048] [--batch 8] ...
Writes the raw trace under /tmp/fa_tpu_trace (open with XProf) and prints
the aggregated table to stdout.
"""

import argparse
import glob
import gzip
import json
import os
import re
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/fa_tpu_jit_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def capture(args) -> str:
    """Run warmup + traced steps; return the trace directory."""
    from flash_attention_dlrs_tpu.models import (
        ModelConfig, make_train_state, make_train_step,
    )

    cfg = ModelConfig(
        vocab_size=32000, d_model=4096, n_layers=args.layers,
        n_q_heads=32, n_kv_heads=8, head_dim=128, d_ff=11008,
        dtype=jnp.bfloat16, remat=True, remat_policy=args.remat_policy,
        remat_skip=args.remat_skip, loss_chunk=args.loss_chunk,
    )
    params, opt_state, optimizer = make_train_state(
        jax.random.PRNGKey(0), cfg, optimizer_name=args.optimizer
    )
    step = make_train_step(cfg, optimizer)
    tokens = jax.random.randint(
        jax.random.PRNGKey(1), (args.batch, args.seq + 1), 0, cfg.vocab_size
    )

    for _ in range(2):  # compile + warm
        params, opt_state, loss = step(params, opt_state, tokens)
    jax.block_until_ready(loss)

    trace_dir = args.trace_dir
    jax.profiler.start_trace(trace_dir, create_perfetto_trace=True)
    for _ in range(args.steps):
        params, opt_state, loss = step(params, opt_state, tokens)
    jax.block_until_ready(loss)
    jax.profiler.stop_trace()
    return trace_dir


_CATEGORIES = (
    # (label, regex over the hlo op name)
    ("flash fwd kernel", r"fa_tpu_fwd|fwd_mid|fwd_small|mid_kernel"),
    ("flash bwd kernel", r"fa_tpu_bwd|bwd_mid|bwd_fused|bwd_dkv|bwd_dq|bwd_small"),
    ("matmul (fusion w/ dot)", r"^(loop_)?(convert_)?fusion.*dot|^dot|^convolution"),
    ("all other fusions", r"fusion"),
    ("copy/transpose", r"copy|transpose"),
    ("dynamic-slice/update", r"dynamic"),
    ("misc", r""),
)


def summarize_perfetto(trace_dir: str, steps: int) -> None:
    """Aggregate the perfetto trace's device-track slices by op name."""
    paths = sorted(
        glob.glob(os.path.join(trace_dir, "**", "*.json.gz"), recursive=True),
        key=os.path.getmtime,
    )
    if not paths:
        print("no perfetto trace found under", trace_dir)
        return
    with gzip.open(paths[-1], "rt") as f:
        data = json.load(f)
    events = data["traceEvents"] if isinstance(data, dict) else data

    # device tracks: process names containing "TPU" (XLA op slices live there)
    tpu_pids = set()
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            if "TPU" in e.get("args", {}).get("name", ""):
                tpu_pids.add(e["pid"])

    by_name: dict = {}
    total = 0.0
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in tpu_pids:
            continue
        # XLA op slices carry a "long_name"/"name"; skip module-level spans
        # (they contain the whole step and would double-count their children).
        name = e.get("name", "")
        if name.startswith("jit_") or name == "":
            continue
        dur = e.get("dur", 0) / 1e6  # us → s
        by_name[name] = by_name.get(name, 0.0) + dur
        total += dur

    per_step = {}
    cat_tot = {}
    for name, sec in by_name.items():
        for label, pat in _CATEGORIES:
            if re.search(pat, name):
                cat_tot[label] = cat_tot.get(label, 0.0) + sec
                break
        per_step[name] = sec / steps

    print(f"\n== device time by category ({steps} steps) ==")
    for label, _ in _CATEGORIES:
        if label in cat_tot:
            ms = cat_tot[label] / steps * 1e3
            print(f"  {label:28s} {ms:9.2f} ms/step  {100*cat_tot[label]/total:5.1f}%")
    print(f"  {'TOTAL (sum of op slices)':28s} {total/steps*1e3:9.2f} ms/step")

    print("\n== top 25 ops by device time ==")
    for name, sec in sorted(per_step.items(), key=lambda kv: -kv[1])[:25]:
        print(f"  {sec*1e3:9.3f} ms/step  {name[:110]}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seq", type=int, default=2048)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--layers", type=int, default=8)
    ap.add_argument("--steps", type=int, default=3)
    ap.add_argument("--remat-policy", default="save_dots",
                    choices=["block", "save_flash", "save_dots", "save_matmuls"])
    ap.add_argument("--remat-skip", type=int, default=0)
    ap.add_argument("--loss-chunk", type=int, default=256)
    ap.add_argument("--optimizer", default="adamw8bit",
                    choices=["adamw", "adamw8bit"])
    ap.add_argument("--trace-dir", default="/tmp/fa_tpu_trace")
    ap.add_argument("--parse-only", action="store_true",
                    help="skip capture; summarize an existing trace dir")
    args = ap.parse_args()

    if not args.parse_only:
        capture(args)
    summarize_perfetto(args.trace_dir, args.steps)


if __name__ == "__main__":
    main()
