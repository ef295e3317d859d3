"""Full golden-reference gate: 200 seeded trials, forward + backward.

Reproduces the reference harness protocol end to end
(reference: src/test_correctness.py:9-14,28-84): NUM_TESTS=200 deterministic
seeds at B=32, H=32, N=256, d=128, FP32, unscaled scores (sm_scale=1), with
tolerances fwd atol 1e-4 and dQ/dK/dV atol 9e-4/7e-4/7e-5 (rtol 1e-5) — but
with a real exit code (the reference only printed pass counts).

Run on TPU:   python scripts/run_golden_gate.py
Run on CPU:   PYTHONPATH= JAX_PLATFORMS=cpu python scripts/run_golden_gate.py --trials 5 --small
"""

import argparse
import sys

import jax
import jax.numpy as jnp


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--trials", type=int, default=200)
    ap.add_argument("--small", action="store_true", help="B=2,H=2 workload")
    ap.add_argument("--causal", action="store_true")
    args = ap.parse_args()

    sys.path.insert(0, ".")
    from flash_attention_dlrs_tpu import flash_attention
    from flash_attention_dlrs_tpu.ops import (
        reference_attention,
        reference_attention_grads,
    )

    b, h, n, d = (2, 2, 256, 128) if args.small else (32, 32, 256, 128)
    fwd_atol, tol = 1e-4, {"dq": 9e-4, "dk": 7e-4, "dv": 7e-5}
    rtol = 1e-5

    # History: the multi-kernel backward (recompute from the saved
    # logsumexp) needed ×10-scaled tolerances on TPU — the MXU has no fp32
    # FMA (HIGHEST = multi-pass bf16 emulation whose absolute error grows
    # with |S|, ~4e-5 at this sm_scale=1 workload vs ~2e-6 on GPU), and the
    # lse round-trip amplified it to ~5e-3 in dQ.  The fused one-shot
    # backward for short sequences (ops/fwd_small.py) recomputes softmax
    # inline instead, and the gate workload (N=256) now meets the
    # reference's ORIGINAL tolerances unscaled on TPU (measured worst:
    # dq 1.6e-4, dk 1.6e-4, dv 1.6e-5).  See BASELINE.md.

    @jax.jit
    def run(q, k, v, do):
        o = flash_attention(q, k, v, causal=args.causal, sm_scale=1.0)
        o_ref = reference_attention(q, k, v, causal=args.causal, sm_scale=1.0)
        _, vjp = jax.vjp(
            lambda *a: flash_attention(*a, causal=args.causal, sm_scale=1.0),
            q, k, v,
        )
        grads = vjp(do)
        grads_ref = reference_attention_grads(
            q, k, v, do, causal=args.causal, sm_scale=1.0
        )
        def gap(a, bb):
            return jnp.max(jnp.abs(a - bb) - rtol * jnp.abs(bb))
        return (
            gap(o, o_ref),
            gap(grads[0], grads_ref[0]),
            gap(grads[1], grads_ref[1]),
            gap(grads[2], grads_ref[2]),
        )

    fwd_pass = bwd_pass = 0
    worst = [0.0, 0.0, 0.0, 0.0]
    for trial in range(args.trials):
        keys = jax.random.split(jax.random.PRNGKey(trial), 4)
        q, k, v = (jax.random.normal(ky, (b, h, n, d), jnp.float32) for ky in keys[:3])
        do = jax.random.normal(keys[3], (b, h, n, d), jnp.float32)
        go, gq, gk, gv = (float(x) for x in run(q, k, v, do))
        worst = [max(w, g) for w, g in zip(worst, (go, gq, gk, gv))]
        fwd_pass += go <= fwd_atol
        bwd_pass += (gq <= tol["dq"]) and (gk <= tol["dk"]) and (gv <= tol["dv"])
    print(f"forward : {fwd_pass}/{args.trials} within atol {fwd_atol}")
    print(f"backward: {bwd_pass}/{args.trials} within {tol}")
    print(f"worst gaps (fwd,dq,dk,dv): {[f'{w:.2e}' for w in worst]}")
    ok = fwd_pass == args.trials and bwd_pass == args.trials
    print("GATE:", "PASS" if ok else "FAIL")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
