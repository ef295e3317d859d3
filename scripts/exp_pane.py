"""Pane-kernel config experiments on real TPU (round-4 scratch harness).

Times fwd_mid_pallas directly over (hb, sub, interleave) variants at the
N=512/1024 shapes where the pane path dispatches.  Not part of the bench
suite — a working tool for kernel iteration; results land in commit
messages and docs/DESIGN.md ablations.
"""

import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/fa_tpu_jit_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from flash_attention_dlrs_tpu.bench.suite import attention_flops, time_fn
from flash_attention_dlrs_tpu.ops import fwd_mid


def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, nargs="+", default=[512, 768, 1024])
    ap.add_argument("--b", type=int, default=8)
    ap.add_argument("--h", type=int, default=16)
    ap.add_argument("--d", type=int, default=128)
    ap.add_argument(
        "--cfg", nargs="*", default=None,
        help="hb,sub,interleave[,bb] tuples e.g. 8,256,1,2 (0 -> auto)",
    )
    args = ap.parse_args()
    b, h, d = args.b, args.h, args.d
    for n in args.n:
        keys = jax.random.split(jax.random.PRNGKey(0), 3)
        q = jax.random.normal(keys[0], (b, h, n, d), jnp.bfloat16)
        k = jax.random.normal(keys[1], (b, h, n, d), jnp.bfloat16)
        v = jax.random.normal(keys[2], (b, h, n, d), jnp.bfloat16)
        fl = attention_flops(b, h, n, n, d, causal=True, mode="fwd")
        cfgs = args.cfg or ["0,0,0", "0,0,1", "8,256,1", "4,256,1"]
        for c in cfgs:
            parts = [int(x) for x in c.split(",")]
            hb, sub, il = parts[:3]
            bb = parts[3] if len(parts) > 3 else 0
            kw = {}
            if hb:
                kw["hb"] = hb
            if sub:
                kw["sub"] = sub
            if bb:
                kw["bb"] = bb

            def run(q_, k_, v_):
                o, _ = fwd_mid.fwd_mid_pallas(
                    q_, k_, v_, sm_scale=d ** -0.5, kv_len=n,
                    interleave=il, **kw,
                )
                return o

            try:
                sec = time_fn(run, q, k, v)
            except Exception as e:  # noqa: BLE001
                print(f"n={n} cfg={c}: FAIL {type(e).__name__}: {str(e)[:120]}")
                continue
            print(
                f"n={n} hb={hb or 'auto'} sub={sub or 'auto'} il={il} "
                f"bb={bb or 'auto'}: "
                f"{sec*1e6:8.1f} us  {fl/sec/1e12:6.1f} TF/s",
                flush=True,
            )


if __name__ == "__main__":
    main()
