"""Strip-kernel config experiments on real TPU (round-4 scratch harness).

Times fwd_mid_strip_pallas directly over (sub, strip, wide, pipeline)
variants at the headline shape.  Not part of the bench suite — a working
tool for kernel iteration; results land in the commit messages and
docs/DESIGN.md ablations.
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
    ap.add_argument("--n", type=int, default=4096)
    ap.add_argument("--b", type=int, default=8)
    ap.add_argument("--h", type=int, default=16)
    ap.add_argument("--d", type=int, default=128)
    ap.add_argument(
        "--cfg", nargs="*", default=None,
        help="sub,strip,wide,pipeline[,wide_static] tuples e.g. 256,4096,1024,2,2",
    )
    args = ap.parse_args()
    b, h, n, d = args.b, args.h, args.n, args.d
    keys = jax.random.split(jax.random.PRNGKey(0), 3)
    q = jax.random.normal(keys[0], (b, h, n, d), jnp.bfloat16)
    k = jax.random.normal(keys[1], (b, h, n, d), jnp.bfloat16)
    v = jax.random.normal(keys[2], (b, h, n, d), jnp.bfloat16)
    fl = attention_flops(b, h, n, n, d, causal=True, mode="fwd")

    cfgs = args.cfg or [
        "512,1024,1024,0",
        "512,1024,1024,1",
        "512,2048,1024,0",
        "512,2048,1024,1",
        "512,1024,512,1",
        "256,1024,1024,1",
    ]
    for c in cfgs:
        parts = [int(x) for x in c.split(",")]
        sub, strip, wide, pipe = parts[:4]
        ws = parts[4] if len(parts) > 4 else 1
        if n % strip or strip % wide or wide % sub:
            print(f"cfg {c}: skipped (divisibility)")
            continue
        try:
            sec = time_fn(
                lambda q_, k_, v_: fwd_mid.fwd_mid_strip_pallas(
                    q_, k_, v_, sm_scale=d**-0.5, kv_len=n,
                    sub=sub, strip=strip, wide=wide, pipeline=pipe,
                    wide_static=ws,
                )[0],
                q, k, v, anchor="elem",
            )
            print(f"cfg sub={sub} strip={strip} wide={wide} pipe={pipe} "
                  f"ws={ws}: "
                  f"{fl / sec / 1e12:.1f} TF/s ({sec*1e3:.3f} ms)")
        except Exception as e:
            msg = str(e).split("\n")[0][:160]
            print(f"cfg {c}: FAIL {type(e).__name__}: {msg}")


if __name__ == "__main__":
    main()
