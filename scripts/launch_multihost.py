"""Multi-host training launch: jax.distributed bring-up + sharded train loop.

Run the SAME command on every host of a pod slice (e.g. via `gcloud compute
tpus tpu-vm ssh --worker=all -- python scripts/launch_multihost.py ...`);
each process contributes its local chips to one global mesh and reads its
own shard of the corpus (runtime/data.py strides windows by process_index).

    python scripts/launch_multihost.py \
        --coordinator 10.0.0.2:8476 --num-processes 4 --process-id $WORKER \
        --dp 8 --tp 4 --steps 100 [--corpus tokens.bin]

On a single host (or under XLA_FLAGS=--xla_force_host_platform_device_count=N
JAX_PLATFORMS=cpu for a dry run) the coordinator flags are optional and the
script runs the identical code path on the local devices.

Reports tokens/s and tokens/s/chip — the scaling metric (BASELINE.md target:
>=80% of linear when going 1 chip -> 1 host -> N hosts).
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--coordinator", default=None,
                    help="host:port of process 0 (multi-host only)")
    ap.add_argument("--num-processes", type=int, default=None)
    ap.add_argument("--process-id", type=int, default=None)
    ap.add_argument("--dp", type=int, default=None,
                    help="data-parallel size (default: all devices)")
    ap.add_argument("--tp", type=int, default=1, help="tensor-parallel size")
    ap.add_argument("--batch-per-dp", type=int, default=8)
    ap.add_argument("--seq-len", type=int, default=1024)
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--corpus", default=None,
                    help="flat uint16 token file; synthetic data if omitted")
    ap.add_argument("--d-model", type=int, default=512)
    ap.add_argument("--n-layers", type=int, default=4)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from flash_attention_dlrs_tpu.models import (
        ModelConfig, make_train_state, make_train_step,
    )
    from flash_attention_dlrs_tpu.parallel import (
        initialize_distributed, make_mesh,
    )
    from flash_attention_dlrs_tpu.runtime.data import (
        LoaderState, TokenDataset, batches,
    )

    initialize_distributed(
        coordinator_address=args.coordinator,
        num_processes=args.num_processes,
        process_id=args.process_id,
    )
    n_dev = len(jax.devices())
    dp = args.dp or n_dev // args.tp
    if dp * args.tp != n_dev:
        raise SystemExit(f"dp({dp}) x tp({args.tp}) != devices({n_dev})")
    mesh = make_mesh([dp, args.tp], ("data", "model"))
    if jax.process_index() == 0:
        print(f"[launch] {jax.process_count()} processes, {n_dev} devices, "
              f"mesh dp={dp} tp={args.tp}")

    cfg = ModelConfig(
        vocab_size=32768, d_model=args.d_model, n_layers=args.n_layers,
        n_q_heads=max(8, args.tp), n_kv_heads=max(2, args.tp),
        head_dim=64, d_ff=args.d_model * 4,
        dtype=jnp.bfloat16, remat=True,
    )
    params, opt_state, optimizer = make_train_state(
        jax.random.PRNGKey(0), cfg, mesh
    )
    step = make_train_step(cfg, optimizer, mesh)

    batch = dp * args.batch_per_dp
    if args.corpus:
        ds = TokenDataset.from_file(args.corpus, args.seq_len)
        it = batches(ds, batch_size=batch // jax.process_count(),
                     state=LoaderState())
        next_batch = lambda: next(it)[0]
    else:
        rng = np.random.default_rng(jax.process_index())

        def next_batch():
            return rng.integers(
                0, cfg.vocab_size, (batch // jax.process_count(),
                                    args.seq_len + 1), np.int32
            )

    from jax.sharding import NamedSharding, PartitionSpec as P

    tok_sharding = NamedSharding(mesh, P("data", None))

    def global_batch():
        """Assemble the global [batch, seq+1] array from per-process local
        shards (each host feeds only its own data-axis slice)."""
        local = next_batch()
        if jax.process_count() == 1:
            return jax.device_put(local, tok_sharding)
        return jax.make_array_from_process_local_data(tok_sharding, local)

    # warm-up step compiles everything
    params, opt_state, loss = step(params, opt_state, global_batch())
    jax.block_until_ready(loss)

    t0 = time.perf_counter()
    for _ in range(args.steps):
        params, opt_state, loss = step(params, opt_state, global_batch())
    jax.block_until_ready(loss)
    dt = time.perf_counter() - t0

    toks = args.steps * batch * args.seq_len
    if jax.process_index() == 0:
        print(f"[launch] {args.steps} steps, loss={float(loss):.4f}")
        print(f"[launch] tokens/s       : {toks / dt:,.0f}")
        print(f"[launch] tokens/s/chip  : {toks / dt / n_dev:,.0f}")


if __name__ == "__main__":
    main()
