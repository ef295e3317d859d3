"""Scale out over a device mesh: dp x tp sharded training and ring
(sequence-parallel) attention.

On a real pod, run as-is (one process per host after
`initialize_distributed()` — see docs/MULTIHOST.md).  Without TPU hardware,
rehearse on 8 virtual CPU devices:

    python examples/04_multichip_mesh.py --cpu-mesh
"""

import os
import sys

if "--cpu-mesh" in sys.argv:
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + " --xla_force_host_platform_device_count=8"
    )

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from flash_attention_dlrs_tpu.models import (
    ModelConfig, make_train_state, make_train_step,
)
from flash_attention_dlrs_tpu.parallel import make_mesh, ring_attention
from flash_attention_dlrs_tpu.ops import reference_attention


def main():
    n_dev = len(jax.devices())
    print(f"{n_dev} devices ({jax.devices()[0].platform})")

    # --- dp x tp training: params sharded over 'model', batch over 'data'.
    # model axis must divide the head counts (4q/2kv here): tp=2, rest dp.
    tp = 2 if n_dev % 2 == 0 and n_dev > 1 else 1
    mesh = make_mesh((n_dev // tp, tp), ("data", "model"))
    cfg = ModelConfig.tiny(dtype=jnp.float32, remat=False)
    params, opt_state, optimizer = make_train_state(
        jax.random.PRNGKey(0), cfg, mesh, learning_rate=1e-3)
    step = make_train_step(cfg, optimizer, mesh)
    data = jax.random.randint(jax.random.PRNGKey(1), (4, 129), 0, 64)
    for i in range(2):
        params, opt_state, loss = step(params, opt_state, data)
        print(f"sharded train step {i}: loss {float(loss):.4f}")

    # --- ring attention: K/V blocks rotate around a context axis, so the
    # sequence dimension shards across every chip (32K tokens on 8 chips =
    # 4K resident per chip).  The lse-weighted merge is exact, and the
    # custom-vjp backward rotates dK/dV accumulators the same way.
    ring_mesh = make_mesh((n_dev,), ("ctx",))
    b, h, n, d = 1, 4, 1024, 64
    ks = jax.random.split(jax.random.PRNGKey(2), 3)
    q = jax.random.normal(ks[0], (b, h, n, d))
    k = jax.random.normal(ks[1], (b, h, n, d))
    v = jax.random.normal(ks[2], (b, h, n, d))

    from functools import partial
    from jax import shard_map

    spec = P(None, None, "ctx", None)
    ring = shard_map(
        partial(ring_attention, axis_name="ctx", causal=False,
                sm_scale=d**-0.5),
        mesh=ring_mesh, in_specs=(spec, spec, spec), out_specs=spec,
        check_vma=False,
    )
    o = jax.jit(ring)(q, k, v)
    ref = reference_attention(q, k, v, sm_scale=d**-0.5)
    print("ring attention max err vs dense:",
          float(jnp.abs(o - ref).max()))


if __name__ == "__main__":
    main()
