"""Train a tiny GQA transformer end-to-end: loss down, checkpoint round-trip.

Runs anywhere (CPU interpret mode / one TPU chip).  The same code scales to
a mesh — see 04_multichip_mesh.py.

    python examples/02_train_tiny.py
"""

import tempfile

import jax
import jax.numpy as jnp

from flash_attention_dlrs_tpu.models import (
    ModelConfig, make_train_state, make_train_step,
)
from flash_attention_dlrs_tpu.utils import checkpoint


def main():
    cfg = ModelConfig.tiny(dtype=jnp.float32, remat=False)
    params, opt_state, optimizer = make_train_state(
        jax.random.PRNGKey(0), cfg, learning_rate=1e-3)
    step = make_train_step(cfg, optimizer)

    # Synthetic corpus with learnable structure (tokens repeat).
    data = jax.random.randint(
        jax.random.PRNGKey(1), (4, 129), 0, cfg.vocab_size // 4)

    losses = []
    for i in range(8):
        params, opt_state, loss = step(params, opt_state, data)
        losses.append(float(loss))
        print(f"step {i}: loss {loss:.4f}")
    assert losses[-1] < losses[0], "loss should decrease"

    with tempfile.TemporaryDirectory() as tmp:
        path = checkpoint.save_checkpoint(
            tmp, {"params": params, "opt": opt_state}, step=8)
        print("saved:", path, "latest:", checkpoint.latest_step(tmp))
        restored, at_step = checkpoint.restore_checkpoint(
            tmp, {"params": params, "opt": opt_state})
        leaf = jax.tree_util.tree_leaves(restored["params"])[0]
        print("restored at step", at_step, "leaf:", leaf.shape)


if __name__ == "__main__":
    main()
