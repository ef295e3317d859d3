"""Import a HuggingFace checkpoint and run it end-to-end.

Uses a tiny randomly-initialized LlamaForCausalLM (offline — no downloads;
swap in `LlamaForCausalLM.from_pretrained(...)` for a real checkpoint),
verifies logit parity against transformers, then serves it through the
paged decode engine and fine-tunes it one step.

The same flow covers Mistral and Qwen2 (`import_hf_llama`), Phi-3
(`import_hf_phi3` — fused projections split automatically), and
Gemma-1/2 (`import_hf_gemma` — GeGLU, sandwich norms, soft-capping,
alternating sliding window); every family has a logit-parity test in
tests/test_convert.py.

    python examples/05_import_hf.py
"""

import dataclasses

import numpy as np

import jax
import jax.numpy as jnp


def main():
    import torch
    from transformers import LlamaConfig, LlamaForCausalLM

    from flash_attention_dlrs_tpu.models import (
        forward, import_hf_llama, make_train_state, make_train_step,
    )
    from flash_attention_dlrs_tpu.runtime import DecodeEngine

    hf_cfg = LlamaConfig(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        rms_norm_eps=1e-5, tie_word_embeddings=False,
    )
    torch.manual_seed(0)
    hf = LlamaForCausalLM(hf_cfg).eval()

    # --- convert ---------------------------------------------------------
    params, cfg = import_hf_llama(hf, dtype=jnp.float32)
    cfg = dataclasses.replace(cfg, remat=False)
    print(f"imported: {cfg.n_layers} layers, {cfg.n_q_heads}q/{cfg.n_kv_heads}kv "
          f"heads, untied head={'unembed' in params}")

    # --- logit parity ----------------------------------------------------
    ids = np.array([[3, 17, 99, 4, 56, 120, 7, 1]], np.int32)
    with torch.no_grad():
        want = hf(torch.from_numpy(ids).long()).logits.numpy()
    got = np.asarray(forward(params, jnp.asarray(ids), cfg))
    err = float(np.abs(got - want).max())
    print(f"max |logit - HF| = {err:.2e}")
    assert err < 2e-4

    # --- serve it --------------------------------------------------------
    eng = DecodeEngine(params, cfg, num_pages=16, page_size=128,
                       num_slots=1, pages_per_seq=4, kv_dtype=jnp.float32)
    toks = eng.generate([[5, 7, 11]], max_new_tokens=6)[0]
    print("generated:", toks)

    # --- fine-tune one step (optimizer state over the IMPORTED params) ----
    _, _, optimizer = make_train_state(jax.random.PRNGKey(0), cfg)
    opt_state = optimizer.init(params)
    step = make_train_step(cfg, optimizer)
    batch = jnp.asarray(np.random.default_rng(0).integers(0, 256, (2, 33)))
    params2, opt_state, loss = step(params, opt_state, batch)
    print(f"fine-tune step ok, loss={float(loss):.4f}")


if __name__ == "__main__":
    main()
