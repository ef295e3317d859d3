"""HF Llama-family checkpoint import: logit parity with transformers.

A randomly-initialized tiny LlamaForCausalLM (offline; no downloads) is
converted with models.convert.import_hf_llama and must reproduce HF's
logits through OUR stack — RoPE convention, RMSNorm eps, GQA head layout,
[out,in]→[in,out] transposes, and the untied lm_head all have to line up
for this to pass.
"""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from flash_attention_dlrs_tpu.models import forward, loss_fn
from flash_attention_dlrs_tpu.models.convert import (
    config_from_hf,
    import_hf_llama,
)


def _tiny_hf(tie: bool, seed: int = 0, eps: float = 1e-5):
    cfg = transformers.LlamaConfig(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=256, rms_norm_eps=eps,
        rope_theta=10000.0, tie_word_embeddings=tie,
    )
    torch.manual_seed(seed)
    return transformers.LlamaForCausalLM(cfg).eval()


@pytest.mark.parametrize("tie", [False, True])
def test_logit_parity_with_hf(tie):
    hf = _tiny_hf(tie)
    params, cfg = import_hf_llama(hf, dtype=jnp.float32)
    cfg = dataclasses.replace(cfg, remat=False)
    assert cfg.tie_embeddings == tie
    assert cfg.norm_eps == 1e-5 and cfg.n_kv_heads == 2
    assert ("unembed" in params) == (not tie)

    ids = np.array([[3, 17, 99, 4, 4, 56, 120, 7],
                    [1, 2, 3, 4, 5, 6, 7, 8]], np.int32)
    with torch.no_grad():
        want = hf(torch.from_numpy(ids).long()).logits.numpy()
    got = np.asarray(forward(params, jnp.asarray(ids), cfg))
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-3)


def test_untied_loss_and_grads_flow():
    hf = _tiny_hf(False)
    params, cfg = import_hf_llama(hf, dtype=jnp.float32)
    cfg = dataclasses.replace(cfg, remat=False, loss_chunk=4)
    toks = jnp.asarray(np.random.default_rng(0).integers(0, 128, (2, 9)))
    loss, grads = jax.value_and_grad(loss_fn)(params, toks, cfg=cfg)
    assert np.isfinite(float(loss))
    # the untied head gets its own gradient
    assert float(jnp.abs(grads["unembed"]).max()) > 0


def test_state_dict_import_requires_cfg_and_validates():
    hf = _tiny_hf(False)
    state = hf.state_dict()
    with pytest.raises(ValueError, match="cfg is required"):
        import_hf_llama(state)
    cfg = config_from_hf(hf.config, dtype=jnp.float32)
    params, _ = import_hf_llama(state, cfg=cfg)
    assert len(params["layers"]) == 2
    with pytest.raises(ValueError, match="Llama-family"):
        import_hf_llama({"foo": 1}, cfg=cfg)
    short = {k: v for k, v in state.items() if ".layers.1." not in k}
    with pytest.raises(ValueError, match="layer 1"):
        import_hf_llama(short, cfg=cfg)


def test_untied_model_serves_greedy_parity():
    """Imported-untied params run the paged serving engine; greedy tokens
    match the dense forward (unembed_matrix threads through decoding)."""
    from flash_attention_dlrs_tpu.runtime import DecodeEngine

    hf = _tiny_hf(False, seed=3)
    params, cfg = import_hf_llama(hf, dtype=jnp.float32)
    cfg = dataclasses.replace(cfg, remat=False)
    eng = DecodeEngine(
        params, cfg, num_pages=16, page_size=128, num_slots=1,
        pages_per_seq=4, kv_dtype=jnp.float32,
    )
    prompt = [5, 7, 11, 13, 17]
    got = eng.generate([prompt], max_new_tokens=5)[0]
    toks = list(prompt)
    want = []
    for _ in range(5):
        logits = forward(params, jnp.asarray([toks], jnp.int32), cfg)
        nxt = int(jnp.argmax(logits[0, len(toks) - 1]))
        want.append(nxt)
        toks.append(nxt)
    assert got == want


def test_mistral_sliding_window_parity():
    """Tiny MistralForCausalLM with a window SHORTER than the sequence:
    parity requires our banded-window kernels to match HF's sliding mask."""
    mcfg = transformers.MistralConfig(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=256, rms_norm_eps=1e-5,
        sliding_window=8, tie_word_embeddings=False,
        attn_implementation="eager",
    )
    torch.manual_seed(1)
    hf = transformers.MistralForCausalLM(mcfg).eval()
    params, cfg = import_hf_llama(hf, dtype=jnp.float32)
    assert cfg.window == 8
    cfg = dataclasses.replace(cfg, remat=False)
    ids = np.random.default_rng(2).integers(0, 128, (2, 24)).astype(np.int32)
    with torch.no_grad():
        want = hf(torch.from_numpy(ids).long()).logits.numpy()
    got = np.asarray(forward(params, jnp.asarray(ids), cfg))
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-3)


def test_windowed_model_engine_modes():
    """Window < max context on a uniformly-sliding model engages the
    rolling KV ring (see test_engine.py for its parity tests); window >=
    max context serves with full residency."""
    from flash_attention_dlrs_tpu.models import ModelConfig, init_params
    from flash_attention_dlrs_tpu.runtime import DecodeEngine

    cfg = ModelConfig.tiny(dtype=jnp.float32, remat=False, window=128)
    params = init_params(jax.random.PRNGKey(0), cfg)
    eng = DecodeEngine(params, cfg, num_pages=16, page_size=128,
                       num_slots=1, pages_per_seq=4, kv_dtype=jnp.float32)
    assert eng.rolling and eng.pages_per_seq == 1
    # exact full residency when the window covers the max context
    eng = DecodeEngine(params, cfg, num_pages=4, page_size=128, num_slots=1,
                       pages_per_seq=1, kv_dtype=jnp.float32)
    assert not eng.rolling


def test_qwen2_bias_parity():
    """Tiny Qwen2 (QKV biases, big rope theta): logit parity through the
    optional-bias projection path; biases land head-sharded in the specs."""
    qcfg = transformers.Qwen2Config(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=256, rms_norm_eps=1e-6,
        rope_theta=1000000.0, tie_word_embeddings=False,
        use_sliding_window=False, sliding_window=4096,
        attn_implementation="eager",
    )
    torch.manual_seed(2)
    hf = transformers.Qwen2ForCausalLM(qcfg).eval()
    params, cfg = import_hf_llama(hf, dtype=jnp.float32)
    assert cfg.window == 0  # use_sliding_window=False gates it off
    assert "bq" in params["layers"][0]
    cfg = dataclasses.replace(cfg, remat=False)
    ids = np.random.default_rng(4).integers(0, 128, (2, 12)).astype(np.int32)
    with torch.no_grad():
        want = hf(torch.from_numpy(ids).long()).logits.numpy()
    got = np.asarray(forward(params, jnp.asarray(ids), cfg))
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-3)
    # head-sharded bias specs exist
    from jax.sharding import Mesh
    from flash_attention_dlrs_tpu.models import param_shardings
    mesh = Mesh(np.array(jax.devices()[:1]).reshape(1, 1), ("data", "model"))
    specs = param_shardings(params, mesh)
    assert "bq" in specs["layers"][0]


def _tiny_gemma2(seed=5, sliding_window=8):
    cfg = transformers.Gemma2Config(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=4, num_attention_heads=4, num_key_value_heads=2,
        head_dim=16, query_pre_attn_scalar=32, rms_norm_eps=1e-6,
        sliding_window=sliding_window, attn_logit_softcapping=50.0,
        final_logit_softcapping=30.0, max_position_embeddings=256,
        attn_implementation="eager",
    )
    torch.manual_seed(seed)
    return transformers.Gemma2ForCausalLM(cfg).eval()


def test_gemma2_logit_parity():
    """Tiny Gemma-2: GeGLU, (1+w) norms folded at import, sandwich norms,
    sqrt(d_model) embedding scale, query_pre_attn_scalar softmax scale,
    attention+final logit soft-capping, and the EVEN-layer sliding window
    (8 < seq 24 so the alternating banded masks actually differ)."""
    from flash_attention_dlrs_tpu.models.convert import import_hf_gemma

    hf = _tiny_gemma2()
    params, cfg = import_hf_gemma(hf, dtype=jnp.float32)
    assert cfg.window == 8 and cfg.window_pattern == "even"
    assert cfg.attn_softcap == 50.0 and cfg.final_softcap == 30.0
    assert cfg.sm_scale == 32 ** -0.5 and cfg.embed_scale
    assert "post_attn_norm" in params["layers"][0]
    cfg = dataclasses.replace(cfg, remat=False)
    ids = np.random.default_rng(6).integers(0, 128, (2, 24)).astype(np.int32)
    with torch.no_grad():
        want = hf(torch.from_numpy(ids).long()).logits.numpy()
    got = np.asarray(forward(params, jnp.asarray(ids), cfg))
    np.testing.assert_allclose(got, want, atol=3e-4, rtol=1e-3)


def test_gemma1_logit_parity():
    """Gemma-1: GeGLU + (1+w) norms + embed scale, Llama-shaped norm
    placement, no soft-capping or sliding window."""
    from flash_attention_dlrs_tpu.models.convert import import_hf_gemma

    gcfg = transformers.GemmaConfig(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=16, rms_norm_eps=1e-6, max_position_embeddings=256,
        attn_implementation="eager",
    )
    torch.manual_seed(6)
    hf = transformers.GemmaForCausalLM(gcfg).eval()
    params, cfg = import_hf_gemma(hf, dtype=jnp.float32)
    assert cfg.window == 0 and cfg.attn_softcap == 0.0
    assert "post_attn_norm" not in params["layers"][0]
    cfg = dataclasses.replace(cfg, remat=False)
    ids = np.random.default_rng(7).integers(0, 128, (2, 16)).astype(np.int32)
    with torch.no_grad():
        want = hf(torch.from_numpy(ids).long()).logits.numpy()
    got = np.asarray(forward(params, jnp.asarray(ids), cfg))
    np.testing.assert_allclose(got, want, atol=3e-4, rtol=1e-3)


def test_gemma2_serves_greedy_parity():
    """Imported Gemma-2 runs the paged engine (softcap decode kernels, the
    window covering max context): greedy tokens match the dense forward."""
    from flash_attention_dlrs_tpu.models.convert import import_hf_gemma
    from flash_attention_dlrs_tpu.runtime import DecodeEngine

    hf = _tiny_gemma2(seed=8, sliding_window=128)
    params, cfg = import_hf_gemma(hf, dtype=jnp.float32)
    cfg = dataclasses.replace(cfg, remat=False)
    eng = DecodeEngine(
        params, cfg, num_pages=4, page_size=128, num_slots=1,
        pages_per_seq=1, kv_dtype=jnp.float32,
    )
    prompt = [3, 99, 14, 5]
    got = eng.generate([prompt], max_new_tokens=5)[0]
    toks = list(prompt)
    want = []
    for _ in range(5):
        logits = forward(params, jnp.asarray([toks], jnp.int32), cfg)
        nxt = int(jnp.argmax(logits[0, len(toks) - 1]))
        want.append(nxt)
        toks.append(nxt)
    assert got == want


def test_phi3_fused_projection_parity():
    """Phi-3: fused qkv_proj / gate_up_proj split into the Llama layout."""
    from flash_attention_dlrs_tpu.models.convert import import_hf_phi3

    pcfg = transformers.Phi3Config(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=256, rms_norm_eps=1e-5, sliding_window=None,
        pad_token_id=0, tie_word_embeddings=False,
        attn_implementation="eager",
    )
    torch.manual_seed(9)
    hf = transformers.Phi3ForCausalLM(pcfg).eval()
    params, cfg = import_hf_phi3(hf, dtype=jnp.float32)
    assert "unembed" in params and cfg.n_kv_heads == 2
    cfg = dataclasses.replace(cfg, remat=False)
    ids = np.random.default_rng(8).integers(0, 128, (2, 10)).astype(np.int32)
    with torch.no_grad():
        want = hf(torch.from_numpy(ids).long()).logits.numpy()
    got = np.asarray(forward(params, jnp.asarray(ids), cfg))
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-3)
    # a split-projection dict is rejected with guidance
    with pytest.raises(ValueError, match="qkv_proj"):
        import_hf_phi3(_tiny_hf(False), dtype=jnp.float32)


def test_imported_model_weight_quantization():
    """quantize_params on imported (untied, biased) params: projections go
    int8, biases/unembed/norms stay, logits track the fp32 model."""
    from flash_attention_dlrs_tpu.models import quantize_params
    from flash_attention_dlrs_tpu.ops.quantization import QuantizedTensor

    qcfg = transformers.Qwen2Config(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=256, tie_word_embeddings=False,
        use_sliding_window=False, attn_implementation="eager",
    )
    torch.manual_seed(11)
    hf = transformers.Qwen2ForCausalLM(qcfg).eval()
    params, cfg = import_hf_llama(hf, dtype=jnp.float32)
    cfg = dataclasses.replace(cfg, remat=False)
    qp = quantize_params(params)
    assert isinstance(qp["layers"][0]["wq"], QuantizedTensor)
    assert "bq" in qp["layers"][0] and "unembed" in qp
    ids = np.random.default_rng(9).integers(0, 128, (1, 12)).astype(np.int32)
    full = np.asarray(forward(params, jnp.asarray(ids), cfg))
    quant = np.asarray(forward(qp, jnp.asarray(ids), cfg))
    # int8 weight error is small on random tiny weights
    assert np.max(np.abs(full - quant)) < 0.15
    assert np.argmax(full[0, -1]) == np.argmax(quant[0, -1])


def test_llama3_rope_scaling_parity():
    """Llama-3.1-style rope_scaling (NTK-by-parts) maps through the
    importer and matches HF logits; unsupported kinds refuse loudly."""
    from flash_attention_dlrs_tpu.models.convert import config_from_hf

    lcfg = transformers.LlamaConfig(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=256, rope_theta=500000.0,
        rope_scaling={"rope_type": "llama3", "factor": 8.0,
                      "low_freq_factor": 1.0, "high_freq_factor": 4.0,
                      "original_max_position_embeddings": 64},
        tie_word_embeddings=False, attn_implementation="eager",
    )
    torch.manual_seed(12)
    hf = transformers.LlamaForCausalLM(lcfg).eval()
    params, cfg = import_hf_llama(hf, dtype=jnp.float32)
    assert cfg.rope_scaling[0] == "llama3" and cfg.rope_scaling[1] == 8.0
    cfg = dataclasses.replace(cfg, remat=False)
    ids = np.random.default_rng(10).integers(0, 128, (2, 40)).astype(np.int32)
    with torch.no_grad():
        want = hf(torch.from_numpy(ids).long()).logits.numpy()
    got = np.asarray(forward(params, jnp.asarray(ids), cfg))
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-3)
    # scaling actually changes the function
    cfg_ns = dataclasses.replace(cfg, rope_scaling=None)
    assert not np.allclose(got, forward(params, jnp.asarray(ids), cfg_ns))
    # unsupported kind refuses
    bad = transformers.LlamaConfig(
        vocab_size=128, hidden_size=64, num_hidden_layers=1,
        num_attention_heads=4,
        rope_scaling={"rope_type": "longrope", "factor": 4.0,
                      "short_factor": [1.0] * 8, "long_factor": [1.0] * 8},
    )
    with pytest.raises(NotImplementedError, match="rope_scaling"):
        config_from_hf(bad)


def test_yarn_rope_scaling_parity():
    """YaRN (arXiv:2309.00071) frequency blending + attention scaling on
    cos/sin matches transformers logits."""
    lcfg = transformers.LlamaConfig(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=512, rope_theta=10000.0,
        rope_scaling={"rope_type": "yarn", "factor": 4.0,
                      "original_max_position_embeddings": 128},
        tie_word_embeddings=True, attn_implementation="eager",
    )
    torch.manual_seed(13)
    hf = transformers.LlamaForCausalLM(lcfg).eval()
    params, cfg = import_hf_llama(hf, dtype=jnp.float32)
    assert cfg.rope_scaling[0] == "yarn"
    # attention_factor default = 0.1*ln(4)+1
    assert cfg.rope_scaling[5] == pytest.approx(0.1 * np.log(4.0) + 1.0)
    cfg = dataclasses.replace(cfg, remat=False)
    ids = np.random.default_rng(11).integers(0, 128, (2, 48)).astype(np.int32)
    with torch.no_grad():
        want = hf(torch.from_numpy(ids).long()).logits.numpy()
    got = np.asarray(forward(params, jnp.asarray(ids), cfg))
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-3)


def test_qwen2_max_window_layers_parity():
    """use_sliding_window=True with max_window_layers=K: the FIRST K layers
    attend fully, layers >= K slide (window_pattern='from:K')."""
    qcfg = transformers.Qwen2Config(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=4, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=256, use_sliding_window=True,
        sliding_window=8, max_window_layers=2, tie_word_embeddings=True,
        attn_implementation="eager",
    )
    assert qcfg.layer_types == ["full_attention"] * 2 + \
        ["sliding_attention"] * 2
    torch.manual_seed(14)
    hf = transformers.Qwen2ForCausalLM(qcfg).eval()
    params, cfg = import_hf_llama(hf, dtype=jnp.float32)
    assert cfg.window == 8 and cfg.window_pattern == "from:2"
    cfg = dataclasses.replace(cfg, remat=False)
    ids = np.random.default_rng(12).integers(0, 128, (2, 24)).astype(np.int32)
    with torch.no_grad():
        want = hf(torch.from_numpy(ids).long()).logits.numpy()
    got = np.asarray(forward(params, jnp.asarray(ids), cfg))
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-3)


def test_gemma2_params_shard():
    """param_shardings covers the sandwich-norm keys — imported Gemma-2
    places on a mesh without a pytree mismatch."""
    from jax.sharding import Mesh
    from flash_attention_dlrs_tpu.models import param_shardings
    from flash_attention_dlrs_tpu.models.convert import import_hf_gemma

    hf = _tiny_gemma2()
    params, cfg = import_hf_gemma(hf, dtype=jnp.float32)
    mesh = Mesh(np.array(jax.devices()[:1]).reshape(1, 1), ("data", "model"))
    shardings = param_shardings(params, mesh, n_kv_heads=cfg.n_kv_heads)
    placed = jax.tree.map(jax.device_put, params, shardings)
    assert "post_attn_norm" in placed["layers"][0]
