"""High-level trainer (models/trainer.py): schedules, clipping,
accumulation equivalence, and bitwise checkpoint-resume."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from flash_attention_dlrs_tpu.models import ModelConfig
from flash_attention_dlrs_tpu.models.trainer import (
    TrainSpec,
    fit,
    lr_schedule,
    make_accum_train_step,
    make_optimizer,
)
from flash_attention_dlrs_tpu.runtime.data import TokenDataset, batches

CFG = ModelConfig.tiny(dtype=jnp.float32, remat=False)


def _corpus(n_tokens=6000, vocab=256, seed=0):
    rng = np.random.default_rng(seed)
    # learnable structure: short repeating motif + noise
    motif = rng.integers(0, vocab, 16)
    toks = np.tile(motif, n_tokens // 16 + 1)[:n_tokens]
    noise = rng.integers(0, vocab, n_tokens)
    keep = rng.random(n_tokens) < 0.8
    return np.where(keep, toks, noise).astype(np.uint16)


def _loader(state=None, batch=4, seq=32):
    ds = TokenDataset(_corpus(), seq)
    return batches(ds, batch_size=batch, seed=1, state=state,
                   process_index=0, process_count=1)


def test_lr_schedule_shapes():
    s = lr_schedule(TrainSpec(learning_rate=1e-3, warmup_steps=10,
                              total_steps=100, min_lr_ratio=0.1))
    assert float(s(0)) == 0.0
    assert float(s(10)) == pytest.approx(1e-3, rel=1e-6)
    assert float(s(100)) == pytest.approx(1e-4, rel=1e-2)
    const = lr_schedule(TrainSpec(learning_rate=5e-4))
    assert float(const(0)) == float(const(1000)) == 5e-4


def test_accum_matches_single_step():
    """accum_steps=2 over the concatenated batch == one step over it
    (same mean loss/grads -> same updated params, fp32 deterministic)."""
    from flash_attention_dlrs_tpu.models import (
        init_params, make_train_step,
    )

    spec = TrainSpec(learning_rate=1e-3)
    toks = jnp.asarray(
        np.random.default_rng(3).integers(0, 256, (4, 33)), jnp.int32)

    opt = make_optimizer(spec)
    p0 = init_params(jax.random.PRNGKey(0), CFG)
    s0 = opt.init(p0)
    p_ref, _, loss_ref = make_train_step(CFG, opt)(p0, s0, toks)

    opt2 = make_optimizer(spec)
    p1 = init_params(jax.random.PRNGKey(0), CFG)
    s1 = opt2.init(p1)
    step2 = make_accum_train_step(CFG, opt2, accum_steps=2)
    p_acc, _, loss_acc = step2(p1, s1, toks)

    assert float(loss_ref) == pytest.approx(float(loss_acc), rel=1e-5)
    # identical up to fp reduction order (mean-of-micro-means vs full mean)
    for a, b in zip(jax.tree.leaves(p_ref), jax.tree.leaves(p_acc)):
        np.testing.assert_allclose(a, b, atol=1e-5, rtol=1e-4)


def test_accum_rejects_indivisible_batch():
    spec = TrainSpec()
    opt = make_optimizer(spec)
    step = make_accum_train_step(CFG, opt, accum_steps=3)
    from flash_attention_dlrs_tpu.models import init_params

    p = init_params(jax.random.PRNGKey(0), CFG)
    s = opt.init(p)
    toks = jnp.zeros((4, 33), jnp.int32)
    with pytest.raises(ValueError, match="accum_steps"):
        step(p, s, toks)


def test_fit_learns_and_logs(tmp_path):
    metrics = tmp_path / "metrics.jsonl"
    losses = []
    fit(CFG, _loader(), spec=TrainSpec(learning_rate=3e-3,
                                       grad_clip_norm=1.0, warmup_steps=2),
        steps=20, seed=0, metrics_path=str(metrics), log_every=5,
        on_step=lambda s, l: losses.append(float(l)))
    assert len(losses) == 20
    assert np.mean(losses[-5:]) < np.mean(losses[:5])  # learning
    assert metrics.exists() and len(metrics.read_text().splitlines()) >= 4


def test_fit_resume_is_bitwise(tmp_path):
    """6 uninterrupted steps == 3 steps + checkpoint + resumed 3 steps,
    bit for bit (params AND the data cursor round-trip)."""
    spec = TrainSpec(learning_rate=1e-3)
    full = fit(CFG, _loader, spec=spec, steps=6, seed=0)

    ck = str(tmp_path / "ck")
    fit(CFG, _loader, spec=spec, steps=3, seed=0, checkpoint_dir=ck)
    resumed = fit(CFG, _loader, spec=spec, steps=6, seed=0,
                  checkpoint_dir=ck)
    assert resumed["step"] == 6
    for a, b in zip(jax.tree.leaves(full["params"]),
                    jax.tree.leaves(resumed["params"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_fit_dropout_threads_step_seed():
    cfg = ModelConfig.tiny(dtype=jnp.float32, remat=False, attn_dropout=0.1)
    out = fit(cfg, _loader(), spec=TrainSpec(), steps=3, seed=0)
    assert out["step"] == 3


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_fit_on_mesh_matches_single_device():
    from flash_attention_dlrs_tpu.parallel import make_mesh

    mesh = make_mesh([4, 2], ("data", "model"))  # model=2 divides 4q/2kv
    spec = TrainSpec(learning_rate=1e-3)
    losses_m, losses_s = [], []
    fit(CFG, _loader, spec=spec, steps=3, seed=0, mesh=mesh,
        on_step=lambda s, l: losses_m.append(float(l)))
    fit(CFG, _loader, spec=spec, steps=3, seed=0,
        on_step=lambda s, l: losses_s.append(float(l)))
    np.testing.assert_allclose(losses_m, losses_s, rtol=1e-4)
