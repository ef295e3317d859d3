"""Utils: checkpoint round-trip, metrics JSONL, config overrides, quantization."""

import dataclasses
import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flash_attention_dlrs_tpu.ops.quantization import (
    int8_matmul,
    quantize,
    quantize_weight,
)
from flash_attention_dlrs_tpu.utils.checkpoint import (
    latest_step,
    restore_checkpoint,
    save_checkpoint,
)
from flash_attention_dlrs_tpu.utils.config import dump_config, load_config
from flash_attention_dlrs_tpu.utils.metrics import MetricsLogger, ThroughputMeter


def test_checkpoint_roundtrip_and_prune(tmp_path):
    state = {
        "w": jnp.arange(12.0).reshape(3, 4),
        "nested": {"b": jnp.ones((2,), jnp.bfloat16)},
        "step_count": jnp.int32(7),
    }
    path = str(tmp_path / "ckpt")
    for step in (1, 2, 3, 4):
        save_checkpoint(path, state, step=step, keep=2)
    assert latest_step(path) == 4
    restored, step = restore_checkpoint(path, state)
    assert step == 4
    np.testing.assert_array_equal(restored["w"], state["w"])
    assert restored["nested"]["b"].dtype == jnp.bfloat16
    # pruned to keep=2
    kept = [n for n in os.listdir(path) if n.startswith("step_")]
    assert len(kept) == 2


def test_metrics_jsonl(tmp_path):
    path = str(tmp_path / "m.jsonl")
    log = MetricsLogger(path)
    log.log(0, loss=1.5, lr=1e-3)
    log.log(1, loss=1.2)
    log.close()
    rows = [json.loads(l) for l in open(path)]
    assert rows[0]["loss"] == 1.5 and rows[1]["step"] == 1
    # disabled logger no-ops
    MetricsLogger(None).log(0, x=1)


def test_throughput_meter():
    m = ThroughputMeter()
    assert m.rate == 0.0
    m.update(10)
    m.update(10)
    assert m.rate > 0


@dataclasses.dataclass(frozen=True)
class _Cfg:
    alpha: float = 1.0
    steps: int = 10
    name: str = "x"
    flag: bool = False


def test_config_layering(tmp_path, monkeypatch):
    p = tmp_path / "c.json"
    p.write_text(json.dumps({"alpha": 2.0, "steps": 20}))
    monkeypatch.setenv("FA_TPU_STEPS", "30")
    monkeypatch.setenv("FA_TPU_FLAG", "true")
    cfg = load_config(_Cfg, str(p), overrides={"name": "y"})
    assert cfg == _Cfg(alpha=2.0, steps=30, name="y", flag=True)
    with pytest.raises(ValueError):
        load_config(_Cfg, overrides={"nope": 1})
    dump_config(cfg, str(tmp_path / "out.json"))
    assert json.load(open(tmp_path / "out.json"))["steps"] == 30


def test_quantize_roundtrip_int8_fp8():
    x = jax.random.normal(jax.random.PRNGKey(0), (64, 128))
    # fp8 bounds follow mantissa width: e4m3 ~2^-4 relative, e5m2 ~2^-3.
    for dt, tol in ((jnp.int8, 2e-2), (jnp.float8_e4m3fn, 1.6e-1), (jnp.float8_e5m2, 3.5e-1)):
        q = quantize(x, dt)
        err = float(jnp.max(jnp.abs(q.dequantize() - x)))
        assert err < tol, (dt, err)


def test_int8_weight_matmul_close():
    key = jax.random.PRNGKey(1)
    x = jax.random.normal(key, (8, 256), jnp.float32)
    w = jax.random.normal(jax.random.fold_in(key, 1), (256, 128), jnp.float32)
    wq = quantize_weight(w)
    np.testing.assert_allclose(
        int8_matmul(x, wq), x @ w, atol=0.5, rtol=0.05
    )
    # per-channel scales: killing one output channel's magnitude shouldn't
    # hurt the others' accuracy
    w2 = w.at[:, 0].multiply(1e-3)
    wq2 = quantize_weight(w2)
    np.testing.assert_allclose(
        int8_matmul(x, wq2)[:, 0], x @ w2[:, :1] @ jnp.ones((1,)), atol=1e-3, rtol=0.05
    )


def test_tuner_raises_on_non_resource_error(tmp_path, monkeypatch):
    """The timed search may skip candidates that don't FIT (OOM/VMEM), but a
    candidate failing with any other exception is a kernel-route bug and
    must propagate (round 2 swallowed one and it crashed on hardware)."""
    import pytest

    import flash_attention_dlrs_tpu.tuning as tuning

    monkeypatch.setattr(tuning, "_CACHE_PATH", str(tmp_path / "c.json"))
    tuning._TUNE_CACHE.clear()

    def build_oom(cand):
        def fn():
            raise RuntimeError("RESOURCE_EXHAUSTED: out of memory")
        return fn

    # all candidates OOM -> search completes, returns first candidate
    assert tuning._tune_cached(["t1"], [1, 2], build_oom, ()) == 1
    tuning._TUNE_CACHE.clear()

    def build_buggy(cand):
        def fn():
            raise AssertionError("consts leaked into custom_partitioning")
        return fn

    with pytest.raises(RuntimeError, match="non-resource error"):
        tuning._tune_cached(["t2"], [1, 2], build_buggy, ())
    tuning._TUNE_CACHE.clear()
