"""Native (C++) page allocator: behavioral equivalence with the Python one."""

import numpy as np
import pytest

from flash_attention_dlrs_tpu.runtime.kv_cache import PageAllocator
from flash_attention_dlrs_tpu.runtime.native_alloc import (
    NativePageAllocator,
    native_available,
)

pytestmark = pytest.mark.skipif(
    not native_available(), reason="native toolchain unavailable"
)


def _both():
    return PageAllocator(16, 128), NativePageAllocator(16, 128)


def test_equivalent_alloc_extend_free_cycle():
    py, cc = _both()
    for a in (py, cc):
        a.allocate("a", 300)   # 3 pages
        a.allocate("b", 128)   # 1 page
    assert len(py.free_pages) == len(cc.free_pages) == 12
    for a in (py, cc):
        assert not a.can_allocate(13 * 128)
        with pytest.raises(MemoryError):
            a.allocate("c", 13 * 128)
        a.ensure_capacity("a", 700)  # grows to 6 pages
        a.seq_lengths["a"] = 700
        assert a.seq_lengths["a"] == 700
    np.testing.assert_array_equal(
        py.page_indices_for(["a", "b"], 8), cc.page_indices_for(["a", "b"], 8)
    )
    np.testing.assert_array_equal(
        py.lengths_for(["a", "b", "missing"]),
        cc.lengths_for(["a", "b", "missing"]),
    )
    for a in (py, cc):
        a.free("a")
    assert len(py.free_pages) == len(cc.free_pages)
    # identical page reuse order after free
    for a in (py, cc):
        a.allocate("d", 500)
    np.testing.assert_array_equal(
        py.page_indices_for(["d"], 8), cc.page_indices_for(["d"], 8)
    )


def test_table_view_and_errors():
    _, cc = _both()
    cc.allocate("s", 256)
    t = cc.page_tables["s"]
    assert len(t) == 2 and list(t) == [0, 1]
    assert t[0] == 0
    assert np.asarray(t, np.int32).dtype == np.int32
    assert "s" in cc.page_tables and "x" not in cc.page_tables
    with pytest.raises(ValueError):
        cc.allocate("s", 1)
    with pytest.raises(KeyError):
        cc.ensure_capacity("x", 10)
    cc.free("s")
    with pytest.raises(KeyError):
        cc.free("s")
    with pytest.raises(KeyError):
        cc.page_tables["s"]


def test_engine_runs_with_native_allocator():
    import jax
    import jax.numpy as jnp
    from flash_attention_dlrs_tpu.models import ModelConfig, init_params
    from flash_attention_dlrs_tpu.runtime.engine import DecodeEngine

    cfg = ModelConfig(vocab_size=128, d_model=64, n_layers=1, n_q_heads=2,
                      n_kv_heads=1, head_dim=32, d_ff=64, dtype=jnp.float32)
    params = init_params(jax.random.PRNGKey(0), cfg)
    prompts = [[1, 2, 3], [7, 8]]

    def run(native):
        eng = DecodeEngine(params, cfg, num_pages=32, page_size=64,
                           pages_per_seq=4, native_allocator=native)
        return eng.generate(prompts, max_new_tokens=5)

    assert run(True) == run(False)
