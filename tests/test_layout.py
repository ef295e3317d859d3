"""Packed stat layout (ops/layout.py): in-kernel lane<->sublane relayout
round-trips, and the host-side pack/unpack reshape is the exact inverse.

The layout contract under test: packed[..., r, l] == stat[..., r*128 + l],
i.e. the row-major flattening of the packed trailing pane IS the stat
vector — what makes the host conversion a free contiguous reshape."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flash_attention_dlrs_tpu import geometry as geo
from flash_attention_dlrs_tpu.ops import layout


@pytest.mark.parametrize("k", [1, 2, 4, 16])
def test_column_lanes_round_trip(k):
    n = k * geo.NUM_LANES
    col = jnp.arange(n, dtype=jnp.float32).reshape(n, 1) * 0.37 - 11.0
    pane = layout.column_to_lanes(col)
    assert pane.shape == (k, geo.NUM_LANES)
    # row-major flattening of the pane is the column
    np.testing.assert_array_equal(
        np.asarray(pane).reshape(-1), np.asarray(col).reshape(-1)
    )
    back = layout.lanes_to_column(pane)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(col))


def test_pack_unpack_inverse():
    b, h, n = 2, 3, 512
    stat = jnp.arange(b * h * n, dtype=jnp.float32).reshape(b, h, n)
    packed = layout.pack_stat(stat)
    assert packed.shape == (b, h, n // geo.NUM_LANES, geo.NUM_LANES)
    # packed[b,h,r,l] == stat[b,h,r*128+l]
    np.testing.assert_array_equal(
        np.asarray(packed)[1, 2, 3], np.asarray(stat)[1, 2, 3 * 128:4 * 128]
    )
    np.testing.assert_array_equal(
        np.asarray(layout.unpack_stat(packed)), np.asarray(stat)
    )


def test_kernel_side_matches_host_side():
    """column_to_lanes (kernel write side) must produce exactly the layout
    pack_stat (host read side) expects, so a forward-written lse pane
    unpacks to the true per-row stats."""
    n = 384
    col = jax.random.normal(jax.random.PRNGKey(0), (n, 1), jnp.float32)
    pane = layout.column_to_lanes(col)  # what a kernel would write
    host = np.asarray(pane).reshape(-1)  # unpack_stat's view of it
    np.testing.assert_array_equal(host, np.asarray(col).reshape(-1))

@pytest.mark.parametrize("block_q", [128, 256, 512, 1024, 2048])
def test_grouped_pack_unpack_inverse(block_q):
    """Grouped layout: per-q-block groups of block_q/128 dense rows padded
    to stat_rows sublanes (Mosaic's block-mapping minimum — a measured
    hardware constraint: (.., 4, 128) stat blocks are rejected)."""
    b, h = 2, 3
    n = 4 * block_q
    k = block_q // geo.NUM_LANES
    s = layout.stat_rows(block_q)
    assert s % geo.NUM_SUBLANES == 0 and s >= k
    stat = jnp.arange(b * h * n, dtype=jnp.float32).reshape(b, h, n)
    packed = layout.pack_stat_grouped(stat, block_q)
    assert packed.shape == (b, h, (n // block_q) * s, geo.NUM_LANES)
    # group g's first k rows flatten to that q block's stat slice
    g = 2
    np.testing.assert_array_equal(
        np.asarray(packed)[1, 2, g * s:g * s + k].reshape(-1),
        np.asarray(stat)[1, 2, g * block_q:(g + 1) * block_q],
    )
    np.testing.assert_array_equal(
        np.asarray(layout.unpack_stat_grouped(packed, block_q)),
        np.asarray(stat),
    )


def test_grouped_matches_kernel_write_side():
    """A kernel writing column_to_lanes(col) into the first k sublanes of
    its stat_rows-tall tile must unpack to the true per-row stats."""
    block_q, b, h = 256, 1, 1
    n = 2 * block_q
    k = block_q // geo.NUM_LANES
    s = layout.stat_rows(block_q)
    col = jax.random.normal(jax.random.PRNGKey(1), (n, 1), jnp.float32)
    tile = np.full((b, h, (n // block_q) * s, geo.NUM_LANES), np.nan,
                   np.float32)
    for g in range(n // block_q):
        pane = layout.column_to_lanes(
            col[g * block_q:(g + 1) * block_q]
        )
        tile[0, 0, g * s:g * s + k] = np.asarray(pane)
    out = layout.unpack_stat_grouped(jnp.asarray(tile), block_q)
    np.testing.assert_array_equal(
        np.asarray(out)[0, 0], np.asarray(col).reshape(-1)
    )
