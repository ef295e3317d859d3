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
