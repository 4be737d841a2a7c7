"""Pallas fused binarize+dilate+pack kernel vs the jnp reference
(interpreter mode on CPU; the same code compiles on TPU)."""

import jax.numpy as jnp
import numpy as np
import pytest

from retto_tpu.ops.db_post import binarize_dilate
from retto_tpu.ops.pallas.db_pack import binarize_dilate_pack_rows, unpack_rows


@pytest.mark.parametrize("dilate", [True, False])
@pytest.mark.parametrize("seed", [0, 1])
def test_matches_jnp_reference(seed, dilate):
    rng = np.random.default_rng(seed)
    h, w = 128, 256
    pred = rng.uniform(0, 1, (h, w)).astype(np.float32)
    ref = np.asarray(binarize_dilate(jnp.asarray(pred), 0.3, dilate))
    packed = binarize_dilate_pack_rows(
        jnp.asarray(pred), 0.3, dilate, interpret=True
    )
    assert packed.shape == (h // 8, w)
    got = unpack_rows(packed, h, w)
    np.testing.assert_array_equal(got, ref.astype(bool))


def test_tile_boundary_dilation():
    # a single hot pixel on the last row of a tile must dilate into the
    # next tile's first row (halo correctness)
    h, w = 128, 256
    pred = np.zeros((h, w), np.float32)
    pred[63, 100] = 0.9  # last row of tile 0
    packed = binarize_dilate_pack_rows(jnp.asarray(pred), 0.3, True, interpret=True)
    got = unpack_rows(packed, h, w)
    assert got[63, 100] and got[64, 100] and got[64, 101] and got[63, 101]
    assert not got[62, 99]


def test_nchw_input_accepted():
    pred = np.zeros((1, 1, 64, 128), np.float32)
    pred[0, 0, 10, 10] = 1.0
    packed = binarize_dilate_pack_rows(jnp.asarray(pred), 0.3, True, interpret=True)
    got = unpack_rows(packed, 64, 128)
    assert got[10, 10]
