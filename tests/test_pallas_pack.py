"""Pallas fused binarize+dilate+pack kernel vs the jnp reference
(interpreter mode on CPU; the same code compiles on TPU)."""

import os

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


def test_batched_matches_jnp_interpret():
    import jax.numpy as jnp

    from retto_tpu.ops.db_post import binarize_dilate
    from retto_tpu.ops.pallas.db_pack import (
        binarize_dilate_pack_rows_batch,
        unpack_rows,
    )

    rng = np.random.default_rng(3)
    pred = rng.uniform(0, 1, (3, 128, 256)).astype(np.float32)
    packed = binarize_dilate_pack_rows_batch(
        jnp.asarray(pred), 0.3, True, interpret=True
    )
    assert packed.shape == (3, 16, 256)
    for b in range(3):
        ref = np.asarray(binarize_dilate(jnp.asarray(pred[b]), 0.3, True))
        got = unpack_rows(np.asarray(packed)[b], 128, 256)
        np.testing.assert_array_equal(got, ref.astype(bool))


@pytest.mark.skipif(
    os.environ.get("RETTO_TEST_TPU") != "1",
    reason="real-TPU parity test (set RETTO_TEST_TPU=1)",
)
def test_batched_real_tpu_parity():
    """Compiled (non-interpreter) kernel parity on the actual chip."""
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_platforms", "")  # undo the conftest CPU repin
    from retto_tpu.ops.db_post import binarize_dilate
    from retto_tpu.ops.pallas.db_pack import (
        binarize_dilate_pack_rows_batch,
        unpack_rows,
    )

    rng = np.random.default_rng(4)
    pred = rng.uniform(0, 1, (2, 256, 384)).astype(np.float32)
    packed = np.asarray(
        binarize_dilate_pack_rows_batch(jnp.asarray(pred), 0.3, True)
    )
    for b in range(2):
        ref = np.asarray(binarize_dilate(jnp.asarray(pred[b]), 0.3, True))
        got = unpack_rows(packed[b], 256, 384)
        np.testing.assert_array_equal(got, ref.astype(bool))
