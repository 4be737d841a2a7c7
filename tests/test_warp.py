"""Device crop-warp vs the host reference path (image_helper.rs:223-249)."""

import jax.numpy as jnp
import numpy as np

from retto_tpu.geometry import PointBox
from retto_tpu.image.warp import crop_homographies, crop_output_size, warp_crops


def test_crop_output_size_and_rotate_flag():
    box = PointBox([[0, 0], [100, 0], [100, 30], [0, 30]])
    assert crop_output_size(box) == (30, 100, False)
    tall = PointBox([[0, 0], [20, 0], [20, 100], [0, 100]])
    assert crop_output_size(tall) == (100, 20, True)


def test_axis_aligned_warp_matches_slice():
    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, (80, 120, 3), dtype=np.uint8)
    box = np.array([[10, 20], [70, 20], [70, 50], [10, 50]], dtype=np.float32)
    h = crop_homographies(box[None], (30, 60), np.array([[30, 60]]))
    out = np.asarray(warp_crops(jnp.asarray(img), jnp.asarray(h), 30, 60))
    direct = img[20:50, 10:70].astype(np.float32)
    # interior must match exactly for the identity-scale case
    np.testing.assert_allclose(out[0][2:-2, 2:-2], direct[2:-2, 2:-2], atol=1.0)


def test_out_of_bounds_fills_white():
    img = np.zeros((40, 40, 3), dtype=np.uint8)
    box = np.array([[-20, -20], [20, -20], [20, 20], [-20, 20]], dtype=np.float32)
    h = crop_homographies(box[None], (40, 40), np.array([[40, 40]]))
    out = np.asarray(warp_crops(jnp.asarray(img), jnp.asarray(h), 40, 40))
    assert out[0, 0, 0, 0] == 255.0  # fill
    assert out[0, 30, 30, 0] == 0.0  # inside


def test_batch_of_heterogeneous_boxes_scaled_to_bucket():
    # two boxes of different natural size rendered into one (48, 96) bucket
    rng = np.random.default_rng(1)
    img = rng.integers(0, 255, (100, 200, 3), dtype=np.uint8)
    boxes = np.array(
        [
            [[10, 10], [58, 10], [58, 34], [10, 34]],  # 24x48
            [[100, 40], [196, 40], [196, 88], [100, 88]],  # 48x96
        ],
        dtype=np.float32,
    )
    sizes = np.array([[24, 48], [48, 96]])
    h = crop_homographies(boxes, (48, 96), sizes)
    out = np.asarray(warp_crops(jnp.asarray(img), jnp.asarray(h), 48, 96))
    assert out.shape == (2, 48, 96, 3)
    # box 2 is identity-scale; check center content matches
    direct = img[40:88, 100:196].astype(np.float32)
    np.testing.assert_allclose(out[1][4:-4, 4:-4], direct[4:-4, 4:-4], atol=1.0)
    # box 1 is upscaled 2x: its mean intensity should be close to the source
    src_mean = img[10:34, 10:58].mean()
    assert abs(out[0].mean() - src_mean) < 10
