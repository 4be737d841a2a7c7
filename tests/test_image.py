"""Image layer tests: resize-dimension arithmetic must match the reference's
integer semantics exactly (image_helper.rs:106-209); pixel paths are checked
against the normalize formulas and geometric invariants."""

import numpy as np
import pytest

from retto_tpu.config import LimitType
from retto_tpu.geometry import PointBox
from retto_tpu.image import (
    ImageHelper,
    decode_image,
    rec_resize_dims,
    resize_both_dims,
    resize_either_dims,
)


class TestResizeDims:
    def test_resize_both_no_change(self):
        # 960x720 within [30, 2000]: untouched (image_helper.rs:115,127)
        assert resize_both_dims(720, 960, 2000, 30) == (720, 960, 1.0, 1.0)

    def test_resize_both_max_branch_floor_div(self):
        # 4320x7680, max 2000: scale = 2000/7680
        # h: floor(4320*0.260416..) = 1125 -> 1125 // 32 = 35 -> 1120
        # w: floor(7680*0.260416..) = 1999 -> 1999 // 32 = 62 -> 1984
        rh, rw, ratio_h, ratio_w = resize_both_dims(4320, 7680, 2000, 30)
        assert (rh, rw) == (1120, 1984)
        assert ratio_h == pytest.approx(4320 / 1120)
        assert ratio_w == pytest.approx(7680 / 1984)

    def test_resize_both_min_branch_rounds(self):
        # 20x100, min 30: scale = 1.5
        # h: round(floor(20*1.5)/32) = round(0.9375) = 1 -> 32
        # w: round(floor(100*1.5)/32) = round(4.6875) = 5 -> 160
        rh, rw, _, _ = resize_both_dims(20, 100, 2000, 30)
        assert (rh, rw) == (32, 160)

    def test_resize_either_min_upscale(self):
        # 50x200 with Min limit 736: ratio = 736/50 = 14.72
        # h: round(floor(736)/32)*32 = 736; w: round(floor(2944)/32)*32 = 2944
        assert resize_either_dims(50, 200, LimitType.MIN, 736) == (736, 2944)

    def test_resize_either_min_no_change_rounds_to_32(self):
        # 200x50 already >= limit? min(200,50)=50 < 736 -> ratio 14.72
        rh, rw = resize_either_dims(200, 50, LimitType.MIN, 736)
        assert rh % 32 == 0 and rw % 32 == 0

    def test_resize_either_max_downscale(self):
        # 1000x3000, Max 960: ratio = 0.32
        # h: round(floor(320)/32)*32 = 320; w: round(floor(960)/32)*32 = 960
        assert resize_either_dims(1000, 3000, LimitType.MAX, 960) == (320, 960)

    def test_resize_either_within_limit_snaps_to_32(self):
        # 736x736 with Min 736: ratio 1.0 -> 736 (already /32-aligned: 23*32)
        assert resize_either_dims(736, 736, LimitType.MIN, 736) == (736, 736)
        # 750x750: ratio 1.0 -> round(750/32)=23 -> 736
        assert resize_either_dims(750, 750, LimitType.MIN, 736) == (736, 736)

    def test_rec_resize_dims(self):
        # crop 40x120 to rec shape [3,48,320]: resized_w = min(320, ceil(48*120/40)) = 144
        assert rec_resize_dims(40, 120, 48, 320) == (144, 320)
        # with max_wh_ratio 10: target = int(48*10) = 480
        assert rec_resize_dims(40, 120, 48, 320, 10.0) == (144, 480)
        # very wide crop clamps to target
        assert rec_resize_dims(10, 1000, 48, 320) == (320, 320)


class TestImageHelper:
    def _png(self, arr: np.ndarray) -> bytes:
        import io

        from PIL import Image

        buf = io.BytesIO()
        Image.fromarray(arr).save(buf, format="PNG")
        return buf.getvalue()

    def test_decode_roundtrip(self):
        arr = np.random.default_rng(0).integers(0, 255, (40, 60, 3), dtype=np.uint8)
        out = decode_image(self._png(arr))
        np.testing.assert_array_equal(out, arr)

    def test_decode_grayscale_and_rgba(self):
        g = np.zeros((10, 10), dtype=np.uint8)
        assert decode_image(g).shape == (10, 10, 3)
        rgba = np.zeros((10, 10, 4), dtype=np.uint8)
        assert decode_image(rgba).shape == (10, 10, 3)

    def test_decode_garbage_raises(self):
        from retto_tpu.errors import RettoImageError

        with pytest.raises(RettoImageError):
            decode_image(b"not an image")

    def test_resize_norm_image_values_and_padding(self):
        # all-white crop: normalized value must be (1.0-0.5)/0.5 = 1.0,
        # padding must be exactly 0.0 (image_helper.rs:203-208)
        img = ImageHelper(np.full((24, 48, 3), 255, dtype=np.uint8))
        out = img.resize_norm_image((3, 48, 320))
        assert out.shape == (3, 48, 320)
        resized_w, _ = rec_resize_dims(24, 48, 48, 320)
        np.testing.assert_allclose(out[:, :, :resized_w], 1.0, atol=1e-6)
        np.testing.assert_allclose(out[:, :, resized_w:], 0.0)

    def test_resize_norm_black_is_minus_one(self):
        img = ImageHelper(np.zeros((48, 96, 3), dtype=np.uint8))
        out = img.resize_norm_image((3, 48, 320))
        resized_w, _ = rec_resize_dims(48, 96, 48, 320)
        np.testing.assert_allclose(out[:, :, :resized_w], -1.0, atol=1e-6)

    def test_rgb2bgr(self):
        arr = np.zeros((4, 4, 3), dtype=np.uint8)
        arr[..., 0] = 10
        arr[..., 2] = 30
        img = ImageHelper(arr)
        bgr = img.rgb2bgr()
        assert bgr[0, 0, 0] == 30 and bgr[0, 0, 2] == 10

    def test_crop_axis_aligned_equals_slice(self):
        rng = np.random.default_rng(1)
        arr = rng.integers(0, 255, (100, 200, 3), dtype=np.uint8)
        img = ImageHelper(arr)
        box = PointBox([[20, 10], [80, 10], [80, 40], [20, 40]])
        crop = img.get_crop_img(box)
        assert crop.shape == (30, 60, 3)
        # centers should match the direct slice closely (bicubic edge fuzz)
        direct = arr[10:40, 20:80]
        diff = np.abs(
            crop[5:-5, 5:-5].astype(int) - direct[5:-5, 5:-5].astype(int)
        )
        assert np.median(diff) <= 1

    def test_crop_tall_box_rotated(self):
        arr = np.zeros((200, 100, 3), dtype=np.uint8)
        img = ImageHelper(arr)
        box = PointBox([[10, 10], [30, 10], [30, 110], [10, 110]])  # 20x100
        crop = img.get_crop_img(box)
        # h/w = 5 >= 1.5 -> rotated to 20x100
        assert crop.shape == (20, 100, 3)

    def test_rotate_180_in_place(self):
        arr = np.arange(12, dtype=np.uint8).reshape(2, 2, 3)
        img = ImageHelper(arr)
        img.rotate_180_in_place()
        np.testing.assert_array_equal(img.img, arr[::-1, ::-1])

    def test_ori_size_preserved_across_resize(self):
        img = ImageHelper(np.zeros((4320, 7680, 3), dtype=np.uint8))
        img.resize_both(2000, 30)
        assert img.ori_size() == (4320, 7680)
        assert img.size() == (1120, 1984)


class TestDeviceOps:
    def test_normalize_det_matches_host_formula(self):
        import jax.numpy as jnp

        from retto_tpu.image.ops import normalize_det

        rng = np.random.default_rng(2)
        arr = rng.integers(0, 255, (32, 64, 3), dtype=np.uint8)
        out = np.asarray(normalize_det(jnp.asarray(arr)))
        assert out.shape == (1, 3, 32, 64)
        ref = (arr[..., ::-1].astype(np.float32) / 255.0 - 0.5) / 0.5
        np.testing.assert_allclose(out[0], np.transpose(ref, (2, 0, 1)), atol=1e-6)

    def test_resize_norm_pad_matches_host(self):
        import jax.numpy as jnp

        from retto_tpu.image.ops import resize_norm_pad

        img = np.full((48, 96, 3), 255, dtype=np.uint8)
        out = np.asarray(resize_norm_pad(jnp.asarray(img), 48, 96, 320))
        assert out.shape == (3, 48, 320)
        np.testing.assert_allclose(out[:, :, :96], 1.0, atol=1e-5)
        np.testing.assert_allclose(out[:, :, 96:], 0.0)

    def test_pad_to(self):
        import jax.numpy as jnp

        from retto_tpu.image.ops import pad_to

        x = jnp.ones((1, 3, 100, 200))
        y = pad_to(x, 128, 256)
        assert y.shape == (1, 3, 128, 256)
        assert float(y[0, 0, 110, 0]) == 0.0
        with pytest.raises(ValueError):
            pad_to(x, 64, 256)
