"""YUV 4:2:0 transfer codec + device matmul-resize tests (CPU)."""

import numpy as np

from retto_tpu.image.yuv import rgb_to_yuv420, yuv420_to_rgb_device


class TestYuvCodec:
    def test_gray_roundtrip_exact(self):
        # grayscale content has constant chroma — subsampling is lossless
        rng = np.random.default_rng(0)
        g = rng.integers(0, 255, (32, 48, 1), np.uint8)
        img = np.repeat(g, 3, axis=-1)
        y, uv = rgb_to_yuv420(img)
        back = np.asarray(yuv420_to_rgb_device(y[None], uv[None]))[0]
        assert np.abs(back - img.astype(np.float32)).max() <= 1.5

    def test_color_roundtrip_close(self):
        rng = np.random.default_rng(1)
        # smooth color field (what photographs look like post-JPEG)
        xx, yy = np.meshgrid(np.linspace(0, 1, 64), np.linspace(0, 1, 32))
        img = np.stack(
            [255 * xx, 255 * yy, 255 * (1 - xx) * (1 - yy)], axis=-1
        ).astype(np.uint8)
        y, uv = rgb_to_yuv420(img)
        back = np.asarray(yuv420_to_rgb_device(y[None], uv[None]))[0]
        assert np.abs(back - img.astype(np.float32)).mean() < 3.0
        del rng

    def test_odd_dims_rejected(self):
        import pytest

        with pytest.raises(ValueError):
            rgb_to_yuv420(np.zeros((31, 32, 3), np.uint8))


class TestMatmulResize:
    def test_upscale_matches_pil_bilinear(self):
        # the device det resize (two MXU matmuls) must reproduce PIL's
        # bilinear on upscales (PIL support=1 there -> identical math)
        import jax.numpy as jnp
        from PIL import Image

        from retto_tpu.pipeline.device_pipeline import (
            _bilinear_matrix,
            _resize2,
        )

        rng = np.random.default_rng(2)
        src = rng.integers(0, 255, (44, 60, 3), np.uint8)
        dst_h, dst_w = 64, 96
        ref = np.asarray(
            Image.fromarray(src).resize((dst_w, dst_h), Image.BILINEAR),
            dtype=np.float32,
        )
        wh = _bilinear_matrix(
            jnp.asarray([44.0]), jnp.asarray([float(dst_h)]), 44, dst_h
        )
        ww = _bilinear_matrix(
            jnp.asarray([60.0]), jnp.asarray([float(dst_w)]), 60, dst_w
        )
        got = np.asarray(
            _resize2(wh, ww, jnp.asarray(src, jnp.float32)[None])
        )[0]
        assert np.abs(got - ref).max() <= 1.0  # PIL rounds to u8

    def test_valid_region_masking(self):
        import jax.numpy as jnp

        from retto_tpu.pipeline.device_pipeline import (
            _bilinear_matrix,
            _resize2,
        )

        # source valid 16x16 inside a 32x32 buffer; dst valid 24x24 in 32x32
        src = np.zeros((1, 32, 32, 1), np.float32)
        src[0, :16, :16, 0] = 100.0
        wh = _bilinear_matrix(jnp.asarray([16.0]), jnp.asarray([24.0]), 32, 32)
        ww = _bilinear_matrix(jnp.asarray([16.0]), jnp.asarray([24.0]), 32, 32)
        out = np.asarray(_resize2(wh, ww, jnp.asarray(src)))[0, :, :, 0]
        assert np.allclose(out[:24, :24], 100.0)
        assert np.allclose(out[24:, :], 0.0)
        assert np.allclose(out[:, 24:], 0.0)

    def test_downscale_matches_pil_bilinear(self):
        # downscales use the widened (anti-aliased) triangle filter like
        # PIL's BILINEAR — big-photo det inputs match the host path
        import jax.numpy as jnp
        from PIL import Image

        from retto_tpu.pipeline.device_pipeline import (
            _bilinear_matrix,
            _resize2,
        )

        rng = np.random.default_rng(5)
        src = rng.integers(0, 255, (128, 192, 3), np.uint8)
        ref = np.asarray(
            Image.fromarray(src).resize((48, 32), Image.BILINEAR),
            dtype=np.float32,
        )
        wh = _bilinear_matrix(
            jnp.asarray([128.0]), jnp.asarray([32.0]), 128, 32
        )
        ww = _bilinear_matrix(
            jnp.asarray([192.0]), jnp.asarray([48.0]), 192, 48
        )
        got = np.asarray(
            _resize2(wh, ww, jnp.asarray(src, jnp.float32)[None])
        )[0]
        assert np.abs(got - ref).max() <= 1.0
