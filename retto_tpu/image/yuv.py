"""YUV 4:2:0 transfer codec for the host->TPU link.

The tunneled host->device link is the DevicePipeline's dominant cost
(~40 MB/s measured; see tools/tunnel_probe*.py).  Images are shipped as
planar YUV 4:2:0 (1.5 bytes/px instead of 3) and reconstructed to RGB on
device.  For JPEG-sourced inputs this is lossless-in-practice: baseline
JPEG chroma is already 4:2:0-subsampled at the source, so the only change
is a second chroma resample.

PERFORMANCE-mode transfer option only (EngineConfig.transfer_format);
COMPAT mode and the default "rgb" format are byte-exact.  Matrices are the
JPEG/JFIF full-range BT.601 pair.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

__all__ = ["rgb_to_yuv420", "yuv420_to_rgb_device", "yuv_planes_to_rgb"]


def rgb_to_yuv420(img: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """HWC uint8 RGB -> (Y [H, W] u8, UV [H/2, W/2, 2] u8).

    H and W must be even (callers pad to the upload bucket first).
    Chroma is 2x2 box-averaged (the JFIF downsample).
    """
    h, w, _ = img.shape
    if h % 2 or w % 2:
        raise ValueError(f"YUV420 needs even dims, got {h}x{w}")
    # PIL ops run at C speed and release the GIL — this host has ONE core
    # (see CLAUDE.md), so every host cycle on the image path is throughput.
    # Luma via convert("L") (same ITU-R 601-2 triple, single output plane);
    # chroma via BOX-downsample first, YCbCr-convert on the quarter-size
    # image (linear ops commute, so this equals subsampling full-res CbCr).
    from PIL import Image

    im = Image.fromarray(img)
    y = np.asarray(im.convert("L"))
    half = np.asarray(im.resize((w // 2, h // 2), Image.BOX).convert("YCbCr"))
    uv = np.ascontiguousarray(half[..., 1:3])
    return y, uv


def yuv_planes_to_rgb(y, u, v):
    """Full-resolution float planes -> RGB float (0..255), device-side."""
    u = u - 128.0
    v = v - 128.0
    r = y + 1.402 * v
    g = y - 0.344136 * u - 0.714136 * v
    b = y + 1.772 * u
    return jnp.stack([r, g, b], axis=-1)


def yuv420_to_rgb_device(y: jnp.ndarray, uv: jnp.ndarray) -> jnp.ndarray:
    """Device-side reconstruction: Y [..., H, W] + UV [..., H/2, W/2, 2]
    -> RGB float32 [..., H, W, 3] in 0..255.  Chroma is upsampled 2x
    nearest (the box-downsample inverse; JPEG decoders do the same)."""
    yf = y.astype(jnp.float32)
    uvf = uv.astype(jnp.float32)
    uvf = jnp.repeat(jnp.repeat(uvf, 2, axis=-3), 2, axis=-2)
    return yuv_planes_to_rgb(yf, uvf[..., 0], uvf[..., 1])
