"""Native (C++) postprocess backend: must match the NumPy path on random
masks (the parity contract documented in native/postprocess.cpp)."""

import numpy as np
import pytest

from retto_tpu.config import DetConfig
from retto_tpu.native import available, det_postprocess_native
from retto_tpu.ops.det_postprocess import det_postprocess

pytestmark = pytest.mark.skipif(
    not available(), reason="no C++ toolchain for the native backend"
)


def blobs_pred(seed, h=256, w=320, n_rects=5):
    rng = np.random.default_rng(seed)
    pred = np.zeros((h, w), np.float32)
    for _ in range(n_rects):
        x0 = int(rng.integers(0, w - 60))
        y0 = int(rng.integers(0, h - 30))
        bw = int(rng.integers(30, min(180, w - x0)))
        bh = int(rng.integers(10, min(40, h - y0)))
        pred[y0 : y0 + bh, x0 : x0 + bw] = rng.uniform(0.6, 0.95)
    pred += rng.uniform(0, 0.15, (h, w)).astype(np.float32)
    return np.clip(pred, 0, 1)


@pytest.mark.parametrize("seed", range(6))
def test_native_matches_numpy(seed):
    pred = blobs_pred(seed)
    mask = pred > 0.3
    cfg = DetConfig()
    nb, ns = det_postprocess(pred, mask, cfg, 512, 640, backend="numpy")
    cb, cs = det_postprocess(pred, mask, cfg, 512, 640, backend="native")
    assert nb.shape == cb.shape, (nb.shape, cb.shape)
    np.testing.assert_allclose(cb, nb, atol=1.0)  # arc discretization fp fuzz
    np.testing.assert_allclose(cs, ns, atol=1e-4)


def test_native_empty_mask():
    pred = np.zeros((64, 64), np.float32)
    out = det_postprocess_native(pred, pred > 0.3, 0.5, 1.6, 3, 1000, 64, 64)
    assert out is not None
    boxes, scores = out
    assert boxes.shape == (0, 4, 2)


def test_native_with_hole():
    pred = np.zeros((128, 128), np.float32)
    pred[20:100, 20:100] = 0.9
    pred[50:70, 50:70] = 0.0  # hole
    mask = pred > 0.3
    cfg = DetConfig()
    nb, _ = det_postprocess(pred, mask, cfg, 128, 128, backend="numpy")
    cb, _ = det_postprocess(pred, mask, cfg, 128, 128, backend="native")
    assert nb.shape == cb.shape


def test_native_rotated_component():
    # a rotated bar: exercises hull + calipers beyond axis-aligned
    h = w = 200
    ys, xs = np.mgrid[0:h, 0:w]
    c, s = np.cos(0.4), np.sin(0.4)
    u = (xs - 100) * c + (ys - 100) * s
    v = -(xs - 100) * s + (ys - 100) * c
    mask = (np.abs(u) < 70) & (np.abs(v) < 12)
    pred = np.where(mask, 0.9, 0.02).astype(np.float32)
    cfg = DetConfig()
    nb, ns = det_postprocess(pred, mask, cfg, 200, 200, backend="numpy")
    cb, cs = det_postprocess(pred, mask, cfg, 200, 200, backend="native")
    assert len(nb) == len(cb) == 1
    np.testing.assert_allclose(cb, nb, atol=2.0)


def test_candidates_batch_packed_parity():
    """rt_det_candidates_batch must equal unpack + per-image candidates
    for both packed layouts (ops.db_post column bits, ops.pallas row bits)."""
    from retto_tpu.config import DetConfig
    from retto_tpu.native import (
        det_candidates_batch_native,
        det_candidates_native,
    )
    from retto_tpu.ops.db_post import unpack_mask
    from retto_tpu.ops.pallas.db_pack import unpack_rows

    if det_candidates_native(np.zeros((8, 8), bool), 3, 10) is None:
        pytest.skip("no native backend")
    rng = np.random.default_rng(11)
    cfg = DetConfig()
    b, H, W = 3, 128, 192
    masks = rng.random((b, H, W)) < 0.02
    for k in range(b):  # add solid blocks so real candidates exist
        masks[k, 30 + k : 60 + k, 20 : 120 + 10 * k] = True
    hs = [120, 128, 100]
    ws = [180, 192, 160]

    # column-packed [H, ceil(W/8)]
    col = np.stack([np.packbits(m, axis=1) for m in masks])
    got = det_candidates_batch_native(col, hs, ws, False, cfg.min_mini_box_size,
                                      cfg.max_candidates)
    for k in range(b):
        ref_mask = unpack_mask(col[k], W)[: hs[k], : ws[k]]
        ref = det_candidates_native(ref_mask, cfg.min_mini_box_size,
                                    cfg.max_candidates)
        np.testing.assert_array_equal(got[k], ref)

    # row-packed [H/8, W]
    row = np.stack([np.packbits(m, axis=0) for m in masks])
    got = det_candidates_batch_native(row, hs, ws, True, cfg.min_mini_box_size,
                                      cfg.max_candidates)
    for k in range(b):
        ref_mask = unpack_rows(row[k], hs[k], ws[k])
        ref = det_candidates_native(ref_mask, cfg.min_mini_box_size,
                                    cfg.max_candidates)
        np.testing.assert_array_equal(got[k], ref)


def test_det_chunk_parity():
    """rt_det_chunk (unpack + contours + pooled-map scoring + finalize in
    one call) must match the per-image Python chain the DevicePipeline
    falls back to: det_candidates -> *stride -> _score_candidates ->
    det_finalize."""
    import dataclasses

    from retto_tpu.config import DetConfig
    from retto_tpu.native import det_chunk_native
    from retto_tpu.ops.det_postprocess import det_candidates, det_finalize
    from retto_tpu.pipeline.device_pipeline import _score_candidates

    rng = np.random.default_rng(21)
    cfg = DetConfig()
    stride = 2
    b = 3
    # det-res geometry: rh x rw; masks at stride-2; pooled prob at det/4
    rhs = [256, 224, 256]
    rws = [320, 320, 256]
    ahs = [250, 210, 240]
    aws = [310, 300, 250]
    mh_pad, mw_pad = 128, 160
    p4h, p4w = 64, 80
    masks = np.zeros((b, mh_pad, mw_pad), bool)
    prob4 = np.zeros((b, p4h, p4w), np.uint8)
    for k in range(b):
        mh, mw = rhs[k] // stride, rws[k] // stride
        for _ in range(4):
            x0 = int(rng.integers(0, mw - 30))
            y0 = int(rng.integers(0, mh - 12))
            bw = int(rng.integers(16, min(70, mw - x0)))
            bh = int(rng.integers(5, min(14, mh - y0)))
            masks[k, y0 : y0 + bh, x0 : x0 + bw] = True
        # pooled prob: downsample the mask region roughly (values 0..255)
        m = masks[k, :mh, :mw].astype(np.float32)
        pool = m.reshape(mh // 2, 2, mw // 2, 2).mean(axis=(1, 3)) * 230
        prob4[k, : mh // 2, : mw // 2] = pool.astype(np.uint8)

    col = np.stack([np.packbits(m, axis=1) for m in masks])
    min_sside = max(1, cfg.min_mini_box_size // stride)
    got = det_chunk_native(
        col, False, prob4,
        [(rhs[k] // stride, rws[k] // stride) for k in range(b)], stride,
        list(zip(rhs, rws)), list(zip(ahs, aws)),
        min_sside, cfg.max_candidates, cfg.box_thresh, cfg.unclip_ratio,
        cfg.min_mini_box_size,
    )
    if got is None:
        pytest.skip("no native backend")
    cfg_s = dataclasses.replace(cfg, min_mini_box_size=min_sside)
    for k in range(b):
        mh, mw = rhs[k] // stride, rws[k] // stride
        cands = det_candidates(masks[k, :mh, :mw], cfg_s)
        if len(cands):
            cands = cands * float(stride)
        scores = _score_candidates(prob4[k], cands)
        rb, rs = det_finalize(
            cands, scores, cfg, rhs[k], rws[k], ahs[k], aws[k]
        )
        gb, gs = got[k]
        assert gb.shape == rb.shape, (k, gb.shape, rb.shape)
        np.testing.assert_allclose(gb, rb, atol=1.0)
        np.testing.assert_allclose(gs, rs, atol=1e-4)


def test_is_gray_native():
    from retto_tpu.native import is_gray_native

    rng = np.random.default_rng(12)
    g = np.repeat(rng.integers(0, 255, (33, 47, 1), np.uint8), 3, axis=2)
    c = g.copy()
    c[20, 11, 2] ^= 1  # single off-by-one chroma pixel
    got_g = is_gray_native(g)
    got_c = is_gray_native(c)
    if got_g is None:
        pytest.skip("no native backend")
    assert got_g is True
    assert got_c is False


def test_pack_yuv420_parity():
    """rt_pack_yuv420 (fused pad+pack) vs the PIL chain (pad -> convert L
    -> BOX half -> YCbCr): Y bit-exact, chroma within +-1."""
    from retto_tpu.image.yuv import rgb_to_yuv420
    from retto_tpu.native import pack_yuv420_native

    rng = np.random.default_rng(31)
    img = rng.integers(0, 256, (94, 121, 3), np.uint8)
    hp, wp = 128, 128
    got = pack_yuv420_native(img, hp, wp)
    if got is None:
        pytest.skip("no native backend")
    y_n, uv_n = got
    padded = np.pad(img, ((0, hp - 94), (0, wp - 121), (0, 0)), mode="edge")
    y_p, uv_p = rgb_to_yuv420(padded)
    np.testing.assert_array_equal(y_n, y_p)  # PIL L is bit-exact
    assert int(np.abs(uv_n.astype(int) - uv_p.astype(int)).max()) <= 1


def test_pack_gray_parity():
    from retto_tpu.native import pack_gray_native

    rng = np.random.default_rng(32)
    g = np.repeat(rng.integers(0, 256, (50, 61, 1), np.uint8), 3, axis=2)
    got = pack_gray_native(g, 64, 64)
    if got is None:
        pytest.skip("no native backend")
    ref = np.pad(g[:, :, 0], ((0, 14), (0, 3)), mode="edge")
    np.testing.assert_array_equal(got, ref)


def test_pack_auto_color_matches_yuv420():
    """rt_pack_auto on a color image == rt_pack_yuv420 bit-for-bit, and
    flags is_gray False."""
    from retto_tpu.native import pack_auto_native, pack_yuv420_native

    rng = np.random.default_rng(33)
    img = rng.integers(0, 256, (94, 121, 3), np.uint8)
    got = pack_auto_native(img, 128, 128)
    if got is None:
        pytest.skip("no native backend")
    gray, y_a, uv_a = got
    assert gray is False
    y_r, uv_r = pack_yuv420_native(img, 128, 128)
    np.testing.assert_array_equal(y_a, y_r)
    np.testing.assert_array_equal(uv_a, uv_r)


def test_pack_auto_gray_plane_lossless():
    """rt_pack_auto on a truly-gray image flags is_gray and its Y plane is
    bit-exactly the padded channel-0 plane (the lossless transfer
    contract of the gray path)."""
    from retto_tpu.native import pack_auto_native, pack_gray_native

    rng = np.random.default_rng(34)
    g = np.repeat(rng.integers(0, 256, (50, 62, 1), np.uint8), 3, axis=2)
    got = pack_auto_native(g, 64, 64)
    if got is None:
        pytest.skip("no native backend")
    gray, y_a, uv_a = got
    assert gray is True
    np.testing.assert_array_equal(y_a, pack_gray_native(g, 64, 64))
    assert int(uv_a.min()) == 128 and int(uv_a.max()) == 128


def test_pack_auto_mixed_rows_chroma_exact():
    """A page that is gray in the top half and colored below must produce
    the same chroma as the plain yuv pack (the gray-block memset(128)
    short-circuit is exact, not approximate)."""
    from retto_tpu.native import pack_auto_native, pack_yuv420_native

    rng = np.random.default_rng(35)
    img = np.repeat(rng.integers(0, 256, (40, 48, 1), np.uint8), 3, axis=2)
    img[20:] = rng.integers(0, 256, (20, 48, 3), np.uint8)
    got = pack_auto_native(img, 48, 48)
    if got is None:
        pytest.skip("no native backend")
    gray, y_a, uv_a = got
    assert gray is False
    y_r, uv_r = pack_yuv420_native(img, 48, 48)
    np.testing.assert_array_equal(y_a, y_r)
    np.testing.assert_array_equal(uv_a, uv_r)
