"""DB postprocess tests on synthetic probability maps — per-stage unit
coverage the reference lacks (SURVEY.md §4 takeaway)."""

import numpy as np
import pytest

from retto_tpu.config import DetConfig
from retto_tpu.ops import box_score_fast, det_postprocess, fill_convex_quad
from retto_tpu.ops.contours import find_contour_point_sets


def make_pred(h=256, w=256, rects=(), value=0.9):
    pred = np.zeros((h, w), dtype=np.float32)
    for (x0, y0, x1, y1) in rects:
        pred[y0:y1, x0:x1] = value
    return pred


class TestContours:
    def test_two_components(self):
        mask = make_pred(rects=[(10, 10, 60, 30), (100, 100, 200, 140)]) > 0.5
        sets = find_contour_point_sets(mask)
        assert len(sets) == 2
        xs0 = sets[0][:, 0]
        ys0 = sets[0][:, 1]
        assert xs0.min() == 10 and xs0.max() == 59
        assert ys0.min() == 10 and ys0.max() == 29

    def test_empty(self):
        assert find_contour_point_sets(np.zeros((32, 32), dtype=bool)) == []

    def test_hole_emits_extra_contour(self):
        mask = make_pred(rects=[(10, 10, 100, 100)]) > 0.5
        mask[40:60, 40:60] = False  # a hole
        sets = find_contour_point_sets(mask)
        assert len(sets) == 2  # outer + hole ring

    def test_diagonal_pixels_are_one_component(self):
        # 8-connectivity like imageproc/Suzuki
        mask = np.zeros((8, 8), dtype=bool)
        mask[1, 1] = mask[2, 2] = mask[3, 3] = True
        assert len(find_contour_point_sets(mask)) == 1


class TestRaster:
    def test_fill_quad_axis_aligned(self):
        quad = np.array([[1, 1], [5, 1], [5, 3], [1, 3]])
        m = fill_convex_quad(quad, 6, 8)
        assert m[1, 1] and m[3, 5] and m[2, 3]
        assert not m[0, 0] and not m[4, 6]
        assert m.sum() == 5 * 3  # inclusive edges: x 1..5, y 1..3

    def test_fill_quad_orientation_independent(self):
        quad = np.array([[1, 1], [5, 1], [5, 3], [1, 3]])
        np.testing.assert_array_equal(
            fill_convex_quad(quad, 6, 8), fill_convex_quad(quad[::-1], 6, 8)
        )

    def test_box_score_fast(self):
        pred = make_pred(rects=[(10, 10, 50, 30)], value=0.8)
        quad = np.array([[10, 10], [49, 10], [49, 29], [10, 29]])
        assert box_score_fast(pred, quad) == pytest.approx(0.8, abs=1e-6)
        # a quad straddling the region averages down
        quad2 = np.array([[10, 10], [89, 10], [89, 29], [10, 29]])
        assert 0.3 < box_score_fast(pred, quad2) < 0.55
        # fully outside -> 0
        quad3 = np.array([[200, 200], [210, 200], [210, 210], [200, 210]])
        assert box_score_fast(pred, quad3) == 0.0


class TestDetPostprocess:
    def test_recovers_rectangles(self):
        rects = [(20, 20, 120, 44), (20, 80, 200, 104)]
        pred = make_pred(rects=rects)
        mask = pred > 0.3
        cfg = DetConfig()
        boxes, scores = det_postprocess(pred, mask, cfg, 256, 256)
        assert boxes.shape == (2, 4, 2)
        assert (scores > 0.85).all()
        # unclip grows each rect by d = area*1.6/perimeter
        for (x0, y0, x1, y1), box in zip(rects, boxes):
            w, h = x1 - x0, y1 - y0
            d = (w * h) * 1.6 / (2 * (w + h))
            np.testing.assert_allclose(box[0], [x0 - d, y0 - d], atol=2.5)
            np.testing.assert_allclose(box[2], [x1 - 1 + d, y1 - 1 + d], atol=2.5)

    def test_reading_order(self):
        # right box on row 1 before left box on row 2
        pred = make_pred(rects=[(150, 20, 240, 40), (10, 22, 100, 42), (10, 90, 100, 110)])
        boxes, _ = det_postprocess(pred, pred > 0.3, DetConfig(), 256, 256)
        assert boxes.shape[0] == 3
        xs = boxes[:, 0, 0]
        assert xs[0] < xs[1]  # left first on the shared row
        assert boxes[2, 0, 1] > boxes[0, 0, 1]  # bottom row last

    def test_low_score_filtered(self):
        pred = make_pred(rects=[(20, 20, 120, 44)], value=0.4)
        mask = pred > 0.3
        boxes, _ = det_postprocess(pred, mask, DetConfig(), 256, 256)
        assert boxes.shape[0] == 0  # 0.4 < box_thresh 0.5

    def test_tiny_boxes_filtered(self):
        pred = make_pred(rects=[(20, 20, 22, 22)])
        boxes, _ = det_postprocess(pred, pred > 0.3, DetConfig(), 256, 256)
        assert boxes.shape[0] == 0  # sside < 3

    def test_scales_to_dest_coords(self):
        pred = make_pred(h=128, w=128, rects=[(20, 20, 100, 50)])
        boxes, _ = det_postprocess(pred, pred > 0.3, DetConfig(), 256, 256)
        assert boxes.shape[0] == 1
        # dest is 2x the bitmap: corners roughly doubled
        d = (80 * 30) * 1.6 / (2 * 110)
        np.testing.assert_allclose(boxes[0][0], [(20 - d) * 2, (20 - d) * 2], atol=5)

    def test_empty_pred(self):
        pred = make_pred()
        boxes, scores = det_postprocess(pred, pred > 0.3, DetConfig(), 256, 256)
        assert boxes.shape == (0, 4, 2) and scores.shape == (0,)


class TestDeviceBinarize:
    def test_binarize_dilate_grows_upleft(self):
        import jax.numpy as jnp

        from retto_tpu.ops.db_post import binarize_dilate

        pred = np.zeros((16, 16), dtype=np.float32)
        pred[8, 8] = 0.9
        m = np.asarray(binarize_dilate(jnp.asarray(pred), 0.3, True))
        assert m.shape == (16, 16)
        # cv2-style 2x2 dilation: the pixel and its down-right neighbors set
        assert m[8, 8] == 1 and m[9, 9] == 1 and m[8, 9] == 1 and m[9, 8] == 1
        assert m[7, 7] == 0

    def test_binarize_no_dilation(self):
        import jax.numpy as jnp

        from retto_tpu.ops.db_post import binarize_dilate

        pred = np.zeros((8, 8), dtype=np.float32)
        pred[2, 2] = 0.9
        m = np.asarray(binarize_dilate(jnp.asarray(pred), 0.3, False))
        assert m.sum() == 1

    def test_binarize_accepts_nchw(self):
        import jax.numpy as jnp

        from retto_tpu.ops.db_post import binarize_dilate

        pred = np.zeros((1, 1, 8, 8), dtype=np.float32)
        m = np.asarray(binarize_dilate(jnp.asarray(pred), 0.3, True))
        assert m.shape == (8, 8)


class TestScoreModeSlow:
    """ScoreMode::Slow — declared-but-unimplemented in the reference
    (det_processor.rs:20-29); here it scores over the original contour
    polygon (PaddleOCR box_score_slow semantics)."""

    def test_fill_polygon_concave(self):
        from retto_tpu.ops.raster import fill_polygon

        # L-shape: the notch must stay outside
        poly = np.array([[0, 0], [10, 0], [10, 4], [4, 4], [4, 10], [0, 10]], float)
        m = fill_polygon(poly, 11, 11)
        assert m[2, 2] and m[2, 8] and m[8, 2]
        assert not m[8, 8]

    def test_slow_ignores_notch_fast_includes_it(self):
        from retto_tpu.geometry import min_area_rect
        from retto_tpu.ops.raster import box_score_slow

        poly = np.array([[0, 0], [10, 0], [10, 4], [4, 4], [4, 10], [0, 10]], float)
        pred = np.ones((12, 12), np.float32)
        pred[5:11, 5:11] = 0.0  # zero probability inside the notch
        quad, _ = min_area_rect(poly)
        assert box_score_slow(pred, poly) > box_score_fast(pred, quad)

    def test_det_postprocess_slow_mode(self):
        from retto_tpu.config import ScoreMode

        pred = np.zeros((64, 64), np.float32)
        pred[10:20, 8:40] = 0.95
        mask = pred > 0.3
        cfg = DetConfig(score_mode=ScoreMode.SLOW)
        boxes, scores = det_postprocess(pred, mask, cfg, 64, 64)
        assert len(boxes) == 1
        assert scores[0] > 0.9
        # FAST on the same rectangle agrees (convex region: same pixels)
        boxes_f, scores_f = det_postprocess(
            pred, mask, DetConfig(), 64, 64, backend="numpy"
        )
        assert np.allclose(boxes, boxes_f)
        assert abs(float(scores[0]) - float(scores_f[0])) < 0.05

    def test_slow_with_native_backend_raises(self):
        from retto_tpu.config import ScoreMode

        pred = np.zeros((16, 16), np.float32)
        with pytest.raises(RuntimeError, match="host-path only"):
            det_postprocess(pred, pred > 0.3,
                            DetConfig(score_mode=ScoreMode.SLOW),
                            16, 16, backend="native")
