"""Unit tests for retto_tpu.geometry — the layer the reference leaves
untested (SURVEY.md §4: "No unit tests for processors/geometry")."""

import math

import numpy as np
import pytest

from retto_tpu.geometry import (
    Point,
    PointBox,
    convex_hull,
    min_area_rect,
    order_clockwise_tl,
    polygon_area,
    polygon_perimeter,
    scale_and_clip,
    sort_boxes_reading_order,
    unclip,
)


def test_point_range_and_dist2():
    a, b = Point(0, 0), Point(3, 4)
    assert a.range(b) == pytest.approx(5.0)
    assert b.dist2() == 25


def test_pointbox_accessors_and_sides():
    # axis-aligned rect 10x4, clockwise from TL
    box = PointBox([[0, 0], [10, 0], [10, 4], [0, 4]])
    assert box.tl == Point(0, 0)
    assert box.tr == Point(10, 0)
    assert box.br == Point(10, 4)
    assert box.bl == Point(0, 4)
    assert box.width_tlc() == pytest.approx(10)
    assert box.width_brc() == pytest.approx(10)
    assert box.height_tlc() == pytest.approx(4)
    assert box.height_brc() == pytest.approx(4)
    c = box.center_point()
    assert (c.x, c.y) == (5, 2)


def test_scale_and_clip_rounds_and_clamps():
    # ref points.rs:179-194: x' = clamp(round(x * ori/bitmap), 0, ori-1)
    boxes = np.array([[[0, 0], [100, 0], [100, 50], [0, 50]]], dtype=np.float32)
    out = scale_and_clip(boxes, bitmap_w=100, bitmap_h=50, ori_w=200, ori_h=100)
    assert out.shape == (1, 4, 2)
    # 100 * 2 = 200 -> clamped to ori_w - 1 = 199
    np.testing.assert_allclose(
        out[0], [[0, 0], [199, 0], [199, 99], [0, 99]]
    )
    b = PointBox(boxes[0]).scale_and_clip(100, 50, 200, 100)
    np.testing.assert_allclose(b.pts, out[0])


def test_order_clockwise_tl():
    pts = np.array([[10, 4], [0, 0], [0, 4], [10, 0]], dtype=np.float32)
    ordered = order_clockwise_tl(pts)
    np.testing.assert_allclose(ordered, [[0, 0], [10, 0], [10, 4], [0, 4]])


def test_convex_hull_square_with_interior():
    pts = np.array([[0, 0], [4, 0], [4, 4], [0, 4], [2, 2], [1, 3]])
    hull = convex_hull(pts)
    assert len(hull) == 4
    assert set(map(tuple, hull.tolist())) == {(0, 0), (4, 0), (4, 4), (0, 4)}


def test_min_area_rect_axis_aligned():
    pts = np.array([[1, 1], [9, 1], [9, 4], [1, 4], [5, 2]])
    box, sside = min_area_rect(pts)
    # reference quirk (det_processor.rs:182-185): sside = min of the TOP and
    # BOTTOM edge lengths (here both 8), not min(w, h)
    assert sside == pytest.approx(8.0, abs=1e-5)
    np.testing.assert_allclose(box, [[1, 1], [9, 1], [9, 4], [1, 4]], atol=1e-5)


def test_min_area_rect_rotated():
    # a 10 x 2 rectangle rotated by 30 degrees
    ang = math.radians(30)
    rot = np.array(
        [[math.cos(ang), -math.sin(ang)], [math.sin(ang), math.cos(ang)]]
    )
    base = np.array([[0, 0], [10, 0], [10, 2], [0, 2]], dtype=np.float64)
    pts = base @ rot.T + np.array([5.0, 7.0])
    box, sside = min_area_rect(pts)
    # the rect must cover all points and have ~the same area
    area = polygon_area(box)
    assert area == pytest.approx(20.0, rel=1e-4)
    # tl-tr edge is one of the rect sides; sside = min(top, bottom) edge
    assert sside == pytest.approx(10.0, abs=1e-4) or sside == pytest.approx(
        2.0, abs=1e-4
    )


def test_polygon_area_perimeter():
    quad = np.array([[0, 0], [10, 0], [10, 4], [0, 4]])
    assert polygon_area(quad) == pytest.approx(40)
    assert polygon_perimeter(quad) == pytest.approx(28)
    # orientation-independent
    assert polygon_area(quad[::-1]) == pytest.approx(40)


@pytest.mark.parametrize("clockwise", [True, False])
def test_unclip_expands_by_distance(clockwise):
    # ref det_processor.rs:244: distance = area * ratio / perimeter
    quad = np.array([[10, 10], [50, 10], [50, 30], [10, 30]], dtype=np.float32)
    if not clockwise:
        quad = quad[::-1]
    ratio = 1.6
    d = polygon_area(quad) * ratio / polygon_perimeter(quad)
    expanded = unclip(quad, ratio)
    # re-fitting a min-area rect must give the original grown by ~d each side
    box, _ = min_area_rect(expanded)
    assert box[0][0] == pytest.approx(10 - d, abs=1.0)  # int quantization
    assert box[0][1] == pytest.approx(10 - d, abs=1.0)
    assert box[2][0] == pytest.approx(50 + d, abs=1.0)
    assert box[2][1] == pytest.approx(30 + d, abs=1.0)
    # every original vertex strictly inside the expanded polygon's bbox
    assert expanded[:, 0].min() <= 10 and expanded[:, 0].max() >= 50


def test_unclip_distance_formula_value():
    # 40 x 20 rect: area 800, perimeter 120, ratio 1.6 -> d = 10.666
    quad = np.array([[0, 0], [40, 0], [40, 20], [0, 20]], dtype=np.float32)
    d = polygon_area(quad) * 1.6 / polygon_perimeter(quad)
    assert d == pytest.approx(800 * 1.6 / 120)


def test_sort_boxes_reading_order():
    # three boxes on one visual row (centers within 10px) + one below
    centers = np.array(
        [
            [200.0, 52.0],  # row 1, rightmost
            [10.0, 50.0],  # row 1, leftmost
            [100.0, 48.0],  # row 1, middle
            [20.0, 300.0],  # row 2
        ]
    )
    idx = sort_boxes_reading_order(centers, y_tol=10.0)
    assert idx.tolist() == [1, 2, 0, 3]


def test_sort_boxes_strict_rows():
    centers = np.array([[5.0, 100.0], [500.0, 20.0]])
    idx = sort_boxes_reading_order(centers)
    assert idx.tolist() == [1, 0]
