"""Polygon rasterization + DB box scoring (host, NumPy).

Replaces ``imageproc::drawing::draw_polygon_mut`` + the fold in the
reference's ``box_score_fast`` (det_processor.rs:188-221): mean probability
over the pixels inside the candidate quad's filled polygon, restricted to
the quad's bounding box.
"""

from __future__ import annotations

import numpy as np

__all__ = ["fill_convex_quad", "box_score_fast"]


def fill_convex_quad(quad: np.ndarray, h: int, w: int) -> np.ndarray:
    """Boolean mask of the filled convex quad (edges inclusive) on an
    ``(h, w)`` grid.  The quad must be ordered (either orientation); the
    candidate boxes here are min-area rects, which are always convex."""
    quad = np.asarray(quad, dtype=np.float64).reshape(4, 2)
    ys, xs = np.mgrid[0:h, 0:w]
    pts = np.stack([xs, ys], axis=-1).astype(np.float64)  # (h, w, 2)
    inside_neg = np.ones((h, w), dtype=bool)
    inside_pos = np.ones((h, w), dtype=bool)
    for i in range(4):
        a = quad[i]
        b = quad[(i + 1) % 4]
        cross = (b[0] - a[0]) * (pts[..., 1] - a[1]) - (b[1] - a[1]) * (
            pts[..., 0] - a[0]
        )
        inside_neg &= cross <= 0
        inside_pos &= cross >= 0
    return inside_neg | inside_pos


def box_score_fast(pred: np.ndarray, quad: np.ndarray) -> float:
    """Mean of ``pred`` inside the quad (det_processor.rs:188-221,
    ScoreMode::Fast — the only mode the reference implements).

    The quad is clamped to the bitmap, shifted into its bounding box, and
    rasterized; returns 0.0 when no pixel is covered."""
    pred = np.asarray(pred)
    h, w = pred.shape
    quad = np.asarray(quad, dtype=np.float64).reshape(4, 2)
    x_min = int(np.clip(np.floor(quad[:, 0].min()), 0, w - 1))
    x_max = int(np.clip(np.ceil(quad[:, 0].max()), 0, w - 1))
    y_min = int(np.clip(np.floor(quad[:, 1].min()), 0, h - 1))
    y_max = int(np.clip(np.ceil(quad[:, 1].max()), 0, h - 1))
    shifted = quad - np.array([x_min, y_min], dtype=np.float64)
    mask = fill_convex_quad(shifted, y_max - y_min + 1, x_max - x_min + 1)
    if not mask.any():
        return 0.0
    region = pred[y_min : y_max + 1, x_min : x_max + 1]
    return float(region[mask].mean())
