"""Bounding-box geometry as native Catalyst column arithmetic.

Reference: ``bb_intersection_over_union`` (demoTalkNet.py:131-144) and
crop-geometry derivation (demoTalkNet.py:185-202). Coordinates are
plain doubles; no +1 pixel convention anywhere in the reference.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(x) -> Column:
    return F.col(x) if isinstance(x, str) else x


def intersection_area(ax1, ay1, ax2, ay2, bx1, by1, bx2, by2) -> Column:
    """max(0, min(x2)-max(x1)) * max(0, min(y2)-max(y1))
    (demoTalkNet.py:133-138)."""
    ax1, ay1, ax2, ay2 = _c(ax1), _c(ay1), _c(ax2), _c(ay2)
    bx1, by1, bx2, by2 = _c(bx1), _c(by1), _c(bx2), _c(by2)
    iw = F.greatest(F.lit(0.0), F.least(ax2, bx2) - F.greatest(ax1, bx1))
    ih = F.greatest(F.lit(0.0), F.least(ay2, by2) - F.greatest(ay1, by1))
    return iw * ih


def box_area(x1, y1, x2, y2) -> Column:
    return (_c(x2) - _c(x1)) * (_c(y2) - _c(y1))


def iou(ax1, ay1, ax2, ay2, bx1, by1, bx2, by2) -> Column:
    """X1: intersection over union (demoTalkNet.py:131-144)."""
    inter = intersection_area(ax1, ay1, ax2, ay2, bx1, by1, bx2, by2)
    union = box_area(ax1, ay1, ax2, ay2) + box_area(bx1, by1, bx2, by2) - inter
    return inter / union


def iou_one_sided(ax1, ay1, ax2, ay2, bx1, by1, bx2, by2) -> Column:
    """X1 ``evalCol=True`` variant: intersection over area of box A
    (demoTalkNet.py:141-142, used by the Columbia eval J5)."""
    inter = intersection_area(ax1, ay1, ax2, ay2, bx1, by1, bx2, by2)
    return inter / box_area(ax1, ay1, ax2, ay2)


def box_center_size(x1, y1, x2, y2) -> tuple[Column, Column, Column]:
    """X2: (cx, cy, half-size) with s = max(h, w)/2
    (demoTalkNet.py:185-189)."""
    cx = (_c(x1) + _c(x2)) / F.lit(2.0)
    cy = (_c(y1) + _c(y2)) / F.lit(2.0)
    s = F.greatest(_c(x2) - _c(x1), _c(y2) - _c(y1)) / F.lit(2.0)
    return cx, cy, s


def crop_rect(cx, cy, s, crop_scale: float = 0.40) -> dict[str, Column]:
    """X3: padded crop-window geometry (demoTalkNet.py:193-202).

    pad ``bsi = int(s*(1+2*cs))``; window rows ``[my-bs, my+bs*(1+2cs))``
    cols ``[mx-bs*(1+cs), mx+bs*(1+cs))`` in the padded image where
    ``my = cy + bsi``, ``mx = cx + bsi``. Pixel work (pad value 110,
    resize 224) stays in the image UDF; these columns define the rect.
    """
    cx, cy, s = _c(cx), _c(cy), _c(s)
    cs = F.lit(float(crop_scale))
    bsi = F.floor(s * (F.lit(1.0) + F.lit(2.0) * cs)).cast("int")
    my = cy + bsi
    mx = cx + bsi
    return {
        "pad": bsi,
        "row0": F.floor(my - s).cast("int"),
        "row1": F.floor(my + s * (F.lit(1.0) + F.lit(2.0) * cs)).cast("int"),
        "col0": F.floor(mx - s * (F.lit(1.0) + cs)).cast("int"),
        "col1": F.floor(mx + s * (F.lit(1.0) + cs)).cast("int"),
    }
