"""Columnar bounding-box format conversion — the distributed scale path.

The reference converts boxes one Python object at a time
(src/datachain/model/utils.py:23-75); at corpus scale (billions of detection
rows) that is a per-row Python loop. Here the same arithmetic is a pure
Catalyst expression over an ``array<double>`` column: no UDF, whole-stage
codegen, safe at 100 TB. Semantics match ``models.utils.convert_bbox``
exactly, including the round(·, 4) on every output coordinate.

Formats (all 4-element arrays):
  - voc:             [x_min, y_min, x_max, y_max] pixels
  - coco:            [x_min, y_min, width, height] pixels
  - albumentations:  [x_min, y_min, x_max, y_max] normalized
  - yolo:            [x_center, y_center, width, height] normalized
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from datachain_spark.models.utils import BBOX_FORMATS


def _lit(v) -> Column:
    return v if isinstance(v, Column) else F.lit(float(v))


def bbox_convert(
    coords: Column,
    source: str,
    target: str,
    img_width=1.0,
    img_height=1.0,
) -> Column:
    """Convert a 4-element bbox array column from *source* to *target* format.

    ``img_width`` / ``img_height`` may be Python numbers or Columns; they are
    only consulted when one side of the conversion is normalized. Returns an
    ``array<double>`` with each element rounded to 4 decimals (reference
    model/utils.py:63-72 parity).
    """
    if source not in BBOX_FORMATS:
        raise ValueError(f"Unsupported source format: {source}")
    if target not in BBOX_FORMATS:
        raise ValueError(f"Unsupported target format: {target}")

    w, h = _lit(img_width), _lit(img_height)
    a = coords[0].cast("double")
    b = coords[1].cast("double")
    c = coords[2].cast("double")
    d = coords[3].cast("double")

    if source == target:
        out = [a, b, c, d]
    else:
        # canonical form: voc pixels
        if source == "voc":
            x1, y1, x2, y2 = a, b, c, d
        elif source == "coco":
            x1, y1, x2, y2 = a, b, a + c, b + d
        elif source == "albumentations":
            x1, y1, x2, y2 = a * w, b * h, c * w, d * h
        else:  # yolo
            x1 = (a - c / 2) * w
            y1 = (b - d / 2) * h
            x2 = (a + c / 2) * w
            y2 = (b + d / 2) * h

        if target == "voc":
            out = [x1, y1, x2, y2]
        elif target == "coco":
            out = [x1, y1, x2 - x1, y2 - y1]
        elif target == "albumentations":
            out = [x1 / w, y1 / h, x2 / w, y2 / h]
        else:  # yolo
            out = [
                (x1 + x2) / 2 / w,
                (y1 + y2) / 2 / h,
                (x2 - x1) / w,
                (y2 - y1) / h,
            ]

    return F.array(*[F.round(v, 4) for v in out])


def bbox_point_inside(coords: Column, x, y) -> Column:
    """True if point (x, y) lies inside a voc-format box column (edges count;
    reference model/bbox.py:188-196)."""
    px, py = _lit(x), _lit(y)
    return (
        (coords[0] <= px) & (px <= coords[2]) & (coords[1] <= py) & (py <= coords[3])
    )


def bbox_iou(box_a: Column, box_b: Column) -> Column:
    """Intersection-over-union of two voc-format box columns (codegen).

    The standard detection-dedup primitive the reference leaves to user code;
    provided here because NMS-style dedup over billions of boxes needs a
    JVM-side expression.
    """
    ix1 = F.greatest(box_a[0].cast("double"), box_b[0].cast("double"))
    iy1 = F.greatest(box_a[1].cast("double"), box_b[1].cast("double"))
    ix2 = F.least(box_a[2].cast("double"), box_b[2].cast("double"))
    iy2 = F.least(box_a[3].cast("double"), box_b[3].cast("double"))
    iw = F.greatest(ix2 - ix1, F.lit(0.0))
    ih = F.greatest(iy2 - iy1, F.lit(0.0))
    inter = iw * ih
    area_a = (box_a[2] - box_a[0]).cast("double") * (box_a[3] - box_a[1]).cast("double")
    area_b = (box_b[2] - box_b[0]).cast("double") * (box_b[3] - box_b[1]).cast("double")
    union = area_a + area_b - inter
    return F.when(union > 0, inter / union).otherwise(F.lit(0.0))
