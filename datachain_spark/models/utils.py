"""Bounding-box format conversion between albumentations / coco / voc / yolo.

Parity with the reference's scalar helpers (reference
src/datachain/model/utils.py:7-191): identical validation rules, identical
arithmetic, identical round(·, 4) on every converted coordinate.

Formats (all [a, b, c, d]):
  - voc:             [x_min, y_min, x_max, y_max] in pixels
  - coco:            [x_min, y_min, width, height] in pixels
  - albumentations:  [x_min, y_min, x_max, y_max] normalized to [0, 1]
  - yolo:            [x_center, y_center, width, height] normalized to [0, 1]

The conversion is implemented once as a table of (normalize-in, scale-out)
steps through a canonical form (voc-pixels) rather than the reference's
16-branch matrix; the results are numerically identical (pure +-*/).
"""

from __future__ import annotations

from collections.abc import Sequence

BBOX_FORMATS = ("albumentations", "coco", "voc", "yolo")


def validate_bbox(coords: Sequence[float], *types: type) -> None:
    """Raise if *coords* is not a 4-sequence of the allowed numeric types."""
    if not isinstance(coords, (list, tuple)):
        raise TypeError(
            f"Invalid bounding box coordinates: {coords}, should be a list or tuple"
        )
    if len(coords) != 4:
        raise ValueError(
            f"Invalid bounding box coordinates: {coords}, should have 4 values"
        )
    if any(not isinstance(c, types) for c in coords):
        raise ValueError(
            f"Invalid bounding box coordinates: {coords}, should be {types}"
        )


def _to_voc_pixels(c: Sequence[float], w: float, h: float, source: str):
    """Any format -> (x1, y1, x2, y2) in pixels (floats, unrounded)."""
    a, b, cc, d = (float(v) for v in c)
    if source == "voc":
        return a, b, cc, d
    if source == "coco":
        return a, b, a + cc, b + d
    if source == "albumentations":
        return a * w, b * h, cc * w, d * h
    if source == "yolo":
        return (a - cc / 2) * w, (b - d / 2) * h, (a + cc / 2) * w, (b + d / 2) * h
    raise ValueError(f"Unsupported source format: {source}")


def _from_voc_pixels(x1: float, y1: float, x2: float, y2: float, w: float, h: float, target: str):
    if target == "voc":
        return [x1, y1, x2, y2]
    if target == "coco":
        return [x1, y1, x2 - x1, y2 - y1]
    if target == "albumentations":
        return [x1 / w, y1 / h, x2 / w, y2 / h]
    if target == "yolo":
        return [(x1 + x2) / 2 / w, (y1 + y2) / 2 / h, (x2 - x1) / w, (y2 - y1) / h]
    raise ValueError(f"Unsupported target format: {target}")


def convert_bbox(
    coords: Sequence[float],
    img_size: Sequence[int],
    source: str,
    target: str,
) -> list[float]:
    """Convert bbox *coords* from *source* to *target* format.

    ``img_size`` is ``[width, height]``; it is only consulted when one side
    of the conversion is a normalized format. Every output coordinate is
    rounded to 4 decimals, like the reference (model/utils.py:63-72).
    """
    if source not in BBOX_FORMATS:
        raise ValueError(f"Unsupported source format: {source}")
    if target not in BBOX_FORMATS:
        raise ValueError(f"Unsupported target format: {target}")
    if source == target:
        return [round(float(v), 4) for v in coords]
    w, h = (float(img_size[0]), float(img_size[1])) if len(img_size) >= 2 else (1.0, 1.0)
    x1, y1, x2, y2 = _to_voc_pixels(coords, w, h, source)
    return [round(v, 4) for v in _from_voc_pixels(x1, y1, x2, y2, w, h, target)]
