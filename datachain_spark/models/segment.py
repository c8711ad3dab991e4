"""Segment polygon model (reference src/datachain/model/segment.py:8-51)."""

from __future__ import annotations

from collections.abc import Sequence
from dataclasses import dataclass, field


@dataclass
class Segment:
    """A polygon contour: parallel x/y pixel-coordinate lists of equal length."""

    title: str = ""
    x: list[int] = field(default_factory=list)
    y: list[int] = field(default_factory=list)

    @staticmethod
    def from_list(points: Sequence[Sequence[float]], title: str = "") -> "Segment":
        if not isinstance(points, (list, tuple)):
            raise TypeError("Segment must be a list of coordinates.")
        if len(points) != 2:
            raise ValueError(
                "Segment must be a list of 2 lists: x and y coordinates."
            )
        points_x, points_y = points
        if not isinstance(points_x, (list, tuple)) or not isinstance(
            points_y, (list, tuple)
        ):
            raise TypeError("Segment x and y coordinates must be lists.")
        if len(points_x) != len(points_y):
            raise ValueError(
                "Segment x and y coordinates must have the same length."
            )
        if not all(isinstance(v, (int, float)) for v in [*points_x, *points_y]):
            raise ValueError("Segment coordinates must be floats or integers.")
        return Segment(
            title=title,
            x=list(map(round, points_x)),
            y=list(map(round, points_y)),
        )

    @staticmethod
    def from_dict(points: dict, title: str = "") -> "Segment":
        keys = ("x", "y")
        if not isinstance(points, dict) or set(points) != set(keys):
            raise ValueError("Segment must be a dictionary with coordinates.")
        return Segment.from_list([points[k] for k in keys], title=title)
