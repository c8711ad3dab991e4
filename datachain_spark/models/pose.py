"""Pose / Pose3D keypoint models (reference src/datachain/model/pose.py:8-100).

17 COCO-order keypoints; x/y are rounded to pixel ints, visibility stays float.
"""

from __future__ import annotations

from collections.abc import Sequence
from dataclasses import dataclass, field


def _check_xy(points, n_lists: int, what: str):
    if not isinstance(points, (list, tuple)):
        raise TypeError(f"{what} must be a list of coordinates.")
    if len(points) != n_lists:
        parts = "2 lists: x and y coordinates" if n_lists == 2 else (
            "3 lists: x, y coordinates and visible"
        )
        raise ValueError(f"{what} must be a list of {parts}.")
    for p in points:
        if not isinstance(p, (list, tuple)):
            names = "x and y coordinates" if n_lists == 2 else "x, y and visible"
            raise TypeError(f"{what} {names} must be lists.")


@dataclass
class Pose:
    """2D pose: 17 keypoints as parallel x/y pixel-coordinate lists."""

    x: list[int] = field(default_factory=list)
    y: list[int] = field(default_factory=list)

    @staticmethod
    def from_list(points: Sequence[Sequence[float]]) -> "Pose":
        _check_xy(points, 2, "Pose")
        points_x, points_y = points
        # mirrors the reference's chained comparison: both lists must be 17 long
        if len(points_x) != len(points_y) != 17:
            raise ValueError(
                "Pose x and y coordinates must have the same length of 17."
            )
        if not all(isinstance(v, (int, float)) for v in [*points_x, *points_y]):
            raise ValueError("Pose coordinates must be floats or integers.")
        return Pose(x=list(map(round, points_x)), y=list(map(round, points_y)))

    @staticmethod
    def from_dict(points: dict) -> "Pose":
        keys = ("x", "y")
        if not isinstance(points, dict) or set(points) != set(keys):
            raise ValueError("Pose must be a dictionary with coordinates.")
        return Pose.from_list([points[k] for k in keys])


@dataclass
class Pose3D:
    """Pose with per-keypoint visibility scores."""

    x: list[int] = field(default_factory=list)
    y: list[int] = field(default_factory=list)
    visible: list[float] = field(default_factory=list)

    @staticmethod
    def from_list(points: Sequence[Sequence[float]]) -> "Pose3D":
        _check_xy(points, 3, "Pose3D")
        points_x, points_y, points_v = points
        if len(points_x) != len(points_y) != len(points_v) != 17:
            raise ValueError(
                "Pose3D x, y and visible must have the same length of 17."
            )
        if not all(
            isinstance(v, (int, float)) for v in [*points_x, *points_y, *points_v]
        ):
            raise ValueError("Pose3D coordinates must be floats or integers.")
        return Pose3D(
            x=list(map(round, points_x)),
            y=list(map(round, points_y)),
            visible=list(points_v),
        )

    @staticmethod
    def from_dict(points: dict) -> "Pose3D":
        keys = ("x", "y", "visible")
        if not isinstance(points, dict) or set(points) != set(keys):
            raise ValueError("Pose3D must be a dictionary with coordinates.")
        return Pose3D.from_list([points[k] for k in keys])
