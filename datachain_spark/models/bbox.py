"""BBox / OBBox data models (reference src/datachain/model/bbox.py:14-255).

Same constructors, validation rules and rounding as the reference; here the
models are dataclasses (this repo's DataModel analog, udf.py:60) so a UDF
returning one maps to a nested Spark StructType automatically.
"""

from __future__ import annotations

from collections.abc import Sequence
from dataclasses import dataclass, field
from typing import TYPE_CHECKING, Union

from .utils import convert_bbox, validate_bbox

if TYPE_CHECKING:
    from .pose import Pose, Pose3D


@dataclass
class BBox:
    """A bounding box in PASCAL VOC pixel format.

    coords = [x_min, y_min, x_max, y_max] in pixels (top-left, bottom-right).
    """

    title: str = ""
    coords: list[int] = field(default_factory=list)

    # --- constructors (one per wire format) ---------------------------------

    @staticmethod
    def from_albumentations(
        coords: Sequence[float], img_size: Sequence[int], title: str = ""
    ) -> "BBox":
        """[x_min, y_min, x_max, y_max] normalized to [0,1] -> BBox."""
        validate_bbox(coords, float)
        voc = convert_bbox(coords, img_size, "albumentations", "voc")
        return BBox(title=title, coords=list(map(round, voc)))

    def to_albumentations(self, img_size: Sequence[int]) -> list[float]:
        return convert_bbox(self.coords, img_size, "voc", "albumentations")

    @staticmethod
    def from_coco(coords: Sequence[float], title: str = "") -> "BBox":
        """[x_min, y_min, width, height] in pixels -> BBox."""
        validate_bbox(coords, float, int)
        voc = convert_bbox(coords, [], "coco", "voc")
        return BBox(title=title, coords=list(map(round, voc)))

    def to_coco(self) -> list[int]:
        return list(map(round, convert_bbox(self.coords, [], "voc", "coco")))

    @staticmethod
    def from_voc(coords: Sequence[float], title: str = "") -> "BBox":
        """[x_min, y_min, x_max, y_max] in pixels -> BBox."""
        validate_bbox(coords, float, int)
        return BBox(title=title, coords=list(map(round, coords)))

    def to_voc(self) -> list[int]:
        return self.coords

    @staticmethod
    def from_yolo(
        coords: Sequence[float], img_size: Sequence[int], title: str = ""
    ) -> "BBox":
        """[x_center, y_center, width, height] normalized -> BBox."""
        validate_bbox(coords, float)
        voc = convert_bbox(coords, img_size, "yolo", "voc")
        return BBox(title=title, coords=list(map(round, voc)))

    def to_yolo(self, img_size: Sequence[int]) -> list[float]:
        return convert_bbox(self.coords, img_size, "voc", "yolo")

    @staticmethod
    def from_list(coords: Sequence[float], title: str = "") -> "BBox":
        return BBox.from_voc(coords, title=title)

    @staticmethod
    def from_dict(coords: dict, title: str = "") -> "BBox":
        keys = ("x1", "y1", "x2", "y2")
        if not isinstance(coords, dict) or set(coords) != set(keys):
            raise ValueError("Bounding box must be a dictionary with coordinates.")
        return BBox.from_voc([coords[k] for k in keys], title=title)

    # --- geometry -----------------------------------------------------------

    def point_inside(self, x: int, y: int) -> bool:
        """True if (x, y) is inside the box; edges count as inside."""
        x1, y1, x2, y2 = self.coords
        return x1 <= x <= x2 and y1 <= y <= y2

    def pose_inside(self, pose: Union["Pose", "Pose3D"]) -> bool:
        """True if every non-origin keypoint of *pose* is inside the box."""
        return all(
            self.point_inside(x, y)
            for x, y in zip(pose.x, pose.y)
            if x > 0 or y > 0
        )


@dataclass
class OBBox:
    """An oriented bounding box: 4 corner points, 8 pixel coordinates."""

    title: str = ""
    coords: list[int] = field(default_factory=list)

    @staticmethod
    def from_list(coords: Sequence[float], title: str = "") -> "OBBox":
        if not isinstance(coords, (list, tuple)):
            raise TypeError("Oriented bounding box must be a list of coordinates.")
        if len(coords) != 8:
            raise ValueError("Oriented bounding box must have 8 coordinates.")
        if not all(isinstance(v, (int, float)) for v in coords):
            raise ValueError(
                "Oriented bounding box coordinates must be floats or integers."
            )
        return OBBox(title=title, coords=list(map(round, coords)))

    @staticmethod
    def from_dict(coords: dict, title: str = "") -> "OBBox":
        keys = ("x1", "y1", "x2", "y2", "x3", "y3", "x4", "y4")
        if not isinstance(coords, dict) or set(coords) != set(keys):
            raise ValueError(
                "Oriented bounding box must be a dictionary with coordinates."
            )
        return OBBox.from_list([coords[k] for k in keys], title=title)
