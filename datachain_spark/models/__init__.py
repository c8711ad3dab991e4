"""Vision data models (reference src/datachain/model/__init__.py:1-6).

BBox/OBBox/Pose/Pose3D/Segment are dataclasses (this repo's DataModel
analog), so a Mapper returning one becomes a nested StructType column.
The YOLO result models live in .yolo (the reference nests them under
model/ultralytics/; they are duck-typed on ``result.summary()`` here, so
the ultralytics package itself is never required).
"""

from . import yolo
from .bbox import BBox, OBBox
from .pose import Pose, Pose3D
from .segment import Segment
from .utils import convert_bbox, validate_bbox
from .yolo import (
    YoloBBox,
    YoloBBoxes,
    YoloOBBox,
    YoloOBBoxes,
    YoloPose,
    YoloPoseBodyPart,
    YoloPoses,
    YoloSegment,
    YoloSegments,
)

__all__ = [
    "BBox",
    "OBBox",
    "Pose",
    "Pose3D",
    "Segment",
    "YoloBBox",
    "YoloBBoxes",
    "YoloOBBox",
    "YoloOBBoxes",
    "YoloPose",
    "YoloPoseBodyPart",
    "YoloPoses",
    "YoloSegment",
    "YoloSegments",
    "convert_bbox",
    "validate_bbox",
    "yolo",
]
