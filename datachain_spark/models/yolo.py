"""YOLO result models (reference src/datachain/model/ultralytics/{bbox,pose,
segment}.py, 1-151/1-117/1-95).

The reference's converters only call ``result.summary()`` (the ultralytics
Results API) and read plain dicts out of it, so these are duck-typed: any
object with a ``summary() -> list[dict]`` method works — including the
deterministic fakes in tests — and the ``ultralytics`` package is never
imported (the reference itself only imports it under TYPE_CHECKING).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from .bbox import BBox, OBBox
from .pose import Pose3D
from .segment import Segment


class YoloPoseBodyPart:
    """COCO keypoint order used by YOLO pose models."""

    nose = 0
    left_eye = 1
    right_eye = 2
    left_ear = 3
    right_ear = 4
    left_shoulder = 5
    right_shoulder = 6
    left_elbow = 7
    right_elbow = 8
    left_wrist = 9
    right_wrist = 10
    left_hip = 11
    right_hip = 12
    left_knee = 13
    right_knee = 14
    left_ankle = 15
    right_ankle = 16


def _box_of(s: dict, name: str) -> BBox:
    return BBox.from_dict(s["box"], title=name) if s.get("box") else BBox()


@dataclass
class YoloBBox:
    """The first bounding box detected in one YOLO result."""

    cls: int = -1
    name: str = ""
    confidence: float = 0
    box: BBox = field(default_factory=BBox)

    @staticmethod
    def from_result(result) -> "YoloBBox":
        summary = result.summary()
        if not summary:
            return YoloBBox(box=BBox())
        name = summary[0].get("name", "")
        return YoloBBox(
            cls=summary[0]["class"],
            name=name,
            confidence=summary[0]["confidence"],
            box=_box_of(summary[0], name),
        )


@dataclass
class YoloBBoxes:
    """All bounding boxes detected across a list of YOLO results."""

    cls: list[int] = field(default_factory=list)
    name: list[str] = field(default_factory=list)
    confidence: list[float] = field(default_factory=list)
    box: list[BBox] = field(default_factory=list)

    @staticmethod
    def from_results(results) -> "YoloBBoxes":
        out = YoloBBoxes()
        for r in results:
            for s in r.summary():
                name = s.get("name", "")
                out.cls.append(s["class"])
                out.name.append(name)
                out.confidence.append(s["confidence"])
                if s.get("box"):
                    out.box.append(BBox.from_dict(s["box"], title=name))
        return out


@dataclass
class YoloOBBox:
    """The first oriented bounding box detected in one YOLO result."""

    cls: int = -1
    name: str = ""
    confidence: float = 0
    box: OBBox = field(default_factory=OBBox)

    @staticmethod
    def from_result(result) -> "YoloOBBox":
        summary = result.summary()
        if not summary:
            return YoloOBBox(box=OBBox())
        name = summary[0].get("name", "")
        box = OBBox.from_dict(summary[0]["box"], title=name) if summary[0].get(
            "box"
        ) else OBBox()
        return YoloOBBox(
            cls=summary[0]["class"],
            name=name,
            confidence=summary[0]["confidence"],
            box=box,
        )


@dataclass
class YoloOBBoxes:
    """All oriented bounding boxes detected across a list of YOLO results."""

    cls: list[int] = field(default_factory=list)
    name: list[str] = field(default_factory=list)
    confidence: list[float] = field(default_factory=list)
    box: list[OBBox] = field(default_factory=list)

    @staticmethod
    def from_results(results) -> "YoloOBBoxes":
        out = YoloOBBoxes()
        for r in results:
            for s in r.summary():
                name = s.get("name", "")
                out.cls.append(s["class"])
                out.name.append(name)
                out.confidence.append(s["confidence"])
                if s.get("box"):
                    out.box.append(OBBox.from_dict(s["box"], title=name))
        return out


@dataclass
class YoloPose:
    """The first pose detected in one YOLO result (box + 3D keypoints)."""

    cls: int = -1
    name: str = ""
    confidence: float = 0
    box: BBox = field(default_factory=BBox)
    pose: Pose3D = field(default_factory=Pose3D)

    @staticmethod
    def from_result(result) -> "YoloPose":
        summary = result.summary()
        if not summary:
            return YoloPose(box=BBox(), pose=Pose3D())
        name = summary[0].get("name", "")
        pose = Pose3D.from_dict(summary[0]["keypoints"]) if summary[0].get(
            "keypoints"
        ) else Pose3D()
        return YoloPose(
            cls=summary[0]["class"],
            name=name,
            confidence=summary[0]["confidence"],
            box=_box_of(summary[0], name),
            pose=pose,
        )


@dataclass
class YoloPoses:
    """All poses detected across a list of YOLO results."""

    cls: list[int] = field(default_factory=list)
    name: list[str] = field(default_factory=list)
    confidence: list[float] = field(default_factory=list)
    box: list[BBox] = field(default_factory=list)
    pose: list[Pose3D] = field(default_factory=list)

    @staticmethod
    def from_results(results) -> "YoloPoses":
        out = YoloPoses()
        for r in results:
            for s in r.summary():
                name = s.get("name", "")
                out.cls.append(s["class"])
                out.name.append(name)
                out.confidence.append(s["confidence"])
                if s.get("box"):
                    out.box.append(BBox.from_dict(s["box"], title=name))
                if s.get("keypoints"):
                    out.pose.append(Pose3D.from_dict(s["keypoints"]))
        return out


@dataclass
class YoloSegment:
    """The first segment detected in one YOLO result (box + contour)."""

    cls: int = -1
    name: str = ""
    confidence: float = 0
    box: BBox = field(default_factory=BBox)
    segment: Segment = field(default_factory=Segment)

    @staticmethod
    def from_result(result) -> "YoloSegment":
        summary = result.summary()
        if not summary:
            return YoloSegment(box=BBox(), segment=Segment())
        name = summary[0].get("name", "")
        segment = Segment.from_dict(summary[0]["segments"], title=name) if summary[
            0
        ].get("segments") else Segment()
        return YoloSegment(
            cls=summary[0]["class"],
            name=name,
            confidence=summary[0]["confidence"],
            box=_box_of(summary[0], name),
            segment=segment,
        )


@dataclass
class YoloSegments:
    """All segments detected across a list of YOLO results."""

    cls: list[int] = field(default_factory=list)
    name: list[str] = field(default_factory=list)
    confidence: list[float] = field(default_factory=list)
    box: list[BBox] = field(default_factory=list)
    segment: list[Segment] = field(default_factory=list)

    @staticmethod
    def from_results(results) -> "YoloSegments":
        out = YoloSegments()
        for r in results:
            for s in r.summary():
                name = s.get("name", "")
                out.cls.append(s["class"])
                out.name.append(name)
                out.confidence.append(s["confidence"])
                if s.get("box"):
                    out.box.append(BBox.from_dict(s["box"], title=name))
                if s.get("segments"):
                    out.segment.append(Segment.from_dict(s["segments"], title=name))
        return out
