"""Vision model tests — mirrors reference tests/unit/model/{test_utils,
test_bbox,test_pose,test_segment}.py behaviors, plus the Spark columnar
conversion path (functions/bbox.py) checked against the scalar reference
semantics for every (source, target) pair.
"""

import math

import pytest

from datachain_spark.functions.bbox import bbox_convert, bbox_iou, bbox_point_inside
from datachain_spark.models import (
    BBox,
    OBBox,
    Pose,
    Pose3D,
    Segment,
    YoloBBox,
    YoloBBoxes,
    YoloPose,
    YoloSegment,
    convert_bbox,
    validate_bbox,
)

# Same boxes in every format at img_size (100, 100) — the reference's table
# (tests/unit/model/test_utils.py:13-45).
BOXES = [
    {
        "albumentations": [0.0, 0.0, 0.0, 0.0],
        "coco": [0, 0, 0, 0],
        "voc": [0, 0, 0, 0],
        "yolo": [0.0, 0.0, 0.0, 0.0],
    },
    {
        "albumentations": [0.5, 0.5, 0.5, 0.5],
        "coco": [50, 50, 0, 0],
        "voc": [50, 50, 50, 50],
        "yolo": [0.5, 0.5, 0.0, 0.0],
    },
    {
        "albumentations": [0.0, 0.0, 1.0, 1.0],
        "coco": [0, 0, 100, 100],
        "voc": [0, 0, 100, 100],
        "yolo": [0.5, 0.5, 1.0, 1.0],
    },
    {
        "albumentations": [0.1, 0.2, 0.9, 0.8],
        "coco": [10, 20, 80, 60],
        "voc": [10, 20, 90, 80],
        "yolo": [0.5, 0.5, 0.8, 0.6],
    },
]


@pytest.mark.parametrize(
    "coords,types,exception",
    [
        (None, [int], TypeError),
        ([], [int], ValueError),
        ([10, 20, 90], [int], ValueError),
        ([10, 20, 90, 80, 100], [int], ValueError),
        ([10, 20, "90", 80], [int], ValueError),
        ([10, 20, 90, 80], [float], ValueError),
    ],
)
def test_validate_bbox(coords, types, exception):
    with pytest.raises(exception):
        validate_bbox(coords, *types)


@pytest.mark.parametrize(
    "source,target,coords,result",
    [
        (source, target, coords, result)
        for box in BOXES
        for source, coords in box.items()
        for target, result in box.items()
    ],
)
def test_convert_bbox(source, target, coords, result):
    got = convert_bbox(coords, (100, 100), source, target)
    assert all(math.isclose(g, r, abs_tol=1e-3) for g, r in zip(got, result))


def test_convert_bbox_bad_formats():
    with pytest.raises(ValueError):
        convert_bbox([0, 0, 1, 1], (100, 100), "voc", "nope")
    with pytest.raises(ValueError):
        convert_bbox([0, 0, 1, 1], (100, 100), "nope", "voc")


def test_bbox_constructors_roundtrip():
    b = BBox.from_voc([10, 20, 90, 80], title="cat")
    assert b.coords == [10, 20, 90, 80] and b.title == "cat"
    assert b.to_coco() == [10, 20, 80, 60]
    assert b.to_albumentations([100, 100]) == [0.1, 0.2, 0.9, 0.8]
    assert b.to_yolo([100, 100]) == [0.5, 0.5, 0.8, 0.6]
    assert BBox.from_coco([10, 20, 80, 60]).coords == [10, 20, 90, 80]
    assert BBox.from_albumentations([0.1, 0.2, 0.9, 0.8], [100, 100]).coords == [
        10, 20, 90, 80,
    ]
    assert BBox.from_yolo([0.5, 0.5, 0.8, 0.6], [100, 100]).coords == [10, 20, 90, 80]
    assert BBox.from_list([10.2, 19.8, 90.0, 80.0]).coords == [10, 20, 90, 80]
    assert BBox.from_dict({"x1": 10, "y1": 20, "x2": 90, "y2": 80}).coords == [
        10, 20, 90, 80,
    ]
    with pytest.raises(ValueError):
        BBox.from_dict({"x1": 10, "y1": 20, "x2": 90})
    # normalized-format constructors refuse int coords (reference validate float)
    with pytest.raises(ValueError):
        BBox.from_yolo([1, 1, 1, 1], [100, 100])


def test_bbox_point_and_pose_inside():
    b = BBox.from_voc([10, 20, 90, 80])
    assert b.point_inside(10, 20) and b.point_inside(90, 80)
    assert b.point_inside(50, 50)
    assert not b.point_inside(9, 50) and not b.point_inside(50, 81)
    inside = Pose(x=[50] * 17, y=[50] * 17)
    assert b.pose_inside(inside)
    outside = Pose(x=[50] * 16 + [95], y=[50] * 17)
    assert not b.pose_inside(outside)
    # (0, 0) keypoints are "not detected" and ignored
    zeroed = Pose(x=[0] * 17, y=[0] * 17)
    assert b.pose_inside(zeroed)


def test_obbox():
    o = OBBox.from_list([0.6, 1.4, 2, 3, 4, 5, 6, 7], title="t")
    assert o.coords == [1, 1, 2, 3, 4, 5, 6, 7]
    assert OBBox.from_dict(
        {f"{a}{i}": i for i in (1, 2, 3, 4) for a in ("x", "y")}
    ).coords == [1, 1, 2, 2, 3, 3, 4, 4]
    with pytest.raises(ValueError):
        OBBox.from_list([1, 2, 3, 4])
    with pytest.raises(TypeError):
        OBBox.from_list(None)


def test_pose_models():
    p = Pose.from_list([[float(i) for i in range(17)], [17.4] * 17])
    assert p.x == list(range(17)) and p.y == [17] * 17
    assert Pose.from_dict({"x": [1] * 17, "y": [2] * 17}).y == [2] * 17
    with pytest.raises(ValueError):
        Pose.from_list([[1] * 16, [2] * 18])
    # reference quirk kept for parity: `len(x) != len(y) != 17` is a chained
    # comparison, so it only raises when BOTH "x differs from y" and "y is
    # not 17" hold (model/pose.py:35) — equal-but-16 slips through
    assert Pose.from_list([[1] * 16, [2] * 16]).x == [1] * 16
    with pytest.raises(ValueError):
        Pose.from_dict({"x": [1] * 17})
    p3 = Pose3D.from_list([[1] * 17, [2] * 17, [0.5] * 17])
    assert p3.visible == [0.5] * 17
    with pytest.raises(ValueError):
        Pose3D.from_list([[1] * 17, [2] * 17])


def test_segment_model():
    s = Segment.from_list([[1.2, 2.0], [3.0, 4.8]], title="road")
    assert s.x == [1, 2] and s.y == [3, 5] and s.title == "road"
    assert Segment.from_dict({"x": [1], "y": [2]}).x == [1]
    with pytest.raises(ValueError):
        Segment.from_list([[1, 2], [3]])
    with pytest.raises(TypeError):
        Segment.from_list([1, 2])


class _FakeResult:
    """Duck-typed stand-in for ultralytics Results (only .summary() is used)."""

    def __init__(self, summary):
        self._summary = summary

    def summary(self):
        return self._summary


def test_yolo_models_from_results():
    det = {
        "class": 3,
        "name": "dog",
        "confidence": 0.9,
        "box": {"x1": 10, "y1": 20, "x2": 90, "y2": 80},
    }
    one = YoloBBox.from_result(_FakeResult([det]))
    assert one.cls == 3 and one.name == "dog" and one.box.coords == [10, 20, 90, 80]
    assert one.box.title == "dog"
    empty = YoloBBox.from_result(_FakeResult([]))
    assert empty.cls == -1 and empty.box.coords == []

    many = YoloBBoxes.from_results([_FakeResult([det]), _FakeResult([det, det])])
    assert many.cls == [3, 3, 3] and len(many.box) == 3

    pose_det = dict(det, keypoints={"x": [1] * 17, "y": [2] * 17, "visible": [1.0] * 17})
    yp = YoloPose.from_result(_FakeResult([pose_det]))
    assert yp.pose.x == [1] * 17 and yp.box.coords == [10, 20, 90, 80]

    seg_det = dict(det, segments={"x": [1, 2, 3], "y": [4, 5, 6]})
    ys = YoloSegment.from_result(_FakeResult([seg_det]))
    assert ys.segment.x == [1, 2, 3] and ys.segment.title == "dog"


# ---------------------------------------------------------------------------
# Spark columnar path
# ---------------------------------------------------------------------------


def test_bbox_convert_column_matches_scalar(spark):
    """Every (source, target) pair: the codegen column equals the scalar
    reference-parity conversion on a mixed batch of boxes."""
    rows = [(i, box[src], src) for i, box in enumerate(BOXES) for src in box]
    df = spark.createDataFrame(
        [(i, [float(v) for v in coords], src) for i, coords, src in rows],
        "id int, coords array<double>, src string",
    )
    for source in ("albumentations", "coco", "voc", "yolo"):
        part = df.filter(df.src == source)
        for target in ("albumentations", "coco", "voc", "yolo"):
            got = {
                r["id"]: r["out"]
                for r in part.select(
                    "id",
                    bbox_convert(
                        part.coords, source, target, img_width=100, img_height=100
                    ).alias("out"),
                ).collect()
            }
            for i, box in enumerate(BOXES):
                expect = convert_bbox(box[source], (100, 100), source, target)
                assert all(
                    math.isclose(g, e, abs_tol=1e-9)
                    for g, e in zip(got[i], expect)
                ), (source, target, i, got[i], expect)


def test_bbox_convert_column_rejects_bad_format():
    import pyspark.sql.functions as F

    with pytest.raises(ValueError):
        bbox_convert(F.col("c"), "voc", "bogus")


def test_bbox_iou_and_point_inside_columns(spark):
    df = spark.createDataFrame(
        [
            ([0.0, 0.0, 10.0, 10.0], [5.0, 5.0, 15.0, 15.0]),   # iou 25/175
            ([0.0, 0.0, 10.0, 10.0], [20.0, 20.0, 30.0, 30.0]),  # disjoint
            ([0.0, 0.0, 10.0, 10.0], [0.0, 0.0, 10.0, 10.0]),    # identical
            ([0.0, 0.0, 0.0, 0.0], [0.0, 0.0, 0.0, 0.0]),        # degenerate
        ],
        "a array<double>, b array<double>",
    )
    ious = [r[0] for r in df.select(bbox_iou(df.a, df.b)).collect()]
    assert math.isclose(ious[0], 25 / 175)
    assert ious[1] == 0.0 and ious[2] == 1.0 and ious[3] == 0.0
    inside = [
        r[0] for r in df.select(bbox_point_inside(df.a, 10, 10)).collect()
    ]
    assert inside == [True, True, True, False]
