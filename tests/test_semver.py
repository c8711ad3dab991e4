"""Semver module tests (mirrors reference tests/unit/test_semver.py)."""

import pytest

from datachain_spark import semver


@pytest.mark.parametrize(
    "version,expected",
    [
        ("0.0.0", (0, 0, 0)),
        ("0.1.2", (0, 1, 2)),
        ("10.20.30", (10, 20, 30)),
        ("999999.999999.999999", (999999, 999999, 999999)),
    ],
)
def test_parse(version, expected):
    assert semver.parse(version) == expected


@pytest.mark.parametrize(
    "version",
    ["0", "1.2", "1.2.-3", "1.2.3-alpha+01", "dev", "1000000.0.0"],
)
def test_parse_wrong_format(version):
    with pytest.raises(ValueError) as excinfo:
        semver.parse(version)
    assert "Invalid version" in str(excinfo.value)


def test_create_and_bounds():
    assert semver.create() == "0.0.0"
    assert semver.create(1, 2, 3) == "1.2.3"
    with pytest.raises(ValueError):
        semver.create(-1)
    with pytest.raises(ValueError):
        semver.create(semver.MAX_VERSION_NUMBER + 1)


def test_value_total_order_and_int64():
    assert semver.value("0.0.0") == 0
    assert semver.value("0.0.1") == 1
    assert semver.value("0.1.0") == 1_000_000
    assert semver.value("999999.999999.999999") < 2**63 - 1
    assert semver.value("1.0.0") > semver.value("0.999999.999999")


@pytest.mark.parametrize(
    "v1,v2,expected",
    [("1.2.3", "1.2.3", 0), ("1.2.3", "1.2.4", -1), ("2.0.0", "1.999999.0", 1)],
)
def test_compare(v1, v2, expected):
    assert semver.compare(v1, v2) == expected
