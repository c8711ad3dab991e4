"""Semver helpers (reference src/datachain/semver.py:1-68): the public
parse/validate/create/value/compare surface used around dataset versions.
The 999999 per-part cap keeps value() inside a signed 64-bit int, so a
version can be compared as one BIGINT column in Spark too.
"""

from __future__ import annotations

MAX_VERSION_NUMBER = 999_999

_ERROR = (
    "Invalid version. It should be in format: <major>.<minor>.<patch> where"
    " each version part is positive integer"
)


def validate(version: str) -> None:
    """Raise ValueError unless `version` is <major>.<minor>.<patch> with
    each part an integer in [0, MAX_VERSION_NUMBER]."""
    parts = version.split(".")
    if len(parts) != 3:
        raise ValueError(_ERROR)
    for part in parts:
        try:
            val = int(part)
        except ValueError:
            raise ValueError(_ERROR) from None
        if not 0 <= val <= MAX_VERSION_NUMBER:
            raise ValueError(_ERROR)


def parse(version: str) -> tuple[int, int, int]:
    """Split a semver string into (major, minor, patch)."""
    validate(version)
    major, minor, patch = version.split(".")
    return int(major), int(minor), int(patch)


def create(major: int = 0, minor: int = 0, patch: int = 0) -> str:
    """Build a semver string from parts."""
    if not all(0 <= p <= MAX_VERSION_NUMBER for p in (major, minor, patch)):
        raise ValueError("Major, minor and patch must be greater or equal to zero")
    return f"{major}.{minor}.{patch}"


def value(version: str) -> int:
    """Total-order integer for a version (fits in int64)."""
    major, minor, patch = parse(version)
    limit = MAX_VERSION_NUMBER + 1
    return major * limit**2 + minor * limit + patch


def compare(v1: str, v2: str) -> int:
    """-1 / 0 / 1 ordering of two versions."""
    a, b = value(v1), value(v2)
    return (a > b) - (a < b)


__all__ = ["MAX_VERSION_NUMBER", "compare", "create", "parse", "validate", "value"]
