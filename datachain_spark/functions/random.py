"""Random functions submodule (reference src/datachain/func/random.py:1-24):
`func.random.rand()` — a non-negative 63-bit random integer column. The
reference's rand() is SQLite's random() (a signed 64-bit int); training
pipelines use it for sampling/splits, so the non-negative variant (matching
sys.rand's domain) is the useful contract — pyspark's uniform [0,1) double
is scaled up JVM-side."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = ["rand"]


def rand(seed: int | None = None) -> Column:
    """Random integer in [0, 2^63) (reference func/random.py rand).
    Pass `seed` for a per-run-reproducible column — something the
    reference cannot offer; for a row-stable rand use Chain.with_sys()."""
    u = F.rand(seed) if seed is not None else F.rand()
    return (u * F.lit(float(1 << 63))).cast("long").bitwiseAND(F.lit((1 << 63) - 1))
