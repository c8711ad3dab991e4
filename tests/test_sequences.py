"""operators/sequences: whole-sequence (conversation-level) exact dedup
(see the module docstring — one groupBy shuffle, per-group state bounded
by the group's own rows, md5 fingerprint DuckDB reproduces)."""

from __future__ import annotations

from pyspark.sql import functions as F

from datachain_spark.operators.sequences import dedup_sequences, sequence_fingerprint

ROWS = [
    (1, 1, "a"), (1, 2, "b"),   # conv 1: a,b
    (2, 1, "a"), (2, 2, "b"),   # conv 2: duplicate of 1 under a new id
    (3, 1, "b"), (3, 2, "a"),   # conv 3: same multiset, different ORDER
    (4, 1, "a"), (4, 2, None),  # conv 4: NULL payload cell
    (5, 1, "a"), (5, 2, ""),    # conv 5: empty string (must differ from 4)
]


def _df(spark):
    return spark.createDataFrame(ROWS, ["conv", "turn", "txt"])


def test_fingerprint_equal_iff_same_ordered_sequence(spark):
    fps = {
        r.conv: r.seq_fp
        for r in sequence_fingerprint(_df(spark), ["conv"], ["turn"], ["txt"]).collect()
    }
    assert fps[1] == fps[2]          # identical ordered content
    assert fps[1] != fps[3]          # order matters
    assert fps[4] != fps[5]          # NULL sentinel != empty string


def test_fingerprint_matches_duckdb_md5(spark):
    import duckdb

    fp1 = (
        sequence_fingerprint(_df(spark), ["conv"], ["turn"], ["txt"])
        .filter(F.col("conv") == 1)
        .collect()[0]
        .seq_fp
    )
    want = duckdb.connect().execute("SELECT md5('a' || chr(31) || 'b')").fetchone()[0]
    assert fp1 == want


def test_dedup_keeps_min_group_and_all_rows(spark):
    out = dedup_sequences(_df(spark), ["conv"], ["turn"], ["txt"])
    kept = sorted(set(r.conv for r in out.collect()))
    assert kept == [1, 3, 4, 5]      # conv 2 dropped (min id 1 wins)
    assert out.filter(F.col("conv") == 1).count() == 2  # rows unchanged
    assert set(out.columns) == {"conv", "turn", "txt"}


def test_fingerprint_partition_and_delivery_invariant(spark):
    """The fingerprint is a pure function of the group's content —
    identical under any partitioning or input row order."""
    base = {
        r.conv: r.seq_fp
        for r in sequence_fingerprint(_df(spark), ["conv"], ["turn"], ["txt"]).collect()
    }
    shuffled = _df(spark).orderBy(F.desc("turn"), F.asc("conv")).repartition(13)
    again = {
        r.conv: r.seq_fp
        for r in sequence_fingerprint(shuffled, ["conv"], ["turn"], ["txt"]).collect()
    }
    assert base == again


def test_multi_payload_and_multi_order_cols(spark):
    df = spark.createDataFrame(
        [
            (1, 1, 0, "u", "hi"), (1, 1, 1, "a", "yo"),
            (2, 1, 0, "u", "hi"), (2, 1, 1, "a", "yo"),   # dup of 1
            (3, 1, 0, "u", "hi"), (3, 1, 1, "a", "yo!"),  # differs in 2nd payload
        ],
        ["conv", "day", "turn", "role", "text"],
    )
    out = dedup_sequences(df, ["conv"], ["day", "turn"], ["role", "text"])
    assert sorted(set(r.conv for r in out.collect())) == [1, 3]
