"""Chain.merge_into — dataset-level MERGE (Delta/Iceberg MERGE analog):
upsert/insert/delete into a saved bucketed dataset via the one-shuffle
CDC apply, with watermark-ordered successive merges, schema evolution,
and changelog visibility.
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

import datachain_spark as dc
from datachain_spark.chain import Chain
from datachain_spark.lake.table import LakeTable
from datachain_spark.namespaces import dataset_root


def _save_base(spark, cat):
    ch = Chain(
        spark.createDataFrame(
            [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)], "id INT, s STRING, v DOUBLE"
        )
    )
    ch.catalog_root = cat
    ch.save("tgt", key_cols=["id"], num_buckets=4)
    return ch


def _rows(spark, cat, name="tgt"):
    df = dc.read_dataset(spark, name, catalog_root=cat).df
    return sorted(tuple(r) for r in df.select("id", "s", "v").collect())


def test_merge_into_upsert_insert_delete(spark, tmp_path):
    cat = str(tmp_path / "cat")
    _save_base(spark, cat)
    src = Chain(
        spark.createDataFrame(
            [(2, "B!", 21.0, False), (4, "d", 40.0, False), (3, None, None, True)],
            "id INT, s STRING, v DOUBLE, is_del BOOLEAN",
        )
    )
    src.catalog_root = cat
    out = src.merge_into("tgt", on=["id"], delete_col="is_del")
    assert out["rows_upserted"] == 2 and out["rows_deleted"] == 1
    assert _rows(spark, cat) == [
        (1, "a", 10.0),
        (2, "B!", 21.0),
        (4, "d", 40.0),
    ]


def test_merge_into_later_merge_wins_and_changelog(spark, tmp_path):
    cat = str(tmp_path / "cat")
    _save_base(spark, cat)

    def merge(rows):
        c = Chain(spark.createDataFrame(rows, "id INT, s STRING, v DOUBLE"))
        c.catalog_root = cat
        return c.merge_into("tgt")

    merge([(1, "first", 1.0)])
    merge([(1, "second", 2.0)])
    assert _rows(spark, cat)[0] == (1, "second", 2.0)
    # both merges are ordinary CDC commits: visible in the changelog
    table = LakeTable(dataset_root(cat, "tgt"))
    ch = table.read_changes(spark, 1)  # after the save commit
    got = sorted(
        (r["id"], r["s"], r["_change_type"]) for r in ch.collect()
    )
    assert got == [(1, "first", "upsert"), (1, "second", "upsert")]


def test_merge_into_schema_evolution_and_full_row_semantics(spark, tmp_path):
    cat = str(tmp_path / "cat")
    _save_base(spark, cat)
    src = Chain(
        spark.createDataFrame([(2, "B2", 22.0, "extra!")], "id INT, s STRING, v DOUBLE, note STRING")
    )
    src.catalog_root = cat
    out = src.merge_into("tgt")
    assert out["evolved"] == ["note"]
    df = dc.read_dataset(spark, "tgt", catalog_root=cat).df
    rows = {r["id"]: (r["s"], r["note"]) for r in df.collect()}
    assert rows[2] == ("B2", "extra!") and rows[1] == ("a", None)
    # full-row upsert: a source missing a payload column NULLs it
    src2 = Chain(spark.createDataFrame([(1, 99.0)], "id INT, v DOUBLE"))
    src2.catalog_root = cat
    src2.merge_into("tgt")
    rows = {
        r["id"]: (r["s"], r["v"])
        for r in dc.read_dataset(spark, "tgt", catalog_root=cat).df.collect()
    }
    assert rows[1] == (None, 99.0)


def test_merge_into_lsn_col_orders_in_batch_duplicates(spark, tmp_path):
    cat = str(tmp_path / "cat")
    _save_base(spark, cat)
    src = Chain(
        spark.createDataFrame(
            [(1, "older", 0.0, 100), (1, "newer", 1.0, 200)],
            "id INT, s STRING, v DOUBLE, seq LONG",
        )
    )
    src.catalog_root = cat
    src.merge_into("tgt", lsn_col="seq")
    assert _rows(spark, cat)[0] == (1, "newer", 1.0)


def test_merge_into_validation(spark, tmp_path):
    cat = str(tmp_path / "cat")
    flat = Chain(spark.createDataFrame([(1, "x")], "id INT, s STRING"))
    flat.catalog_root = cat
    flat.save("flat")  # no key_cols
    src = Chain(spark.createDataFrame([(1, "y")], "id INT, s STRING"))
    src.catalog_root = cat
    with pytest.raises(ValueError, match="not a merge target"):
        src.merge_into("flat")
    _save_base(spark, cat)
    with pytest.raises(ValueError, match="does not match"):
        src.merge_into("tgt", on=["s"])
    bad = Chain(spark.createDataFrame([("y",)], "s STRING"))
    bad.catalog_root = cat
    with pytest.raises(ValueError, match="missing key columns"):
        bad.merge_into("tgt")


def test_merge_into_lsn_col_not_leaked_into_schema(spark, tmp_path):
    """A non-'lsn' ordering column is consumed into the WAL order and must
    NOT ride along as a payload column (it would silently evolve the
    target schema via apply_batch's candidate-column path — r5 ADVICE)."""
    cat = str(tmp_path / "cat")
    _save_base(spark, cat)
    src = Chain(
        spark.createDataFrame(
            [(2, "b2", 25.0, 100), (4, "d", 40.0, 101)],
            "id INT, s STRING, v DOUBLE, my_order LONG",
        )
    )
    src.catalog_root = cat
    src.merge_into("tgt", lsn_col="my_order")
    df = dc.read_dataset(spark, "tgt", catalog_root=cat).df
    assert "my_order" not in df.columns, df.columns
    assert _rows(spark, cat) == [
        (1, "a", 10.0),
        (2, "b2", 25.0),
        (3, "c", 30.0),
        (4, "d", 40.0),
    ]
