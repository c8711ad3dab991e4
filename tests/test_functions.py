"""Scalar/aggregate function library tests (reference tests/unit/sql/*)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from datachain_spark import functions as fn


def test_string_functions(spark):
    df = spark.createDataFrame([("hello world",)], "s string")
    row = df.select(
        fn.length("s").alias("l"),
        fn.split("s", " ").alias("sp"),
        fn.replace("s", "world", "there").alias("r"),
        fn.regexp_replace("s", "[lo]", "_").alias("rr"),
        fn.byte_hamming_distance(F.lit("karolin"), F.lit("kathrin")).alias("h"),
        fn.byte_hamming_distance(F.lit("abc"), F.lit("abcdd")).alias("h2"),
    ).collect()[0]
    assert row["l"] == 11
    assert row["sp"] == ["hello", "world"]
    assert row["r"] == "hello there"
    assert row["rr"] == "he___ w_r_d"
    assert row["h"] == 3
    assert row["h2"] == 2


def test_path_functions(spark):
    df = spark.createDataFrame(
        [("a/b/c/file.tar.gz",), ("noslash.txt",), ("plain",)], "p string"
    )
    rows = df.select(
        fn.parent("p").alias("parent"),
        fn.name("p").alias("name"),
        fn.file_stem("p").alias("stem"),
        fn.file_ext("p").alias("ext"),
    ).collect()
    assert (rows[0]["parent"], rows[0]["name"], rows[0]["stem"], rows[0]["ext"]) == (
        "a/b/c", "file.tar.gz", "file.tar", "gz",
    )
    assert (rows[1]["parent"], rows[1]["stem"], rows[1]["ext"]) == ("", "noslash", "txt")
    assert (rows[2]["stem"], rows[2]["ext"]) == ("plain", "")


def test_array_functions(spark):
    df = spark.createDataFrame([([1.0, 0.0], [0.0, 1.0], ["a", "b", "c"])],
                               "x array<double>, y array<double>, s array<string>")
    row = df.select(
        fn.cosine_distance("x", "y").alias("cd"),
        fn.euclidean_distance("x", "y").alias("ed"),
        fn.contains("s", "b").alias("c"),
        fn.slice("s", 1, 2).alias("sl"),
        fn.join("s", "-").alias("j"),
        fn.get_element("s", 0).alias("g"),
        fn.sip_hash_64("s").alias("h"),
    ).collect()[0]
    assert math.isclose(row["cd"], 1.0)
    assert math.isclose(row["ed"], math.sqrt(2))
    assert row["c"] is True
    assert row["sl"] == ["b", "c"]
    assert row["j"] == "a-b-c"
    assert row["g"] == "a"
    assert isinstance(row["h"], int)


def test_numeric_and_conditional(spark):
    df = spark.createDataFrame([(0b1100, 0b1010, 5.0)], "a long, b long, v double")
    row = df.select(
        fn.bit_and("a", "b").alias("ba"),
        fn.bit_or("a", "b").alias("bo"),
        fn.bit_xor("a", "b").alias("bx"),
        fn.bit_hamming_distance("a", "b").alias("bh"),
        fn.greatest("v", fn.literal(10.0)).alias("g"),
        fn.least("v", fn.literal(10.0)).alias("l"),
        fn.ifelse(F.col("v") > 1, "big", "small").alias("ie"),
        fn.isnone("v").alias("isn"),
        fn.case((F.col("v") > 100, "huge"), (F.col("v") > 1, "big"), else_="tiny").alias("cs"),
    ).collect()[0]
    assert row["ba"] == 0b1000 and row["bo"] == 0b1110 and row["bx"] == 0b0110
    assert row["bh"] == 2
    assert row["g"] == 10.0 and row["l"] == 5.0
    assert row["ie"] == "big" and row["isn"] is False and row["cs"] == "big"


def test_aggregates_and_window(spark):
    df = spark.createDataFrame(
        [("a", 1), ("a", 3), ("b", 2)], "g string, v int"
    )
    row = df.groupBy("g").agg(
        fn.count().alias("n"),
        fn.sum("v").alias("s"),
        fn.collect("v").alias("c"),
        fn.concat("g", "+").alias("cc"),
    ).orderBy("g").collect()
    assert row[0]["n"] == 2 and row[0]["s"] == 4 and sorted(row[0]["c"]) == [1, 3]
    assert row[1]["cc"] == "b"
    w = fn.window("g", "v", desc=True)
    top = df.withColumn("rn", fn.row_number().over(w)).filter("rn = 1").orderBy("g").collect()
    assert [(r["g"], r["v"]) for r in top] == [("a", 3), ("b", 2)]
