"""Streaming operators: watermarked windows + stateful sessionization,
driven through a real file-streaming source into a memory sink."""

from __future__ import annotations

from datetime import datetime, timedelta

import pytest

from datachain_spark.streaming import sessionize_stateful, windowed_counts

T0 = datetime(2025, 6, 1, 0, 0, 0)


def _events(spark):
    rows = []
    # user 1: two sessions separated by a 2-hour gap
    for i in range(5):
        rows.append((i, T0 + timedelta(minutes=i), 1, "click", 1.0))
    for i in range(3):
        rows.append((100 + i, T0 + timedelta(hours=3, minutes=i), 1, "view", 2.0))
    # user 2: one session
    rows.append((200, T0 + timedelta(minutes=10), 2, "click", 5.0))
    return spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double"
    )


def test_windowed_counts_batch(spark):
    out = windowed_counts(_events(spark), window="5 minutes").collect()
    got = {(r["win_start"], r["event_type"]): (r["n"], r["total"]) for r in out}
    assert got[(T0, "click")] == (5, 5.0)
    assert got[(T0 + timedelta(hours=3), "view")] == (3, 6.0)


def test_windowed_counts_streaming(spark, tmp_path):
    src = str(tmp_path / "src")
    _events(spark).write.parquet(src)
    stream = (
        spark.readStream.schema(
            "event_id long, ts timestamp, user_id long, event_type string, value double"
        ).parquet(src)
    )
    q = (
        windowed_counts(stream, window="5 minutes")
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("winout")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    # append mode emits only watermark-closed windows; with a finite feed
    # the final windows stay open — check the closed ones landed
    rows = spark.sql("select * from winout").collect()
    got = {(r["win_start"], r["event_type"]): r["n"] for r in rows}
    assert got.get((T0, "click")) == 5


def test_sessionize_stateful_streaming(spark, tmp_path):
    src = str(tmp_path / "ssrc")
    _events(spark).write.parquet(src)
    stream = (
        spark.readStream.schema(
            "event_id long, ts timestamp, user_id long, event_type string, value double"
        ).parquet(src)
    )
    q = (
        sessionize_stateful(stream, gap="30 minutes")
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("sessout")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(processingTime="1 second")
        .start()
    )
    import time

    deadline = time.monotonic() + 60
    rows = []
    while time.monotonic() < deadline:
        rows = spark.sql("select * from sessout").collect()
        if rows:
            break
        time.sleep(2)
    q.stop()
    assert any(r["user_id"] == 1 and r["n_events"] == 5 for r in rows)
