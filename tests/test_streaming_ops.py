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


def test_watermark_drops_late_data(spark, tmp_path):
    """Late-data semantics: an event older than the watermark arriving in a
    later microbatch is DROPPED — the already-emitted window is not
    re-opened and not duplicated (append mode)."""
    import os
    import time as _time

    schema = "event_id long, ts timestamp, user_id long, event_type string, value double"
    src = str(tmp_path / "latesrc")
    os.makedirs(src)
    # batch 1: 3 on-time events in the T0 window + one at T0+1h that pushes
    # the watermark to ~50min (10 min delay), closing the T0 window
    b1 = spark.createDataFrame(
        [
            (1, T0, 1, "click", 1.0),
            (2, T0 + timedelta(minutes=1), 1, "click", 1.0),
            (3, T0 + timedelta(minutes=2), 1, "click", 1.0),
            (4, T0 + timedelta(hours=1), 1, "click", 1.0),
        ],
        schema,
    )
    # batch 2: a filler event — the watermark computed from batch 1 becomes
    # the LATE-ROW FILTER only one batch later (a window still in state
    # absorbs same-batch stragglers before eviction; that is Spark's
    # documented one-batch watermark lag)
    bmid = spark.createDataFrame(
        [(9, T0 + timedelta(hours=1, seconds=10), 1, "click", 1.0)], schema
    )
    # batch 3: one LATE event back in the (now closed) T0 window and one
    # current event
    b2 = spark.createDataFrame(
        [
            (5, T0 + timedelta(seconds=30), 1, "click", 100.0),  # late -> dropped
            (6, T0 + timedelta(hours=1, minutes=1), 1, "click", 1.0),
        ],
        schema,
    )
    b1.coalesce(1).write.parquet(src + "/f1")
    bmid.coalesce(1).write.parquet(src + "/f2")
    b2.coalesce(1).write.parquet(src + "/f3")
    now = _time.time()
    for i, d in enumerate(["f1", "f2", "f3"]):  # file source orders by mtime
        for f in os.listdir(os.path.join(src, d)):
            os.utime(os.path.join(src, d, f), (now + i, now + i))
    stream = spark.readStream.schema(schema).option("maxFilesPerTrigger", "1").parquet(
        src + "/f*"
    )
    q = (
        windowed_counts(stream, window="5 minutes", watermark="10 minutes")
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("lateout")
        .option("checkpointLocation", str(tmp_path / "lateckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = spark.sql("select * from lateout").collect()
    t0_rows = [r for r in rows if r["win_start"] == T0]
    # exactly one emission for the T0 window, counting ONLY on-time events
    assert len(t0_rows) == 1
    assert t0_rows[0]["n"] == 3 and t0_rows[0]["total"] == 3.0


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
