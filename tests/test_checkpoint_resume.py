"""Row-level UDF checkpoint resume (reference tests/func/checkpoints/
test_checkpoint_recovery.py:28-641): a crashed map()/gen() rerun processes
ONLY rows without committed output."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from datachain_spark import chain as dc


def _processed(log: str) -> list[int]:
    if not os.path.exists(log):
        return []
    with open(log) as f:
        return [int(x) for x in f.read().split()]


def test_map_crash_resume_processes_only_remainder(spark, tmp_path):
    ids = list(range(12))
    ch = dc.read_values(spark, id=ids, v=[float(i) for i in ids])
    store = str(tmp_path / "ckpt")
    log1, log2 = str(tmp_path / "run1.log"), str(tmp_path / "run2.log")

    # chunking is pmod(xxhash64(all cols), n_chunks) with n_chunks=4 at
    # rows=3 — compute each id's chunk so the poison sits in chunk >= 1
    # (deterministic: same hash the engine uses)
    chunk = {
        r["id"]: r["c"]
        for r in ch.df.select(
            "id", F.pmod(F.xxhash64("id", "v"), F.lit(4)).alias("c")
        ).collect()
    }
    later = [i for i in ids if chunk[i] >= 2]
    assert later, "need a poison row outside chunks 0-1"
    poison = later[0]

    def crashing(id, v, _log=log1, _poison=poison):
        if id == _poison:
            raise RuntimeError("simulated mid-map crash")
        with open(_log, "a") as f:
            f.write(f"{id}\n")
        return float(v) * 10

    with pytest.raises(Exception, match="simulated|crash|RuntimeError"):
        ch.map(
            crashing, output={"out": float}, params=["id", "v"],
            checkpoint=store, checkpoint_rows=3,
        ).count()

    committed = {i for i in ids if chunk[i] < chunk[poison]}
    assert committed, "crash must land after at least one committed chunk"

    def healthy(id, v, _log=log2):
        with open(_log, "a") as f:
            f.write(f"{id}\n")
        return float(v) * 10

    out = ch.map(
        healthy, output={"out": float}, params=["id", "v"],
        checkpoint=store, checkpoint_rows=3,
    )
    got = {r["id"]: r["out"] for r in out.df.collect()}
    assert got == {i: i * 10.0 for i in ids}  # full correct result
    # the resume processed ONLY rows without committed output
    run2 = set(_processed(log2))
    assert run2 == set(ids) - committed
    assert run2.isdisjoint(committed)


def test_gen_crash_resume_with_zero_output_keys(spark, tmp_path):
    ids = list(range(10))
    ch = dc.read_values(spark, id=ids)
    store = str(tmp_path / "ckpt")
    log1, log2 = str(tmp_path / "g1.log"), str(tmp_path / "g2.log")
    chunk = {
        r["id"]: r["c"]
        for r in ch.df.select("id", F.pmod(F.xxhash64("id"), F.lit(4)).alias("c")).collect()
    }
    later = [i for i in ids if chunk[i] >= 2]
    poison = later[0]

    def crashing(id, _log=log1, _poison=poison):
        if id == _poison:
            raise RuntimeError("simulated crash")
        with open(_log, "a") as f:
            f.write(f"{id}\n")
        # ids divisible by 3 yield NOTHING — resume must still mark them done
        for k in range(id % 3):
            yield (id * 100 + k,)

    with pytest.raises(Exception, match="simulated|crash|RuntimeError"):
        ch.gen(crashing, output={"g": int}, params=["id"],
               checkpoint=store, checkpoint_rows=3).count()

    committed = {i for i in ids if chunk[i] < chunk[poison]}

    def healthy(id, _log=log2):
        with open(_log, "a") as f:
            f.write(f"{id}\n")
        for k in range(id % 3):
            yield (id * 100 + k,)

    out = ch.gen(healthy, output={"g": int}, params=["id"],
                 checkpoint=store, checkpoint_rows=3)
    expect = sorted(i * 100 + k for i in ids for k in range(i % 3))
    assert sorted(out.to_values("g")) == expect
    run2 = set(_processed(log2))
    assert run2 == set(ids) - committed
    # zero-output keys in committed chunks were NOT re-generated
    zero_committed = {i for i in committed if i % 3 == 0}
    assert zero_committed.isdisjoint(run2)


def test_checkpoint_noop_rerun_and_schema_namespace(spark, tmp_path):
    ch = dc.read_values(spark, id=[1, 2, 3])
    store = str(tmp_path / "ckpt")
    log = str(tmp_path / "n.log")

    def f(id, _log=log):
        with open(_log, "a") as fh:
            fh.write(f"{id}\n")
        return id + 1

    r1 = ch.map(f, output={"out": int}, params=["id"], checkpoint=store)
    assert sorted(r1.to_values("out")) == [2, 3, 4]
    n1 = len(_processed(log))
    # rerun: everything committed -> ZERO rows reprocessed
    r2 = ch.map(f, output={"out": int}, params=["id"], checkpoint=store)
    assert sorted(r2.to_values("out")) == [2, 3, 4]
    assert len(_processed(log)) == n1
    # a different output schema gets a fresh namespace, not a bogus resume
    r3 = ch.map(f, output={"other": int}, params=["id"], checkpoint=store)
    assert sorted(r3.to_values("other")) == [2, 3, 4]
    assert len(_processed(log)) == 2 * n1
