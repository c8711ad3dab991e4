"""Round-3 fix regression tests: gen() scalar yields, PEP 440 ~= semver,
salted_agg salt_on identity, connected_components convergence warning,
bucketed Chain.save as a CDC merge target, concurrent-safe upsert staging."""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F

from datachain_spark import chain as dc
from datachain_spark.chain import C, Chain
from datachain_spark.lake.table import LakeTable
from datachain_spark.operators.dedup import connected_components
from datachain_spark.operators.skew import salted_agg


# ---------- gen() scalar yields (ADVICE medium, chain.py gen run loop) ----------


def test_gen_scalar_int_yield(spark):
    ch = dc.read_values(spark, n=[2, 3])

    def expand(n) -> "__import__('typing').Iterator[int]":  # noqa: F821
        for i in range(n):
            yield i

    out = ch.gen(expand, output={"i": int}, params=["n"]).to_values("i")
    assert sorted(out) == [0, 0, 1, 1, 2]


def test_gen_scalar_str_yield(spark):
    # multi-char strings used to crash (tuple("hi") -> column-count
    # mismatch); 1-char strings silently stored a shredded row
    ch = dc.read_values(spark, word=["hi", "x"])

    def echo(word):
        yield word
        yield word + "!"

    out = ch.gen(echo, output={"s": str}, params=["word"]).to_values("s")
    assert sorted(out) == ["hi", "hi!", "x", "x!"]


# ---------- PEP 440 ~= compatible release (ADVICE low) ----------


def test_semver_compatible_release_pins_minor(spark, tmp_path):
    cat = str(tmp_path / "cat")
    base = dc.read_values(spark, id=[1, 2, 3])
    Chain(base.df, catalog_root=cat).save("d", version="1.2.3")
    Chain(base.filter(C("id") <= 2).df, catalog_root=cat).save("d", version="1.2.9")
    Chain(base.filter(C("id") <= 1).df, catalog_root=cat).save("d", version="1.9.0")
    # ~=1.2.3 means >=1.2.3,<1.3.0 — must NOT match 1.9.0
    assert dc.read_dataset(spark, "d", version="~=1.2.3", catalog_root=cat).count() == 2
    # ~=1.2 means >=1.2,<2.0 — 1.9.0 matches
    assert dc.read_dataset(spark, "d", version="~=1.2", catalog_root=cat).count() == 1


# ---------- salted_agg salt_on (ADVICE low, skew.py) ----------


def test_salted_agg_salt_on_identity_column(spark):
    # duplicate-heavy hot key: full-row hash sends all copies to ONE salt
    # bucket; salting on the per-row event id spreads them
    rows = [("hot", i, 1.0) for i in range(400)] + [("cold", 1000 + i, 2.0) for i in range(5)]
    df = spark.createDataFrame(rows, ["user_id", "event_id", "value"])
    out = salted_agg(
        df,
        "user_id",
        {"n": ("count", "*"), "total": ("sum", "value"), "mean": ("avg", "value")},
        salt=8,
        salt_on="event_id",
    )
    got = {r["user_id"]: r for r in out.collect()}
    assert got["hot"]["n"] == 400 and got["hot"]["total"] == 400.0 and got["hot"]["mean"] == 1.0
    assert got["cold"]["n"] == 5 and got["cold"]["total"] == 10.0

    # the partial stage really spreads the hot key's duplicate rows:
    # identical payload rows land in >1 salt bucket when salted by event_id
    dup = spark.createDataFrame([("hot", i) for i in range(64)], ["user_id", "event_id"])
    n_buckets = (
        dup.withColumn("s", F.pmod(F.xxhash64("event_id"), F.lit(8)))
        .select("s")
        .distinct()
        .count()
    )
    assert n_buckets > 1


# ---------- connected_components convergence warning (ADVICE low) ----------


def test_connected_components_warns_when_unconverged(spark):
    # a path graph 0-1-2-...-9 has diameter 9; min-label propagation needs
    # ~9 rounds, so max_iters=2 must warn instead of silently returning
    # split components
    pairs = spark.createDataFrame([(i, i + 1) for i in range(9)], ["id_a", "id_b"])
    with pytest.warns(RuntimeWarning, match="did not converge"):
        labels = connected_components(pairs, max_iters=2)
        labels.collect()
    # and with enough rounds it converges silently to a single component
    full = connected_components(pairs, max_iters=15)
    assert full.select("component").distinct().count() == 1


# ---------- bucketed save -> CDC merge target (VERDICT "what's wrong" #2) ----------


def test_bucketed_save_is_cdc_merge_target(spark, tmp_path):
    from datachain_spark.cdc.apply import apply_batch

    cat = str(tmp_path / "cat")
    ts = datetime.datetime(2026, 1, 1, tzinfo=datetime.timezone.utc)
    base = spark.createDataFrame(
        [(f"c{i}", 0, "user", f"text {i}", ts) for i in range(20)],
        "conv_id string, turn_idx int, role string, text string, ts timestamp",
    )
    saved = Chain(base, catalog_root=cat).save(
        "corpus", key_cols=["conv_id", "turn_idx"], num_buckets=4
    )
    assert saved.count() == 20
    table = LakeTable(f"{cat}/corpus")
    snap = table.snapshot()
    assert snap.num_buckets == 4 and snap.key_cols == ["conv_id", "turn_idx"]
    # bucket pruning is real: each bucket holds only its keys
    some_bucket = sorted(snap.buckets)[0]
    pruned = table.read(spark, buckets=[some_bucket])
    assert 0 < pruned.count() < 20

    # now apply a CDC batch directly onto the SAVED dataset: update c0,
    # delete c1, insert a brand-new key
    events = spark.createDataFrame(
        [
            ("U", 100, "c0", 0, "user", "updated!", ts),
            ("D", 101, "c1", 0, None, None, ts),
            ("I", 102, "c_new", 0, "assistant", "fresh", ts),
        ],
        "op string, lsn long, conv_id string, turn_idx int, role string, text string, ts timestamp",
    )
    apply_batch(spark, table, events, job_id="j", batch_id=0, normalize=False)
    final = {r["conv_id"]: r["text"] for r in table.read(spark).collect()}
    assert len(final) == 20  # 20 base - 1 delete + 1 insert
    assert final["c0"] == "updated!"
    assert "c1" not in final
    assert final["c_new"] == "fresh"
    # idempotent replay is a no-op on the saved-table target too
    assert apply_batch(spark, table, events, job_id="j", batch_id=0)["skipped"] == "ledger"


def test_save_rekey_refused(spark, tmp_path):
    cat = str(tmp_path / "cat")
    base = dc.read_values(spark, conv_id=["a"], v=[1])
    Chain(base.df, catalog_root=cat).save("d", key_cols=["conv_id"], num_buckets=2)
    with pytest.raises(ValueError, match="key_cols"):
        Chain(base.df, catalog_root=cat).save("d", key_cols=["v"])


# ---------- to_pytorch shim (VERDICT next-round #8) ----------


def test_to_pytorch_raises_without_torch(spark):
    ch = dc.read_values(spark, id=[1, 2, 3])
    try:
        import torch  # noqa: F401

        pytest.skip("torch present; ImportError path not reachable")
    except ImportError:
        pass
    with pytest.raises(ImportError, match="torch"):
        ch.to_pytorch()


def test_to_pytorch_iterates_with_stub_torch(spark, monkeypatch):
    """Exercise the IterableDataset logic with a minimal torch stand-in:
    single-worker full iteration, then 2-worker sharding via chunk()."""
    import sys
    import types

    torch_mod = types.ModuleType("torch")
    utils_mod = types.ModuleType("torch.utils")
    data_mod = types.ModuleType("torch.utils.data")

    class IterableDataset:  # noqa: N801 - torch name
        pass

    worker = {"info": None}
    data_mod.IterableDataset = IterableDataset
    data_mod.get_worker_info = lambda: worker["info"]
    torch_mod.utils = utils_mod
    utils_mod.data = data_mod
    for name, mod in [
        ("torch", torch_mod),
        ("torch.utils", utils_mod),
        ("torch.utils.data", data_mod),
    ]:
        monkeypatch.setitem(sys.modules, name, mod)

    ch = dc.read_values(spark, id=[1, 2, 3, 4], label=["a", "b", "c", "d"])
    ds = ch.to_pytorch(transform=lambda rec: (rec["id"], rec["label"].upper()))
    assert sorted(ds) == [(1, "A"), (2, "B"), (3, "C"), (4, "D")]

    # two DataLoader workers: shards are disjoint and cover everything
    class WInfo:
        def __init__(self, wid, n):
            self.id, self.num_workers = wid, n

    shards = []
    for wid in range(2):
        worker["info"] = WInfo(wid, 2)
        shards.append(sorted(r["id"] for r in ch.to_pytorch()))
    assert sorted(shards[0] + shards[1]) == [1, 2, 3, 4]
    assert set(shards[0]).isdisjoint(shards[1])
