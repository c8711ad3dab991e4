"""Top-level API parity with the reference's `datachain/__init__.py` plus
the model layer (DataModel/ModelStore/Sys), class-based UDFs
(Mapper/Generator/Aggregator/BatchMapper), and the Session temp-dataset
lifecycle (reference query/session.py)."""

from __future__ import annotations

import dataclasses
import os
from typing import Optional

import pytest

import datachain_spark as dc
from datachain_spark import (
    Aggregator,
    BatchMapper,
    Chain,
    DataModel,
    Generator,
    Mapper,
    ModelStore,
    Session,
    is_chain_type,
)

# the reference package's public __all__ (src/datachain/__init__.py:46-100)
REFERENCE_ALL = [
    "AbstractUDF", "Aggregator", "ArrowRow", "Audio", "AudioFile",
    "AudioFragment", "C", "Column", "DataChain", "DataChainError",
    "DataModel", "DataType", "File", "FileError", "Generator", "Image",
    "ImageFile", "Mapper", "ModelStore", "Session", "Sys", "TarVFile",
    "TextFile", "Video", "VideoFile", "VideoFragment", "VideoFrame",
    "create_project", "datasets", "delete_dataset", "delete_namespace",
    "is_chain_type", "is_local", "is_studio", "listings", "metrics",
    "move_dataset", "param", "read_csv", "read_database", "read_dataset",
    "read_hf", "read_json", "read_pandas", "read_parquet", "read_records",
    "read_storage", "read_values",
]


def test_reference_all_importable():
    missing = [n for n in REFERENCE_ALL if not hasattr(dc, n)]
    assert missing == []
    assert dc.DataChain is dc.Chain


# ---------- class-based UDFs ----------


# UDF classes are defined INSIDE tests: cloudpickle then serializes them
# by value (a module-level class in tests/ pickles by reference, which
# executors cannot import)


def test_mapper_class_through_map(spark):
    class Doubler(Mapper):
        def setup(self):
            self.factor = 2

        def process(self, x: int) -> int:
            return x * self.factor

    ch = dc.read_values(spark, x=[1, 2, 3])
    out = ch.map(Doubler(), output={"y": int}).df
    assert sorted(r["y"] for r in out.collect()) == [2, 4, 6]


def test_generator_class_through_gen(spark):
    class Expander(Generator):
        def process(self, x: int):
            for i in range(x):
                yield {"part": i}

    ch = dc.read_values(spark, x=[2, 3])
    out = ch.gen(Expander(), output={"part": int})
    assert sorted(r["part"] for r in out.df.collect()) == [0, 0, 1, 1, 2]


def test_batchmapper_class_through_map_batches(spark):
    class BatchScale(BatchMapper):
        def setup(self):
            self.k = 10

        def process(self, pdf):
            pdf = pdf.copy()
            pdf["x"] = pdf["x"] * self.k
            return pdf

    ch = dc.read_values(spark, x=[1, 2, 3])
    out = ch.map_batches(BatchScale())
    assert sorted(r["x"] for r in out.df.collect()) == [10, 20, 30]


def test_aggregator_class_through_agg(spark):
    class GroupSum(Aggregator):
        def process(self, pdf):
            return pdf.groupby("g", as_index=False).agg(total=("x", "sum"))

    ch = dc.read_values(spark, g=["a", "a", "b"], x=[1, 2, 5])
    out = ch.agg(GroupSum(), partition_by="g", output={"g": str, "total": int})
    got = {r["g"]: r["total"] for r in out.df.collect()}
    assert got == {"a": 3, "b": 5}


def test_passing_class_not_instance_raises(spark):
    class Doubler(Mapper):
        def process(self, x: int) -> int:
            return x * 2

    ch = dc.read_values(spark, x=[1])
    with pytest.raises(TypeError, match="INSTANCE"):
        ch.map(Doubler, output={"y": int})


# ---------- DataModel / ModelStore ----------


class Point(DataModel):
    x: float
    y: float = 0.0


class Box(DataModel):
    _version = 2
    a: Point
    label: Optional[str] = None


def test_datamodel_subclass_is_dataclass_and_registered():
    assert dataclasses.is_dataclass(Point)
    p = Point(1.5)
    assert (p.x, p.y) == (1.5, 0.0)
    # auto-registered with version (reference __pydantic_init_subclass__)
    assert ModelStore.get("Point") is Point
    assert ModelStore.get_name(Point) == "Point@v1"
    assert ModelStore.get("Box@v2") is Box
    assert ModelStore.get("Box", 2) is Box
    assert ModelStore.parse_name_version("Box@v2") == ("Box", 2)


@dataclasses.dataclass
class Inner:
    v: int


@dataclasses.dataclass
class Outer:
    inner: Inner


def test_modelstore_registers_nested_models():
    DataModel.register(Outer)
    assert ModelStore.get("Inner") is Inner
    ModelStore.remove(Outer)
    ModelStore.remove(Inner)
    assert ModelStore.get("Outer") is None


def test_datamodel_in_udf_output(spark):
    # local model class -> cloudpickle ships it by value to executors
    class UdfPoint(DataModel):
        x: float
        y: float = 0.0

    ch = dc.read_values(spark, x=[1.0, 2.0])

    def mk(x):
        return UdfPoint(x=x, y=x * 2)

    out = ch.map(mk, output={"p": UdfPoint})
    rows = sorted((r["p"]["x"], r["p"]["y"]) for r in out.df.collect())
    assert rows == [(1.0, 2.0), (2.0, 4.0)]


def test_is_chain_type():
    from datetime import datetime

    assert is_chain_type(int) and is_chain_type(str) and is_chain_type(datetime)
    assert is_chain_type(Point)
    assert is_chain_type(Optional[int])
    assert is_chain_type(list[float])
    assert is_chain_type(dict[str, int])
    assert not is_chain_type(complex)
    assert not is_chain_type(dict[int, str])


# ---------- Sys ----------


def test_with_sys_deterministic_rand(spark):
    ch = dc.read_values(spark, x=[1, 2, 3]).with_sys()
    rows = ch.df.select("sys.id", "sys.rand").collect()
    assert len({r["id"] for r in rows}) == 3  # unique ids
    assert all(r["rand"] >= 0 for r in rows)
    again = dc.read_values(spark, x=[1, 2, 3]).with_sys()
    assert sorted(r["rand"] for r in rows) == sorted(
        r["rand"] for r in again.df.select("sys.rand").collect()
    )


# ---------- Session temp datasets ----------


def test_session_temp_dataset_lifecycle(spark, tmp_path):
    root = str(tmp_path / "catalog")
    with Session("unittest", catalog_root=root, spark=spark) as s:
        ch = Chain(spark.createDataFrame([(1,)], "x int"), catalog_root=root)
        saved = ch.save()  # no name -> session temp dataset
        names = dc.datasets(root)
        assert len(names) == 1 and names[0].startswith("session_unittest_")
        assert s._temp_datasets  # tracked for cleanup
        assert saved.df.count() == 1
    assert dc.datasets(root) == []  # cleaned up on exit


def test_session_temp_name_format():
    s = Session("abc")
    n = s.generate_temp_dataset_name()
    parts = n.split("_")
    assert parts[0] == "session" and parts[1] == "abc"
    assert len(parts) == 4 and parts[2] == s.uuid


def test_session_get_prefers_context(tmp_path):
    with Session("outer", catalog_root=str(tmp_path)) as a:
        assert Session.get() is a
        with Session("inner", catalog_root=str(tmp_path)) as b:
            assert Session.get() is b
        assert Session.get() is a
    assert Session.get() is Session.GLOBAL_SESSION


def test_is_local_flag(monkeypatch):
    monkeypatch.delenv("DATACHAIN_SPARK_IS_STUDIO", raising=False)
    monkeypatch.delenv("DATACHAIN_IS_STUDIO", raising=False)
    assert dc.is_local() and not dc.is_studio()
    monkeypatch.setenv("DATACHAIN_IS_STUDIO", "true")
    assert dc.is_studio() and not dc.is_local()


# ---------- setup() worker-evaluated objects ----------


def test_setup_injects_objects_into_map(spark):
    ch = dc.read_values(spark, text=["a", "bb"])
    out = ch.setup(prefix=lambda: "P:").map(
        lambda prefix, text: prefix + text, output={"tagged": str}
    )
    assert sorted(r["tagged"] for r in out.df.collect()) == ["P:a", "P:bb"]


def test_setup_injects_into_gen_and_respects_order(spark):
    ch = dc.read_values(spark, n=[2])

    def expand(k, n, suffix):
        for i in range(n):
            yield {"v": f"{k}{i}{suffix}"}

    out = ch.setup(k=lambda: "x", suffix=lambda: "!").gen(expand, output={"v": str})
    assert sorted(r["v"] for r in out.df.collect()) == ["x0!", "x1!"]


def test_setup_value_not_evaluated_on_driver(spark):
    # the callable must run on workers only: a driver-side evaluation
    # would raise here before any Spark job
    def boom():
        raise RuntimeError("must not run on driver at chain-build time")

    ch = dc.read_values(spark, x=[1]).setup(client=boom)
    assert ch._setup  # registered, not evaluated

    with pytest.raises(Exception, match="must not run on driver"):
        ch.map(lambda client, x: x, output={"y": int}).df.collect()


def test_setup_duplicate_and_noncallable_rejected(spark):
    ch = dc.read_values(spark, x=[1]).setup(a=lambda: 1)
    with pytest.raises(ValueError, match="already setup"):
        ch.setup(a=lambda: 2)
    with pytest.raises(ValueError, match="callable"):
        ch.setup(b=3)


# ---------- explode ----------


def test_explode_json_column(spark):
    ch = dc.read_values(
        spark,
        meta=[
            '{"a": 1, "b": "x"}',
            '{"a": 2, "b": "y", "c": [1, 2]}',
        ],
    )
    out = ch.explode("meta", schema_sample_size=2)
    rows = sorted(
        (r["meta_expl"]["a"], r["meta_expl"]["b"], r["meta_expl"]["c"])
        for r in out.df.collect()
    )
    assert rows == [(1, "x", None), (2, "y", [1, 2])]
    # generated model registered (reference dict_to_data_model)
    assert ModelStore.get("MetaExplodedModel") is not None
    # the parse is JVM from_json — no Python eval node in the plan
    plan = out.df._jdf.queryExecution().executedPlan().toString()
    assert "Eval" not in plan and "PythonUDF" not in plan


def test_explode_rejects_non_object(spark):
    ch = dc.read_values(spark, meta=["[1,2,3]"])
    with pytest.raises(TypeError, match="JSON"):
        ch.explode("meta")


# ---------- thin delegates ----------


def test_apply_clone_column_c(spark):
    ch = dc.read_values(spark, x=[1, 2])
    doubled = ch.apply(lambda c: c.mutate(y=c.column("x") * 2))
    assert sorted(r["y"] for r in doubled.df.collect()) == [2, 4]
    assert ch.clone().df.collect() == ch.df.collect()
    with pytest.raises(ValueError, match="not found"):
        ch.column("nope")


def test_empty_hash_results_columnar(spark, sf_dir):
    ch = dc.read_values(spark, x=[1, 2])
    assert not ch.empty
    assert ch.filter(ch.column("x") > 99).empty
    # plan-identity hash: two chains built the same way over the same
    # SOURCE hash equal (local in-memory relations get fresh expr ids,
    # so the guarantee is for real reads — the checkpoint-identity case)
    p = os.path.join(sf_dir, "region.parquet")
    a = dc.read_parquet(spark, p).filter("r_regionkey > 0")
    b = dc.read_parquet(spark, p).filter("r_regionkey > 0")
    assert a.hash() == b.hash() != dc.read_parquet(spark, p).hash()
    assert len(ch.hash()) == 8
    assert sorted(ch.results()) == [(1,), (2,)]
    names, cols = ch.to_columnar_data_with_names()
    assert names == ["x"] and sorted(cols[0]) == [1, 2]


def test_batch_map_alias(spark):
    ch = dc.read_values(spark, x=[1, 2])
    out = ch.batch_map(lambda pdf: pdf.assign(x=pdf.x + 1))
    assert sorted(r["x"] for r in out.df.collect()) == [2, 3]


def test_delta_properties_and_reset_settings(spark):
    ch = dc.read_values(spark, x=[1])
    assert ch.delta is False and ch.delta_unsafe is False
    s = ch.settings(parallel=2)
    assert s._settings.parallel == 2
    assert s.reset_settings()._settings.parallel is None
    assert ch.job is None


def test_dataset_provenance(spark, tmp_path):
    root = str(tmp_path / "cat")
    ch = Chain(spark.createDataFrame([(1,)], "x int"), catalog_root=root)
    saved = ch.save("prov_ds")
    assert saved.name == "prov_ds"
    assert saved.version is not None
    assert saved.dataset["name"] == "prov_ds"
    assert saved.namespace_name == "local" and saved.project_name == "local"
    again = dc.read_dataset(spark, "prov_ds", catalog_root=root)
    assert again.name == "prov_ds" and again.version == saved.version
    # transformations drop provenance
    assert again.filter(again.column("x") > 0).name is None


def test_from_classmethod_aliases(spark):
    assert sorted(
        r["x"] for r in Chain.from_values(spark, x=[7, 8]).df.collect()
    ) == [7, 8]


def test_datasets_classmethod(spark, tmp_path):
    root = str(tmp_path / "cat2")
    Chain(spark.createDataFrame([(1,)], "x int"), catalog_root=root).save("dsa")
    ch = Chain.datasets(spark, root)
    assert [r["name"] for r in ch.df.collect()] == ["dsa"]


def test_session_save_uses_session_catalog_for_prebuilt_chain(spark, tmp_path):
    """A chain built BEFORE the session context still saves its unnamed
    temp dataset under the session's catalog (name and root must come
    from the same session, or cleanup misses it)."""
    ch = dc.read_values(spark, x=[1])  # built outside any session
    root = str(tmp_path / "sess_cat")
    with Session("ctx", catalog_root=root, spark=spark):
        ch.save()
        assert len(dc.datasets(root)) == 1
    assert dc.datasets(root) == []


def test_chain_inherits_session_catalog_root(spark, tmp_path):
    root = str(tmp_path / "inherit_cat")
    with Session("inh", catalog_root=root, spark=spark):
        ch = dc.read_values(spark, x=[1])
        assert ch.catalog_root == root
    ch2 = dc.read_values(spark, x=[1])
    assert ch2.catalog_root != root
