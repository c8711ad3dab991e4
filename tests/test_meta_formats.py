"""Schema-from-sample metadata reader tests (reference
lib/meta_formats.py behaviors: sampling rules, generated model contract,
jmespath reduction, json/jsonl/csv parsing)."""

import dataclasses
import json

import pytest

from datachain_spark.sources.meta import (
    gen_datamodel_code,
    infer_meta_schema,
    jsearch,
    load_spec,
    read_meta,
)

SAMPLE = {
    "id": 7,
    "name": "row",
    "score": 1.5,
    "ok": True,
    "tags": ["a", "b"],
    "nested": {"depth": 2, "label": "x"},
    "maybe": None,
}


def test_jsearch_subset():
    obj = {"a": {"b": [{"c": 5}, {"c": 9}]}}
    assert jsearch("a.b[1].c", obj) == 9
    assert jsearch("a.b[0]", obj) == {"c": 5}
    assert jsearch(None, obj) is obj
    assert jsearch("a.missing", obj) is None
    assert jsearch("a.b[7].c", obj) is None
    with pytest.raises(ValueError, match="unsupported jmespath"):
        jsearch("a[?x>`1`]", obj)


def test_infer_meta_schema_types():
    schema = infer_meta_schema(json.dumps(SAMPLE))
    ddl = {f.name: f.dataType.simpleString() for f in schema.fields}
    assert ddl == {
        "id": "bigint",
        "name": "string",
        "score": "double",
        "ok": "boolean",
        "tags": "array<string>",
        "nested": "struct<depth:bigint,label:string>",
        "maybe": "string",
    }
    # JSON array samples its first entry; jsonl samples the first line
    assert infer_meta_schema(json.dumps([SAMPLE, {}]))["id"].dataType.simpleString() == "bigint"
    two_lines = json.dumps({"x": 1}) + "\n" + json.dumps({"x": "s"})
    assert infer_meta_schema(two_lines, "jsonl")["x"].dataType.simpleString() == "bigint"
    # CSV: header + first row, cells type-sniffed
    csv_schema = infer_meta_schema("a,b,c\n1,2.5,zz\n", "csv")
    assert [f.dataType.simpleString() for f in csv_schema.fields] == [
        "bigint", "double", "string",
    ]


def test_gen_datamodel_code_spec_contract():
    code = gen_datamodel_code(json.dumps(SAMPLE), model_name="Meta")
    spec = load_spec(code)
    assert spec.__name__ == "Meta" and dataclasses.is_dataclass(spec)
    names = {f.name for f in dataclasses.fields(spec)}
    assert names == set(SAMPLE)
    nested = next(f for f in dataclasses.fields(spec) if f.name == "nested")
    assert dataclasses.is_dataclass(nested.type)
    # generated models plug into the UDF signature machinery
    from datachain_spark.udf import model_to_struct

    struct = model_to_struct(spec)
    assert struct["id"].dataType.simpleString() == "bigint"
    assert struct["nested"].dataType.simpleString() == "struct<depth:bigint,label:string>"


@pytest.fixture()
def meta_dir(tmp_path):
    rows = [
        {**SAMPLE, "id": i, "score": i / 2, "nested": {"depth": i, "label": f"l{i}"}}
        for i in range(6)
    ]
    (tmp_path / "a.jsonl").write_text("\n".join(json.dumps(r) for r in rows[:3]))
    (tmp_path / "b.jsonl").write_text("\n".join(json.dumps(r) for r in rows[3:]))
    return tmp_path, rows


def test_read_meta_jsonl_native(spark, meta_dir):
    d, rows = meta_dir
    df = read_meta(spark, str(d), format="jsonl")
    got = {r["id"]: r for r in df.collect()}
    assert len(got) == 6
    assert got[4]["nested"]["label"] == "l4" and got[4]["score"] == 2.0
    assert read_meta(spark, str(d), format="jsonl", nrows=2).count() == 2


def test_read_meta_json_array_and_doc(spark, tmp_path):
    arr = [{"x": i, "y": f"v{i}"} for i in range(4)]
    (tmp_path / "arr.json").write_text(json.dumps(arr))
    df = read_meta(spark, str(tmp_path / "arr.json"))
    assert sorted(r["x"] for r in df.collect()) == [0, 1, 2, 3]

    (tmp_path / "doc.json").write_text(json.dumps({"x": 9, "y": "one"}))
    one = read_meta(spark, str(tmp_path / "doc.json")).collect()
    assert len(one) == 1 and one[0]["x"] == 9


def test_read_meta_jmespath_reduction(spark, tmp_path):
    docs = [{"meta": {"items": [{"k": i}, {"k": i * 10}]}} for i in range(1, 4)]
    (tmp_path / "w.jsonl").write_text("\n".join(json.dumps(d) for d in docs))
    df = read_meta(spark, str(tmp_path / "w.jsonl"), format="jsonl", jmespath="meta.items")
    assert sorted(r["k"] for r in df.collect()) == [1, 2, 3, 10, 20, 30]
    picked = read_meta(
        spark, str(tmp_path / "w.jsonl"), format="jsonl", jmespath="meta.items[1]"
    )
    assert sorted(r["k"] for r in picked.collect()) == [10, 20, 30]


def test_read_meta_csv(spark, tmp_path):
    (tmp_path / "t.csv").write_text("id,name,score\n1,a,0.5\n2,b,1.5\n")
    df = read_meta(spark, str(tmp_path / "t.csv"), format="csv")
    rows = {r["id"]: r for r in df.collect()}
    assert rows[2]["name"] == "b" and rows[2]["score"] == 1.5
    # explicit spec skips inference
    from pyspark.sql import types as T

    spec = T.StructType(
        [
            T.StructField("id", T.StringType()),
            T.StructField("name", T.StringType()),
            T.StructField("score", T.StringType()),
        ]
    )
    allstr = read_meta(spark, str(tmp_path / "t.csv"), format="csv", spec=spec)
    assert allstr.schema["id"].dataType.simpleString() == "string"
