"""Schema-from-sample metadata readers (reference lib/meta_formats.py).

The reference samples one file, runs datamodel-code-generator to produce a
Pydantic model, then parses every file row-by-row in a Python UDF
(meta_formats.py:71-224). Spark-first split of the same contract:

- `infer_meta_schema(sample, format, jmespath)` — deterministic recursive
  inference from ONE sample (first JSON object / first JSONL line / CSV
  header+first row) to a Spark StructType. int->long, float->double,
  bool, str; dict->struct; list->array of the first element's type;
  null -> nullable string (datamodel-codegen's Optional[str] analog).
- `gen_datamodel_code(sample, ...)` — emits Python source for a dataclass
  tree (this repo's DataModel analog) + `spec = <Model>`, mirroring the
  reference's generated-module contract (it exec's the code and reads
  `spec`). Nested objects become nested dataclasses.
- `read_meta(spark, uri, ...)` — the scale path: the inferred (or given)
  schema is handed to Spark's NATIVE json/csv readers, so a 100 TB
  metadata lake is parsed JVM-side with pushdown, not in Python loops.
  Only a non-trivial `jmespath` reduction drops to mapInPandas (the
  reference pays Python row-at-a-time for every format, always).

`jmespath` support is the documented subset `a.b[0].c` (field access +
list indexing) — the full jmespath language needs the external library
the reference imports; anything else raises.
"""

from __future__ import annotations

import csv as _csv
import io
import json
import re
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

_IDENT = re.compile(r"[A-Za-z_][A-Za-z0-9_]*")


def jsearch(expr: str | None, obj: Any) -> Any:
    """Evaluate the supported jmespath subset (`a.b[0].c`) against obj."""
    if not expr:
        return obj
    pos = 0
    while pos < len(expr):
        if expr[pos] == ".":
            pos += 1
            continue
        if expr[pos] == "[":
            end = expr.index("]", pos)
            body = expr[pos + 1 : end]
            if not re.fullmatch(r"-?\d+", body):
                raise ValueError(
                    f"unsupported jmespath expression {expr!r} (supported "
                    "subset: dotted fields and [index])"
                )
            idx = int(body)
            obj = obj[idx] if isinstance(obj, list) and -len(obj) <= idx < len(obj) else None
            pos = end + 1
            continue
        m = _IDENT.match(expr, pos)
        if not m:
            raise ValueError(
                f"unsupported jmespath expression {expr!r} (supported "
                "subset: dotted fields and [index])"
            )
        obj = obj.get(m.group()) if isinstance(obj, dict) else None
        pos = m.end()
    return obj


def _infer_type(value: Any) -> T.DataType:
    if isinstance(value, bool):
        return T.BooleanType()
    if isinstance(value, int):
        return T.LongType()
    if isinstance(value, float):
        return T.DoubleType()
    if isinstance(value, dict):
        return T.StructType(
            [T.StructField(k, _infer_type(v), True) for k, v in value.items()]
        )
    if isinstance(value, list):
        elem = next((v for v in value if v is not None), None)
        return T.ArrayType(_infer_type(elem) if elem is not None else T.StringType())
    return T.StringType()  # str and null


def _csv_cell(s: str) -> Any:
    try:
        return int(s)
    except ValueError:
        pass
    try:
        return float(s)
    except ValueError:
        return s


def _sample_object(sample: str, format: str, jmespath: str | None) -> dict:
    """First object out of a raw sample string, reference sampling rules
    (meta_formats.py:85-101): JSON arrays sample entry 0, JSONL samples
    line 1, CSV samples header + first row."""
    if format == "csv":
        rows = list(_csv.DictReader(io.StringIO(sample)))
        if not rows:
            raise ValueError("CSV sample needs a header and one data row")
        return {k: _csv_cell(v) for k, v in rows[0].items()}
    if format == "jsonl":
        sample = sample.strip().splitlines()[0]
    obj = jsearch(jmespath, json.loads(sample))
    if isinstance(obj, list):
        obj = obj[0]
    if not isinstance(obj, dict):
        raise ValueError("sample did not reduce to a JSON object")
    return obj


def infer_meta_schema(
    sample: str, format: str = "json", jmespath: str | None = None
) -> T.StructType:
    """Spark schema inferred from one sample document."""
    return _infer_type(_sample_object(sample, format, jmespath))  # type: ignore[return-value]


_PY_NAMES = {
    T.LongType(): "int",
    T.DoubleType(): "float",
    T.BooleanType(): "bool",
    T.StringType(): "str",
}


def gen_datamodel_code(
    sample: str,
    format: str = "json",
    jmespath: str | None = None,
    model_name: str | None = None,
) -> str:
    """Python source for a dataclass tree matching the sample + a `spec`
    binding (reference gen_datamodel_code, meta_formats.py:71-133; exec it
    and read `spec`, exactly like the reference does with its generated
    Pydantic module)."""
    schema = infer_meta_schema(sample, format, jmespath)
    model_name = model_name or f"Model{format}"
    classes: list[str] = []

    def emit(struct: T.StructType, name: str) -> str:
        fields = []
        for f in struct.fields:
            fields.append(f"    {f.name}: {py_of(f.dataType, f'{name}_{f.name}')} = None")
        classes.append(
            "@dataclass\nclass " + name + ":\n" + ("\n".join(fields) or "    pass")
        )
        return name

    def py_of(dt: T.DataType, nested_name: str) -> str:
        if isinstance(dt, T.StructType):
            return emit(dt, nested_name)
        if isinstance(dt, T.ArrayType):
            return f"list[{py_of(dt.elementType, nested_name)}]"
        return _PY_NAMES.get(dt, "str")

    emit(schema, model_name)
    body = "\n\n\n".join(classes)
    return (
        "from dataclasses import dataclass\n\n\n"
        + body
        + f"\n\n\nspec = {model_name}\n"
    )


def load_spec(code: str):
    """exec generated model code, return its `spec` class (the reference's
    dynamic-module trick, meta_formats.py:152-156)."""
    ns: dict[str, Any] = {}
    # dont_inherit: exec would otherwise inherit THIS module's
    # `from __future__ import annotations` flag and leave the generated
    # dataclasses with string field types that model_to_struct can't resolve
    exec(compile(code, "<datamodel>", "exec", dont_inherit=True), ns)  # noqa: S102
    return ns["spec"]


def read_meta(
    spark: SparkSession,
    uri: str,
    format: str = "json",
    jmespath: str | None = None,
    spec: T.StructType | None = None,
    schema_from: str | None = None,
    nrows: int | None = None,
) -> DataFrame:
    """Read JSON / JSONL / CSV metadata into typed rows (reference
    read_meta, meta_formats.py:136-224).

    Schema comes from `spec` (a StructType) or is inferred from one sample
    file (`schema_from` path or the first matched file). Without a
    jmespath reduction the actual parse is Spark's native reader — JVM
    parsing, column pruning, predicate pushdown; with one, each file is
    reduced in an Arrow-batched stage and parsed via from_json."""
    import glob as _glob
    import os

    if format not in ("json", "jsonl", "csv"):
        raise ValueError(f"unsupported meta format: {format}")

    pattern = os.path.join(uri, "*") if os.path.isdir(uri) else uri
    if spec is None:
        src = schema_from or sorted(_glob.glob(pattern))[0]
        with open(src, encoding="utf-8") as fd:
            if format == "csv":
                sample = fd.readline() + fd.readline()
            elif format == "jsonl":
                sample = fd.readline()
            else:
                sample = fd.read()
        spec = infer_meta_schema(sample, format, jmespath)

    if format == "csv":
        df = spark.read.csv(pattern, header=True, schema=spec)
    elif jmespath is None:
        # top-level JSON arrays explode to one row per element natively
        df = spark.read.json(pattern, schema=spec, multiLine=(format == "json"))
    else:
        import pandas as pd

        raw = spark.read.text(pattern, wholetext=(format == "json"))

        def reduce_rows(batches):
            for pdf in batches:
                docs = []
                for line in pdf["value"]:
                    if not line.strip():
                        continue
                    obj = jsearch(jmespath, json.loads(line))
                    if isinstance(obj, list):
                        docs.extend(json.dumps(o) for o in obj)
                    elif obj is not None:
                        docs.append(json.dumps(obj))
                yield pd.DataFrame({"doc": docs})

        df = (
            raw.mapInPandas(reduce_rows, "doc string")
            .select(F.from_json("doc", spec).alias("r"))
            .select("r.*")
        )
    return df.limit(nrows) if nrows is not None else df


__all__ = [
    "gen_datamodel_code",
    "infer_meta_schema",
    "jsearch",
    "load_spec",
    "read_meta",
]


def merge_struct(a: T.StructType, b: T.StructType) -> T.StructType:
    """Union of two inferred struct schemas (Chain.explode's multi-sample
    inference — the reference unions pyarrow-inferred schemas across its
    sample rows, datachain.py:528-533): fields merge by name preserving
    first-seen order, long+double widens to double, nested structs merge
    recursively, irreconcilable types fall back to string."""

    def merge_dt(x: T.DataType, y: T.DataType) -> T.DataType:
        if x == y:
            return x
        if isinstance(x, T.StructType) and isinstance(y, T.StructType):
            return merge_struct(x, y)
        if isinstance(x, T.ArrayType) and isinstance(y, T.ArrayType):
            return T.ArrayType(merge_dt(x.elementType, y.elementType), True)
        if {type(x), type(y)} == {T.LongType, T.DoubleType}:
            return T.DoubleType()
        return T.StringType()

    merged: dict[str, T.DataType] = {f.name: f.dataType for f in a.fields}
    order = [f.name for f in a.fields]
    for f in b.fields:
        if f.name in merged:
            merged[f.name] = merge_dt(merged[f.name], f.dataType)
        else:
            merged[f.name] = f.dataType
            order.append(f.name)
    return T.StructType([T.StructField(n, merged[n], True) for n in order])
