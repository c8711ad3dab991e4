"""The reference's flagship README pattern, running unchanged on Spark.

A DataChain user writes `import datachain as dc`; here the same program
runs with `import datachain_spark as dc` — class-based Mapper UDFs,
DataModel outputs, setup()-provided clients, File objects in UDF params,
Session temp datasets, and explode() — end to end.

Run: python examples/drop_in_reference_api.py
(Reference analogs: /root/reference/README + examples/get_started/.)
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import datachain_spark as dc

spark = dc.get_spark(cpus=4, shuffle_partitions=8)
SF = "/root/testdata/sf0.001"


# ---- 1. typed models (reference DataModel; dataclass-backed here) ----
class DocInfo(dc.DataModel):
    n_tokens: int
    head: str


# ---- 2. read_storage -> File objects inside the UDF (reference's
#         primary idiom: `.map(lambda file: ...)`) ----
def probe(file: dc.File) -> DocInfo:
    text = file.read_bytes(64).decode("latin-1")
    return DocInfo(n_tokens=len(text.split()), head=text[:16])


files = dc.read_storage(spark, SF, type="meta", glob="*.parquet")
infos = files.map(probe, output={"info": DocInfo})
print("files probed:", infos.count(), "| model registered:", dc.ModelStore.get("DocInfo") is not None)


# ---- 3. setup(): worker-constructed client + class-based Mapper ----
class Scorer(dc.Mapper):
    def setup(self):
        self.bias = 0.5  # stand-in for loading a model handle per worker

    def process(self, n_chars: int) -> float:
        return n_chars * self.bias


docs = dc.read_parquet(spark, f"{SF}/documents.parquet")
scored = (
    docs.settings(parallel=4)
    .setup(scale=lambda: 2.0)  # evaluated on workers, never pickled
    .map(lambda scale, n_chars: n_chars * scale, output={"scaled": float})
    .map(Scorer(), output={"score": float})
)
print("scored rows:", scored.count())


# ---- 4. explode(): JSON column -> typed struct, parsed in JVM codegen ----
from pyspark.sql import functions as F

j = dc.Chain(
    docs.df.select("doc_id", F.to_json(F.struct("lang", "n_chars")).alias("meta")),
)
exploded = j.explode("meta")
print("exploded cols:", exploded.df.select("meta_expl.*").columns)


# ---- 5. Session temp datasets: save() without a name, cleaned on exit ----
import tempfile

with dc.Session("demo", catalog_root=tempfile.mkdtemp(), spark=spark) as sess:
    tmp = scored.save()  # session-owned temp dataset
    print("temp dataset:", dc.datasets(sess.catalog_root))
print("after session exit:", dc.datasets(sess.catalog_root))

spark.stop()
print("OK")
