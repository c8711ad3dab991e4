"""File-centric pipeline: list a directory into File rows, read the listed
CSVs as one distributed table, dedup, export results to a database AND back
to files — the reference's read_storage -> parse_tabular -> to_database
flow (storage.py / datachain.py:2214-2667), Spark-first.

Run: python examples/storage_pipeline.py
"""

import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from datachain_spark import get_spark
from datachain_spark.sources import (
    file_diff,
    parse_tabular,
    read_database,
    read_storage,
    to_database,
    to_storage,
)
from datachain_spark.sources.database import DERBY_DRIVER

spark = get_spark(cpus=4, shuffle_partitions=8)
work = Path(tempfile.mkdtemp(prefix="storage_example_"))

# --- make a little data lake of CSV shards ---
src = work / "lake"
(src / "2025").mkdir(parents=True)
(src / "2025" / "jan.csv").write_text("id,score\n1,0.5\n2,0.9\n")
(src / "2025" / "feb.csv").write_text("id,score\n3,0.1\n2,0.9\n")

# --- list it: File struct rows, no bytes read for meta listings ---
listing = read_storage(spark, str(src), type="meta", glob="*.csv")
listing.select("file.path", "file.size", "file.etag").show(truncate=False)

# --- read the listed files as ONE distributed table ---
rows = parse_tabular(spark, listing, format="csv", header="true", inferSchema="true")
deduped = rows.dropDuplicates(["id"]).orderBy("id")
deduped.show()

# --- JDBC sink with set-wise upsert (embedded Derby) ---
url = f"jdbc:derby:{work}/db;create=true"
to_database(deduped.select("id", "score"), "SCORES", url, mode="overwrite", driver=DERBY_DRIVER)
to_database(
    spark.createDataFrame([(2, 0.95), (4, 0.4)], "id int, score double"),
    "SCORES",
    url,
    on_conflict=["id"],
    driver=DERBY_DRIVER,
)
read_database(spark, "SELECT * FROM SCORES", url, driver=DERBY_DRIVER).orderBy("id").show()

# --- export payloads back out as files, then diff the two listings ---
snap = read_storage(spark, str(src), type="binary").localCheckpoint()
(src / "2025" / "mar.csv").write_text("id,score\n5,0.7\n")
after = read_storage(spark, str(src), type="binary", update=True)
file_diff(after, snap).select("file.path", "diff_status").show()
manifest = to_storage(after, str(work / "export"), placement="fullpath").collect()
print("exported:", sorted(r["path"] for r in manifest))
