"""End-to-end CDC ingest: generate a binlog-style feed, tail it with
Structured Streaming foreachBatch into a versioned merge-on-read table,
then inspect state, lineage, and time travel.

Run: python examples/cdc_replay.py
(Reference analog: the delta/retry examples in
/root/reference/examples/incremental_processing/.)
"""

import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from datachain_spark import get_spark
from datachain_spark.cdc.feed import FeedSpec, write_feed
from datachain_spark.cdc.stream import run_stream

spark = get_spark(cpus=4, shuffle_partitions=8)
work = Path(tempfile.mkdtemp(prefix="cdc_example_"))

spec = FeedSpec(n_convs=50, hot_every=1000, hot_base=80, batch_size=300)
n = write_feed(spark, spec, str(work / "feed"))
print(f"feed: {n} microbatch files")

table, metrics = run_stream(
    spark, str(work / "table"), str(work / "feed"), str(work / "ckpt"), num_buckets=8
)
for m in metrics:
    print("batch:", m)

df = table.read(spark)
print("final rows:", df.count())
df.orderBy("conv_id", "turn_idx").show(5, truncate=60)

print("versions:", table.versions()[-3:])
print("ledger tail:", table.ledger_rows()[-1])
table.tag_version("v1.0.0")
print("time travel v1 rows:", table.read(spark, version=table.versions()[1]).count())
