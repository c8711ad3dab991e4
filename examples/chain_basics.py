"""Chain API tour — what a DataChain user writes here instead.

Run: python examples/chain_basics.py
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from datachain_spark import chain as dc, functions as fn, get_spark
from datachain_spark.chain import C

spark = get_spark(cpus=4, shuffle_partitions=8)

ch = dc.read_values(
    spark,
    id=[1, 2, 3, 4, 5, 6],
    title=["intro.md", "guide.pdf", "notes.txt", "data.csv", "img.png", "talk.pdf"],
    size=[120, 4096, 300, 900, 2048, 5120],
)

(
    ch.mutate(ext=fn.file_ext("title"), stem=fn.file_stem("title"))
    .filter(C("size") > 200)
    .order_by("size", descending=True)
    .show()
)

print("by extension:")
ch.mutate(ext=fn.file_ext("title")).group_by(
    "ext", n=fn.count(), total=fn.sum("size")
).show()

# Arrow-vectorized UDFs (reference .map/.gen/.agg)
doubled = ch.map(lambda size: size * 2, output={"size2": int}, params=["size"])
print("mapped:", doubled.to_values("size2"))

# versioned datasets
import tempfile

cat = tempfile.mkdtemp(prefix="catalog_")
dc.Chain(ch.df, catalog_root=cat).save("files")
print("datasets:", dc.datasets(cat))
print("read back:", dc.read_dataset(spark, "files", catalog_root=cat).count())
