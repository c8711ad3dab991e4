"""LAION WebDataset flavor (reference lib/webdataset_laion.py:23-76).

The reference defines a Laion json model (caption/url/width/... + face
bboxes), a WDSLaion sample shape (txt + parsed json), and
process_laion_meta — a generator that unpacks the LAION .npz embedding
sidecar files (b32/l14 image+text embeddings, dedup vector) into one row
per index.

Spark-first: the json model is a DDL schema fed to one codegen from_json;
npz unpacking is a mapInPandas generator over the binary payload column —
each executor unpacks its own shard sidecars, rows never touch the driver.
"""

from __future__ import annotations

import io
from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Laion json member model (reference webdataset_laion.py:23-39) as a Spark
# schema: Pydantic Optional fields are nullable columns.
LAION_JSON_SCHEMA = (
    "uid string, face_bboxes array<array<double>>, caption string, "
    "url string, key string, status string, error_message string, "
    "width int, height int, original_width int, original_height int, "
    "exif string, sha256 string"
)

_META_VECS = ("b32_img", "b32_txt", "l14_img", "l14_txt", "dedup")


def read_wds_laion(
    spark: SparkSession, uri: str, image_ext: str = "jpg", glob: str = "*.tar"
) -> DataFrame:
    """Read LAION-format WebDataset shards into WDSLaion-shaped rows
    (reference WDSLaion, webdataset_laion.py:43-45): key, shard, txt,
    typed `json` struct, and the image payload bytes."""
    from datachain_spark.sources.tar import parse_json_member, read_webdataset

    df = read_webdataset(
        spark, uri, text_cols=("txt", "json"), bin_cols=(image_ext,), glob=glob
    )
    return parse_json_member(df, "json", LAION_JSON_SCHEMA)


def process_laion_meta(df: DataFrame, payload: str = "data", path: str = "path") -> DataFrame:
    """Unpack LAION .npz embedding sidecars: one output row per index with
    the five vectors (reference process_laion_meta,
    webdataset_laion.py:58-76). `df` carries the sidecar bytes in
    `payload` and its identity in `path`.

    Generator semantics (1:N) via mapInPandas: unpacking happens where the
    bytes already live — no shuffle, no driver copy; a 100 TB sidecar
    collection unpacks shard-parallel."""
    import numpy as np
    import pandas as pd

    schema = T.StructType(
        [
            T.StructField("path", T.StringType()),
            T.StructField("index", T.LongType()),
            *[
                T.StructField(v, T.ArrayType(T.FloatType()))
                for v in _META_VECS
            ],
        ]
    )

    def unpack(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for p, blob in zip(pdf[path], pdf[payload]):
                if blob is None:
                    continue
                npz = np.load(io.BytesIO(bytes(blob)))
                vecs = {v: npz[v] for v in _META_VECS}
                n = len(vecs["b32_img"])
                yield pd.DataFrame(
                    {
                        "path": [p] * n,
                        "index": range(n),
                        **{
                            v: [row.astype(np.float32) for row in vecs[v]]
                            for v in _META_VECS
                        },
                    }
                )

    return df.mapInPandas(unpack, schema)


def laion_to_embeddings(meta: DataFrame, vec: str = "b32_img") -> DataFrame:
    """Adapt unpacked LAION meta to this repo's embeddings-table shape
    (doc_id-free: identity = (path, index)) for the similarity operators."""
    return meta.select(
        F.concat_ws("#", "path", F.col("index").cast("string")).alias("id"),
        F.col(vec).alias("embedding"),
    )


__all__ = [
    "LAION_JSON_SCHEMA",
    "laion_to_embeddings",
    "process_laion_meta",
    "read_wds_laion",
]
