"""read_storage — directory/bucket listing as File rows, Spark-first.

The reference's #1 entry point (/root/reference/src/datachain/lib/dc/
storage.py:21-262) lists a bucket/directory into rows of a `File` model
(source, path, size, etag, is_latest, last_modified — /root/reference/src/
datachain/lib/file.py:200-255) via an async fsspec scandir
(/root/reference/src/datachain/lib/listing.py:46-107).

Spark-first rebuild: the `binaryFile` data source does the listing AND the
(lazy) content read distributed across executors — recursive lookup and
glob filtering are source options, and Catalyst prunes the `content`
column away when it is not selected, so a metadata-only listing never
reads file bytes. The File model becomes a nested STRUCT column (Spark has
native struct columns; the reference flattens to `file__path` because SQL
warehouses lack them — SURVEY.md §1.1).

On a real cluster the same code lists s3a://... through the Hadoop
filesystem layer; no fsspec, no driver-side listing loop. The reference's
4h listing cache (listing.py:26-61: listings saved as `lst__` datasets
shared across processes) maps to `cached_listing` / the `cache_root`
parameter of read_storage: the File-struct listing is materialized to
parquet once and reused within the TTL — at 10^8 objects a bucket crawl
is worth sharing; content reads stay live (lazy, per-file), exactly like
the reference's File readers.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

FILE_STRUCT_FIELDS = ["source", "path", "size", "last_modified", "etag", "is_latest"]

# incremented on every REAL directory walk (not cache hits) — lets tests
# (and operators) assert that a cached listing did no re-crawl
LISTING_WALKS = 0


def list_files(
    spark: SparkSession,
    uri: str,
    recursive: bool = True,
    glob: str | None = None,
    update: bool = False,
) -> DataFrame:
    """Raw listing: one row per file with (path, length, modificationTime,
    content available lazily). `glob` filters file NAMES (reference's glob
    over the listing, lib/listing.py:73-107). `update=True` invalidates
    Spark's session file-status cache for the path first — the exact
    analog of the reference's `update` flag over its 4h-TTL listing cache
    (lib/listing.py:26): without it, a re-listing of a path already
    scanned this session returns the cached statuses."""
    global LISTING_WALKS
    LISTING_WALKS += 1
    if update:
        spark.catalog.refreshByPath(uri)
    reader = spark.read.format("binaryFile").option(
        "recursiveFileLookup", str(bool(recursive)).lower()
    )
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    return reader.load(uri)


def read_storage(
    spark: SparkSession,
    uri: str,
    type: str = "binary",  # noqa: A002 - reference API name
    recursive: bool = True,
    glob: str | None = None,
    column: str = "file",
    update: bool = False,
    cache_root: str | None = None,
    ttl_seconds: int = 4 * 3600,
) -> DataFrame:
    """List `uri` into File rows (reference read_storage semantics).

    The URI may embed a glob pattern (`dir/**/x*.{csv,json}`) exactly like
    the reference (lib/dc/storage.py:159, storage_pattern.py:35-118): the
    patterned tail is split off, braces expand, only the base is walked
    (non-recursively when the pattern stays in one segment), the final
    component prunes the walk via pathGlobFilter where unambiguous, and
    the full pattern is enforced as one codegen rlike on the relative
    path — see sources/pattern.py.

    type='meta'   -> File struct only (no bytes are read: content is pruned)
    type='binary' -> File struct + `data` binary column
    type='text'   -> File struct + `text` string column (UTF-8 decode)

    The File struct: source (the listed root), path (relative to it), size,
    last_modified, etag (deterministic digest of path+size+mtime — local
    filesystems have no server etag; object stores would supply one), and
    is_latest (always true here: local listings have no versioning).

    `cache_root` enables the persistent listing cache (reference
    lib/listing.py:26-61, its `lst__` datasets with a 4h TTL): within
    `ttl_seconds` of the last crawl of (uri, recursive, glob), the LISTING
    comes from the cached parquet with NO directory walk — for
    type='binary'/'text' the cached paths drive the content read directly
    (per-file opens, still no crawl). `update=True` forces a re-crawl.
    Cache-read semantics are a SNAPSHOT view: files deleted since the
    crawl drop out of the content join; files modified keep their cached
    etag but read live bytes."""
    from datachain_spark.sources.pattern import (
        expand_brace_pattern,
        filename_pushdown,
        globs_to_regex,
        pattern_needs_recursion,
        split_uri_pattern,
    )

    base, pattern = split_uri_pattern(uri)
    if pattern is not None:
        uri = base
        variants = expand_brace_pattern(pattern)
        # single-segment patterns match direct children only (reference
        # should_use_recursion); the pattern filter below is exact either way
        recursive = recursive and pattern_needs_recursion(pattern)
        if glob is None:
            glob = filename_pushdown(variants)
        out = read_storage(
            spark, base, type=type, recursive=recursive, glob=glob,
            column=column, update=update, cache_root=cache_root,
            ttl_seconds=ttl_seconds,
        )
        return out.filter(F.col(f"{column}.path").rlike(globs_to_regex(variants)))
    if cache_root is not None:
        listing = cached_listing(
            spark, uri, cache_root, ttl_seconds=ttl_seconds,
            recursive=recursive, glob=glob, update=update, column=column,
        )
        if type == "meta":
            return listing
        if type not in ("binary", "text"):
            raise ValueError(f"unknown type {type!r}: expected meta|binary|text")
        root = uri.rstrip("/")
        # same O(files) driver-side path list as parse_tabular / Spark's
        # own file index; the listing is typically curated/filtered
        paths = [
            f"{r['source']}/{r['path']}"
            for r in listing.select(f"{column}.source", f"{column}.path").collect()
        ]
        if not paths:
            return listing.limit(0).withColumn(
                "data" if type == "binary" else "text",
                F.lit(None).cast("binary" if type == "binary" else "string"),
            )
        content = spark.read.format("binaryFile").load(paths)
        rel = F.regexp_replace(F.col("path"), r"^file:", "")
        rel = F.regexp_replace(rel, "^" + _re_quote(root) + "/?", "")
        content = content.select(
            rel.alias("__relpath"),
            F.col("content").alias("data")
            if type == "binary"
            else F.decode(F.col("content"), "UTF-8").alias("text"),
        )
        return (
            listing.join(content, F.col(f"{column}.path") == F.col("__relpath"), "inner")
            .drop("__relpath")
        )
    df = list_files(spark, uri, recursive=recursive, glob=glob, update=update)
    root = uri.rstrip("/")
    rel = F.regexp_replace(F.col("path"), r"^file:", "")
    rel = F.regexp_replace(rel, "^" + _re_quote(root) + "/?", "")
    file_struct = F.struct(
        F.lit(root).alias("source"),
        rel.alias("path"),
        F.col("length").alias("size"),
        F.col("modificationTime").alias("last_modified"),
        F.md5(
            F.concat_ws(
                "\x00", rel, F.col("length"), F.col("modificationTime").cast("long")
            )
        ).alias("etag"),
        F.lit(True).alias("is_latest"),
    )
    if type == "meta":
        return df.select(file_struct.alias(column))
    if type == "binary":
        return df.select(file_struct.alias(column), F.col("content").alias("data"))
    if type == "text":
        return df.select(
            file_struct.alias(column), F.decode(F.col("content"), "UTF-8").alias("text")
        )
    raise ValueError(f"unknown type {type!r}: expected meta|binary|text")


def _re_quote(s: str) -> str:
    import re

    return re.escape(s)


def cached_listing(
    spark: SparkSession,
    uri: str,
    cache_root: str,
    ttl_seconds: int = 4 * 3600,
    recursive: bool = True,
    glob: str | None = None,
    update: bool = False,
    column: str = "file",
) -> DataFrame:
    """Persistent listing reuse (reference lib/listing.py:26-61: bucket
    listings are saved as `lst__<hash>` datasets with a 4h TTL shared
    across processes). The META listing (File struct, no bytes) is
    materialized to parquet under `cache_root`; later calls within the TTL
    read the parquet instead of re-listing the bucket — at 10^8 objects a
    listing is an expensive distributed crawl worth sharing. `update=True`
    forces a re-list (the reference's update flag). Returns the File-struct
    DataFrame; pair with parse_tabular / file_diff like a live listing.

    Only the LISTING is cached — content reads (type='binary'/'text') stay
    live, exactly like the reference's lazy File readers."""
    import hashlib
    import json
    import time

    key = hashlib.md5(f"{uri}|{recursive}|{glob}".encode()).hexdigest()[:16]
    cdir = os.path.join(cache_root, f"lst__{key}")
    meta_path = os.path.join(cdir, "_listing_meta.json")
    data_dir = os.path.join(cdir, "data")
    fresh = False
    if not update and os.path.exists(meta_path):
        with open(meta_path) as fh:
            meta = json.load(fh)
        fresh = (time.time() - meta["created_at"]) < ttl_seconds
    if not fresh:
        df = read_storage(
            spark, uri, type="meta", recursive=recursive, glob=glob,
            update=True, column=column,
        )
        df.write.mode("overwrite").parquet(data_dir)
        os.makedirs(cdir, exist_ok=True)
        tmp = meta_path + ".tmp"
        with open(tmp, "w") as fh:
            json.dump(
                {
                    "uri": uri,
                    "glob": glob,
                    "recursive": recursive,
                    "created_at": time.time(),
                },
                fh,
            )
        os.replace(tmp, meta_path)
    return spark.read.parquet(data_dir)


def listings(
    spark: SparkSession,
    cache_root: str,
    ttl_seconds: int = 4 * 3600,
) -> DataFrame:
    """Enumerate the persistent listing cache as a DataFrame — the
    reference's listings() surface (lib/dc/listings.py:1-147 returns
    ListingInfo rows for saved `lst__` datasets, with an expiry flag).
    One row per cached crawl: uri, glob, recursive, created_at, expired
    (vs `ttl_seconds`), num_objects (from the cached parquet footers —
    driver-side metadata, no Spark job)."""
    import json
    import time

    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("uri", T.StringType(), False),
            T.StructField("glob", T.StringType(), True),
            T.StructField("recursive", T.BooleanType(), True),
            T.StructField("created_at", T.TimestampType(), False),
            T.StructField("expired", T.BooleanType(), False),
            T.StructField("num_objects", T.LongType(), True),
        ]
    )
    rows = []
    if os.path.isdir(cache_root):
        import datetime

        import pyarrow.parquet as pq

        for entry in sorted(os.listdir(cache_root)):
            if not entry.startswith("lst__"):
                continue
            meta_path = os.path.join(cache_root, entry, "_listing_meta.json")
            data_dir = os.path.join(cache_root, entry, "data")
            if not os.path.exists(meta_path):
                continue
            with open(meta_path) as fh:
                meta = json.load(fh)
            n = None
            if os.path.isdir(data_dir):
                n = sum(
                    pq.ParquetFile(os.path.join(data_dir, f)).metadata.num_rows
                    for f in os.listdir(data_dir)
                    if f.endswith(".parquet")
                )
            rows.append(
                (
                    meta["uri"],
                    meta.get("glob"),
                    meta.get("recursive"),
                    datetime.datetime.fromtimestamp(
                        meta["created_at"], datetime.timezone.utc
                    ),
                    (time.time() - meta["created_at"]) >= ttl_seconds,
                    n,
                )
            )
    return spark.createDataFrame(rows, schema)


def prefetch_files(
    df: DataFrame,
    column: str = "file",
    data_col: str = "data",
    workers: int = 8,
) -> DataFrame:
    """Async file-fetch stage for File-typed rows — the reference's UDF
    prefetcher (/root/reference/src/datachain/lib/udf.py:375-432 downloads
    upcoming Files on a thread pool while the UDF processes the current
    one) rebuilt Spark-first: inside each mapInPandas worker an Arrow
    batch's files are fetched CONCURRENTLY by `workers` threads (reads
    release the GIL), so a downstream .map()/.gen() over the payload never
    waits on storage latency one file at a time. Use after a meta listing:

        read_storage(spark, uri, type="meta") |> prefetch_files |> map(...)

    Executor-local, no shuffle; memory per task is one batch of payloads
    (bound batch size via spark.sql.execution.arrow.maxRecordsPerBatch
    when files are large). Missing files yield NULL data (listing
    staleness tolerated, like the reference's catch-and-log)."""
    import pandas as pd
    from pyspark.sql import types as T

    out_schema = T.StructType(
        list(df.schema.fields) + [T.StructField(data_col, T.BinaryType(), True)]
    )

    def run(batches):
        from concurrent.futures import ThreadPoolExecutor

        def fetch(f) -> bytes | None:
            try:
                with open(os.path.join(f["source"], f["path"]), "rb") as fh:
                    return fh.read()
            except OSError:
                return None

        with ThreadPoolExecutor(max_workers=workers) as pool:
            for pdf in batches:
                payloads = list(pool.map(fetch, pdf[column]))
                yield pdf.assign(**{data_col: pd.Series(payloads, dtype=object)})

    return df.mapInPandas(run, out_schema)


def to_storage(
    df: DataFrame,
    output: str,
    placement: str = "filename",  # filename | etag | fullpath
    column: str = "file",
    data_col: str = "data",
) -> DataFrame:
    """Export binary payloads back to files (reference to_storage,
    /root/reference/src/datachain/datachain.py:2795-2876 with FileExporter
    placement strategies, lib/file.py:51-84). Executors write in parallel
    via mapInPandas — the threaded driver-side exporter becomes a
    distributed write; `output` must be a shared filesystem on a real
    cluster. Returns a DataFrame of (path, n_bytes) actually written
    (collect it to force the export and get the manifest).

    placement='filename' -> basename only (collisions overwrite);
    'etag' -> <etag><ext>; 'fullpath' -> mirrors the relative path tree.
    """
    import pandas as pd

    out_schema = "path string, n_bytes long"

    def write(batches):
        import os as _os

        for pdf in batches:
            paths, sizes = [], []
            for f, data in zip(pdf[column], pdf[data_col]):
                rel = f["path"]
                base = _os.path.basename(rel)
                if placement == "filename":
                    target = base
                elif placement == "etag":
                    ext = _os.path.splitext(base)[1]
                    target = f"{f['etag']}{ext}"
                elif placement == "fullpath":
                    target = rel
                else:
                    raise ValueError(f"unknown placement {placement!r}")
                full = _os.path.join(output, target)
                _os.makedirs(_os.path.dirname(full) or output, exist_ok=True)
                payload = bytes(data) if data is not None else b""
                with open(full, "wb") as fh:
                    fh.write(payload)
                paths.append(target)
                sizes.append(len(payload))
            yield pd.DataFrame({"path": paths, "n_bytes": sizes})

    return df.mapInPandas(write, out_schema)


def parse_tabular(
    spark: SparkSession,
    listing: DataFrame,
    format: str = "csv",  # noqa: A002 - reference API name
    column: str = "file",
    **options: str,
) -> DataFrame:
    """Read the CONTENT of listed files as tabular data (reference
    parse_tabular, /root/reference/src/datachain/datachain.py:2214-2320 —
    its ArrowGenerator opens each File and yields record batches). Here
    the listing's paths feed a normal distributed spark.read — Arrow
    batching, schema merge, and parallelism are native — and each row
    keeps its source file via input_file_name().

    Scale note: the path list is collected to the driver, which is the
    same O(files) driver-side footprint Spark's own InMemoryFileIndex
    keeps for ANY scan — a curated listing (post-filter, post-file_diff)
    is typically far smaller than the raw bucket. For an unfiltered read
    of a whole prefix, skip the listing and point spark.read at the
    directory (pathGlobFilter does the rest)."""
    rows = listing.select(f"{column}.source", f"{column}.path").collect()
    paths = [f"{r['source']}/{r['path']}" for r in rows]
    if not paths:
        raise ValueError("parse_tabular: empty listing")
    reader = spark.read.options(**options)
    df = getattr(reader, format)(paths)
    return df.withColumn("source_file", F.input_file_name())


def file_diff(
    left: DataFrame,
    right: DataFrame,
    column: str = "file",
    compare: list[str] | None = None,
) -> DataFrame:
    """Diff two File listings on (source, path), comparing etag (i.e.
    size+mtime) by default — the reference's file_diff
    (/root/reference/src/datachain/datachain.py:1998-2069) specialized on
    File unique keys. Returns the left schema + diff_status in A/D/M/S.

    NOTE: a listing DataFrame is lazy over a mutable filesystem; the
    "old" side must be a MATERIALIZED snapshot (localCheckpoint(), a saved
    dataset, or parquet export), exactly as the reference diffs against a
    persisted lst__ dataset — a cached plan is invalidated by the
    update=True refresh and would silently re-list the new state."""
    from datachain_spark.diff import diff

    compare = compare or ["etag"]
    lf = left.withColumn("__src", F.col(f"{column}.source")).withColumn(
        "__path", F.col(f"{column}.path")
    )
    rf = right.withColumn("__src", F.col(f"{column}.source")).withColumn(
        "__path", F.col(f"{column}.path")
    )
    for c in compare:
        lf = lf.withColumn(f"__cmp_{c}", F.col(f"{column}.{c}"))
        rf = rf.withColumn(f"__cmp_{c}", F.col(f"{column}.{c}"))
    out = diff(
        lf,
        rf,
        on=["__src", "__path"],
        compare=[f"__cmp_{c}" for c in compare],
    )
    return out.drop("__src", "__path", *[f"__cmp_{c}" for c in compare])
