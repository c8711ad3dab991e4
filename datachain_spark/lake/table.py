"""LakeTable — a versioned, bucket-partitioned, merge-on-read table format.

An Iceberg-style snapshot store built from scratch (no Iceberg jars are
available in this environment): every commit writes an immutable JSON
manifest listing the parquet segment files of each hash bucket; the
manifest rename is the atomic commit point.

Write path = **merge-on-read** (Iceberg MOR semantics): a CDC batch
APPENDS one segment per touched bucket containing upsert after-images and
delete tombstones, each stamped with its event LSN — apply cost is
O(batch), never O(table) (copy-on-write would rewrite every touched
bucket per batch: quadratic over a bulk replay, measured 3x slower even
at 2M events). Read path resolves last-writer-wins per key with a
row_number window over `_lsn` within each bucket (a key's history lives
in exactly one bucket, so resolution never crosses bucket boundaries).
`compact()` rewrites multi-segment buckets to a single resolved segment —
amortized, like Iceberg data compaction — after which reads are
window-free again (per-bucket `dirty` flags track which buckets need
resolution).

This reproduces the reference's dataset-versioning pillar
(/root/reference/src/datachain/dataset.py:240-360 — per-version physical
tables; /root/reference/src/datachain/catalog/catalog.py:796-890 — version
creation) Spark-first: a version here is a snapshot manifest + tag instead
of a full table copy, and schema evolution is union-by-name with null
backfill on read (parquet readers fill missing columns with null when given
an explicit schema), mirroring Iceberg semantics rather than the reference's
SchemaDriftError (/root/reference/src/datachain/delta.py:58-97).

Scale notes (100 TB / 1000 executors):
- Data paths are listed in the manifest, so reads never list directories.
- Bucket pruning: reads of K of B buckets scan only those buckets' files.
- Apply is O(batch); compaction is O(dirty-bucket data), amortized across
  batches and parallel over buckets.
- Manifests are O(B * segments-per-bucket) JSON — driver-side metadata,
  the same regime as Iceberg manifest lists. `expire_versions` bounds
  history; compaction bounds segments-per-bucket.
- Buckets are assigned by pmod(xxhash64(key), B): deterministic across
  cluster sizes and restarts.
- The exactly-once ledger is carried IN the snapshot as a per-job set of
  committed batch-id ranges (contiguous runs collapse to [lo, hi] pairs),
  so `batch_committed` is an O(1) driver-side dict lookup instead of an
  O(versions) manifest scan — and it survives `expire_versions`.

Durability assumption: the atomic commit point is POSIX `rename(2)` of the
manifest into `versions/` (plus `os.listdir` for version discovery), which
is atomic-and-visible on local disks, NFS, and HDFS-like stores. On S3-style
object stores this protocol needs a real catalog (conditional PUT /
compare-and-swap, as Iceberg's catalog layer provides); the table format
itself — immutable manifests + immutable data files — ports unchanged.
"""

from __future__ import annotations

import json
import os
import threading
import time
from concurrent.futures import Future, ThreadPoolExecutor
from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Internal per-row metadata columns: LSN of the producing event, and the
# delete-tombstone marker (merge-on-read).
LSN_COL = "_lsn"
DELETED_COL = "_deleted"
META_FIELDS = [
    T.StructField(LSN_COL, T.LongType(), True),
    T.StructField(DELETED_COL, T.BooleanType(), True),
]


def _add_committed(committed: dict[str, list[list[int]]], job_id: str, batch_id: int) -> None:
    """Fold one committed batch id into a job's merged [lo, hi] range list
    (kept sorted; adjacent ranges coalesce, so in-order replay stays at one
    range per job)."""
    rs = committed.setdefault(job_id, [])
    rs.append([batch_id, batch_id])
    rs.sort()
    merged: list[list[int]] = []
    for lo, hi in rs:
        if merged and lo <= merged[-1][1] + 1:
            merged[-1][1] = max(merged[-1][1], hi)
        else:
            merged.append([lo, hi])
    committed[job_id] = merged


@dataclass
class Snapshot:
    version: int
    parent: int | None
    schema_json: str
    num_buckets: int
    key_cols: list[str]
    buckets: dict[int, list[str]]  # bucket -> relative parquet segment paths
    watermarks: dict[int, int]  # bucket -> high-watermark LSN applied
    dirty: dict[int, bool] = field(default_factory=dict)  # bucket needs LWW resolve
    tag: str | None = None
    ledger: dict[str, Any] | None = None  # commit-manifest row (exactly-once)
    # job_id -> merged [lo, hi] committed-batch ranges (exactly-once lookup)
    committed: dict[str, list[list[int]]] = field(default_factory=dict)
    props: dict[str, Any] = field(default_factory=dict)
    created_at: float = 0.0

    @property
    def schema(self) -> T.StructType:
        return T.StructType.fromJson(json.loads(self.schema_json))

    def to_json(self) -> str:
        return json.dumps(
            {
                "version": self.version,
                "parent": self.parent,
                "schema": self.schema_json,
                "num_buckets": self.num_buckets,
                "key_cols": self.key_cols,
                "buckets": {str(k): v for k, v in self.buckets.items()},
                "watermarks": {str(k): v for k, v in self.watermarks.items()},
                "dirty": {str(k): v for k, v in self.dirty.items()},
                "tag": self.tag,
                "ledger": self.ledger,
                "committed": self.committed,
                "props": self.props,
                "created_at": self.created_at,
            },
            sort_keys=True,
        )

    @staticmethod
    def from_json(s: str) -> "Snapshot":
        d = json.loads(s)
        return Snapshot(
            version=d["version"],
            parent=d["parent"],
            schema_json=d["schema"],
            num_buckets=d["num_buckets"],
            key_cols=d.get("key_cols", []),
            buckets={int(k): v for k, v in d["buckets"].items()},
            watermarks={int(k): v for k, v in d.get("watermarks", {}).items()},
            dirty={int(k): v for k, v in d.get("dirty", {}).items()},
            tag=d.get("tag"),
            ledger=d.get("ledger"),
            committed=d.get("committed") or {},
            props=d.get("props") or {},
            created_at=d.get("created_at", 0.0),
        )


class LakeTable:
    """One versioned table rooted at a directory."""

    def __init__(self, root: str):
        self.root = root
        self._snap_cache: dict[int, Snapshot] = {}
        # serializes manifest commits (the compaction worker thread and the
        # apply thread both commit); Spark job submission itself is
        # thread-safe and stays OUTSIDE the lock
        self._commit_lock = threading.Lock()
        self._compact_pool: ThreadPoolExecutor | None = None
        self._compact_future: Future | None = None

    # ---------- paths ----------
    def _versions_dir(self) -> str:
        return os.path.join(self.root, "versions")

    def _manifest_path(self, version: int) -> str:
        return os.path.join(self._versions_dir(), f"v{version:012d}.json")

    def data_dir(self, *parts: str) -> str:
        return os.path.join(self.root, "data", *parts)

    # ---------- lifecycle ----------
    @staticmethod
    def create(
        root: str,
        schema: T.StructType,
        key_cols: list[str],
        num_buckets: int = 64,
        bloom_filter_cols: list[str] | None = None,
        bloom_filter_ndv: int = 100_000,
    ) -> "LakeTable":
        """`bloom_filter_cols` turns on parquet bloom filters for those
        columns in every segment/compaction write (Delta's
        delta.bloomFilter analog): point lookups (read_keys) then skip
        row groups even where min/max stats are useless — a high-NDV key
        inside an unsorted bucket is exactly that case. `bloom_filter_ndv`
        sizes the filter per row group (~1.25 bytes/key at 1% fpp; the
        parquet-mr default of 1M NDV would bloat small segments)."""
        t = LakeTable(root)
        os.makedirs(t._versions_dir(), exist_ok=True)
        os.makedirs(t.data_dir(), exist_ok=True)
        props: dict[str, Any] = {}
        if bloom_filter_cols:
            # `table.*` props are inherited by every later commit (like the
            # `dataset.*` metadata) — the write config must survive applies
            props["table.bloom_filter_cols"] = list(bloom_filter_cols)
            props["table.bloom_filter_ndv"] = int(bloom_filter_ndv)
        snap = Snapshot(
            version=0,
            parent=None,
            schema_json=json.dumps(schema.jsonValue()),
            num_buckets=num_buckets,
            key_cols=list(key_cols),
            buckets={},
            watermarks={},
            created_at=time.time(),
            props=props,
        )
        t._write_manifest(snap)
        return t

    def parquet_write_options(self) -> dict[str, str]:
        """Per-column parquet writer options every data write (segment
        append, compaction rewrite) must apply — currently the bloom
        filter settings from create(bloom_filter_cols=...). Reads are
        zero-config: parquet-mr consults the filter automatically for
        pushed equality predicates."""
        props = self.snapshot().props
        cols = props.get("table.bloom_filter_cols") or []
        ndv = str(props.get("table.bloom_filter_ndv", 100_000))
        opts: dict[str, str] = {}
        for c in cols:
            opts[f"parquet.bloom.filter.enabled#{c}"] = "true"
            opts[f"parquet.bloom.filter.expected.ndv#{c}"] = ndv
        return opts

    @staticmethod
    def exists(root: str) -> bool:
        d = os.path.join(root, "versions")
        return os.path.isdir(d) and any(f.endswith(".json") for f in os.listdir(d))

    # ---------- versions ----------
    def versions(self) -> list[int]:
        d = self._versions_dir()
        if not os.path.isdir(d):
            return []
        return sorted(
            int(f[1:-5]) for f in os.listdir(d) if f.startswith("v") and f.endswith(".json")
        )

    def current_version(self) -> int:
        vs = self.versions()
        if not vs:
            raise FileNotFoundError(f"no versions in {self.root}")
        return vs[-1]

    def snapshot(self, version: int | None = None) -> Snapshot:
        v = self.current_version() if version is None else version
        if v not in self._snap_cache:
            with open(self._manifest_path(v)) as f:
                self._snap_cache[v] = Snapshot.from_json(f.read())
        return self._snap_cache[v]

    def resolve_tag(self, tag: str) -> int:
        for v in reversed(self.versions()):
            if self.snapshot(v).tag == tag:
                return v
        raise KeyError(f"tag {tag!r} not found in {self.root}")

    def version_at(self, ts) -> int:
        """Timestamp time travel (Delta's TIMESTAMP AS OF / Iceberg's
        snapshot-at): the latest version whose commit time is <= ts.
        Accepts an epoch float, a datetime, or an ISO-8601 string (naive
        strings are taken as UTC, matching the commit clock). Raises if ts
        predates the table. O(versions) manifest metadata, no Spark job."""
        import datetime as _dt

        if isinstance(ts, str):
            parsed = _dt.datetime.fromisoformat(ts)
            if parsed.tzinfo is None:
                parsed = parsed.replace(tzinfo=_dt.timezone.utc)
            ts = parsed.timestamp()
        elif isinstance(ts, _dt.datetime):
            if ts.tzinfo is None:
                ts = ts.replace(tzinfo=_dt.timezone.utc)
            ts = ts.timestamp()
        best = None
        for v in self.versions():
            if self.snapshot(v).created_at <= ts:
                best = v
            else:
                break
        if best is None:
            raise KeyError(f"no version at or before ts={ts} in {self.root}")
        return best

    def _write_manifest(self, snap: Snapshot) -> None:
        """Atomic commit: full write to tmp + fsync, then `os.link` into
        place. link(2) — unlike rename(2) — FAILS if the target exists, so
        the version-number claim itself is atomic: two committers racing
        for version N+1 (e.g. a tag commit vs an async-compaction commit
        from another process) get one winner and one loud FileExistsError
        instead of a silently clobbered manifest."""
        path = self._manifest_path(snap.version)
        tmp = path + f".tmp.{os.getpid()}.{threading.get_ident()}"
        with open(tmp, "w") as f:
            f.write(snap.to_json())
            f.flush()
            os.fsync(f.fileno())
        try:
            os.link(tmp, path)
        except FileExistsError:
            raise FileExistsError(f"version {snap.version} already committed") from None
        finally:
            os.remove(tmp)
        self._snap_cache[snap.version] = snap

    # ---------- schema / buckets ----------
    @property
    def schema(self) -> T.StructType:
        return self.snapshot().schema

    @property
    def num_buckets(self) -> int:
        return self.snapshot().num_buckets

    def bucket_expr(self, *key_cols: str) -> Column:
        """Deterministic bucket id — stable across cluster sizes/restarts.
        Defaults to the table's first key column (bucket(conv_id) layout)."""
        cols = key_cols or tuple(self.snapshot().key_cols[:1])
        return F.pmod(F.xxhash64(*[F.col(c) for c in cols]), F.lit(self.num_buckets)).cast("int")

    # ---------- read ----------
    def _files(self, snap: Snapshot, buckets: list[int] | None = None) -> list[str]:
        sel = snap.buckets if buckets is None else {b: snap.buckets.get(b, []) for b in buckets}
        return [os.path.join(self.root, p) for fl in sel.values() for p in fl]

    def _read_raw(
        self,
        spark: SparkSession,
        snap: Snapshot,
        buckets: list[int] | None,
    ) -> DataFrame:
        read_schema = T.StructType(list(snap.schema.fields) + META_FIELDS)
        files = self._files(snap, buckets)
        if not files:
            return spark.createDataFrame([], read_schema)
        return spark.read.schema(read_schema).parquet(*files)

    def _resolve(
        self, df: DataFrame, key_cols: list[str], keep_tombstones: bool = False
    ) -> DataFrame:
        """Merge-on-read LWW resolution: latest `_lsn` per key wins; drop
        tombstones (`keep_tombstones=True` keeps a winning tombstone row —
        the compaction path uses it to preserve delete ordering against
        redelivered stale upserts). A key's segments all live in one
        bucket, so the window shuffle is bucket-local data, never
        cross-key."""
        from pyspark.sql import Window

        w = Window.partitionBy(*key_cols).orderBy(F.col(LSN_COL).desc())
        keep = F.col("__rn") == 1
        if not keep_tombstones:
            keep = keep & ~F.coalesce(F.col(DELETED_COL), F.lit(False))
        return df.withColumn("__rn", F.row_number().over(w)).filter(keep).drop("__rn")

    def read(
        self,
        spark: SparkSession,
        version: int | str | None = None,
        buckets: list[int] | None = None,
        with_meta: bool = False,
        as_of=None,
    ) -> DataFrame:
        """Read a snapshot (optionally bucket-pruned / time-travel; `as_of`
        = timestamp time travel via version_at).

        The explicit schema makes old files (pre-evolution) surface added
        columns as null — Iceberg-style union-by-name on read. Buckets
        flagged dirty get LWW resolution; compacted buckets scan straight
        through (no window)."""
        if as_of is not None:
            if version is not None:
                raise ValueError("pass either version or as_of, not both")
            version = self.version_at(as_of)
        if isinstance(version, str):
            version = self.resolve_tag(version)
        snap = self.snapshot(version)
        sel = sorted(snap.buckets) if buckets is None else buckets
        dirty = [b for b in sel if snap.dirty.get(b)]
        clean = [b for b in sel if not snap.dirty.get(b)]
        parts = []
        if clean:
            # clean (compacted) buckets are LWW-resolved but MAY carry
            # retained tombstones (compact(retain_tombstones=True)) — a
            # cheap codegen filter, no window needed
            parts.append(
                self._read_raw(spark, snap, clean).filter(
                    ~F.coalesce(F.col(DELETED_COL), F.lit(False))
                )
            )
        if dirty:
            parts.append(self._resolve(self._read_raw(spark, snap, dirty), snap.key_cols))
        if not parts:
            df = self._read_raw(spark, snap, [])
        else:
            df = parts[0]
            for p in parts[1:]:
                df = df.unionByName(p)
        if not with_meta:
            df = df.drop(LSN_COL, DELETED_COL)
        return df

    def buckets_for(self, spark: SparkSession, values: list) -> dict:
        """Bucket id per bucketing-key value (the table buckets on its
        first key column). ONE tiny local-DF job that evaluates the SAME
        JVM xxhash64 expression the writer used — no Python reimplementation
        to drift. O(len(values)) driver metadata."""
        kcol = self.snapshot().key_cols[0]
        ktype = next(f.dataType for f in self.snapshot().schema.fields if f.name == kcol)
        df = spark.createDataFrame(
            [(v,) for v in values], T.StructType([T.StructField(kcol, ktype)])
        )
        rows = df.select(F.col(kcol), self.bucket_expr().alias("__b")).collect()
        return {r[kcol]: int(r["__b"]) for r in rows}

    def read_keys(
        self,
        spark: SparkSession,
        values: list,
        version: int | str | None = None,
        with_meta: bool = False,
        as_of=None,
    ) -> DataFrame:
        """Point lookups at table scale: resolve the values' buckets with
        one tiny local job, read ONLY those buckets (1/num_buckets of the
        table per distinct key), and push the key equality into the scan —
        with a zorder_by compaction layout the parquet row-group stats
        prune inside the bucket too, so a one-conversation read touches a
        handful of row groups out of 100 TB.

        Lookups key on the FIRST key column only (the bucketing column);
        for a composite-key table the result is every row whose first key
        component matches — filter the remaining components on the
        returned frame."""
        if not values:
            raise ValueError("read_keys needs at least one key value")
        kcol = self.snapshot().key_cols[0]
        bmap = self.buckets_for(spark, values)
        df = self.read(
            spark,
            version=version,
            buckets=sorted(set(bmap.values())),
            with_meta=with_meta,
            as_of=as_of,
        )
        cond = (
            F.col(kcol) == F.lit(values[0])
            if len(values) == 1
            else F.col(kcol).isin(list(values))
        )
        return df.filter(cond)

    def read_changes(
        self,
        spark: SparkSession,
        since_version: int,
        until_version: int | None = None,
    ) -> DataFrame:
        """Changelog read (Delta Change Data Feed / Iceberg incremental-scan
        analog; the reference's nearest surface is whole-dataset diff,
        src/datachain/diff/__init__.py:117-184, which rescans BOTH sides):
        the row-level changes committed in versions (since, until], straight
        from the segment files those commits ADDED — manifest set-difference
        picks the files driver-side (O(files) metadata, no data diff), so
        the scan cost is proportional to the CHANGES, never the table.

        Each row carries `_change_type` ('upsert'/'delete'),
        `_commit_version`, and `_lsn`. Rows are the committed segment rows:
        per batch, the within-batch LWW winner per key (the apply fuses
        batch dedup into the write). Compaction commits rewrite existing
        rows without logical change and are excluded (props marker);
        tag/metadata-only commits add no files and contribute nothing.
        Incremental consumers chain: next call's `since` = this call's
        `until`. Raises KeyError if a manifest in range was expired."""
        until = self.current_version() if until_version is None else until_version
        if not 0 <= since_version <= until:
            raise ValueError(
                f"need 0 <= since ({since_version}) <= until ({until})"
            )
        parts: list[DataFrame] = []
        for v in range(since_version + 1, until + 1):
            try:
                snap = self.snapshot(v)
                prev = self.snapshot(v - 1)
            except FileNotFoundError as e:  # expired manifest
                raise KeyError(
                    f"version {v} manifest missing (expired?); cannot "
                    f"reconstruct changes for ({since_version}, {until}]"
                ) from e
            if snap.props.get("compaction"):
                continue
            prev_files = {b: set(fl) for b, fl in prev.buckets.items()}
            added = [
                os.path.join(self.root, p)
                for b, fl in snap.buckets.items()
                for p in fl
                if p not in prev_files.get(b, set())
            ]
            if not added:
                continue
            read_schema = T.StructType(list(snap.schema.fields) + META_FIELDS)
            parts.append(
                spark.read.schema(read_schema)
                .parquet(*added)
                .withColumn("_commit_version", F.lit(v).cast("int"))
            )
        if not parts:
            schema = T.StructType(
                list(self.snapshot(until).schema.fields)
                + META_FIELDS
                + [T.StructField("_commit_version", T.IntegerType(), False)]
            )
            out = spark.createDataFrame([], schema)
        else:
            out = parts[0]
            for p in parts[1:]:
                out = out.unionByName(p, allowMissingColumns=True)
        return (
            out.withColumn(
                "_change_type",
                F.when(
                    F.coalesce(F.col(DELETED_COL), F.lit(False)), F.lit("delete")
                ).otherwise(F.lit("upsert")),
            )
            .drop(DELETED_COL)
        )

    def stream_changes(
        self,
        spark: SparkSession,
        max_files_per_trigger: int | None = None,
    ) -> DataFrame:
        """CDC-out: the table's changelog as a STREAMING DataFrame (Delta
        CDF readStream analog) — downstream consumers subscribe to every
        upsert/delete the appliers commit, instead of re-diffing snapshots.

        Built on Spark's file-streaming source over the segment layout:
        the `job=*/batch=*/bucket=*` glob picks up the appended change
        segments as they land and NEVER the `compact=*` rewrites, so
        compaction is invisible. The source's processed-file log gives
        exactly-once PER SEGMENT FILE; rows carry `_change_type` and
        `_lsn` (commit-version attribution needs the manifest and is a
        batch-read concern — use read_changes for audited ranges).

        Delivery contract (r5 ADVICE): this is AT-LEAST-ONCE with possible
        phantoms, weaker than read_changes. Because the glob bypasses the
        manifest, a segment written by an apply attempt that crashes AFTER
        its files land but BEFORE the manifest commit is still emitted
        (a phantom: the recovering applier reuses the same files, so the
        rows are usually committed eventually, but a permanently abandoned
        attempt's rows are not), and an overwrite-retry that renames part
        files can double-emit rows. Downstream consumers must be LWW-
        idempotent on (key, _lsn) — the same absorption rule every reader
        of this table already applies. For committed-only audited reads,
        poll read_changes over committed version ranges instead.
        Pre-evolution files surface later-added columns as NULL via the
        explicit read schema, which is pinned at stream START: restart
        the stream to pick up newer columns."""
        read_schema = T.StructType(list(self.snapshot().schema.fields) + META_FIELDS)
        reader = spark.readStream.schema(read_schema)
        if max_files_per_trigger:
            reader = reader.option("maxFilesPerTrigger", int(max_files_per_trigger))
        out = reader.parquet(
            os.path.join(self.root, "data", "job=*", "batch=*", "bucket=*")
        )
        return (
            out.withColumn(
                "_change_type",
                F.when(
                    F.coalesce(F.col(DELETED_COL), F.lit(False)), F.lit("delete")
                ).otherwise(F.lit("upsert")),
            )
            .drop(DELETED_COL)
        )

    # ---------- commit ----------
    def commit(
        self,
        append_bucket_files: dict[int, list[str]] | None = None,
        replace_bucket_files: dict[int, list[str]] | None = None,
        compacted_from: dict[int, list[str]] | None = None,
        has_deletes: set[int] | frozenset[int] = frozenset(),
        schema: T.StructType | None = None,
        watermark_updates: dict[int, int] | None = None,
        ledger: dict[str, Any] | None = None,
        tag: str | None = None,
        props: dict[str, Any] | None = None,
    ) -> int:
        """Commit a new version. `append_bucket_files` adds MOR segments
        (bucket turns dirty if it already had data or the segment carries
        tombstones); `replace_bucket_files` swaps a bucket's segment list
        (compaction). With `compacted_from` (the exact input files the
        compaction resolved), only THOSE files are replaced: segments
        appended to the bucket after the compaction read survive as
        residuals and the bucket stays dirty iff any exist — this is what
        makes compaction safe to run CONCURRENTLY with appends (Iceberg's
        rewrite-files validation, done set-wise here). Without it the swap
        is whole-list (bucket turns clean). Untouched buckets inherit the
        parent's files. Paths are relative to the table root. Commits are
        serialized under the table's commit lock."""
        with self._commit_lock:
            parent = self.snapshot()
            buckets = {b: list(fl) for b, fl in parent.buckets.items()}
            dirty = dict(parent.dirty)
            for b, fl in (append_bucket_files or {}).items():
                existing = buckets.setdefault(b, [])
                if existing or b in has_deletes:
                    dirty[b] = True
                existing.extend(fl)
            for b, fl in (replace_bucket_files or {}).items():
                if compacted_from is not None and b in compacted_from:
                    eaten = set(compacted_from[b])
                    residual = [p for p in buckets.get(b, []) if p not in eaten]
                    buckets[b] = list(fl) + residual
                    # residual segments postdate the compaction read: the
                    # union still needs LWW resolution (and may carry
                    # tombstones against compacted rows)
                    dirty[b] = bool(residual)
                else:
                    buckets[b] = list(fl)
                    dirty[b] = False
            watermarks = dict(parent.watermarks)
            for b, lsn in (watermark_updates or {}).items():
                watermarks[b] = max(lsn, watermarks.get(b, -1))
            committed = {j: [list(r) for r in rs] for j, rs in parent.committed.items()}
            if ledger is not None and "job_id" in ledger and "batch_id" in ledger:
                _add_committed(committed, str(ledger["job_id"]), int(ledger["batch_id"]))
            # dataset-level metadata (description/attrs, stored under
            # `dataset.*` keys; reference dataset.py:423-424 description +
            # attrs live on the dataset record, not the version) is
            # INHERITED across commits — a new save/apply/compaction must
            # not wipe it. Per-commit props (e.g. {"compaction": True})
            # stay per-commit.
            merged_props = {
                k: v
                for k, v in parent.props.items()
                if k.startswith(("dataset.", "table."))
            }
            merged_props.update(props or {})
            snap = Snapshot(
                version=parent.version + 1,
                parent=parent.version,
                schema_json=json.dumps(schema.jsonValue()) if schema else parent.schema_json,
                num_buckets=parent.num_buckets,
                key_cols=parent.key_cols,
                buckets=buckets,
                watermarks=watermarks,
                dirty=dirty,
                tag=tag,
                ledger=ledger,
                committed=committed,
                props=merged_props,
                created_at=time.time(),
            )
            self._write_manifest(snap)
            return snap.version

    def tag_version(self, tag: str, version: int | None = None) -> int:
        """Create a tagged (semver) alias version — a metadata-only commit,
        mirroring the reference's dataset version registration
        (/root/reference/src/datachain/dataset.py:419-448). Serialized
        under the commit lock like every other commit: a tag racing a
        concurrent apply/async-compaction commit must not both read the
        same HEAD and claim the same version number."""
        with self._commit_lock:
            return self._tag_version_locked(tag, version)

    def _tag_version_locked(self, tag: str, version: int | None = None) -> int:
        src = self.snapshot(version)
        snap = Snapshot(
            version=self.current_version() + 1,
            parent=src.version,
            schema_json=src.schema_json,
            num_buckets=src.num_buckets,
            key_cols=src.key_cols,
            buckets=dict(src.buckets),
            watermarks=dict(src.watermarks),
            dirty=dict(src.dirty),
            tag=tag,
            committed={j: [list(r) for r in rs] for j, rs in src.committed.items()},
            props={
                k: v
                for k, v in src.props.items()
                if k.startswith(("dataset.", "table."))
            },
            created_at=time.time(),
        )
        self._write_manifest(snap)
        return snap.version

    def edit_props(self, updates: dict[str, Any]) -> int:
        """Metadata-only commit updating dataset-level props (the storage
        behind edit_dataset — reference catalog.py:1560-1582 update_dataset
        with description/attrs). A key mapped to None is REMOVED; all other
        `dataset.*` keys are inherited. Serialized under the commit lock so
        an edit racing an apply/compaction commit cannot clobber a version."""
        with self._commit_lock:
            src = self.snapshot()
            props = {
                k: v
                for k, v in src.props.items()
                if k.startswith(("dataset.", "table."))
            }
            for k, v in updates.items():
                if v is None:
                    props.pop(k, None)
                else:
                    props[k] = v
            snap = Snapshot(
                version=self.current_version() + 1,
                parent=src.version,
                schema_json=src.schema_json,
                num_buckets=src.num_buckets,
                key_cols=src.key_cols,
                buckets=dict(src.buckets),
                watermarks=dict(src.watermarks),
                dirty=dict(src.dirty),
                tag=src.tag,
                committed={j: [list(r) for r in rs] for j, rs in src.committed.items()},
                props=props,
                created_at=time.time(),
            )
            self._write_manifest(snap)
            return snap.version

    # ---------- compaction ----------
    def compact(
        self,
        spark: SparkSession,
        max_segments: int = 8,
        files_per_bucket: int = 1,
        max_buckets: int | None = None,
        retain_tombstones: bool = True,
        zorder_by: list[str] | None = None,
    ) -> int | None:
        """Rewrite buckets with more than `max_segments` segments into
        resolved (LWW) segments. `max_buckets` staggers the work — only the
        worst offenders per call — so a steady append workload (every batch
        touches every bucket) pays a smooth, bounded compaction tax per
        batch instead of a periodic full-table rewrite. Parallel over
        buckets (one Spark job). Returns the new version, or None if
        nothing needed compaction.

        `retain_tombstones=True` (default) keeps each deleted key's WINNING
        tombstone row (`_deleted`, `_lsn`) in the compacted output instead
        of erasing it: under unordered delivery a redelivered stale upsert
        (lsn below the delete) appended AFTER compaction must still lose
        LWW to the delete — erasing the tombstone would resurrect the key
        (Cassandra keeps tombstones for gc_grace for the same reason).
        Reads filter retained tombstones with a codegen predicate, so
        clean-bucket scans stay window-free. Pass False only when the
        writer guarantees no event at-or-below the bucket watermark can
        ever be appended (e.g. the `lsn_ordered=True` replay path, whose
        per-bucket high-watermark filter drops redeliveries pre-write) —
        then tombstones are garbage the moment they are compacted.

        `zorder_by` clusters each rewritten bucket's rows on the Morton
        curve of the given columns (operators/zorder.py — Delta's OPTIMIZE
        ZORDER analog), so parquet row-group min/max stats prune reads
        filtered on ANY of those columns (e.g. `["conv_id", "ts"]` serves
        both one-conversation reads and time-window scans). Bounds come
        from a column-pruned aggregate over the PRE-resolve raw scan —
        a superset, so the bounds cover the resolved rows without running
        the LWW window twice."""
        snap = self.snapshot()
        todo = [b for b, fl in snap.buckets.items() if len(fl) > max_segments]
        if not todo:
            return None
        if max_buckets is not None and len(todo) > max_buckets:
            todo = sorted(todo, key=lambda b: -len(snap.buckets[b]))[:max_buckets]
        raw = self._read_raw(spark, snap, todo)
        resolved = self._resolve(
            raw,
            snap.key_cols,
            keep_tombstones=retain_tombstones,
        )
        resolved = resolved.withColumn("bucket", self.bucket_expr())
        out_dir = self.data_dir(f"compact={snap.version + 1}")
        n_parts = max(1, len(todo) * files_per_bucket)
        out = resolved.repartition(n_parts, "bucket")
        if zorder_by:
            from datachain_spark.operators.zorder import zorder_code

            out = (
                out.withColumn("__z", zorder_code(resolved, zorder_by, stats_df=raw))
                .sortWithinPartitions("bucket", "__z")
                .drop("__z")
            )
        out.write.mode("overwrite").options(**self.parquet_write_options()).partitionBy(
            "bucket"
        ).parquet(out_dir)
        replace: dict[int, list[str]] = {b: [] for b in todo}
        for entry in os.listdir(out_dir):
            if not entry.startswith("bucket="):
                continue
            b = int(entry.split("=", 1)[1])
            bdir = os.path.join(out_dir, entry)
            replace[b] = sorted(
                os.path.relpath(os.path.join(bdir, f), self.root)
                for f in os.listdir(bdir)
                if f.endswith(".parquet")
            )
        # compacted_from = the exact input files this pass resolved: a
        # commit that lands between our snapshot read and this commit may
        # have appended NEW segments to `todo` buckets — those survive as
        # residuals and the bucket stays dirty (concurrent-append safety)
        return self.commit(
            replace_bucket_files=replace,
            compacted_from={b: list(snap.buckets[b]) for b in todo},
            props={"compaction": True},
        )

    def compact_async(
        self,
        spark: SparkSession,
        max_segments: int = 8,
        files_per_bucket: int = 1,
        max_buckets: int | None = None,
        retain_tombstones: bool = True,
    ) -> bool:
        """Submit one compact() pass to the table's background worker and
        return immediately — the batch-apply loop stops paying the
        compaction jobs' driver submission gaps inside its measured window
        (they overlap the NEXT batch's scan/shuffle stages instead; at 32
        cores those gaps were a visible share of the residual per-batch
        serial cost). Safe because commit() is lock-serialized and the
        compaction commit replaces only its `compacted_from` inputs.

        One pass in flight at a time: if the previous pass is still
        running, this call is a no-op returning False (compaction is
        amortized — skipping a turn just leaves the work for the next
        call). A finished pass's error is re-raised here or in
        drain_compaction()."""
        if self._compact_future is not None:
            if not self._compact_future.done():
                return False
            self._compact_future.result()  # surface any error
        if self._compact_pool is None:
            self._compact_pool = ThreadPoolExecutor(
                max_workers=1, thread_name_prefix=f"compact-{os.path.basename(self.root)}"
            )
        self._compact_future = self._compact_pool.submit(
            self.compact, spark, max_segments, files_per_bucket, max_buckets,
            retain_tombstones,
        )
        return True

    def drain_compaction(self) -> int | None:
        """Wait for the in-flight async compaction (if any); returns its
        committed version (None if none ran/needed). Call at end-of-replay
        or before shutdown."""
        fut, self._compact_future = self._compact_future, None
        return fut.result() if fut is not None else None

    # ---------- exactly-once ledger ----------
    def batch_committed(self, job_id: str, batch_id: int) -> bool:
        """Has (job_id, batch_id) already been applied? O(1): the HEAD
        snapshot carries the committed-batch range set per job (contiguous
        replays collapse to a single [lo, hi] pair, so the manifest cost is
        O(gaps), not O(batches) — bounded over a 10^10-event replay)."""
        for lo, hi in self.snapshot().committed.get(job_id, []):
            if lo <= batch_id <= hi:
                return True
        return False

    def ledger_rows(self) -> list[dict[str, Any]]:
        """Flattened commit-manifest rows (one per partition per batch) —
        the lineage/metrics surface, mirroring the reference's checkpoint
        events (/root/reference/src/datachain/checkpoint_event.py:1-101)."""
        rows: list[dict[str, Any]] = []
        for v in self.versions():
            led = self.snapshot(v).ledger
            if not led:
                continue
            for p in led.get("partitions", []):
                rows.append(
                    {
                        "job_id": led["job_id"],
                        "batch_id": led["batch_id"],
                        "partition_id": p["partition_id"],
                        "high_watermark_lsn": p["high_watermark_lsn"],
                        "rows_in": led.get("rows_in", 0),
                        "rows_upserted": led.get("rows_upserted", 0),
                        "rows_deleted": led.get("rows_deleted", 0),
                        "committed_at": led.get("committed_at"),
                        "version": v,
                    }
                )
        return rows

    def ledger_df(self, spark: SparkSession) -> DataFrame:
        """The commit manifest as a queryable DataFrame (FIXTURES.md §3
        schema): one row per (batch, partition) with high-watermark LSN and
        lineage counts — the reference's checkpoint-events surface
        (/root/reference/src/datachain/checkpoint_event.py) as a table."""
        schema = T.StructType(
            [
                T.StructField("job_id", T.StringType(), False),
                T.StructField("batch_id", T.LongType(), False),
                T.StructField("partition_id", T.IntegerType(), False),
                T.StructField("high_watermark_lsn", T.LongType(), False),
                T.StructField("rows_in", T.LongType(), True),
                T.StructField("rows_upserted", T.LongType(), True),
                T.StructField("rows_deleted", T.LongType(), True),
                T.StructField("committed_at", T.TimestampType(), True),
                T.StructField("version", T.LongType(), False),
            ]
        )
        import datetime

        rows = []
        for r in self.ledger_rows():
            rows.append(
                (
                    r["job_id"],
                    int(r["batch_id"]),
                    int(r["partition_id"]),
                    int(r["high_watermark_lsn"]),
                    int(r["rows_in"]),
                    int(r["rows_upserted"]),
                    int(r["rows_deleted"]),
                    datetime.datetime.fromtimestamp(r["committed_at"], datetime.timezone.utc)
                    if r.get("committed_at")
                    else None,
                    int(r["version"]),
                )
            )
        return spark.createDataFrame(rows, schema)

    def remove_orphans(self, older_than: float = 3600.0) -> int:
        """Vacuum data files referenced by NO version manifest — the
        Iceberg `remove_orphan_files` analog. A crash after a segment or
        compaction write but before its manifest commit leaves a complete
        `job=*/batch=*` or `compact=*` directory that no snapshot
        references; `expire_versions` never touches those (it only deletes
        files referenced by dropped versions), so without this they
        accumulate forever.

        The unit of vacuuming is a WRITE UNIT directory (one
        `data/job=<j>/batch=<b>` segment dir or one `data/compact=<v>`
        dir): a unit is orphaned iff no file under it appears in any
        retained manifest. Units whose newest file is younger than
        `older_than` seconds are kept — they may belong to an in-flight
        write racing this vacuum (same safety window as Iceberg's
        `older_than`). Exception: an uncommitted segment dir that the
        crash-recovery fast path could still legitimately reuse
        (cdc/apply.py reuses a fully-written `job=/batch=` dir whose
        batch is NOT in the ledger) is also deleted once past the window —
        the retry recomputes it, which is always correct.

        Returns the number of files removed."""
        import shutil

        vs = self.versions()
        live = {
            p
            for v in vs
            for fl in self.snapshot(v).buckets.values()
            for p in fl
        }
        cutoff = time.time() - older_than
        units: list[str] = []
        data_root = self.data_dir()
        for entry in sorted(os.listdir(data_root)) if os.path.isdir(data_root) else []:
            full = os.path.join(data_root, entry)
            if not os.path.isdir(full):
                continue
            if entry.startswith("compact="):
                units.append(full)
            elif entry.startswith("job="):
                units.extend(
                    os.path.join(full, b)
                    for b in sorted(os.listdir(full))
                    if os.path.isdir(os.path.join(full, b))
                )
        removed = 0
        for unit in units:
            files = [
                os.path.join(dp, fn)
                for dp, _, fns in os.walk(unit)
                for fn in fns
            ]
            if any(os.path.relpath(f, self.root) in live for f in files):
                continue  # unit has committed data — never touch it
            try:
                newest = max((os.path.getmtime(f) for f in files), default=os.path.getmtime(unit))
            except FileNotFoundError:  # pragma: no cover - concurrent cleanup
                continue
            if newest > cutoff:
                continue  # possibly in-flight
            shutil.rmtree(unit, ignore_errors=True)
            removed += len(files)
        # prune now-empty job= parents
        for entry in sorted(os.listdir(data_root)) if os.path.isdir(data_root) else []:
            full = os.path.join(data_root, entry)
            if entry.startswith("job=") and os.path.isdir(full) and not os.listdir(full):
                try:
                    os.rmdir(full)
                except OSError:  # pragma: no cover
                    pass
        return removed

    def drop_version(self, version: int) -> int:
        """Remove ONE version's manifest plus any data files referenced by
        no surviving version (the reference's delete-a-dataset-version,
        lib/dc/datasets.py:307-383). Manifests are self-contained (each
        snapshot lists its full bucket file set), so dropping a mid-chain
        version never corrupts later ones; dropping HEAD rewinds the table
        to its parent. The last remaining version cannot be dropped —
        delete the dataset instead. Returns data files removed."""
        with self._commit_lock:
            vs = self.versions()
            if version not in vs:
                raise KeyError(f"version {version} not found in {self.root}")
            if len(vs) == 1:
                raise ValueError(
                    "cannot drop the only version; use delete_dataset(force=True)"
                )
            live = {
                p
                for v in vs
                if v != version
                for fl in self.snapshot(v).buckets.values()
                for p in fl
            }
            removed = 0
            for fl in self.snapshot(version).buckets.values():
                for p in fl:
                    if p not in live:
                        fp = os.path.join(self.root, p)
                        if os.path.exists(fp):
                            os.remove(fp)
                            removed += 1
            os.remove(self._manifest_path(version))
            self._snap_cache.pop(version, None)
            return removed

    def expire_versions(self, keep_last: int = 10) -> int:
        """Vacuum: drop manifests (and data files referenced by no kept
        version) older than the last `keep_last` versions. `keep_last` must
        be >= 1 — HEAD (and the files it references) is always retained."""
        if keep_last < 1:
            raise ValueError("expire_versions requires keep_last >= 1 (HEAD must survive)")
        vs = self.versions()
        drop = vs[:-keep_last]
        if not drop:
            return 0
        keep = vs[len(drop) :]
        live = {p for v in keep for fl in self.snapshot(v).buckets.values() for p in fl}
        removed = 0
        for v in drop:
            for fl in self.snapshot(v).buckets.values():
                for p in fl:
                    if p not in live:
                        fp = os.path.join(self.root, p)
                        if os.path.exists(fp):
                            os.remove(fp)
                            removed += 1
            os.remove(self._manifest_path(v))
            self._snap_cache.pop(v, None)
        return removed
