"""Row-level UDF checkpoint resume for long map/gen stages.

The reference resumes a crashed `.map()`/`.gen()` mid-stage, reprocessing
only input rows that have no persisted output yet (reference
query/dataset.py:1221-1360, 1439-1457; tests/func/checkpoints/
test_checkpoint_recovery.py:28-641 — partial UDF output tables keyed by
row). Spark's native recovery unit is the task, so a crashed *job* loses
everything since the last committed write; this module restores the
reference's behavior Spark-first:

- Every input row gets a deterministic content key (xxhash64 of the key
  columns, or of all input columns when none are given).
- The remaining work is processed in CHUNKS of ~`rows_per_commit` rows;
  each chunk is one distributed mapInPandas job whose output lands in its
  own `commit=<uuid>` parquet directory — the `_SUCCESS` marker is the
  atomic commit point, exactly like the CDC segment writes
  (cdc/apply.py:262-285).
- A chunk's files carry one row per OUTPUT row plus an explicit
  zero-output marker row per input key that produced nothing (`__n_out=0`)
  — so "processed" is recorded even for silent keys and a gen() that
  filters everything still resumes correctly.
- On rerun, done keys = the keys present in committed chunk dirs; the
  input is anti-joined against them and only the remainder runs. A crash
  between chunk jobs loses at most one uncommitted chunk (its dir has no
  `_SUCCESS` and is ignored and overwritten-safe: fresh uuid per attempt).

The store is namespaced by a fingerprint of (output schema, params, key
columns): changing the UDF signature starts a fresh checkpoint rather
than resuming into mismatched output (the reference hashes the UDF for
the same reason).

Key semantics: the checkpoint key IDENTIFIES A UNIT OF WORK. Input rows
that are duplicates under the key are processed ONCE and (for map) each
receives the single stored output — the key columns must therefore
functionally determine the UDF's inputs (trivially true for the default
all-columns key; an explicit `checkpoint_on` that does not is a caller
contract violation, same as the reference's row-id keys). The key is a
64-bit xxhash64: at multi-billion-row scale hash collisions silently
merge two distinct work units (~6e-8 collision odds at 1e9 distinct
keys) — pass an explicit unique-id column as `checkpoint_on` when exact
identity matters at that scale. Both the UDF and everything upstream of
it must be deterministic (resume re-derives keys from the source).

Scale shape: the driver loop is over CHUNK JOBS, never rows; every step —
key hashing, anti-join, UDF, commit write — is a distributed DataFrame
op. The anti-join shuffles only key hashes (8 bytes/row); chunk selection
is a pmod filter on the same hash, so resume cost is O(remaining), not
O(done). The keyed input and the remaining set are persist()ed for the
duration of the chunk loop, so the source is scanned once — not once per
chunk (500 rescans of a 100M-row input at the default chunk size
otherwise). A best-effort pid lockfile in the namespace refuses
concurrent resumes of the same store (two resumers would run the same
chunks twice; results would still dedupe by key, but the work and the
commit dirs would not).
"""

from __future__ import annotations

import hashlib
import json
import math
import os
import time
import uuid
from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

KEY_COL = "__ckpt_key"
NOUT_COL = "__n_out"


def _fingerprint(out_schema: T.StructType, use: list[str], key_cols: list[str]) -> str:
    blob = json.dumps(
        {"schema": out_schema.jsonValue(), "params": use, "keys": key_cols}, sort_keys=True
    )
    return hashlib.md5(blob.encode()).hexdigest()[:16]


def _committed_dirs(store_ns: str) -> list[str]:
    if not os.path.isdir(store_ns):
        return []
    return sorted(
        os.path.join(store_ns, d)
        for d in os.listdir(store_ns)
        if d.startswith("commit=")
        and os.path.exists(os.path.join(store_ns, d, "_SUCCESS"))
    )


class CheckpointLockedError(RuntimeError):
    """Another live process is resuming this checkpoint namespace."""


class _NamespaceLock:
    """Best-effort single-resumer guard: an O_EXCL pid lockfile in the
    namespace dir. A lock owned by a DEAD pid is stale and taken over
    (crash-safe); a live owner raises — two concurrent resumers would
    each run the full chunk schedule (duplicate work + orphan commit
    dirs, even though reads dedupe by key)."""

    def __init__(self, ns: str):
        self.path = os.path.join(ns, ".resume_lock")
        self.held = False

    @staticmethod
    def _alive(pid: int) -> bool:
        try:
            os.kill(pid, 0)
        except ProcessLookupError:
            return False
        except PermissionError:
            return True  # exists, owned by someone else
        return True

    def acquire(self) -> None:
        # claim = os.link(tmp-with-pid, lockfile): atomic AND the lockfile
        # is never visible without its pid content (an O_EXCL create +
        # separate write leaves a window where a racer reads an empty file
        # and mistakes a live lock for stale)
        tmp = f"{self.path}.pid.{os.getpid()}.{time.time_ns()}"
        with open(tmp, "w") as fh:
            fh.write(str(os.getpid()))
            fh.flush()
            os.fsync(fh.fileno())
        try:
            for _ in range(3):  # retries after stale-lock takeover races
                try:
                    os.link(tmp, self.path)
                    self.held = True
                    return
                except FileExistsError:
                    pass
                try:
                    with open(self.path) as fh:
                        owner = int(fh.read().strip() or "-1")
                except FileNotFoundError:
                    continue  # holder released between link and read — retry
                except (OSError, ValueError):
                    owner = -1
                if owner > 0 and self._alive(owner):
                    raise CheckpointLockedError(
                        f"checkpoint namespace is being resumed by live pid {owner} "
                        f"({self.path}); concurrent resumes of one store duplicate work"
                    ) from None
                # stale: owner is dead. Take over via rename-aside CAS —
                # exactly ONE racer's rename succeeds, so no racer can
                # os.remove() a fresh lock another racer just created
                # (the unlink-based takeover had exactly that hole).
                aside = f"{self.path}.stale.{os.getpid()}.{time.time_ns()}"
                try:
                    os.rename(self.path, aside)
                except FileNotFoundError:
                    continue  # lost the CAS — retry against the new holder
                # the rename applies to whatever file is there NOW, which
                # may be a FRESH lock claimed since we read the dead owner
                # (observed as a flaky two-holders test): re-verify the
                # renamed file. A live pid means we stole a live lock —
                # restore it by link (same inode, holder unaffected) and
                # refuse. Residual window: a third contender claiming
                # between our rename and the restore link orphans the
                # restored holder — three live racers inside microseconds,
                # accepted for a best-effort guard (documented).
                try:
                    with open(aside) as fh:
                        owner2 = int(fh.read().strip() or "-1")
                except (OSError, ValueError):
                    owner2 = -1
                if owner2 > 0 and owner2 != os.getpid() and self._alive(owner2):
                    try:
                        os.link(aside, self.path)
                    except FileExistsError:
                        pass
                    os.remove(aside)
                    raise CheckpointLockedError(
                        f"checkpoint namespace is being resumed by live pid "
                        f"{owner2} ({self.path}); lost the takeover race"
                    ) from None
                os.remove(aside)
            raise CheckpointLockedError(f"could not acquire {self.path}")
        finally:
            try:
                os.remove(tmp)
            except FileNotFoundError:  # pragma: no cover
                pass

    def release(self) -> None:
        if self.held:
            try:
                os.remove(self.path)
            except FileNotFoundError:
                pass
            self.held = False


def checkpointed_udf(
    df: DataFrame,
    fn: Callable,
    row_adapter: Callable,
    out_struct: T.StructType,
    store: str,
    use: list[str],
    key_cols: list[str] | None = None,
    rows_per_commit: int = 200_000,
    is_gen: bool = False,
) -> DataFrame:
    """Run a per-row UDF with row-level resume; returns the output rows
    (map: out columns appended to the input via a KEY join; gen: out
    columns only). `fn` is the user callable/Mapper (setup()/teardown()
    honored once per worker via Lifecycle); `row_adapter(proc, row_tuple)
    -> list[tuple]` yields the schema-ordered output tuples for one row."""
    import pandas as pd

    from datachain_spark.udf import Lifecycle

    spark = df.sparkSession
    keys = list(key_cols) if key_cols else list(df.columns)
    keyed = df.withColumn(KEY_COL, F.xxhash64(*[F.col(c) for c in keys]))
    ns = os.path.join(store, _fingerprint(out_struct, use, keys))
    os.makedirs(ns, exist_ok=True)

    store_schema = T.StructType(
        [T.StructField(KEY_COL, T.LongType(), False)]
        + [T.StructField(f.name, f.dataType, True) for f in out_struct.fields]
        + [T.StructField(NOUT_COL, T.IntegerType(), False)]
    )
    out_names = [f.name for f in out_struct.fields]

    def load_store() -> DataFrame:
        dirs = _committed_dirs(ns)
        if not dirs:
            return spark.createDataFrame([], store_schema)
        return spark.read.schema(store_schema).parquet(*dirs)

    done = load_store().select(KEY_COL).distinct()
    # duplicates under the key are ONE unit of work (see module docstring):
    # process each key once, whichever duplicate row carries it
    remaining = keyed.join(done, KEY_COL, "left_anti").dropDuplicates([KEY_COL])
    # persist for the chunk loop: the source is scanned ONCE, not once per
    # chunk job (and a non-deterministic upstream can't shift keys mid-loop);
    # the count below materializes the cache and decides the chunking
    remaining = remaining.persist()
    try:
        _run_chunks(remaining, fn, row_adapter, out_struct, ns, use, rows_per_commit)
    finally:
        # unpersist on EVERY exit — a CheckpointLockedError or a failed
        # chunk job must not leak the cached DataFrame for the session
        remaining.unpersist()

    produced = load_store().filter(F.col(NOUT_COL) > 0).drop(NOUT_COL)
    # only this input's keys (the store may hold more from wider past runs)
    produced = produced.join(keyed.select(KEY_COL).distinct(), KEY_COL, "left_semi")
    if is_gen:
        return produced.drop(KEY_COL)
    # map (1:1): ONE stored output per key — duplicate input rows under the
    # key were processed once (above) and a fn rerun of the same key (crash
    # replay of an uncommitted chunk) wrote identical rows, so keeping one
    # is exact; without this, K input duplicates joining K stored copies
    # inflated the output K^2-fold
    produced = produced.dropDuplicates([KEY_COL])
    # output columns overwrite same-named input columns (matching the
    # non-checkpoint mapInPandas path, where pdf[name] = ... replaces)
    collide = [c for c in keyed.columns if c != KEY_COL and c in set(out_names)]
    return keyed.drop(*collide).join(produced, KEY_COL, "inner").drop(KEY_COL)


def _run_chunks(
    remaining: DataFrame,
    fn: Callable,
    row_adapter: Callable,
    out_struct: T.StructType,
    ns: str,
    use: list[str],
    rows_per_commit: int,
) -> None:
    """The locked chunk loop: count the remainder, acquire the namespace
    lock, run one mapInPandas commit job per chunk."""
    import pandas as pd

    from datachain_spark.udf import Lifecycle

    out_names = [f.name for f in out_struct.fields]
    store_schema = T.StructType(
        [T.StructField(KEY_COL, T.LongType(), False)]
        + [T.StructField(f.name, f.dataType, True) for f in out_struct.fields]
        + [T.StructField(NOUT_COL, T.IntegerType(), False)]
    )
    n_remaining = remaining.count()
    lock = _NamespaceLock(ns)
    if n_remaining:
        lock.acquire()
        n_chunks = max(1, math.ceil(n_remaining / rows_per_commit))

        def make_runner():
            def run(batches):
                with Lifecycle(fn) as proc:
                    for pdf in batches:
                        rows = []
                        key_vals = pdf[KEY_COL]
                        for i, row in enumerate(
                            pdf[use].itertuples(index=False, name=None)
                        ):
                            outs = row_adapter(proc, row)
                            if outs:
                                for o in outs:
                                    rows.append((int(key_vals.iloc[i]), *o, len(outs)))
                            else:
                                # explicit zero-output marker: the key is DONE
                                rows.append(
                                    (int(key_vals.iloc[i]), *([None] * len(out_names)), 0)
                                )
                        yield pd.DataFrame(
                            rows, columns=[KEY_COL, *out_names, NOUT_COL]
                        )

            return run

        try:
            for i in range(n_chunks):
                chunk = remaining.filter(F.pmod(F.col(KEY_COL), F.lit(n_chunks)) == i)
                out_rows = chunk.mapInPandas(make_runner(), store_schema)
                commit_dir = os.path.join(ns, f"commit={uuid.uuid4().hex[:12]}")
                # parquet job commit (_SUCCESS) is the atomic checkpoint point
                out_rows.write.mode("overwrite").parquet(commit_dir)
        finally:
            lock.release()
