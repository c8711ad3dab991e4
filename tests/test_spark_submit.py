"""Deployment-contract test: the real `spark-submit --py-files` path.

The north rule mandates the engine run via `spark-submit --py-files` on a
cluster; this drives the ACTUAL deployment artifact — tools/package.py's
zip + tools/submit_replay.py — in a separate JVM/Python process with the
repo scrubbed from PYTHONPATH (so only the shipped zip can supply the
package), then asserts the job's order-independent state fingerprint
equals the single-threaded oracle's.
"""

import json
import os
import shutil
import subprocess
import sys

from pyspark.sql import functions as F

from datachain_spark.cdc.feed import FeedSpec, write_feed
from datachain_spark.cdc.normalize import normalize_text
from datachain_spark.cdc.oracle import oracle_replay

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _spark_submit() -> str:
    found = shutil.which("spark-submit")
    if found:
        return found
    import pyspark

    return os.path.join(pyspark.__path__[0], "bin", "spark-submit")


def test_spark_submit_py_files_replay_matches_oracle(spark, tmp_path):
    spec = FeedSpec(n_convs=12, hot_every=1000, hot_base=30, batch_size=150)
    feed = str(tmp_path / "feed")
    table = str(tmp_path / "table")
    write_feed(spark, spec, feed, files_per_batch=4)

    zip_path = str(tmp_path / "datachain_spark.zip")
    subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "package.py"), zip_path],
        check=True,
        capture_output=True,
    )

    env = dict(os.environ)
    env.pop("PYTHONPATH", None)  # the zip, not the checkout, must supply the package
    env["PYSPARK_PYTHON"] = sys.executable
    env["PYSPARK_DRIVER_PYTHON"] = sys.executable
    proc = subprocess.run(
        [
            _spark_submit(),
            "--master", "local[4]",
            "--conf", "spark.sql.shuffle.partitions=8",
            "--conf", "spark.ui.enabled=false",
            "--py-files", zip_path,
            os.path.join(REPO, "tools", "submit_replay.py"),
            "--feed", feed,
            "--table", table,
        ],
        env=env,
        capture_output=True,
        text=True,
        cwd=str(tmp_path),  # not the repo root: cwd imports must not leak in
        timeout=600,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    summary = json.loads(
        [ln for ln in proc.stdout.splitlines() if ln.startswith("{")][-1]
    )
    assert summary["applied"] == summary["batches"] > 0
    assert summary["skipped"] == 0

    # oracle fingerprint computed with the same commutative hash
    oracle = oracle_replay(spec)
    exp = spark.createDataFrame(
        [(o[0], o[1], o[2], normalize_text(o[3]), o[4]) for o in oracle],
        "conv_id string, turn_idx int, role string, text string, tool string",
    )
    h = F.xxhash64(
        *[
            F.coalesce(F.col(c).cast("string"), F.lit("∅"))
            for c in ["conv_id", "turn_idx", "role", "text", "tool"]
        ]
    )
    row = exp.agg(
        F.count(F.lit(1)).alias("rows"),
        F.sum(h.cast("decimal(38,0)")).alias("hash"),
    ).first()
    assert summary["rows"] == int(row["rows"])
    assert summary["state_hash"] == int(row["hash"])
