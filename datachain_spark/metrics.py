"""User job metrics (reference src/datachain/query/metrics.py:1-26).

`set`/`get` maintain a per-process metrics dict; when the process runs
under a job id ($DATACHAIN_SPARK_JOB_ID), every set() also persists the
full dict atomically to `<catalog>/jobs/<job_id>.json` — the analog of
the reference's metastore.update_job(job_id, metrics=...), readable by
any monitor without a database.
"""

from __future__ import annotations

import json
import os
import tempfile

JOB_ID_ENV = "DATACHAIN_SPARK_JOB_ID"

metrics: dict[str, str | int | float | bool | None] = {}


def set(key: str, value: str | int | float | bool | None) -> None:  # noqa: A001 - reference API name
    """Set a metric value (reference metrics.py:6-20: string non-empty
    keys; scalar values only)."""
    if not isinstance(key, str):
        raise TypeError("Key must be a string")
    if not key:
        raise ValueError("Key must not be empty")
    if not isinstance(value, (str, int, float, bool, type(None))):
        raise TypeError("Value must be a string, int, float or bool")
    metrics[key] = value
    job_id = os.getenv(JOB_ID_ENV)
    if job_id:
        from datachain_spark.chain import DEFAULT_CATALOG

        jobs_dir = os.path.join(DEFAULT_CATALOG, "jobs")
        os.makedirs(jobs_dir, exist_ok=True)
        path = os.path.join(jobs_dir, f"{job_id}.json")
        fd, tmp = tempfile.mkstemp(dir=jobs_dir)
        with os.fdopen(fd, "w") as f:
            json.dump(metrics, f)
        os.replace(tmp, path)


def get(key: str) -> str | int | float | bool | None:
    """Get a metric value (KeyError when unset, like the reference)."""
    return metrics[key]
