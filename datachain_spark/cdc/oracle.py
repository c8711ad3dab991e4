"""Naive single-threaded reference replay — the correctness oracle.

FIXTURES.md §4: apply I/U as put, D as delete, last writer by (ts, lsn)
wins; duplicate deliveries (same lsn, later batch) must not override newer
state, so tombstones retain their lsn. This is the same golden-comparison
style as the reference's delta tests
(/root/reference/tests/func/test_delta.py:40-102), extended with deletes.
"""

from __future__ import annotations

from datachain_spark.cdc.feed import FeedSpec, gen_events_py


def oracle_replay(spec: FeedSpec, upto_batch: int | None = None) -> list[tuple]:
    """Final transcripts state as sorted rows
    (conv_id, turn_idx, role, text, tool) — ts omitted because it is
    derived 1:1 from the winning lsn and checked implicitly via LWW."""
    state: dict[tuple, tuple[int, dict | None]] = {}
    for e in gen_events_py(spec):
        if upto_batch is not None and e["batch_id"] > upto_batch:
            continue
        key = (e["conv_id"], e["turn_idx"])
        prev = state.get(key)
        if prev is not None and prev[0] >= e["lsn"]:
            continue  # stale duplicate delivery
        state[key] = (e["lsn"], None if e["op"] == "D" else e)
    rows = [
        (k[0], k[1], v[1]["role"], v[1]["text"], v[1]["tool"])
        for k, v in state.items()
        if v[1] is not None
    ]
    rows.sort(key=lambda r: (r[0], r[1]))
    return rows
