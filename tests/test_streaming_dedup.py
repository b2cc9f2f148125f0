"""The streaming delta-LSH dedup job's demo IS its acceptance test:
planted near/exact duplicates in every relationship (batch-internal,
vs-established near, vs-established exact), replay-idempotent per-batch
sinks, index growth accounting, and the streaming-equals-batch replay
equivalence."""

import os
import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)


def test_streaming_dedup_demo(tmp_path):
    from jobs.run_streaming_dedup import _demo

    summary = _demo(str(tmp_path / "wd"))
    assert summary == {
        "docs_in": 8,
        "docs_kept": 5,
        "docs_dropped": 3,
        "batches": 3,
        "demo_checks": "ok",
    }
