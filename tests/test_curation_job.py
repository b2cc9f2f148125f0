"""End-to-end curation pipeline job (jobs/run_curation.py): documents
in, training shards out, with per-stage funnel accounting.  The demo
plants a gate-passing duplicate pair and a benchmark leak and asserts
each stage fired (membership checks on the final output, robust to
organic duplicates in the fixture corpus)."""

from __future__ import annotations


def test_curation_job_demo(spark, tmp_path):
    from jobs.run_curation import _demo

    summary = _demo(str(tmp_path / "cur"))
    f = summary["funnel"]
    assert f["final"] > 0
    assert f["final"] <= f["input"]
    assert summary["splits"].get("train", 0) > summary["splits"].get(
        "val", 0
    )
    assert summary["total_tokens"] > 0
