"""End-to-end streaming demo job (jobs/run_streaming.py, VERDICT r3
item 6): drives stateful assembly + streaming dedup through real
writeStream queries with checkpoints and asserts the job's own
contracts — bounded state, dedup exactness, spec-oracle equality of the
final corrected view."""

from __future__ import annotations


def test_streaming_job_demo(spark, tmp_path):
    # the demo builds its own SparkSession via get_spark(); under pytest
    # that returns the active session, so tmp isolation works
    from jobs.run_streaming import _demo

    summary = _demo(str(tmp_path / "demo"))
    assert summary["oracle_equal"] is True
    assert summary["corrected_turns"] == 54
    assert summary["deduped_rows"] == 53  # one planted exact duplicate
    # cross-micro-batch statefulness actually exercised
    assert summary["micro_batches"] > 3
    assert summary["emissions"] > summary["corrected_turns"]
    # bounded state: one row per live conversation
    assert summary["corrected_query"]["state_rows"] <= 7


def test_streaming_job_empty_feed_reports_zero_work(spark, tmp_path):
    """A first cron drain over an empty feed must report zero work, not
    crash: the parquet streaming sink creates its dir (with an empty
    _spark_metadata) at query start even when no batch commits, so a
    directory probe passes while the read fails — the summary must
    catch the unreadable-sink case (code-review r4, reproduced live)."""
    from jobs.run_streaming import run

    src = str(tmp_path / "src")
    spark.createDataFrame(
        [], "conv_id string, turn_idx int, text string, ts timestamp"
    ).write.parquet(src)
    s = run(spark, src, [("hus", 10)], str(tmp_path / "out"))
    assert s["corrected_turns"] == 0
    assert s["emissions"] == 0
    assert s["deduped_rows"] == 0


def test_streaming_job_live_feed_bounded_state(spark, tmp_path):
    """r5 (VERDICT r4 item 8): the long-running-stream shape — a
    background writer lands files WHILE the queries run on a
    processingTime trigger.  The demo itself asserts ≥3 live
    data-carrying micro-batches, per-progress bounded state, cross-
    micro-batch dedup of a late duplicate, and spec-oracle equality;
    here we pin the headline numbers."""
    from jobs.run_streaming import _demo_live

    summary = _demo_live(str(tmp_path / "live"))
    assert summary["oracle_equal"] is True
    assert summary["data_batches"] >= 3
    assert summary["corrected_turns"] == 54
    assert summary["deduped_rows"] == 53
    # the state series never exceeds the live-conversation count and
    # actually grew as conversations appeared (statefulness exercised)
    assert max(summary["state_rows_series"]) <= 7
    assert summary["state_rows_series"][0] < max(
        summary["state_rows_series"]
    )
