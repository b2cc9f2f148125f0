"""End-to-end transcript curation job (jobs/run_transcript_curation.py):
turns in, rendered documents + SFT pairs out, with per-stage funnel
accounting.  The demo plants one defect per stage (assistant-first
conversation, timestamp gap, canned banner, shared prefix, over-budget
conversations) and asserts each stage fired."""

from __future__ import annotations

import datetime


def test_transcript_job_demo(spark, tmp_path):
    from jobs.run_transcript_curation import _demo

    summary = _demo(str(tmp_path / "tc"))
    f = summary["funnel"]
    assert f["final_convs"] <= f["sessions_after_prefix_dedup"]
    assert f["final_turns"] >= f["final_convs"]
    assert summary["total_tokens"] > 0
    assert summary["total_rendered_chars"] > 0


def _mk_turns(spark, suffix: str = ""):
    t0 = datetime.datetime(2023, 11, 14, 22, 13, 20)
    rows = []
    for c in range(12):
        for i in range(4):
            rows.append(
                (
                    f"rc{c}",
                    i,
                    "user" if i % 2 == 0 else "assistant",
                    f"turn {i} of conversation {c} body{suffix} "
                    + "word " * (c + 2),
                    None,
                    t0 + datetime.timedelta(minutes=i),
                )
            )
    return spark.createDataFrame(
        rows,
        "conv_id string, turn_idx int, role string, text string,"
        " tool string, ts timestamp",
    )


def test_transcript_kill_and_resume_skips_finished_stages(
    spark, tmp_path, monkeypatch
):
    """Crash in the 'final_turns' stage build, resume: the 'sessioned'
    stage must NOT re-run (poisoned operator would fail loudly), the
    funnel equals an uninterrupted run's, and resuming a different
    corpus is refused."""
    import pytest
    from pyspark.sql import functions as F

    import memo_fraktur_ocr_code_spark.operators.transcripts as tr_mod
    from jobs.run_transcript_curation import curate_transcripts

    turns = _mk_turns(spark)
    out_crash = str(tmp_path / "crash_run")
    out_fresh = str(tmp_path / "fresh_run")

    real_trunc = tr_mod.truncate_to_token_budget

    def boom(*a, **k):
        raise RuntimeError("injected crash")

    monkeypatch.setattr(tr_mod, "truncate_to_token_budget", boom)
    with pytest.raises(RuntimeError, match="injected crash"):
        curate_transcripts(
            spark, turns, out_crash, budget=8, n_ckpt_buckets=4
        )
    done = {
        r.stage
        for r in spark.read.parquet(
            f"{out_crash}/stages/_stages_done"
        ).collect()
    }
    assert done == {"sessioned", "keepers", "clean_turns"}

    # resume: finished stages are read back, never recomputed
    monkeypatch.setattr(tr_mod, "truncate_to_token_budget", real_trunc)
    for poisoned in (
        "split_sessions",
        "conversation_prefix_groups",
        "flag_boilerplate_turns",
    ):
        monkeypatch.setattr(
            tr_mod,
            poisoned,
            lambda *a, **k: (_ for _ in ()).throw(
                AssertionError("finished stage recomputed on resume")
            ),
        )
    resumed = curate_transcripts(
        spark, turns, out_crash, budget=8, n_ckpt_buckets=4,
        resume=True,
    )
    monkeypatch.undo()

    fresh = curate_transcripts(
        spark, turns, out_fresh, budget=8, n_ckpt_buckets=4
    )
    assert resumed["funnel"] == fresh["funnel"]
    assert resumed["total_tokens"] == fresh["total_tokens"]

    # a content edit that preserves row count must refuse to resume
    other = turns.withColumn(
        "text", F.regexp_replace("text", "body", "bodi")
    )
    with pytest.raises(ValueError, match="refusing to resume"):
        curate_transcripts(
            spark, other, out_crash, budget=8, n_ckpt_buckets=4,
            resume=True,
        )

    # ...and so must a parameter change that alters a checkpointed
    # stage's output (the budget drives the final_turns stage)
    with pytest.raises(ValueError, match="refusing to resume"):
        curate_transcripts(
            spark, turns, out_crash, budget=99, n_ckpt_buckets=4,
            resume=True,
        )

    # budget respected in the shipped turn table
    worst = (
        spark.read.parquet(f"{out_fresh}/turns")
        .groupBy("conv_id")
        .agg(F.sum("n_tokens").alias("t"))
        .agg(F.max("t"))
        .collect()[0][0]
    )
    assert worst <= 8, worst
