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


def test_curation_kill_and_resume_skips_finished_stages(
    spark, tmp_path, monkeypatch
):
    """Crash after the 'gated' stage, resume with --resume semantics:
    finished stages must NOT re-run their operators (asserted by
    poisoning them), the in-flight stage completes, and the funnel
    equals an uninterrupted run's (r5 — stage materialization through
    the checkpoint-manifest layer)."""
    import json

    import pytest
    from pyspark.sql import functions as F

    import memo_fraktur_ocr_code_spark.operators.curation as cur_mod
    import memo_fraktur_ocr_code_spark.operators.textstats as ts_mod
    from jobs.run_curation import curate

    texts = [
        (
            i,
            "Planted Common Header Line\n"
            + (
                "the quiet harbor town number %d keeps a long record of"
                " every ship that ever came to trade in salt and wool"
                " and the people there still read the old pages aloud"
                % i
            ),
        )
        for i in range(20)
    ]
    docs = spark.createDataFrame(texts, "doc_id bigint, text string")
    out_crash = str(tmp_path / "crash_run")
    out_fresh = str(tmp_path / "fresh_run")

    real_redact = cur_mod.redact_pii

    def boom(*a, **k):
        raise RuntimeError("injected crash")

    monkeypatch.setattr(cur_mod, "redact_pii", boom)
    with pytest.raises(RuntimeError, match="injected crash"):
        curate(spark, docs, out_crash, budget=100, n_shards=4)
    done = {
        r.stage
        for r in spark.read.parquet(
            f"{out_crash}/stages/_stages_done"
        ).collect()
    }
    assert done == {"cleaned", "gated"}

    # resume: stages 1-2 are read back, never recomputed — poison their
    # operators so any recompute fails loudly
    monkeypatch.setattr(cur_mod, "redact_pii", real_redact)
    monkeypatch.setattr(
        cur_mod,
        "strip_boilerplate_lines",
        lambda *a, **k: (_ for _ in ()).throw(
            AssertionError("stage 'cleaned' recomputed on resume")
        ),
    )
    monkeypatch.setattr(
        ts_mod,
        "quality_gate_verdict",
        lambda *a, **k: (_ for _ in ()).throw(
            AssertionError("stage 'gated' recomputed on resume")
        ),
    )
    resumed = curate(
        spark, docs, out_crash, budget=100, n_shards=4, resume=True
    )
    monkeypatch.undo()

    fresh = curate(spark, docs, out_fresh, budget=100, n_shards=4)
    assert resumed["funnel"] == fresh["funnel"]
    assert resumed["splits"] == fresh["splits"]
    assert resumed["total_tokens"] == fresh["total_tokens"]

    # resuming a DIFFERENT corpus — even one with identical row count
    # and total text length — must be refused, not silently mixed
    # (code-review r5: the completion markers carry a content-hashed
    # fingerprint)
    other = docs.select(
        "doc_id",
        F.regexp_replace("text", "harbor", "harbur").alias("text"),
    )
    with pytest.raises(ValueError, match="refusing to resume"):
        curate(spark, other, out_crash, budget=100, n_shards=4,
               resume=True)
    # the manifest carries per-bucket lineage for every stage
    m = spark.read.parquet(f"{out_crash}/stages/_manifest")
    stages_in_manifest = {
        r.stage for r in m.select("stage").distinct().collect()
    }
    assert {"cleaned", "gated", "exact", "near"} <= stages_in_manifest


def test_curation_span_dedup_stage_excises_planted_repeat_once(
    spark, tmp_path
):
    """The optional 4d span-excision stage (VERDICT r5 #2): a verbatim
    11-token phrase planted inside THREE otherwise window-unique
    documents (below the near-dup Jaccard threshold, so document dedup
    keeps all three) survives in exactly ONE output document — the
    canonical occurrence — and the funnel records the removed tokens.
    Bodies interleave the doc id every <=4 tokens so no organic 8-token
    window repeats across documents."""
    from jobs.run_curation import curate

    planted = "every ship that ever came to trade in salt and wool"
    texts = []
    for i in range(12):
        body = (
            f"the town {i} keeps a full record {i} of every boat {i}"
            f" that came to rest {i} near the old pier {i} while"
            f" people {i} read the long pages {i} aloud during"
            f" winter {i}"
        )
        if i in (2, 5, 9):
            body = body + " " + planted
        texts.append((i, body))
    docs = spark.createDataFrame(texts, "doc_id bigint, text string")
    out = str(tmp_path / "span_run")
    summary = curate(
        spark,
        docs,
        out,
        budget=200,
        n_shards=2,
        max_line_df=100,  # keep the boilerplate stage out of the way
        span_dedup_len=8,
    )
    f = summary["funnel"]
    n_planted = len(planted.split())
    assert f["span_tokens_removed"] == 2 * n_planted  # two later copies
    assert f["emptied_by_span_dedup"] == 0
    assert f["after_span_dedup"] == f["after_paragraph_dedup"]
    final = spark.read.parquet(f"{out}/curated")
    rows = {r.doc_id: r.text for r in final.collect()}
    assert set(rows) == set(range(12))
    carriers = [d for d in (2, 5, 9) if planted in rows[d]]
    assert carriers == [2]  # canonical = smallest (id, pos)
    # the excised docs keep their own words minus the repeat only
    assert "the long pages 5" in rows[5] and planted not in rows[5]
    # n_tokens describes the text that ships (shipped-text invariant)
    tok_rows = {
        r.doc_id: (r.n_tokens, len(r.text.split()))
        for r in final.select("doc_id", "n_tokens", "text").collect()
    }
    for d, (n, actual) in tok_rows.items():
        assert n == actual, (d, n, actual)
