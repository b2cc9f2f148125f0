"""End-to-end integration: the docs/MIGRATION.md production flow.

Reference-style inputs on disk (transcripts parquet, ``token count``
lexicon text, metadata TSV) → readers → F1/F2 filters → correction
pipeline → checkpointed sink + exports; corrected text checked against
the oracle on the surviving turns."""

from __future__ import annotations

from pyspark.sql import functions as F

from memo_fraktur_ocr_code_spark.oracle.spec import correct_corpus
from memo_fraktur_ocr_code_spark.plans.checkpoint import (
    read_stage,
    run_stage_checkpointed,
)
from memo_fraktur_ocr_code_spark.plans.pipeline import correct_pipeline
from memo_fraktur_ocr_code_spark.sources import sinks
from memo_fraktur_ocr_code_spark.sources.fixtures import make_fixture
from memo_fraktur_ocr_code_spark.sources.readers import (
    read_freq_dictionary,
    read_metadata_tsv,
    read_transcripts,
)


def test_production_flow(spark, tmp_path):
    transcripts, alt_rows, lexicon = make_fixture(n_convs=6)
    conv_ids = sorted({r["conv_id"] for r in transcripts})

    # reference-style inputs on disk
    tpath = str(tmp_path / "transcripts")
    apath = str(tmp_path / "alt")
    spark.createDataFrame(
        transcripts,
        "conv_id string, turn_idx int, role string, text string,"
        " tool string, ts timestamp",
    ).write.parquet(tpath)
    spark.createDataFrame(
        alt_rows, "conv_id string, turn_idx int, text string"
    ).write.parquet(apath)
    lex_file = tmp_path / "unigrams.txt"
    lex_file.write_text("\n".join(f"{t} {c}" for t, c in lexicon))
    meta_file = tmp_path / "metadata.tsv"
    rows = ["conv_id\tnovel_start\tnovelstart_rescan\tnovel_end\tdiscard"]
    for i, cid in enumerate(conv_ids):
        # first conv discarded (F1); the rest keep turns 0..2 (F2)
        rows.append(f"{cid}\t0\t\t2\t{'1' if i == 0 else ''}")
    meta_file.write_text("\n".join(rows))

    # readers
    base = read_transcripts(spark, tpath)
    alt = read_transcripts(spark, apath)
    lex = [
        (r.token, r.freq)
        for r in read_freq_dictionary(spark, str(lex_file)).collect()
    ]
    meta = read_metadata_tsv(spark, str(meta_file))

    # F1 discard filter + F2 range filter (broadcast join)
    keep = meta.where(F.col("discard").isNull()).select(
        "conv_id", "realstart", "novel_end"
    )
    filtered = base.join(F.broadcast(keep), "conv_id").where(
        F.col("turn_idx").between(F.col("realstart"), F.col("novel_end"))
    ).select("conv_id", "turn_idx", "role", "text", "tool", "ts")

    corrected = correct_pipeline(spark, filtered, alt, lex)
    out_dir = str(tmp_path / "out")
    summary = run_stage_checkpointed(
        spark, corrected, out_dir, "corrected_turns", n_buckets=8
    )
    assert summary["buckets_completed"] >= 1

    got_df = read_stage(spark, out_dir, "corrected_turns")
    got = {
        (r.conv_id, r.turn_idx): r.corrected_text for r in got_df.collect()
    }
    # F1: discarded conv absent entirely; F2: only turns ≤ 2 survive
    assert not any(k[0] == conv_ids[0] for k in got)
    assert all(k[1] <= 2 for k in got)

    # oracle on exactly the surviving turns
    surviving = [
        r
        for r in transcripts
        if r["conv_id"] != conv_ids[0] and r["turn_idx"] <= 2
    ]
    surviving_alt = [
        r
        for r in alt_rows
        if r["conv_id"] != conv_ids[0] and r["turn_idx"] <= 2
    ]
    want = {
        (r["conv_id"], r["turn_idx"]): r["corrected_text"]
        for r in correct_corpus(surviving, surviving_alt, lexicon)
    }
    assert got == want

    # exports
    sinks.write_single_line(got_df, str(tmp_path / "singleline"))
    assert spark.read.parquet(str(tmp_path / "singleline")).count() == len(
        got
    )
