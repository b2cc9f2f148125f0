"""Report rendering, dictionary building, pipeline edge cases."""

from __future__ import annotations

from pyspark.sql import functions as F

from memo_fraktur_ocr_code_spark.plans.dictionary import (
    build_bigram_dictionary,
    build_unigram_dictionary,
    write_dictionary_text,
)
from memo_fraktur_ocr_code_spark.plans.evaluate import evaluate_corrections
from memo_fraktur_ocr_code_spark.plans.report import param_str, render_report


def _df(spark, rows):
    return spark.createDataFrame(
        rows, "conv_id string, turn_idx int, text string"
    )


def test_render_report(spark):
    gold = _df(spark, [("c1", 0, "den gamle Mur")])
    base = _df(spark, [("c1", 0, "den gamlc Mur")])
    corr = _df(spark, [("c1", 0, "den gamle Mur")])
    rep = evaluate_corrections(spark, gold, base, corr)
    txt = render_report(rep, param_str())
    assert "kb_freqs10_correasy_corrhard_symwordcorr" in txt
    assert "Precision" in txt and "levcat" in txt
    assert "tp 1" in txt


def test_render_report_reference_parity(spark):
    """Golden check of the 2dp percentage mode (analyze_gold_vrt.py:
    196-200): breakdown shows round(pct, 2), not the engine's exact
    basis points."""
    from memo_fraktur_ocr_code_spark.plans.report import (
        with_reference_percentage,
    )

    gold = _df(spark, [("c1", 0, "den gamle Mur og en dag")])
    base = _df(spark, [("c1", 0, "den gamlc Mur og cn dag")])
    corr = _df(spark, [("c1", 0, "den gamle Mur og en dag")])
    rep = evaluate_corrections(spark, gold, base, corr)
    txt = render_report(rep, param_str(), reference_parity=True)
    assert "percentage" in txt and "pct_bp" not in txt
    # 4/6 match = 66.67 the reference way (2dp, not 6666 bp)
    assert "66.67" in txt
    # plain mode still exposes the exact bp column
    plain = render_report(rep, param_str())
    assert "pct_bp" in plain and "6666" in plain
    # direct golden check of the derived column
    bd = with_reference_percentage(rep["base_levcat_breakdown"])
    vals = {r.levcat: r.percentage for r in bd.collect()}
    assert vals["match"] == 66.67


def test_build_dictionaries_and_text_sink(spark, tmp_path):
    turns = _df(
        spark,
        [
            ("c1", 0, "den gamle mur\nden gamle dag"),
            ("c2", 0, "den nye dag"),
        ],
    )
    uni = {r.token: r.freq for r in build_unigram_dictionary(turns).collect()}
    assert uni["den"] == 3 and uni["gamle"] == 2
    bi = {
        (r.tok1, r.tok2): r.freq
        for r in build_bigram_dictionary(turns).collect()
    }
    assert bi[("den", "gamle")] == 2
    # bigrams never cross line boundaries (make_dictionary.py:47-53)
    assert ("mur", "den") not in bi
    p = str(tmp_path / "uni.txt")
    write_dictionary_text(build_unigram_dictionary(turns), p)
    lines = [r.value for r in spark.read.text(p).collect()]
    assert "den 3" in lines


def test_pipeline_edge_cases(spark):
    """Empty input, noise-only turns, unicode beyond the Danish range."""
    from memo_fraktur_ocr_code_spark.plans.pipeline import correct_pipeline

    lexicon = [("den", 100), ("gamle", 50)]
    empty = spark.createDataFrame(
        [], "conv_id string, turn_idx int, text string"
    )
    assert correct_pipeline(spark, empty, None, lexicon).count() == 0

    weird = spark.createDataFrame(
        [
            ("c1", 0, "—— * ð"),          # noise tokens only
            ("c1", 1, ""),                 # empty turn
            ("c1", 2, "héllo wörld 漢字"),  # out-of-range unicode passes through
            ("c1", 3, "a"),                # single short first line
        ],
        "conv_id string, turn_idx int, text string",
    )
    out = {
        r.turn_idx: r.corrected_text
        for r in correct_pipeline(spark, weird, None, lexicon).collect()
    }
    assert len(out) == 4
    assert "漢字" in out[2]
    # 'a' is eaten by the top-of-page page-number heuristic
    # (correct_ocr.py:398-405: first line matching \s*\w{1,3}\s*$)
    assert out[3] == ""
    assert out[0] == "—— * ð"  # noise tokens pass through untouched
