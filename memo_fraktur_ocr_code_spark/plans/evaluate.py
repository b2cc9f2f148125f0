"""Evaluation harness plan — the reference's gold-standard analysis
(evalocr/analyze_gold_vrt.py:42-103 + annotate_gold_vrt.py:53-66)
re-expressed as one Spark job graph.

Inputs: per-turn gold text, base-OCR text and corrected text tables
``(conv_id, turn_idx, text)``.  Stages:

1. token-align each OCR channel onto the gold token stream per turn
   (align_b_to_a kernel — the reference aligns per page, J1);
2. diff measures per aligned pair (E6-E8) + freqlist membership (J5);
3. category/opcode breakdowns (A4/A7), per-conv rollups (A5),
   confusion classification + precision/recall/F1 (A6), error listings
   (A8), same-char aggregates (A9).

Everything after the alignment kernel is pure Catalyst; the final report
tables are tiny and safe to ``toPandas()``.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from memo_fraktur_ocr_code_spark.functions.alignment import align_b_to_a
from memo_fraktur_ocr_code_spark.functions.textspec import (
    strip_gold_hyphen_markers,
    tokenize,
)
from memo_fraktur_ocr_code_spark.operators import aggregates as agg
from memo_fraktur_ocr_code_spark.operators.annotate import (
    add_in_freqlist,
    annotate_pair_measures,
)

_ALIGN_SCHEMA = (
    "conv_id string, turn_idx int, word_idx int, token string, "
    "ocrtok string"
)


def aligned_token_pairs(
    gold: DataFrame, ocr: DataFrame, label: str = "ocrtok"
) -> DataFrame:
    """Per-turn alignment of an OCR channel onto the gold token stream
    (J1, align_ocr.py:72-89): equi-join the channels on (conv_id,
    turn_idx), run the alignment kernel per row batch, explode to one row
    per gold token with its aligned OCR bucket.  Long aligned tokens are
    truncated per the reference hack (add_vrt_annotations.py:290-291)."""
    joined = gold.select(
        "conv_id", "turn_idx", F.col("text").alias("gold_text")
    ).join(
        ocr.select("conv_id", "turn_idx", F.col("text").alias("ocr_text")),
        ["conv_id", "turn_idx"],
        "left",
    )

    def kernel(batches):
        for pdf in batches:
            conv, turn, widx, toks, ocrs = [], [], [], [], []
            for cid, ti, g, o in zip(
                pdf["conv_id"], pdf["turn_idx"],
                pdf["gold_text"], pdf["ocr_text"],
            ):
                g = strip_gold_hyphen_markers(g) if isinstance(g, str) else ""
                gtoks = tuple(tokenize(g))
                if not gtoks:
                    continue
                otoks = tuple(
                    tokenize(o) if isinstance(o, str) else ()
                )
                aligned = align_b_to_a(gtoks, otoks)
                aligned = [
                    t if len(t) < 100 else t[:30] + "..." for t in aligned
                ]
                for i, (gt, ot) in enumerate(zip(gtoks, aligned)):
                    conv.append(cid)
                    turn.append(ti)
                    widx.append(i + 1)
                    toks.append(gt)
                    ocrs.append(ot)
            yield pd.DataFrame(
                {
                    "conv_id": conv,
                    "turn_idx": pd.array(turn, dtype="int32"),
                    "word_idx": pd.array(widx, dtype="int32"),
                    "token": toks,
                    "ocrtok": ocrs,
                }
            )

    return joined.mapInPandas(kernel, schema=_ALIGN_SCHEMA)


def evaluate_corrections(
    spark: SparkSession,
    gold: DataFrame,
    base_ocr: DataFrame,
    corrected: DataFrame,
    freqlist_forms=None,
) -> dict[str, DataFrame]:
    """Full evaluation report as named DataFrames (lazy until read).

    The two aligned-pair tables are cached: every report table roots in
    them, and without the cache each of render_report's ~9 collects
    re-runs the Python alignment kernels over the full corpus from
    scratch (ADVICE r3) — an order of magnitude of wasted kernel work."""
    base_pairs = aligned_token_pairs(gold, base_ocr).cache()
    corr_pairs = aligned_token_pairs(gold, corrected).cache()

    base_ann = annotate_pair_measures(base_pairs)
    corr_ann = annotate_pair_measures(corr_pairs)
    if freqlist_forms is not None:
        bc = spark.sparkContext.broadcast(frozenset(freqlist_forms))
        base_ann = add_in_freqlist(base_ann, bc, token_col="ocrtok")
        corr_ann = add_in_freqlist(corr_ann, bc, token_col="ocrtok")

    triple = base_pairs.select(
        "conv_id", "turn_idx", "word_idx", "token",
        F.col("ocrtok").alias("base_ocrtok"),
    ).join(
        corr_pairs.select(
            "conv_id", "turn_idx", "word_idx",
            F.col("ocrtok").alias("corr_ocrtok"),
        ),
        ["conv_id", "turn_idx", "word_idx"],
    )
    categorized = agg.confusion_categories(triple)

    return {
        # the cached roots are exposed so release_evaluation() can
        # unpersist them once the report is rendered — otherwise two
        # full aligned-pair tables stay pinned in executor storage for
        # the rest of the session (ADVICE r3)
        "base_pairs": base_pairs,
        "corr_pairs": corr_pairs,
        "base_annotated": base_ann,
        "corr_annotated": corr_ann,
        "base_levcat_breakdown": agg.freq_breakdown(base_ann, "levcat"),
        "corr_levcat_breakdown": agg.freq_breakdown(corr_ann, "levcat"),
        "corr_opcode_breakdown": agg.opcode_breakdown(corr_ann),
        "per_conv_quality": agg.novel_quality_rollup(corr_ann),
        "confusion": categorized,
        "precision_recall_f1": agg.precision_recall_f1(categorized),
        "error_cases": agg.error_cases(corr_ann),
        "same_char_aggregates": agg.same_char_aggregates(corr_ann),
        # deterministic order: these feed render_report's limit(50) —
        # unordered limit picks whichever partitions answer first and
        # the rendered report would differ between identical runs
        # (ADVICE r3)
        "missed_errors": categorized.where(
            F.col("finecategory") == "FalseNegMiss"
        ).orderBy("conv_id", "turn_idx", "word_idx"),
        "new_errors": categorized.where(
            F.col("finecategory") == "FalseNegWrong"
        ).orderBy("conv_id", "turn_idx", "word_idx"),
        "bad_corrections": categorized.where(
            F.col("finecategory") == "FalsePos"
        ).orderBy("conv_id", "turn_idx", "word_idx"),
    }


def release_evaluation(reports: dict[str, DataFrame]) -> None:
    """Unpersist the cached aligned-pair roots of an
    ``evaluate_corrections`` result — call after the report is rendered
    so repeated evaluations don't accumulate pinned caches."""
    for k in ("base_pairs", "corr_pairs"):
        df = reports.get(k)
        if df is not None:
            df.unpersist()


def match_rate(pairs_annotated: DataFrame) -> float:
    """Token match rate (the reference's headline accuracy metric,
    README.md:616-629)."""
    row = pairs_annotated.select(
        (
            F.sum(F.when(F.col("levcat") == "match", 1).otherwise(0))
            / F.count("*")
        ).alias("rate")
    ).collect()[0]
    return float(row["rate"])


def word_error_rate(pairs_annotated: DataFrame) -> float:
    """WER over aligned token buckets: share of gold tokens whose aligned
    OCR bucket differs (substitutions, splits and junk-folds all count —
    insertions/deletions are absorbed into buckets by align_b_to_a)."""
    row = pairs_annotated.select(
        (
            F.sum(F.when(F.col("levcat") != "match", 1).otherwise(0))
            / F.count("*")
        ).alias("wer")
    ).collect()[0]
    return float(row["wer"])


def corpus_cer(pairs_annotated: DataFrame) -> float:
    """Corpus-level CER: total character edits over total gold chars
    (exact integer sums, one final division)."""
    row = pairs_annotated.select(
        (
            F.sum("leven") / F.sum(F.length("token"))
        ).alias("cer")
    ).collect()[0]
    return float(row["cer"])
