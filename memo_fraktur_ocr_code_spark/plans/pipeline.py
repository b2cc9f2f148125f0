"""End-to-end per-turn correction pipeline (the flagship plan).

Composition mirrors the reference pipeline order
(run_eval_pipeline.py:54-64): assemble → correct_easy → correct_hard →
sym_wordcorrect, re-expressed as one Spark job graph with exactly one
conversation-grouped shuffle (assembly) plus one per-turn equi-join (alt
channel); everything else is embarrassingly parallel per-turn work in
whole-stage codegen or Arrow kernels.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from memo_fraktur_ocr_code_spark.functions.alignment import alt_ocr_correct
from memo_fraktur_ocr_code_spark.functions.symspell import word_correct_text
from memo_fraktur_ocr_code_spark.functions.textspec import (
    assemble_turns,
    correct_easy,
)
from memo_fraktur_ocr_code_spark.operators.assembly import (
    assemble_transcripts,
)
from memo_fraktur_ocr_code_spark.operators.hardcorrect import correct_hard
from memo_fraktur_ocr_code_spark.operators.normalize import correct_easy_col
from memo_fraktur_ocr_code_spark.operators.wordcorrect import (
    broadcast_lexicon,
    sym_wordcorrect,
)

_OUT_SCHEMA = "conv_id string, turn_idx int, corrected_text string"


def correct_pipeline(
    spark: SparkSession,
    transcripts: DataFrame,
    alt_transcripts: DataFrame | None,
    lexicon_pairs,
    do_easy: bool = True,
    do_hard: bool = True,
    do_sym: bool = True,
    fused: bool = True,
) -> DataFrame:
    """Returns (conv_id, turn_idx, corrected_text), one row per input turn,
    byte-equal to ``oracle.spec.correct_corpus`` under the stable
    (turn_idx, ts) ordering.

    Two physically different plans, same bytes out (both covered by the
    equality tests):

    * ``fused=True`` (default): ONE cogrouped Arrow kernel per conv does
      assemble+easy+hard+sym — 2 shuffles total (one per channel), one
      Python stage, no join.  This is the plan for the 100 TB run.
    * ``fused=False``: staged operators (Catalyst regexp chain for easy,
      separate kernels, equi-join for the alt channel) — more readable,
      more shuffles; kept for plan inspection and as a cross-check.
    """
    if fused:
        return _correct_pipeline_fused(
            spark, transcripts, alt_transcripts, lexicon_pairs,
            do_easy, do_hard, do_sym,
        )
    bc_index, bc_guard = broadcast_lexicon(spark, lexicon_pairs)

    df = assemble_transcripts(transcripts)
    if do_easy:
        df = df.withColumn("text", correct_easy_col("text"))
    if do_hard and alt_transcripts is not None:
        alt = assemble_transcripts(alt_transcripts)
        df = correct_hard(df, alt, bc_guard)
    if do_sym:
        df = sym_wordcorrect(df, bc_index)
    return df.select(
        "conv_id", "turn_idx", F.col("text").alias("corrected_text")
    )


def _correct_pipeline_fused(
    spark: SparkSession,
    transcripts: DataFrame,
    alt_transcripts: DataFrame | None,
    lexicon_pairs,
    do_easy: bool,
    do_hard: bool,
    do_sym: bool,
) -> DataFrame:
    bc_index, bc_guard = broadcast_lexicon(spark, lexicon_pairs)
    use_alt = do_hard and alt_transcripts is not None

    def kernel(base_pdf: pd.DataFrame, alt_pdf: pd.DataFrame) -> pd.DataFrame:
        if len(base_pdf) == 0:  # conv present only in the alt channel
            return pd.DataFrame(
                {"conv_id": [], "turn_idx": [], "corrected_text": []}
            )
        order_cols = (
            ["turn_idx", "ts"] if "ts" in base_pdf.columns else ["turn_idx"]
        )
        base_pdf = base_pdf.sort_values(order_cols, kind="mergesort")
        texts = assemble_turns(
            [t if isinstance(t, str) else "" for t in base_pdf["text"]]
        )
        if do_easy:
            texts = [correct_easy(t) for t in texts]
        if use_alt:
            amap = dict(zip(alt_pdf["turn_idx"], alt_pdf["text"]))
            alts = assemble_turns(
                [
                    amap.get(ti) if isinstance(amap.get(ti), str) else ""
                    for ti in base_pdf["turn_idx"]
                ]
            )
            mf = bc_guard.value
            texts = [
                alt_ocr_correct(t, a, mf) if t else t
                for t, a in zip(texts, alts)
            ]
        if do_sym:
            index = bc_index.value
            memo: dict = {}
            texts = [word_correct_text(t, index, memo) for t in texts]
        return pd.DataFrame(
            {
                "conv_id": base_pdf["conv_id"].to_numpy(),
                "turn_idx": base_pdf["turn_idx"].to_numpy(),
                "corrected_text": texts,
            }
        )

    cols = ["conv_id", "turn_idx", "text"] + (
        ["ts"] if "ts" in transcripts.columns else []
    )
    base = transcripts.select(*cols)
    if use_alt:
        alt = alt_transcripts.select("conv_id", "turn_idx", "text")
    else:
        alt = base.limit(0).select("conv_id", "turn_idx", "text")
    return (
        base.groupBy("conv_id")
        .cogroup(alt.groupBy("conv_id"))
        .applyInPandas(kernel, schema=_OUT_SCHEMA)
    )
