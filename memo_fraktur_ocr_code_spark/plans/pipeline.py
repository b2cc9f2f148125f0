"""End-to-end per-turn correction pipeline (the flagship plan).

Composition mirrors the reference pipeline order
(run_eval_pipeline.py:54-64): assemble → correct_easy → correct_hard →
sym_wordcorrect, re-expressed as one Spark job graph with exactly one
conversation-grouped shuffle (assembly) plus one per-turn equi-join (alt
channel); everything else is embarrassingly parallel per-turn work in
whole-stage codegen or Arrow kernels.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from memo_fraktur_ocr_code_spark.operators.assembly import (
    assemble_transcripts,
)
from memo_fraktur_ocr_code_spark.operators.hardcorrect import correct_hard
from memo_fraktur_ocr_code_spark.operators.normalize import correct_easy_col
from memo_fraktur_ocr_code_spark.operators.wordcorrect import (
    broadcast_lexicon,
    sym_wordcorrect,
)


def correct_pipeline(
    spark: SparkSession,
    transcripts: DataFrame,
    alt_transcripts: DataFrame | None,
    lexicon_pairs,
    do_easy: bool = True,
    do_hard: bool = True,
    do_sym: bool = True,
) -> DataFrame:
    """Returns (conv_id, turn_idx, corrected_text), one row per input turn,
    byte-equal to ``oracle.spec.correct_corpus`` under the stable
    (turn_idx, ts) ordering."""
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
