"""Structured Streaming surface for per-turn correction.

The reference is strictly batch (SURVEY.md §2.9); the streaming-capable
subset of the pipeline is everything that needs no cross-turn context:
correct_easy (stateless Catalyst) + sym_wordcorrect (stateless Arrow
kernel with a broadcast index).  Cross-turn dehyphenation and the alt-OCR
alignment need conversation context and stay batch (they would require
session-window state over conv_id — an explicit non-goal, noted in
SURVEY.md §2.9).

Usage: ``readStream`` any transcript-shaped source → ``correct_stream``
→ ``writeStream`` with checkpointing; watermarking on ``ts`` is the
caller's choice (no windowed aggregation happens here, so late rows are
simply corrected late)."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StringType

from memo_fraktur_ocr_code_spark.operators.normalize import correct_easy_col
from memo_fraktur_ocr_code_spark.operators.wordcorrect import (
    broadcast_lexicon,
    sym_wordcorrect,
)
from memo_fraktur_ocr_code_spark.functions.textspec import clean_page_lines


def correct_stream(
    spark: SparkSession, stream_df: DataFrame, lexicon_pairs
) -> DataFrame:
    """Streaming per-turn correction: clean lines → easy → symspell.
    Works identically on batch DataFrames (the transforms are all
    stateless), which is how it is unit-tested."""
    bc_index, _bc_guard = broadcast_lexicon(spark, lexicon_pairs)

    @F.pandas_udf(StringType())
    def _clean(texts: pd.Series) -> pd.Series:
        return texts.map(
            lambda t: clean_page_lines(t) if isinstance(t, str) else t
        )

    df = stream_df.select(
        "conv_id",
        "turn_idx",
        correct_easy_col(_clean(F.col("text"))).alias("text"),
    )
    return sym_wordcorrect(df, bc_index).withColumnRenamed(
        "text", "corrected_text"
    )


def turn_rate_stream(
    stream_df: DataFrame,
    window_duration: str = "10 minutes",
    watermark: str = "30 minutes",
) -> DataFrame:
    """Streaming windowed aggregation with late-data handling: turns and
    corrected-chars per conversation per event-time window.

    Watermark on ``ts`` bounds state: rows later than ``watermark`` behind
    the max seen event time are dropped, finished windows are emitted and
    their state evicted — the standard Structured Streaming pattern for
    the pipeline's per-partition throughput/CER metrics feed."""
    return (
        stream_df.withWatermark("ts", watermark)
        .groupBy(
            F.window("ts", window_duration).alias("win"),
            F.col("conv_id"),
        )
        .agg(
            F.count("*").alias("n_turns"),
            F.sum(F.length("text")).alias("n_chars"),
        )
        .select(
            F.col("win.start").alias("window_start"),
            "conv_id",
            "n_turns",
            "n_chars",
        )
    )


def dedup_stream(
    stream_df: DataFrame,
    watermark: str = "30 minutes",
    text_col: str = "text",
    ts_col: str = "ts",
) -> DataFrame:
    """Streaming exact content dedup: the dedup key is
    ``xxhash64`` of the whitespace-normalized text (the same signature
    batch ``dedup.exact_dedup`` groups on), and
    ``dropDuplicatesWithinWatermark`` keeps each key's first arrival
    while EXPIRING key state once the watermark passes its event time —
    bounded state on an unbounded stream.  A plain ``dropDuplicates``
    would hold every signature ever seen and OOM eventually; the
    watermark variant trades that for a documented semantics change
    (a duplicate arriving later than ``watermark`` after the original
    is re-emitted), which is the standard streaming-dedup contract."""
    from memo_fraktur_ocr_code_spark.operators.dedup import (
        normalize_text_col,
    )

    return (
        stream_df.withWatermark(ts_col, watermark)
        .withColumn(
            "content_sig", F.xxhash64(normalize_text_col(text_col))
        )
        .dropDuplicatesWithinWatermark(["content_sig"])
    )


def session_stream(
    stream_df: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "1 hour",
    ts_col: str = "ts",
) -> DataFrame:
    """Streaming sessionization — the live twin of the batch W2
    operator (``annotate.sessionize``: split a conversation wherever
    consecutive turns are more than ``gap`` apart).  Implemented with
    ``F.session_window``: Spark merges overlapping per-key gap windows
    as events arrive, the watermark closes a session once event time
    passes ``session_end + gap``, and closed sessions emit exactly once
    with their state evicted — bounded state on an unbounded transcript
    feed (the standard dynamic-gap pattern, Structured Streaming
    session windows, Spark 3.2+).

    Output per (conv_id, session): ``(conv_id, session_start,
    session_end, n_turns, n_chars)``.

    Scale: state is one open session per active conversation — the
    minimum any gap-based sessionizer can hold; the aggregation keys on
    (conv_id, session_window), so hot conversations stay confined to
    their key's partition."""
    return (
        stream_df.withWatermark(ts_col, watermark)
        .groupBy(
            F.col("conv_id"),
            F.session_window(F.col(ts_col), gap).alias("win"),
        )
        .agg(
            F.count("*").alias("n_turns"),
            F.sum(F.length("text")).alias("n_chars"),
        )
        .select(
            "conv_id",
            F.col("win.start").alias("session_start"),
            F.col("win.end").alias("session_end"),
            "n_turns",
            "n_chars",
        )
    )
