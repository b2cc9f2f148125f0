"""Sinks (SURVEY.md §2.1 S8-S11).

The reference writes one directory per novel with small text files; here
every sink is a partitioned columnar write (or a text export built with
JVM expressions and written distributed — never collected to the driver).

* corrected-turn sink (S8)   — parquet bucketed/partitioned by conv hash
* VRT export (S9)            — tab-separated positional-attribute lines
                               (make_corpus_vrt.py:55-70 format)
* year-partitioned sink (S10)— ``partitionBy('year')`` dynamic write
                               (make_year_vrts.py:8-44)
* single-line sink (S11)     — \\f/\\v rendering (pages2singlelinefiles.py)
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from memo_fraktur_ocr_code_spark.operators.normalize import (
    single_line_render_col,
)


def write_corrected_turns(
    df: DataFrame, path: str, n_buckets: int = 64, mode: str = "overwrite"
) -> None:
    """S8 — corrected turns, partitioned by a conv hash bucket so one
    conversation's turns colocate (the Iceberg ``bucket(conv_id)`` analog
    on plain parquet)."""
    (
        df.withColumn(
            "conv_bucket", F.pmod(F.xxhash64("conv_id"), F.lit(n_buckets))
        )
        .write.partitionBy("conv_bucket")
        .mode(mode)
        .parquet(path)
    )


def vrt_lines(tokens: DataFrame) -> DataFrame:
    """S9 — VRT positional-attribute lines ``token\\ti\\tj\\tline\\tpage\\t
    text_id`` (make_corpus_vrt.py:68), one row per token; structural
    grouping keys stay as columns for downstream ``<text>`` assembly."""
    return tokens.select(
        "conv_id",
        "turn_idx",
        F.concat_ws(
            "\t",
            F.col("token"),
            F.col("word_idx").cast("string"),
            F.col("word_on_line").cast("string"),
            F.col("line_idx").cast("string"),
            F.col("turn_idx").cast("string"),
            F.col("conv_id"),
        ).alias("vrt_line"),
        F.col("word_idx"),
    )


def write_vrt_export(tokens: DataFrame, path: str) -> None:
    """S9 — distributed text export of VRT <text> blocks, one file tree
    partitioned by conv bucket; block assembly is a grouped concat, never
    a driver collect."""
    blocks = (
        vrt_lines(tokens)
        .groupBy("conv_id")
        .agg(
            F.concat_ws(
                "\n",
                F.array_sort(
                    F.collect_list(F.struct("turn_idx", "word_idx", "vrt_line"))
                ).getField("vrt_line"),
            ).alias("body")
        )
        .select(
            F.concat(
                F.lit('<text id="'),
                F.col("conv_id"),
                F.lit('">\n'),
                F.col("body"),
                F.lit("\n</text>"),
            ).alias("value")
        )
    )
    blocks.write.mode("overwrite").text(path)


def write_year_partitioned(
    df: DataFrame, meta: DataFrame, path: str
) -> None:
    """S10/W5 — broadcast-join year metadata, dynamic partition write
    (make_year_vrts.py:8-44 re-expressed)."""
    (
        df.join(F.broadcast(meta.select("conv_id", "year")), "conv_id")
        .write.partitionBy("year")
        .mode("overwrite")
        .parquet(path)
    )


def write_single_line(df: DataFrame, path: str, text_col: str = "corrected_text") -> None:
    """S11 — one line per turn with \\f/\\v escapes."""
    (
        df.select(
            "conv_id",
            "turn_idx",
            single_line_render_col(text_col).alias("single_line"),
        )
        .write.mode("overwrite")
        .parquet(path)
    )


def texton_lines(tokens: DataFrame) -> DataFrame:
    """Text-Tonsorium export projection (vrt2texton_tokens.py): each
    conversation's tokens as one space-joined line, one row per
    conversation — grouped concat with an in-aggregate sort, never a
    driver collect."""
    return tokens.groupBy("conv_id").agg(
        F.concat_ws(
            " ",
            F.array_sort(
                F.collect_list(F.struct("turn_idx", "word_idx", "token"))
            ).getField("token"),
        ).alias("token_line")
    )


def write_texton_lines(tokens: DataFrame, path: str) -> None:
    """Distributed write of the Text-Tonsorium export."""
    texton_lines(tokens).write.mode("overwrite").parquet(path)
