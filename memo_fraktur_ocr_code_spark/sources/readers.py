"""Readers for the reference's text-based table formats (SURVEY §2.1
S3-S6), normalized into typed DataFrames:

* frequency dictionaries — ``token count`` space-separated lines
  (correct_ocr.py:208; bigrams: ``tok1 tok2 count``, make_dictionary.py)
* metadata TSV — tab-separated with header (myutils/__init__.py:95-117);
  the reference's substring matching is replaced by exact conv_id keys,
  its ``novel_end`` '1000000' sentinel and empty-string NULLs normalized
* CONLL — 14-column tab-separated, positions 0/2/4 consumed
  (align_ocr.py:276-280); empty lines dropped
* BOM tolerance — a leading U+FEFF is stripped (myutils readfile)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_BOM_STRIP = ("﻿", "")


def _strip_bom(df: DataFrame, col: str) -> DataFrame:
    return df.withColumn(col, F.regexp_replace(col, "^﻿", ""))


def read_freq_dictionary(spark: SparkSession, path: str) -> DataFrame:
    """``token count`` lines → (token string, freq bigint), freq desc."""
    df = spark.read.csv(
        path, sep=" ", schema="token string, freq bigint"
    )
    return _strip_bom(df, "token").where(
        F.col("token").isNotNull() & F.col("freq").isNotNull()
    ).orderBy(F.desc("freq"), "token")


def read_bigram_dictionary(spark: SparkSession, path: str) -> DataFrame:
    df = spark.read.csv(
        path, sep=" ", schema="tok1 string, tok2 string, freq bigint"
    )
    return _strip_bom(df, "tok1").where(F.col("freq").isNotNull())


def read_metadata_tsv(spark: SparkSession, path: str) -> DataFrame:
    """metadata.tsv → typed rows with real NULLs and sanitized bounds
    (the reference's `realstart` fallback and novel_end hack,
    myutils/__init__.py:108-112)."""
    raw = spark.read.option("header", True).option("sep", "\t").csv(path)
    cols = {c: F.when(F.col(c) == "", None).otherwise(F.col(c)).alias(c)
            for c in raw.columns}
    df = raw.select(*cols.values())
    if "novelstart_rescan" in raw.columns and "novel_start" in raw.columns:
        df = df.withColumn(
            "realstart",
            F.coalesce("novelstart_rescan", "novel_start").cast("int"),
        )
    if "novel_end" in raw.columns:
        df = df.withColumn(
            "novel_end",
            F.coalesce(F.col("novel_end").cast("int"), F.lit(1000000)),
        )
    return df


def read_conll(spark: SparkSession, path: str) -> DataFrame:
    """14-column CONLL TSV → (sent_word_num, token, lemma, pos) with the
    reference's column positions; blank lines dropped."""
    raw = spark.read.text(path)
    parts = F.split(F.col("value"), "\t")
    return (
        raw.where(F.length(F.trim("value")) > 0)
        .select(
            parts.getItem(0).cast("int").alias("sent_word_num"),
            parts.getItem(1).alias("token"),
            parts.getItem(2).alias("lemma"),
            parts.getItem(4).alias("pos"),
        )
    )


def read_transcripts(spark: SparkSession, path: str) -> DataFrame:
    """The primary input table (BASELINE.json input_hint schema), from
    parquet/Iceberg-style storage.  'NA' strings → real NULLs on the
    nullable string columns (the reference's NA convention)."""
    df = spark.read.parquet(path)
    for c in ("role", "tool", "text"):
        if c in df.columns:
            df = df.withColumn(
                c, F.when(F.col(c) == "NA", None).otherwise(F.col(c))
            )
    return df
