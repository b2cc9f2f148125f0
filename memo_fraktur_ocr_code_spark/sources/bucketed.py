"""Bucketed storage layout for the transcripts corpus.

The north rule prescribes an Iceberg transcripts table with "explicit
partitioning on conv_id buckets".  The sandbox has no Iceberg runtime
jar, so this module provides the same physical contract through Spark's
session-catalog bucketed parquet tables — the stand-in for Iceberg's
``bucket(N, conv_id)`` partition transform:

* every turn of a conversation lands in the same bucket file set
  (hash co-location), and
* the scan REPORTS that hash partitioning to Catalyst, so any
  conv_id-clustered operator — ``groupBy("conv_id")``, the correction
  pipeline's ``cogroup().applyInPandas`` kernel, a self-join on
  conv_id — satisfies its ClusteredDistribution straight off the scan
  and the Exchange is elided entirely.

At 10^12 turns that elision is the difference between "one full-corpus
shuffle per job" and "zero": the shuffle is paid ONCE at ingest (the
bucketed write) and amortized over every subsequent read.  Buckets also
bound skew blast radius: a whale conversation is confined to its bucket
and the skew router (plans/pipeline.py ``fused='auto'``) still splits
it out of the partition walk.

tests/test_bucketed.py proves the elision by asserting zero Exchange
operators in the physical plans over bucketed inputs, and byte-equality
of the pipeline output against the unbucketed path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


#: In-bucket sort — the pipeline's stable turn order (turn_idx, ts) per
#: conversation, so bucket files are already in kernel walk order.
DEFAULT_SORT = ("conv_id", "turn_idx", "ts")


def write_bucketed(
    df: DataFrame,
    table: str,
    n_buckets: int = 64,
    path: str | None = None,
    sort_cols: tuple[str, ...] = DEFAULT_SORT,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` as a bucketed parquet table: hash-bucketed by
    conv_id into ``n_buckets``, sorted by ``sort_cols`` within each
    bucket.  ``path`` makes it an external table (data outside the
    warehouse dir); the catalog entry carries the bucket spec either
    way — that metadata is what lets later scans skip the shuffle."""
    w = (
        df.write.format("parquet")
        .mode(mode)
        .bucketBy(n_buckets, "conv_id")
        .sortBy(*sort_cols)
    )
    if path is not None:
        w = w.option("path", path)
    w.saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Read a bucketed table through the catalog (``spark.table`` — a
    plain ``spark.read.parquet`` on the files would LOSE the bucket
    spec and reintroduce the shuffle)."""
    return spark.table(table)


def conv_rollup(spark: SparkSession, table: str) -> DataFrame:
    """Per-conversation rollup over a bucketed transcripts table —
    turn count, first/last ts, total text chars.  Over a bucketed scan
    this aggregates with ZERO Exchange (partial and final aggregation
    collapse into one stage per bucket)."""
    from pyspark.sql import functions as F

    return (
        read_bucketed(spark, table)
        .groupBy("conv_id")
        .agg(
            F.count("*").alias("n_turns"),
            F.min("ts").alias("first_ts"),
            F.max("ts").alias("last_ts"),
            F.sum(F.length("text")).alias("n_chars"),
        )
    )
