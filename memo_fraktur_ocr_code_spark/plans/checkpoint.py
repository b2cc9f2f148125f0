"""Checkpoint manifests + resume-without-recompute.

The reference's incremental machinery is dated intermediate directories
plus per-step booleans (run_eval_pipeline.py:50-100, README.md:189-203).
At 10^12 turns that becomes: stage outputs bucketed by conv_id hash, plus
a manifest table recording per-bucket lineage and metrics
``(stage, bucket, rows_out, wall_ms, input_fingerprint, n_convs)``.
Resume = anti-join the completed buckets — an executor/job failure never
recomputes finished buckets (north_rule requirement).

Bucketing by ``xxhash64(conv_id) % n_buckets`` keeps all turns of one
conversation in one bucket, so a bucket is a self-contained unit of work
for every conv-grouped stage.
"""

from __future__ import annotations

import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MANIFEST_DIR = "_manifest"


def with_bucket(
    df: DataFrame, bucket_col: str = "conv_id", n_buckets: int = 32
) -> DataFrame:
    return df.withColumn(
        "_bucket", F.pmod(F.xxhash64(F.col(bucket_col)), F.lit(n_buckets))
    )


def completed_buckets(
    spark: SparkSession, out_dir: str, stage: str
) -> set[int]:
    path = os.path.join(out_dir, MANIFEST_DIR)
    if not os.path.exists(path):
        return set()
    m = spark.read.parquet(path)
    return {
        r["bucket"]
        for r in m.where(F.col("stage") == stage)
        .select("bucket")
        .distinct()
        .collect()
    }


def _reconcile_orphan_buckets(
    out_dir: str, stage: str, done: set[int]
) -> list[int]:
    """Delete data partitions whose bucket never reached the manifest.

    The data job commits before the manifest row is appended; a crash
    in that window leaves bucket partitions on disk with no manifest
    entry, and a resume would recompute them — ``mode('append')`` would
    then write those rows a SECOND time.  Making the bucket dir + its
    manifest row atomic isn't possible on a plain filesystem, so resume
    instead reconciles: any ``_bucket=K`` partition not recorded as
    complete is incomplete-by-contract and is dropped before compute.
    Local-FS implementation; on an object store this is the same
    prefix delete."""
    import shutil

    data_path = os.path.join(out_dir, stage)
    if not os.path.exists(data_path):
        return []
    orphans = []
    for name in os.listdir(data_path):
        if not name.startswith("_bucket="):
            continue
        b = int(name.split("=", 1)[1])
        if b not in done:
            shutil.rmtree(os.path.join(data_path, name))
            orphans.append(b)
    return sorted(orphans)


def run_stage_checkpointed(
    spark: SparkSession,
    df: DataFrame,
    out_dir: str,
    stage: str,
    bucket_col: str = "conv_id",
    n_buckets: int = 32,
    input_fingerprint: str = "",
) -> dict:
    """Execute ``df`` bucket-wise with resume.

    Already-completed buckets (per the manifest) are pruned *before*
    compute; the remainder is written partitioned by bucket, then the
    manifest is extended.  Returns a summary dict.

    Resume safety: (a) bucket partitions on disk with no manifest row
    (a crash between the data commit and the manifest append) are
    deleted before compute, so they are recomputed exactly once instead
    of duplicated; (b) if the manifest records a different
    ``input_fingerprint`` for this stage, the run is refused — resuming
    with a different input would silently mix two corpora in one
    out_dir.
    """
    done = completed_buckets(spark, out_dir, stage)
    if done and input_fingerprint:
        prior = {
            r["input_fingerprint"]
            for r in spark.read.parquet(os.path.join(out_dir, MANIFEST_DIR))
            .where(F.col("stage") == stage)
            .select("input_fingerprint")
            .distinct()
            .collect()
        }
        prior.discard("")
        if prior and prior != {input_fingerprint}:
            raise ValueError(
                f"manifest for stage '{stage}' records input"
                f" {sorted(prior)}, refusing to resume with"
                f" '{input_fingerprint}' — resuming a different input"
                " would mix two corpora in one out_dir"
            )
    orphans = _reconcile_orphan_buckets(out_dir, stage, done)
    bucketed = with_bucket(df, bucket_col, n_buckets)
    todo = bucketed
    if done:
        todo = bucketed.where(~F.col("_bucket").isin(sorted(done)))
    t0 = time.time()
    data_path = os.path.join(out_dir, stage)
    todo.write.partitionBy("_bucket").mode("append").parquet(data_path)
    wall_ms = int((time.time() - t0) * 1000)

    written = spark.read.parquet(data_path).where(
        ~F.col("_bucket").isin(sorted(done)) if done else F.lit(True)
    )
    # per-bucket metrics: lineage + throughput, plus CER when the stage
    # carries one (north rule: per-partition lineage + CER/throughput)
    metric_aggs = [
        F.count("*").alias("rows_out"),
        F.countDistinct(bucket_col).alias("n_convs"),
    ]
    has_cer = "cer" in written.columns
    if has_cer:
        metric_aggs.append(
            # round, don't truncate: 2-dp doubles sit a hair below their
            # decimal value and a bare cast biases the mean low
            F.sum(F.round(F.col("cer") * 100).cast("bigint")).alias(
                "cer_cp_sum"
            )
        )
    text_col = next(
        (c for c in ("corrected_text", "text") if c in written.columns),
        None,
    )
    if text_col:
        metric_aggs.append(F.sum(F.length(text_col)).alias("chars_out"))
    stats = (
        written.groupBy("_bucket")
        .agg(*metric_aggs)
        .select(
            F.lit(stage).alias("stage"),
            F.col("_bucket").alias("bucket"),
            "rows_out",
            "n_convs",
            (F.col("cer_cp_sum") / F.col("rows_out") / 100).alias("cer_avg")
            if has_cer
            else F.lit(None).cast("double").alias("cer_avg"),
            F.col("chars_out")
            if text_col
            else F.lit(None).cast("bigint").alias("chars_out"),
            F.lit(wall_ms).alias("wall_ms"),
            (F.col("rows_out") * 1000.0 / F.greatest(F.lit(wall_ms), F.lit(1)))
            .alias("rows_per_sec"),
            F.lit(input_fingerprint).alias("input_fingerprint"),
        )
    )
    stats.write.mode("append").parquet(os.path.join(out_dir, MANIFEST_DIR))
    after = completed_buckets(spark, out_dir, stage)
    return {
        "stage": stage,
        "buckets_skipped": len(done),
        "buckets_completed": len(after),
        "buckets_reclaimed": len(orphans),
        "wall_ms": wall_ms,
    }


def read_stage(spark: SparkSession, out_dir: str, stage: str) -> DataFrame:
    return spark.read.parquet(os.path.join(out_dir, stage)).drop("_bucket")
