"""Checkpoint manifests + resume-without-recompute.

The reference's incremental machinery is dated intermediate directories
plus per-step booleans (run_eval_pipeline.py:50-100, README.md:189-203).
At 10^12 turns that becomes: stage outputs bucketed by conv_id hash, plus
a manifest table recording per-bucket lineage and metrics
``(stage, bucket, n_buckets, rows_out, n_convs, cer_avg, chars_out,
wall_ms, rows_per_sec, input_fingerprint)``.  Resume = anti-join the
completed buckets — an executor/job failure never recomputes finished
buckets (north_rule requirement).

Bucketing by ``pmod(xxhash64(conv_id), n_buckets)`` over the ORIGINAL
typed key keeps all turns of one conversation in one bucket, so a bucket
is a self-contained unit of work for every conv-grouped stage.  NULL
keys need no special-casing: Spark's ``xxhash64`` never returns NULL —
for a NULL input it returns the seed (42), a deterministic value like
any other — so every row, NULL-keyed included, lands in a real numeric
bucket (ADVICE r3: the previous NULL→xxhash64('') remap was built on a
false premise and itself created a cross-version bucket-reassignment
hazard).  The manifest records the scheme version; resume refuses an
out_dir written under a different scheme.

All filesystem probes go through the Hadoop FileSystem API resolved from
``out_dir``'s own scheme — ``os.path`` would silently report "nothing
there" for hdfs:// or s3a:// out_dirs on a cluster, failing the entire
refusal/resume contract open (ADVICE r3).
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.errors import AnalysisException

MANIFEST_DIR = "_manifest"

# Version tag for the bucket-assignment function.  Recorded in every
# manifest row; resume refuses a mismatch (bucket ids computed under one
# scheme are meaningless under another).  Legacy manifests (no column /
# NULL) were written by the v1 NULL→xxhash64('') remap and are refused
# too — their NULL-key rows would silently land in a different bucket.
BUCKET_SCHEME = "xxhash64-typed-v2"


def _fs_and_path(spark: SparkSession, path: str):
    """(Hadoop FileSystem, Path) for ``path``, resolved by its scheme —
    works identically for file://, hdfs:// and s3a:// URIs."""
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    return fs, hpath


def _fs_exists(spark: SparkSession, path: str) -> bool:
    fs, hpath = _fs_and_path(spark, path)
    return bool(fs.exists(hpath))


def delete_recursive(spark: SparkSession, path: str) -> bool:
    """Recursive delete through the Hadoop FS API — ``shutil.rmtree``
    silently no-ops on hdfs:// / s3a:// URIs, so callers that reset a
    checkpoint dir (e.g. a fresh non-resume curation run) must use this
    instead (code-review r5).  Returns True if anything was deleted."""
    fs, hpath = _fs_and_path(spark, path)
    if not fs.exists(hpath):
        return False
    return bool(fs.delete(hpath, True))


def with_bucket(
    df: DataFrame, bucket_col: str = "conv_id", n_buckets: int = 32
) -> DataFrame:
    # Keys hash their ORIGINAL typed value (xxhash64(123L) !=
    # xxhash64('123') — a blanket string cast would silently reassign
    # every bucket for numeric key columns, corrupting resumes of
    # out_dirs written before the cast).  NULL keys need no remap:
    # xxhash64(NULL) is the seed (42), never NULL, so the bucket column
    # is total and deterministic as-is (ADVICE r3 — the previous
    # NULL→xxhash64('') special-case was the only thing that could move
    # a key between versions).  Scheme version: BUCKET_SCHEME.
    return df.withColumn(
        "_bucket", F.pmod(F.xxhash64(F.col(bucket_col)), F.lit(n_buckets))
    )


def completed_buckets(
    spark: SparkSession, out_dir: str, stage: str
) -> set[int]:
    path = f"{out_dir}/{MANIFEST_DIR}"
    if not _fs_exists(spark, path):
        return set()
    try:
        m = spark.read.parquet(path)
    except AnalysisException:
        # _manifest exists but holds no readable parquet (a killed
        # first write leaving only _temporary) — no prior manifest,
        # nothing completed (ADVICE r4)
        return set()
    return {
        r["bucket"]
        for r in m.where(F.col("stage") == stage)
        .select("bucket")
        .distinct()
        .collect()
    }


def _reconcile_orphan_buckets(
    spark: SparkSession, out_dir: str, stage: str, done: set[int]
) -> list[int]:
    """Delete data partitions whose bucket never reached the manifest.

    The data job commits before the manifest row is appended; a crash
    in that window leaves bucket partitions on disk with no manifest
    entry, and a resume would recompute them — ``mode('append')`` would
    then write those rows a SECOND time.  Making the bucket dir + its
    manifest row atomic isn't possible on a plain filesystem, so resume
    instead reconciles: any ``_bucket=K`` partition not recorded as
    complete is incomplete-by-contract and is dropped before compute.
    Hadoop FS operations, so the same code reconciles local dirs and
    object-store prefixes."""
    data_path = f"{out_dir}/{stage}"
    if not _fs_exists(spark, data_path):
        return []
    fs, hpath = _fs_and_path(spark, data_path)
    orphans = []
    for status in fs.listStatus(hpath):
        name = status.getPath().getName()
        if not name.startswith("_bucket="):
            continue
        val = name.split("=", 1)[1]
        try:
            b = int(val)
        except ValueError:
            # foreign partition dir (should not occur: with_bucket never
            # emits a NULL bucket) — leave it alone rather than guess
            continue
        if b not in done:
            fs.delete(status.getPath(), True)
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
    of duplicated; (b) a manifest recording a different
    ``input_fingerprint`` for this stage refuses the run (no silent
    corpus mixing); (c) a manifest recording a different ``n_buckets``
    refuses the run — bucket ids are only meaningful within one hash
    space, and reinterpreting them under a new modulus silently skips
    never-written rows and duplicates already-written ones (ADVICE r3);
    (d) a manifest recording a different ``bucket_scheme`` (or none: the
    legacy v1 NULL-remap layout) refuses the run — a key assigned under
    one scheme version may land in a different bucket under another,
    duplicating its rows on resume.
    """
    done = completed_buckets(spark, out_dir, stage)
    if done:
        m = spark.read.parquet(f"{out_dir}/{MANIFEST_DIR}").where(
            F.col("stage") == stage
        )
        if input_fingerprint:
            prior = {
                r["input_fingerprint"]
                for r in m.select("input_fingerprint").distinct().collect()
            }
            prior.discard("")
            if prior and prior != {input_fingerprint}:
                raise ValueError(
                    f"manifest for stage '{stage}' records input"
                    f" {sorted(prior)}, refusing to resume with"
                    f" '{input_fingerprint}' — resuming a different input"
                    " would mix two corpora in one out_dir"
                )
        if "n_buckets" in m.columns:
            prior_n = {
                r["n_buckets"]
                for r in m.select("n_buckets").distinct().collect()
            }
            # rows written before the column existed read as NULL under
            # the merged schema — unknown, not conflicting: refusing on
            # them would block every legitimate cross-version resume
            # (and sorted() over {None, int} would itself crash)
            prior_n.discard(None)
            if prior_n and prior_n != {n_buckets}:
                raise ValueError(
                    f"manifest for stage '{stage}' was written with"
                    f" n_buckets={sorted(prior_n)}, refusing to resume"
                    f" with n_buckets={n_buckets} — bucket ids from one"
                    " hash space are meaningless in another"
                )
    # scheme refusal: NULL (pre-column legacy rows) means the v1
    # NULL-remap layout — refuse rather than guess, because a NULL-key
    # row recomputed under v2 lands in a different bucket and would be
    # written a second time.  Checked over the WHOLE manifest (not just
    # this stage, and regardless of whether this stage has completed
    # buckets): writing a v2 stage into a legacy out_dir would create a
    # mixed-schema manifest whose later reads resolve the schema from
    # an arbitrary file footer — so the mix must never be created.
    # mergeSchema so legacy files surface as NULLs instead of deciding
    # the column away.  An unreadable/empty _manifest dir (e.g. a killed
    # first write that left only _temporary, surfacing as
    # UNABLE_TO_INFER_SCHEMA) is treated as 'no prior manifest' — a
    # clean start, not a crash (ADVICE r4).
    prior_scheme = None
    if _fs_exists(spark, f"{out_dir}/{MANIFEST_DIR}"):
        try:
            whole = spark.read.option("mergeSchema", "true").parquet(
                f"{out_dir}/{MANIFEST_DIR}"
            )
            prior_scheme = (
                {
                    r["bucket_scheme"]
                    for r in whole.select("bucket_scheme")
                    .distinct()
                    .collect()
                }
                if "bucket_scheme" in whole.columns
                else {None}
            )
        except AnalysisException:
            prior_scheme = None
    if prior_scheme is not None:
        if prior_scheme != {BUCKET_SCHEME}:
            legacy = sorted(
                s if s is not None else "<v1-null-remap>"
                for s in prior_scheme
            )
            raise ValueError(
                f"manifest at '{out_dir}' records bucket scheme"
                f" {legacy}, refusing to write stage '{stage}' under"
                f" '{BUCKET_SCHEME}' — keys may map to different"
                " buckets across scheme versions; recompute into a"
                " fresh out_dir"
            )
    orphans = _reconcile_orphan_buckets(spark, out_dir, stage, done)
    bucketed = with_bucket(df, bucket_col, n_buckets)
    todo = bucketed
    if done:
        todo = bucketed.where(~F.col("_bucket").isin(sorted(done)))
    t0 = time.time()
    data_path = f"{out_dir}/{stage}"
    todo.write.partitionBy("_bucket").mode("append").parquet(data_path)
    wall_ms = int((time.time() - t0) * 1000)

    written = spark.read.parquet(data_path).where(
        ~F.col("_bucket").isin(sorted(done)) if done else F.lit(True)
    )
    # per-bucket metrics: lineage + throughput, plus CER when the stage
    # carries one (north rule: per-partition lineage + CER/throughput)
    metric_aggs = [
        F.count("*").alias("rows_out"),
        # count NULL keys as a (single) conversation too — countDistinct
        # skips NULLs, and a bucket holding only NULL-key rows would
        # report n_convs=0 while carrying data
        F.countDistinct(
            F.coalesce(F.col(bucket_col).cast("string"), F.lit(""))
        ).alias("n_convs"),
    ]
    has_cer = "cer" in written.columns
    if has_cer:
        metric_aggs += [
            # round, don't truncate: 2-dp doubles sit a hair below their
            # decimal value and a bare cast biases the mean low
            F.sum(F.round(F.col("cer") * 100).cast("bigint")).alias(
                "cer_cp_sum"
            ),
            # count the rows the sum actually saw: dividing a
            # NULL-skipping sum by the all-rows count treats NULL CER as
            # a perfect 0 and biases the mean low (ADVICE r3)
            F.count("cer").alias("cer_n"),
        ]
    text_col = next(
        (c for c in ("corrected_text", "text") if c in written.columns),
        None,
    )
    if text_col:
        metric_aggs.append(F.sum(F.length(text_col)).alias("chars_out"))
    bucket_rows = written.groupBy("_bucket").agg(*metric_aggs).collect()
    # wall_ms is the RUN's wall clock (the buckets were written by one
    # job, so per-bucket wall time does not exist); rows_per_sec is the
    # run-level throughput, identical on every row by construction.
    total_rows = sum(r["rows_out"] for r in bucket_rows)
    run_rps = total_rows * 1000.0 / max(wall_ms, 1)
    manifest = [
        (
            stage,
            int(r["_bucket"]),
            n_buckets,
            int(r["rows_out"]),
            int(r["n_convs"]),
            (float(r["cer_cp_sum"]) / r["cer_n"] / 100)
            if has_cer and r["cer_n"]
            else None,
            # sum(length(text)) over an all-NULL bucket is NULL — an
            # unguarded int() here would crash AFTER the data commit and
            # orphan the whole run's buckets
            int(r["chars_out"])
            if text_col and r["chars_out"] is not None
            else None,
            wall_ms,
            run_rps,
            input_fingerprint,
            BUCKET_SCHEME,
        )
        for r in bucket_rows
    ]
    spark.createDataFrame(
        manifest,
        "stage string, bucket bigint, n_buckets int, rows_out bigint,"
        " n_convs bigint, cer_avg double, chars_out bigint,"
        " wall_ms bigint, rows_per_sec double, input_fingerprint string,"
        " bucket_scheme string",
    ).write.mode("append").parquet(f"{out_dir}/{MANIFEST_DIR}")
    after = completed_buckets(spark, out_dir, stage)
    return {
        "stage": stage,
        "buckets_skipped": len(done),
        "buckets_completed": len(after),
        "buckets_reclaimed": len(orphans),
        "wall_ms": wall_ms,
    }


def read_stage(spark: SparkSession, out_dir: str, stage: str) -> DataFrame:
    return spark.read.parquet(f"{out_dir}/{stage}").drop("_bucket")
