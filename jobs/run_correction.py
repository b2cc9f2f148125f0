"""Cluster job: per-turn OCR correction over a transcripts table.

Submit with scripts/submit.sh (spark-submit --py-files).  Reads the
transcripts (and optional alt-channel) table, runs the fused single-
shuffle correction pipeline, writes corrected turns bucketed by conv
hash, with per-bucket checkpoint manifests for resume.

Args: <transcripts_path> <lexicon_path> <out_dir> [alt_path]

``lexicon_path``: parquet or ``token count`` text (the reference's
unigram format, correct_ocr.py:208).
"""

from __future__ import annotations

import sys

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def load_lexicon(spark: SparkSession, path: str) -> list[tuple[str, int]]:
    if path.endswith(".txt"):
        df = spark.read.csv(path, sep=" ", schema="token string, freq bigint")
    else:
        df = spark.read.parquet(path)
    rows = df.orderBy(F.desc("freq"), "token").collect()
    return [(r["token"], int(r["freq"])) for r in rows]


def main(argv: list[str]) -> None:
    transcripts_path, lexicon_path, out_dir = argv[:3]
    alt_path = argv[3] if len(argv) > 3 else None

    spark = SparkSession.builder.appName("memo-correct-turns").getOrCreate()
    from memo_fraktur_ocr_code_spark.plans.checkpoint import (
        run_stage_checkpointed,
    )
    from memo_fraktur_ocr_code_spark.plans.pipeline import correct_pipeline

    transcripts = spark.read.format(
        "iceberg" if transcripts_path.count("/") == 1 else "parquet"
    ).load(transcripts_path)
    alt = spark.read.parquet(alt_path) if alt_path else None
    lexicon = load_lexicon(spark, lexicon_path)

    corrected = correct_pipeline(spark, transcripts, alt, lexicon)
    summary = run_stage_checkpointed(
        spark,
        corrected,
        out_dir,
        stage="corrected_turns",
        n_buckets=1024,
        input_fingerprint=transcripts_path,
    )
    print(summary)


if __name__ == "__main__":
    main(sys.argv[1:])
