"""Benchmark harness.

Runs the headline queries at ``$SPARK_GRAFT_SF_DIR`` (default
/root/testdata/sf0.1) on ``local[$SPARK_GRAFT_CPUS]`` and prints ONE JSON
line: ``{"metric", "value", "unit": "sec", "queries": {...}, "sf", ...}``.

Also produces the scaling evidence required by BASELINE.json's north rule
(two cluster sizes): the flagship correction pipeline runs at local[8] and
local[32] on the same input; the JSON carries turns/sec at both plus the
scaling efficiency (speedup / ideal-speedup).  The same numbers are
written to BENCH.md.

Env knobs: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS, BENCH_REPLICATION
(transcript volume multiplier, default 24 → ~48k turns), BENCH_SKIP_SCALING.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
REPLICATION = int(os.environ.get("BENCH_REPLICATION", "24"))

HEADLINE = [
    "pipeline_correct_turns",
    "q1_lineitem_agg",
    "j4_q3_top_orders",
    "a1_unigram_freq",
    "a2_bigram_freq",
    "w1_token_enum",
    "w2_sessionize",
    "a6_precision_recall",
    "dedup_exact",
    "dedup_ngram_jaccard",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "sim_ann_cosine",
    "lang_id",
    "quality_score",
    "token_count",
    "fingerprint",
]


def _spark(master: str):
    from memo_fraktur_ocr_code_spark.session import get_spark

    return get_spark(master=master, app_name=f"bench-{master}")


_BENCH_INPUT = "/tmp/memo_bench_input"


def _materialize_inputs(sf_dir: str, factor: int) -> list:
    """Synthesize + replicate the transcript workload ONCE, write it to
    parquet, and return the lexicon.  The timed runs then measure
    read-parquet → pipeline → materialize, nothing else."""
    import shutil

    import __spark_entry__ as entry

    shutil.rmtree(_BENCH_INPUT, ignore_errors=True)
    spark = _spark(f"local[{CPUS}]")
    try:
        base, alt, lexicon = entry.transcripts_from_documents(
            spark, sf_dir, turns_per_doc=16
        )
        rep = F.explode(F.sequence(F.lit(0), F.lit(factor - 1))).alias("rep")
        base_r = (
            base.select("*", rep)
            .withColumn("conv_id", F.concat_ws("-", "conv_id", "rep"))
            .drop("rep")
        )
        alt_r = (
            alt.select("*", rep)
            .withColumn("conv_id", F.concat_ws("-", "conv_id", "rep"))
            .drop("rep")
        )
        base_r.repartition(64).write.parquet(f"{_BENCH_INPUT}/base")
        alt_r.repartition(64).write.parquet(f"{_BENCH_INPUT}/alt")
    finally:
        spark.stop()
    return lexicon


def _run_pipeline_count(spark, lexicon, warm: bool = False) -> int:
    from memo_fraktur_ocr_code_spark.plans.pipeline import correct_pipeline

    base = spark.read.parquet(f"{_BENCH_INPUT}/base")
    alt = spark.read.parquet(f"{_BENCH_INPUT}/alt")
    if warm:  # tiny conv sample: warms JVM/Python/Arrow, not the data
        keep = F.pmod(F.xxhash64("conv_id"), F.lit(50)) == 0
        base = base.where(keep)
        alt = alt.where(keep)
    out = correct_pipeline(spark, base, alt, lexicon)
    # force full materialization of the corrected text, not just counting
    return out.select(
        F.count("*").alias("n"), F.sum(F.length("corrected_text")).alias("c")
    ).collect()[0]["n"]


def run_headline(spark, sf_dir: str, lexicon) -> dict[str, float]:
    import __spark_entry__ as entry

    qs = entry.queries()
    times: dict[str, float] = {}
    for name in HEADLINE:
        fn = qs[name]
        t0 = time.time()
        if name == "pipeline_correct_turns":
            _run_pipeline_count(spark, lexicon)
        else:
            df = fn(spark, sf_dir)
            # materialize every column cheaply
            df.select(F.count("*")).collect()
        times[name] = round(time.time() - t0, 3)
    return times


def run_scaling(lexicon) -> dict:
    results = {}
    for n in (8, 32):
        spark = _spark(f"local[{n}]")
        try:
            # warm the JVM / Python-worker / Arrow path
            _run_pipeline_count(spark, lexicon, warm=True)
            t0 = time.time()
            turns = _run_pipeline_count(spark, lexicon)
            dt = time.time() - t0
            results[n] = {
                "cores": n,
                "turns": turns,
                "sec": round(dt, 3),
                "turns_per_sec": round(turns / dt, 1),
            }
        finally:
            spark.stop()
    speedup = results[8]["sec"] / results[32]["sec"]
    ideal = 32 / 8
    results["speedup_8_to_32"] = round(speedup, 3)
    results["scaling_efficiency"] = round(speedup / ideal, 3)
    return results


def main():
    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    out: dict = {"metric": "headline_queries_total", "unit": "sec", "sf": sf}

    lexicon = _materialize_inputs(SF_DIR, REPLICATION)

    scaling = None
    if not os.environ.get("BENCH_SKIP_SCALING"):
        scaling = run_scaling(lexicon)
        out["scaling"] = scaling

    spark = _spark(f"local[{CPUS}]")
    try:
        times = run_headline(spark, SF_DIR, lexicon)
    finally:
        spark.stop()
    out["queries"] = times
    out["value"] = round(sum(times.values()), 3)
    if scaling:
        out["turns_per_sec_local8"] = scaling[8]["turns_per_sec"]
        out["turns_per_sec_local32"] = scaling[32]["turns_per_sec"]
        out["scaling_efficiency"] = scaling["scaling_efficiency"]
        _write_bench_md(out)
    print(json.dumps(out))


def _write_bench_md(out: dict) -> None:
    s = out["scaling"]
    lines = [
        "# BENCH — measured throughput + scaling evidence",
        "",
        f"Input: transcripts synthesized from `{SF_DIR}/documents.parquet`"
        f" × replication {REPLICATION} (sf={out['sf']}).",
        "",
        "## Two-cluster-size scaling (north rule: efficiency ≥ 0.8)",
        "",
        "Sandbox stand-in for N vs 4N executors: same job, same input,"
        " local[8] vs local[32].",
        "",
        "| cores | turns | sec | turns/sec |",
        "| --- | --- | --- | --- |",
        f"| 8 | {s[8]['turns']} | {s[8]['sec']} | {s[8]['turns_per_sec']} |",
        f"| 32 | {s[32]['turns']} | {s[32]['sec']} | {s[32]['turns_per_sec']} |",
        "",
        f"Speedup 8→32: **{s['speedup_8_to_32']}×** (ideal 4×);"
        f" scaling efficiency: **{s['scaling_efficiency']}**.",
        "",
        "## Headline query times (local[{}] at sf={})".format(
            CPUS, out["sf"]
        ),
        "",
        "| query | sec |",
        "| --- | --- |",
    ]
    for k, v in out["queries"].items():
        lines.append(f"| {k} | {v} |")
    lines.append("")
    lines.append(f"Total: {out['value']} sec.")
    lines.append("")
    with open(os.path.join(os.path.dirname(__file__), "BENCH.md"), "w") as f:
        f.write("\n".join(lines))


if __name__ == "__main__":
    main()
