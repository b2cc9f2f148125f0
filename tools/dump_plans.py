"""Regenerate docs/PLANS.md — formatted physical-plan audits for the
headline queries (pushdown / pruning / broadcast / shuffle evidence)."""

from __future__ import annotations

import sys

sys.path.insert(0, ".")


def main():
    import __spark_entry__ as e
    from memo_fraktur_ocr_code_spark.session import get_spark

    spark = get_spark(master="local[4]", shuffle_partitions=8)
    sf = "/root/testdata/sf0.001"
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )

    def plan(df):
        return df._jdf.queryExecution().explainString(mode)

    sections = []

    # merged-registry resolver — rotation-proof (registry membership
    # moves between queries() and extra_queries() across rounds)
    merged_q = dict(e.queries())
    merged_q.update(e.extra_queries())

    def _q(name):
        return merged_q[name]

    def add(title, df, note):
        p = plan(df)
        lines = p.splitlines()
        tree_end = next(
            (i for i, line in enumerate(lines) if line.strip() == "" and i > 3),
            len(lines),
        )
        tree = "\n".join(lines[:tree_end])
        details = "\n".join(
            line
            for line in lines
            if "PushedFilters" in line or "ReadSchema" in line
        )
        sections.append(f"## {title}\n\n{note}\n\n```\n{tree}\n{details}\n```\n")

    add(
        "Flagship correction pipeline (single-shuffle partition-walk)",
        e.entry(spark),
        "One Exchange total: both channels union, hash-repartition by "
        "conv_id (explicit count — AQE byte-coalescing would serialize the "
        "CPU-bound kernel), sort within partitions, one Arrow kernel walks "
        "whole partitions.",
    )
    add(
        "TPC-H Q1-style aggregate (q1_lineitem_agg)",
        _q("q1_lineitem_agg")(spark, sf),
        "Predicate pushdown to the parquet scan, column pruning to 6 "
        "columns, partial (map-side) HashAggregate before the exchange.",
    )
    add(
        "Order-revenue top-k (j4_q3_top_orders)",
        _q("j4_q3_top_orders")(spark, sf),
        "Both dimension joins planned as BroadcastHashJoin; top-k as "
        "TakeOrderedAndProject (no global sort).",
    )
    add(
        "MinHash-LSH near-dup pairs (dedup_minhash_lsh)",
        _q("dedup_minhash_lsh")(spark, sf),
        "Candidates via band-bucket equi-join (SortMergeJoin on (band, "
        "bucket)) — shuffles scale with candidates, never |docs|²; the "
        "signature-estimate pre-prune (r3) shrinks the exact shingle "
        "verify join's input before it runs.",
    )
    add(
        "Exact cosine top-k (sim_ann_cosine)",
        _q("sim_ann_cosine")(spark, sf),
        "Query side broadcast (BroadcastNestedLoopJoin over the small "
        "query set); scores fold JVM-side (zip_with/aggregate inside "
        "codegen); window top-k per query.",
    )
    add(
        "SRP-LSH embedding dedup (dedup_embedding_srp)",
        _q("dedup_embedding_srp")(spark, sf),
        "Multi-band bucket equi-join (2×6-bit bands ORed via posexplode + "
        "distinct) — no crossJoin in the plan; exact cosine verify only "
        "on same-bucket pairs.",
    )
    add(
        "IVF-style ANN (sim_ivf_topk)",
        _q("sim_ivf_topk")(spark, sf),
        "Window-free centroid pick: TakeOrderedAndProject selects the "
        "n_lists smallest-id vectors (r3 fix — no single-partition "
        "Window anywhere); corpus assignment via broadcast argmax, "
        "probes via broadcast equi-join on list id.",
    )
    add(
        "Top-N calibration sum (a10_augmented_dict uses top_n_sum)",
        _q("a10_augmented_dict")(spark, sf),
        "Distributed top-k: TakeOrderedAndProject feeds the sum — no "
        "single-partition Window in the plan (VERDICT r1 item 5).",
    )
    def _auto_plan():
        import __spark_entry__ as entry
        base, alt, lex = entry.transcripts_from_documents(spark, sf)
        from memo_fraktur_ocr_code_spark.plans.pipeline import (
            correct_pipeline,
        )
        return correct_pipeline(
            spark, base, alt, lex, fused="auto", long_conv_threshold=8
        )

    add(
        "Skew-routed pipeline (fused='auto')",
        _auto_plan(),
        "Union of the partition-walk plan (short conversations) and the "
        "staged per-turn plan (pathological conversations); long-id list "
        "is a BroadcastHashJoin on both splits.",
    )
    add(
        "Gopher repetition filters (repetition_stats)",
        _q("repetition_stats")(spark, sf),
        "Line measures are per-row array expressions inside codegen; the "
        "top-2-gram mode is one hash-aggregate shuffle on (doc, gram) + a "
        "doc-partitioned window — scales with corpus, never corpus².",
    )
    add(
        "Trained-codebook IVF ANN (sim_ivf_trained_topk)",
        _q("sim_ivf_trained_topk")(spark, sf),
        "2 Lloyd rounds: each a broadcast-argmax assignment (no corpus "
        "shuffle) + a (list,dim)-keyed aggregation whose reduce "
        "cardinality is n_lists x dim; no SinglePartition anywhere and "
        "the narrow per-dim sums stay inside whole-stage codegen (a "
        "dim-wide aggregate blows Janino's 64 KB method limit).",
    )
    add(
        "Benchmark decontamination (decontaminate_bench)",
        _q("decontaminate_bench")(spark, sf),
        "The benchmark gram set is a BroadcastExchange; training-corpus "
        "grams are pipelined posexplode off the scan (no shuffle) and "
        "only matching hits enter the per-doc count aggregation — "
        "shuffle ∝ contamination hits, not corpus size.",
    )
    add(
        "Token-budget pack assignment (pack_token_budget)",
        _q("pack_token_budget")(spark, sf),
        "The running-sum window is PARTITIONED by shard (hash exchange "
        "on shard, never SinglePartition) — per-shard quota packing "
        "parallelizes to n_shards at any corpus size.",
    )
    add(
        "Chat-template conversation rendering (transcript_render)",
        _q("transcript_render")(spark, sf),
        "ONE conversation-keyed hash aggregate (collect_list) with the "
        "ordering done by array_sort INSIDE the aggregate — no window, "
        "no sort exchange; over bucket(conv_id) tables the single "
        "Exchange elides.",
    )
    add(
        "SFT context-window mining (transcript_sft_pairs)",
        _q("transcript_sft_pairs")(spark, sf),
        "One conversation-partitioned window with a BOUNDED "
        "rowsBetween(-k,-1) frame — per-row state is k turns, whale "
        "conversations cost O(k); the only Exchange keys on conv_id.",
    )
    add(
        "Shared-prefix conversation dedup (transcript_prefix_dedup)",
        _q("transcript_prefix_dedup")(spark, sf),
        "Turn-level work is one conversation-keyed aggregate; the "
        "group/keeper aggregate and its join run over the already "
        "conversation-sized signature table (corpus-of-turns never "
        "shuffles twice).",
    )
    add(
        "DSIR importance resampling (dsir_importance)",
        _q("dsir_importance")(spark, sf),
        "Both corpus-sized aggregations key on the hashed bucket — "
        "reduce cardinality CAPPED at n_buckets by construction, so "
        "map-side combine absorbs essentially all rows; the per-bucket "
        "score table is a BroadcastExchange that can never exceed "
        "n_buckets rows (a SAFE forced broadcast, unlike a "
        "data-dependent gram set); the feature stream is posexplode "
        "off the scan, never a shuffle of its own.",
    )
    add(
        "Trigram Stupid Backoff LM (stupid_backoff_lm)",
        _q("stupid_backoff_lm")(spark, sf),
        "Three Zipf-keyed count aggregations (uni/bi/trigram) with "
        "partial map-side combine + five UNHINTED left joins of the "
        "positions stream against them — AQE broadcasts the count "
        "tables while they fit and shuffle-joins on the gram key at "
        "corpus scale; the single-row token total is a broadcast "
        "nested-loop of one row.",
    )
    add(
        "Embedding-level decontamination (embedding_decontaminate)",
        _q("embedding_decontaminate")(spark, sf),
        "The REGISTERED plan is the SRP scale path: corpus vectors "
        "hash to banded signatures map-side (Arrow twin of the "
        "Catalyst fold), candidates come from a band equi-join against "
        "the BROADCAST bench band table, and only above-threshold hits "
        "reach the distinct + per-id rollup — per-corpus-row cost is "
        "~bands hash probes, not |bench| dot products.",
    )
    add(
        "Paragraph-level exact dedup (dedup_paragraphs)",
        _q("dedup_paragraphs")(spark, sf),
        "Three keyed exchanges, all necessary: the paragraph-owner "
        "aggregation (min(struct) — partial-aggregatable, so Zipf-hot "
        "paragraphs combine map-side), the UNHINTED owner join (AQE "
        "broadcasts while the distinct-paragraph table is small, "
        "shuffle-joins on the paragraph key at corpus scale), and the "
        "id-keyed ordered reassembly.  No corpus-wide window.",
    )
    add(
        "Count-min sketch build + estimate (cms_heavy_hitters)",
        _q("cms_heavy_hitters")(spark, sf),
        "The sketch build expands rows depth x map-side and partially "
        "aggregates immediately — the exchange carries counter state "
        "bounded by depth*width per task.  The estimate side joins a "
        "FORCED-broadcast sketch, justified structurally: the sketch "
        "can never exceed depth*width rows regardless of corpus size.",
    )
    add(
        "Integer-ppm PageRank, 5 iterations (pagerank)",
        _q("pagerank")(spark, sf),
        "Each iteration is one src-keyed join (ranks x out-edges) + "
        "one dst-keyed aggregation with map-side combine absorbing hub "
        "skew; consecutive iterations rendezvous on the same hash "
        "partitioning, and localCheckpoint cadence keeps the plan tree "
        "from growing with the iteration count.",
    )
    add(
        "Bloom membership pre-screen (bloom_decontaminate)",
        _q("bloom_decontaminate")(spark, sf),
        "The filter side is a FORCED broadcast with a structural bound "
        "(at most m_bits/32 rows regardless of corpus size); the probe "
        "stream expands k positions map-side off the scan and reduces "
        "with one key aggregation — definite-miss rows never reach the "
        "exact-membership join.",
    )
    add(
        "Epoch-level repetition (expand_epochs)",
        _q("expand_epochs")(spark, sf),
        "The weights table is |domains| rows broadcast by construction; "
        "the replication itself is a map-side explode off the scan — "
        "rows out IS the product (the temperature mix materialized), "
        "not shuffle overhead.",
    )
    add(
        "Exact-substring span excision (remove_dup_spans)",
        _q("remove_dup_spans")(spark, sf),
        "The apply half of Lee et al. substring dedup: only "
        "(span_key, id, pos) triples shuffle (text stays in the "
        "scan), the canonical election is one map-side-combined hash "
        "aggregation, the occ>1 slice joins back UNHINTED (tiny under "
        "Zipf -> AQE broadcast; unbounded on boilerplate-heavy "
        "corpora -> shuffle join), and the excision itself is "
        "per-document array work off the positions list — merged "
        "intervals first, so the per-token coverage test is "
        "O(tokens x merged-intervals).",
    )
    add(
        "Batch hopping-window rollup (window_rollup)",
        _q("window_rollup")(spark, sf),
        "Expand (size/slide replicas per row) happens map-side off the "
        "scan; one hash aggregation on (window, event_type) with the "
        "distinct-user expand — the exact batch twin of the streaming "
        "watermarked rollup, epoch-aligned so backfill buckets match "
        "the live edge byte-for-byte.",
    )

    out = (
        "# Physical plan audits (`.explain('formatted')`, local[4],"
        " sf0.001)\n\n"
        "Regenerate with `python tools/dump_plans.py`.\n\n"
        + "\n".join(sections)
    )
    with open("docs/PLANS.md", "w") as f:
        f.write(out)
    print("written docs/PLANS.md")
    spark.stop()


if __name__ == "__main__":
    main()
