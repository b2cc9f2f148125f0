"""n_probe → recall sweep: trained vs untrained IVF codebook.

The only reason to train the codebook (Lloyd rounds in
similarity.kmeans_centroids) is better recall at equal probe cost —
this script produces that evidence (VERDICT r3 item 8): for each
``n_probe``, recall@k of ``ivf_topk`` against the exact brute-force
top-k, with the untrained min-id codebook vs the 2-round trained one,
over the driver's embeddings table.  Deterministic end to end (fixed
codebook init = smallest ids, exact fixed-point Lloyd means, quantized
scores) — reruns reproduce the table byte for byte.

Usage: python tools/sweep_ivf.py [sf_dir] [k]
Prints one JSON line; table quoted in BENCH_NOTES.md.
"""

from __future__ import annotations

import json
import sys

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 5

    from memo_fraktur_ocr_code_spark.operators.similarity import (
        cosine_topk,
        ivf_topk,
        kmeans_centroids,
    )
    from memo_fraktur_ocr_code_spark.session import get_spark

    spark = get_spark(master="local[8]", shuffle_partitions=16)
    spark.sparkContext.setLogLevel("ERROR")
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    corpus = emb.where(F.col("vec_id") >= 10).cache()
    queries = emb.where(F.col("vec_id") < 10).cache()
    n_corpus = corpus.count()
    queries.count()

    exact = {
        (r.query_id, r.neighbor_id)
        for r in cosine_topk(corpus, queries, k=k).collect()
    }
    trained_cents = kmeans_centroids(
        corpus, dim=64, n_lists=16, iters=2
    ).cache()
    trained_cents.count()

    rows = []
    for n_probe in (1, 2, 4, 8):
        got_u = {
            (r.query_id, r.neighbor_id)
            for r in ivf_topk(
                corpus, queries, k=k, n_lists=16, n_probe=n_probe
            ).collect()
        }
        got_t = {
            (r.query_id, r.neighbor_id)
            for r in ivf_topk(
                corpus, queries, k=k, n_lists=16, n_probe=n_probe,
                centroids=trained_cents,
            ).collect()
        }
        rows.append(
            {
                "n_probe": n_probe,
                "recall_untrained": round(len(got_u & exact) / len(exact), 4),
                "recall_trained": round(len(got_t & exact) / len(exact), 4),
            }
        )
    print(
        json.dumps(
            {
                "metric": "ivf_recall_sweep",
                "sf_dir": sf_dir,
                "k": k,
                "n_corpus": n_corpus,
                "n_lists": 16,
                "lloyd_iters": 2,
                "sweep": rows,
            }
        )
    )


if __name__ == "__main__":
    main()
