"""Unit tests for the r5-session-4 data-selection operators: DSIR
hashed-ngram importance resampling (curation.dsir_importance /
dsir_resample), trigram Stupid Backoff LM scoring
(textstats.stupid_backoff_score), and embedding-level benchmark
decontamination (similarity.decontaminate_embeddings)."""

from __future__ import annotations

from pyspark.sql import functions as F

from memo_fraktur_ocr_code_spark.operators.curation import (
    dsir_importance,
    dsir_resample,
    hashed_ngram_features,
)
from memo_fraktur_ocr_code_spark.operators.similarity import (
    decontaminate_embeddings,
)
from memo_fraktur_ocr_code_spark.operators.textstats import (
    stupid_backoff_score,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


# ---------------------------------------------------------------- DSIR


def test_hashed_features_counts_unigrams_plus_bigrams(spark):
    df = _docs(spark, [(1, "a b c"), (2, "x"), (3, "")])
    out = hashed_ngram_features(df).groupBy("id").count().collect()
    got = {r.id: r["count"] for r in out}
    # doc 1: 3 unigrams + 2 bigrams; doc 2: 1 unigram; doc 3: nothing
    assert got == {1: 5, 2: 1}


def test_hashed_features_bucket_range_and_determinism(spark):
    df = _docs(spark, [(1, "alpha beta gamma delta")])
    a = hashed_ngram_features(df, n_buckets=64).collect()
    b = hashed_ngram_features(df, n_buckets=64).collect()
    assert sorted(r.bucket for r in a) == sorted(r.bucket for r in b)
    assert all(0 <= r.bucket < 64 for r in a)


def test_dsir_prefers_target_like_documents(spark):
    # target speaks "ocean" vocabulary; raw mixes ocean docs with
    # unrelated ones — the ocean docs must outscore the others AT EQUAL
    # LENGTH (the score sums per-occurrence evidence, so it is
    # length-sensitive by design, exactly like the paper's
    # log-likelihood-ratio sum; comparisons hold length fixed).
    # n_buckets is kept well under the corpus totals — with totals <<
    # n_buckets the add-one smoothing floor swamps the count signal
    # (at corpus scale totals >> buckets always holds).
    ocean = "waves tide coral reef current salt waves tide"
    other = "gears pistons torque flywheel camshaft valves engine oil"
    raw = _docs(
        spark,
        [
            (1, ocean),
            (2, other),
            (3, ocean + " " + ocean),
            (4, other + " " + other),
        ],
    )
    target = _docs(spark, [(10, ocean), (11, "tide coral waves salt")])
    scored = {
        r.doc_id: r.dsir_ppm
        for r in dsir_importance(raw, target, n_buckets=16).collect()
    }
    assert scored[1] > scored[2]
    assert scored[3] > scored[4]


def test_dsir_scores_every_raw_doc_including_empty(spark):
    raw = _docs(spark, [(1, "a b"), (2, ""), (3, None)])
    target = _docs(spark, [(9, "a b")])
    out = dsir_importance(raw, target).collect()
    got = {r.doc_id: (r.n_feats, r.dsir_ppm) for r in out}
    assert set(got) == {1, 2, 3}
    assert got[2] == (0, 0) and got[3] == (0, 0)


def test_dsir_resample_keeps_topk_deterministically(spark):
    ocean = "waves tide coral reef"
    raw = _docs(
        spark,
        [(i, ocean if i % 2 == 0 else "gears pistons torque flywheel")
         for i in range(10)],
    )
    target = _docs(spark, [(99, ocean)])
    kept = dsir_resample(raw, target, keep_n=5, n_buckets=256).collect()
    assert [r.doc_id for r in kept] == [0, 2, 4, 6, 8]


def test_dsir_empty_target_still_scores(spark):
    raw = _docs(spark, [(1, "a b c")])
    target = _docs(spark, [(9, "x")]).where(F.lit(False))
    out = dsir_importance(raw, target).collect()
    assert len(out) == 1  # smoothed target ppm, no crash on nt=0


# ------------------------------------------------- Stupid Backoff LM


def test_stupid_backoff_trigram_hit_beats_backoff(spark):
    train = _docs(spark, [(1, "a b c a b c a b c")])
    score = _docs(
        spark,
        [
            (10, "a b c"),   # seen trigram → direct ratio
            (11, "c c b"),   # unseen trigram AND unseen bigrams → 0.16 path
        ],
    )
    out = {
        r.doc_id: r.sb_ppm
        for r in stupid_backoff_score(score, train=train).collect()
    }
    assert out[10] > out[11] > 0


def test_stupid_backoff_short_docs_score_zero(spark):
    d = _docs(spark, [(1, "a b"), (2, ""), (3, None)])
    out = stupid_backoff_score(d).collect()
    assert all(r.n_scored == 0 and r.sb_ppm == 0 for r in out)


def test_stupid_backoff_self_trained_trigrams_all_seen(spark):
    # trained on itself every trigram is seen: per-position score is
    # c3 * 1e6 DIV c(w1 w2), here 1e6 exactly for a unique sentence
    d = _docs(spark, [(1, "p q r s")])
    out = stupid_backoff_score(d).collect()[0]
    assert out.n_scored == 2 and out.sb_ppm == 1000000


def test_stupid_backoff_backoff_order(spark):
    # unseen trigram but seen bigram must outscore unseen everything
    train = _docs(spark, [(1, "a b x y")])
    score = _docs(
        spark,
        [
            (10, "q a b"),  # trigram unseen, bigram (a b) seen → 0.4 path
            (11, "q q q"),  # everything unseen → 0.16 * 0 = 0
        ],
    )
    out = {
        r.doc_id: r.sb_ppm
        for r in stupid_backoff_score(score, train=train).collect()
    }
    assert out[10] > out[11] == 0


# -------------------------------------- embedding decontamination


def _vecs(spark, rows):
    return spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")


def test_embedding_decontaminate_brute_flags_scaled_copies(spark):
    base = [float(i % 7 + 1) for i in range(8)]
    other = [float((i * 3) % 5 + 1) for i in range(8)]
    corpus = _vecs(spark, [(1, base), (2, other)])
    bench = _vecs(spark, [(100, [x * 2.0 for x in base])])
    out = {
        r.vec_id: (r.n_hits, r.contaminated)
        for r in decontaminate_embeddings(
            corpus, bench, dim=8, method="brute"
        ).collect()
    }
    assert out[1] == (1, 1)
    assert out[2] == (0, 0)


def test_embedding_decontaminate_srp_matches_brute_on_planted(spark):
    # scaled copies have identical SRP signatures (sign(w.av)=sign(w.v))
    # → the banded path has guaranteed recall on every planted hit
    import random

    rng = random.Random(5)
    corpus_rows = [
        (i, [rng.uniform(-1, 1) for _ in range(16)]) for i in range(40)
    ]
    corpus = _vecs(spark, corpus_rows)
    bench = _vecs(
        spark,
        [(100 + i, [x * 3.0 for x in v]) for i, v in corpus_rows if i % 9 == 0],
    )
    brute = decontaminate_embeddings(
        corpus, bench, dim=16, method="brute"
    ).collect()
    srp = decontaminate_embeddings(
        corpus, bench, dim=16, method="srp", bits=24, bands=6
    ).collect()
    as_map = lambda rows: {r.vec_id: (r.n_hits, r.contaminated) for r in rows}
    assert as_map(brute) == as_map(srp)
    assert sum(r.contaminated for r in brute) == 5  # ids 0,9,18,27,36


def test_embedding_decontaminate_unknown_method(spark):
    corpus = _vecs(spark, [(1, [1.0, 2.0])])
    try:
        decontaminate_embeddings(corpus, corpus, dim=2, method="nope")
        assert False, "expected ValueError"
    except ValueError:
        pass


# ---------------------------------- cluster capping + temperature mix


def test_cap_cluster_sizes_keeps_m_smallest_ids(spark):
    from memo_fraktur_ocr_code_spark.operators.dedup import (
        cap_cluster_sizes,
    )

    members = spark.createDataFrame(
        [(5, 1), (3, 1), (9, 1), (7, 7), (2, 2), (4, 2)],
        "id bigint, cluster_id bigint",
    )
    out = {
        r.id: (r.cluster_size, r.rank_in_cluster, r.keep)
        for r in cap_cluster_sizes(members, 2).collect()
    }
    assert out[3] == (3, 1, 1) and out[5] == (3, 2, 1)
    assert out[9] == (3, 3, 0)  # third member of a capped-at-2 cluster
    assert out[7] == (1, 1, 1)  # singleton survives
    assert out[2] == (2, 1, 1) and out[4] == (2, 2, 1)


def test_cap_cluster_sizes_m1_equals_canonicalization(spark):
    from memo_fraktur_ocr_code_spark.operators.dedup import (
        cap_cluster_sizes,
    )

    members = spark.createDataFrame(
        [(5, 1), (1, 1), (2, 2)], "id bigint, cluster_id bigint"
    )
    kept = {
        r.id
        for r in cap_cluster_sizes(members, 1).collect()
        if r.keep == 1
    }
    assert kept == {1, 2}  # exactly the cluster minima


def test_cap_cluster_sizes_validates_m(spark):
    from memo_fraktur_ocr_code_spark.operators.dedup import (
        cap_cluster_sizes,
    )

    try:
        cap_cluster_sizes(spark.range(1), 0)
        assert False, "expected ValueError"
    except ValueError:
        pass


def test_temperature_mix_flattens_toward_uniform(spark):
    from memo_fraktur_ocr_code_spark.operators.curation import (
        temperature_mix_weights,
    )

    df = spark.createDataFrame(
        [("big", "w " * 90), ("small", "w " * 10)],
        "source string, text string",
    )
    out = {
        r.domain: (r.share_ppm, r.temp_ppm)
        for r in temperature_mix_weights(df, alpha_quarters=2).collect()
    }
    # alpha=1/2: q_big = 3/4, q_small = 1/4 (sqrt(.9):sqrt(.1) = 3:1)
    assert out["big"][0] == 900000 and out["small"][0] == 100000
    assert out["big"][1] == 750000 and out["small"][1] == 250000


def test_temperature_mix_alpha_identity_and_validation(spark):
    from memo_fraktur_ocr_code_spark.operators.curation import (
        temperature_mix_weights,
    )

    df = spark.createDataFrame(
        [("a", "w " * 30), ("b", "w " * 10)],
        "source string, text string",
    )
    out = {
        r.domain: r.temp_ppm
        for r in temperature_mix_weights(df, alpha_quarters=4).collect()
    }
    # alpha=1 is the identity: temperature shares == raw shares
    assert out == {"a": 750000, "b": 250000}
    try:
        temperature_mix_weights(df, alpha_quarters=5)
        assert False, "expected ValueError"
    except ValueError:
        pass


def test_sample_to_temperature_caps_and_keeps_underrepresented(spark):
    from memo_fraktur_ocr_code_spark.operators.curation import (
        sample_to_temperature,
    )

    rows = [(i, "big", "w " * 90) for i in range(30)] + [
        (100 + i, "small", "w " * 10) for i in range(30)
    ]
    df = spark.createDataFrame(
        rows, "doc_id bigint, source string, text string"
    )
    out = sample_to_temperature(df, alpha_quarters=2).collect()
    by_dom = {}
    for r in out:
        by_dom.setdefault(r.domain, []).append(r)
    # big: share 0.9 → temp 0.75 → rate 8333bp (downsampled);
    # small: share 0.1 → temp 0.25 → rate capped at 10000 (kept whole)
    assert all(r.rate_bp == 10000 and r.keep == 1 for r in by_dom["small"])
    big = by_dom["big"]
    assert big[0].rate_bp == 8333
    assert all(
        (r.keep == 1) == (r.bucket < r.rate_bp) for r in big
    )
    # keep-everything contract: every input doc has a verdict row
    assert len(out) == 60


def test_expand_epochs_replicates_by_weight(spark):
    from pyspark.sql import functions as F

    from memo_fraktur_ocr_code_spark.operators.curation import (
        expand_epochs,
    )

    docs = spark.createDataFrame(
        [(i, "rare" if i < 10 else "big",
          "w" + " w" * (3 if i < 10 else 400))
         for i in range(110)],
        "doc_id bigint, source string, text string",
    )
    weights = spark.createDataFrame(
        # rare at 2.5 epochs, big capped to sampling at 0.6 epochs
        [("rare", 100, 25_000), ("big", 100, 6_000)],
        "domain string, share_ppm bigint, temp_ppm bigint",
    ).withColumn("share_ppm", F.lit(10_000))
    out = expand_epochs(docs, weights=weights).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append(r.epoch)
    rare_copies = [len(by_doc.get(i, [])) for i in range(10)]
    big_copies = [len(by_doc.get(i, [])) for i in range(10, 110)]
    # 25000 bp = 2 full copies + fractional half; every rare doc has 2
    # or 3 copies with contiguous 1-based epoch numbering
    assert all(c in (2, 3) for c in rare_copies), rare_copies
    assert any(c == 3 for c in rare_copies)
    for i in range(10):
        assert sorted(by_doc[i]) == list(range(1, len(by_doc[i]) + 1))
    # 6000 bp < 1 epoch degenerates to the sampling filter: 0/1 copies,
    # and roughly 60% kept (deterministic md5 buckets)
    assert all(c in (0, 1) for c in big_copies)
    kept = sum(big_copies)
    assert 40 <= kept <= 80, kept


def test_unimax_budget_allocation(spark):
    """UniMax (Chung et al. 2023): ascending walk, equal shares unless
    the epoch cap binds; budget conserved up to DIV truncation; no
    domain ever exceeds max_epochs passes."""
    from memo_fraktur_ocr_code_spark.operators.curation import (
        unimax_budgets,
    )
    from pyspark.sql import functions as F

    rows = []
    did = 0
    for dom, n_docs in (("tiny", 1), ("mid", 5), ("big", 20)):
        for _ in range(n_docs):
            rows.append((did, dom, "tok " * 10))
            did += 1
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    # tokens: tiny=10, mid=50, big=200; total=260
    out = {
        r.domain: r
        for r in unimax_budgets(df, budget_tokens=390, max_epochs=2).collect()
    }
    # walk ascending: tiny fair=130 cap=20 -> 20; mid fair=185 cap=100
    # -> 100; big fair=270 cap=400 -> 270
    assert out["tiny"].alloc_tokens == 20 and out["tiny"].epochs_bp == 20000
    assert out["mid"].alloc_tokens == 100 and out["mid"].epochs_bp == 20000
    assert out["big"].alloc_tokens == 270
    assert out["big"].epochs_bp == (270 * 10000) // 200  # 13500
    # conservation: caps bound supply, fair shares bound demand
    assert sum(r.alloc_tokens for r in out.values()) == 390
    for r in out.values():
        assert r.epochs_bp <= 20000
        assert r.cap_tokens == 2 * r.n_tokens
    # budget larger than every cap: everything takes its cap exactly
    full = {
        r.domain: r.alloc_tokens
        for r in unimax_budgets(df, budget_tokens=10_000, max_epochs=2).collect()
    }
    assert full == {"tiny": 20, "mid": 100, "big": 400}
