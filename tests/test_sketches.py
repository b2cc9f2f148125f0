"""Unit tests for the mergeable sketches (operators/sketches.py):
count-min one-sidedness and additivity, KMV partition-invariance and
the exact small-group branch."""

from __future__ import annotations

from pyspark.sql import functions as F

from memo_fraktur_ocr_code_spark.operators.sketches import (
    cms_build,
    cms_estimate,
    kmv_build,
    kmv_estimate,
)


def _tokens(spark, rows):
    return spark.createDataFrame([(t,) for t in rows], "token string")


def test_cms_never_undercounts_even_under_collisions(spark):
    rows = [f"tok{i}" for i in range(40) for _ in range(i % 5 + 1)]
    df = _tokens(spark, rows)
    true = {
        r.token: r.cnt
        for r in df.groupBy("token").agg(F.count("*").alias("cnt")).collect()
    }
    # width 4 guarantees heavy collisions over 40 distinct keys
    sketch = cms_build(df, "token", depth=2, width=4)
    est = cms_estimate(
        sketch, df.select("token").distinct(), "token", depth=2, width=4
    )
    got = {r.token: r.cms_cnt for r in est.collect()}
    assert set(got) == set(true)
    assert all(got[t] >= true[t] for t in true)
    assert any(got[t] > true[t] for t in true)  # collisions are live


def test_cms_exact_when_wide_and_additive(spark):
    df = _tokens(spark, ["a", "a", "b", "c", "c", "c"])
    sketch = cms_build(df, "token", depth=4, width=4096)
    est = cms_estimate(
        sketch, df.select("token").distinct(), "token", depth=4, width=4096
    )
    got = {r.token: r.cms_cnt for r in est.collect()}
    assert got == {"a": 2, "b": 1, "c": 3}
    # additivity: sketch(x union y) == elementwise sum of the sketches —
    # the property that makes per-shard sketches mergeable
    x = _tokens(spark, ["a", "b"])
    y = _tokens(spark, ["a", "c", "c"])
    merged = (
        cms_build(x, "token", 2, 8)
        .unionByName(cms_build(y, "token", 2, 8))
        .groupBy("d", "slot")
        .agg(F.sum("cnt").alias("cnt"))
    )
    whole = cms_build(x.unionByName(y), "token", 2, 8)
    a = {(r.d, r.slot): r.cnt for r in merged.collect()}
    b = {(r.d, r.slot): r.cnt for r in whole.collect()}
    assert a == b


def test_kmv_partition_invariant_and_exact_small_groups(spark):
    df = spark.range(0, 500).select(
        (F.col("id") % 3).cast("string").alias("grp_in"),
        F.concat(F.lit("k"), F.col("id")).alias("key"),
    )
    one = {
        r.grp: r.hs
        for r in kmv_build(
            df.repartition(1), "key", group_col="grp_in", k=32
        ).collect()
    }
    many = {
        r.grp: r.hs
        for r in kmv_build(
            df.repartition(7), "key", group_col="grp_in", k=32
        ).collect()
    }
    assert one == many  # global bottom-k is partitioning-independent
    assert all(len(hs) == 32 and hs == sorted(hs) for hs in one.values())

    # small group (< k distinct): estimate IS the exact count
    small = spark.createDataFrame(
        [("g", f"k{i}") for i in range(10)], "grp_in string, key string"
    )
    est = kmv_estimate(
        kmv_build(small, "key", group_col="grp_in", k=32), k=32
    ).collect()
    assert len(est) == 1
    assert est[0].sketch_size == 10 and est[0].kmv_distinct == 10


def test_window_rollup_tumbling_and_hopping(spark):
    from memo_fraktur_ocr_code_spark.operators.timeseries import (
        window_rollup,
    )

    rows = [
        (1, "2024-01-01 00:10:00", "a", 1),
        (2, "2024-01-01 00:50:00", "a", 2),
        (3, "2024-01-01 01:10:00", "a", 1),
        (4, None, "a", 9),  # NULL ts excluded, visibly
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts string, event_type string, user_id long"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    tumbling = {
        r.win_start: (r.n_events, r.n_users)
        for r in window_rollup(df, size_s=3600).collect()
    }
    base = 1704067200  # 2024-01-01T00:00:00Z
    assert tumbling == {base: (2, 2), base + 3600: (1, 1)}
    hopping = {
        r.win_start: (r.n_events, r.n_users)
        for r in window_rollup(df, size_s=3600, slide_s=1800).collect()
    }
    # every event lands in exactly two 1h/30min windows
    assert hopping == {
        base - 1800: (1, 1),     # covers 00:10 only
        base: (2, 2),            # covers 00:10 + 00:50
        base + 1800: (2, 2),     # covers 00:50 + 01:10
        base + 3600: (1, 1),     # covers 01:10 only
    }


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src long, dst long")


def test_pagerank_cycle_is_a_fixed_point(spark):
    from memo_fraktur_ocr_code_spark.operators.graph import pagerank

    # 2-cycle: each node hands its whole rank to the other, so
    # 1_000_000 ppm is exactly stationary under 150000 + (17*x) DIV 20
    got = {
        r.node: r.rank_ppm
        for r in pagerank(_edges(spark, [(1, 2), (2, 1)]), iters=7).collect()
    }
    assert got == {1: 1_000_000, 2: 1_000_000}


def test_pagerank_star_matches_hand_computation(spark):
    from memo_fraktur_ocr_code_spark.operators.graph import pagerank

    # A(1) -> B(2), A -> C(3); B and C are dangling.  Their mass folds
    # back uniformly each iteration (dangling fix, VERDICT r5):
    # it1: dang = 2_000_000, redist = 666_666;
    #   A = 150_000 + 17*666_666 DIV 20            = 716_666
    #   B = 150_000 + 17*(500_000 + 666_666) DIV 20 = 1_141_666
    e = _edges(spark, [(1, 2), (1, 3)])
    it1 = {r.node: r.rank_ppm for r in pagerank(e, iters=1).collect()}
    assert it1 == {1: 716_666, 2: 1_141_666, 3: 1_141_666}
    # it2: dang = 2_283_332, redist = 761_110;
    #   A = 150_000 + 17*761_110 DIV 20               = 796_943
    #   B = 150_000 + 17*(358_333 + 761_110) DIV 20   = 1_101_526
    it2 = {r.node: r.rank_ppm for r in pagerank(e, iters=2).collect()}
    assert it2 == {1: 796_943, 2: 1_101_526, 3: 1_101_526}


def test_pagerank_conserves_mass_with_planted_sinks(spark):
    from memo_fraktur_ocr_code_spark.operators.graph import pagerank

    # Sink-heavy graph: 6 sources all pointing into 4 pure sinks.
    # With the dangling fold-back the total stays N * 1e6 ppm up to
    # DIV truncation (< 2 ppm lost per node per iteration); the leaky
    # variant would drain ~40% of the mass per iteration here.
    pairs = [(i, 100 + (i % 4)) for i in range(6)]
    n = 10
    for iters in (1, 3, 5):
        got = pagerank(_edges(spark, pairs), iters=iters).collect()
        assert len(got) == n
        total = sum(r.rank_ppm for r in got)
        assert n * 1_000_000 - total <= 2 * n * iters
        assert total <= n * 1_000_000


def test_pagerank_partition_invariant_and_hub_dominates(spark):
    from memo_fraktur_ocr_code_spark.operators.graph import pagerank

    pairs = [(i, (i * 3 + 1) % 40) for i in range(40)] + [
        (i, 7) for i in range(40) if i != 7
    ]
    one = {
        r.node: r.rank_ppm
        for r in pagerank(_edges(spark, pairs).repartition(1), iters=4).collect()
    }
    many = {
        r.node: r.rank_ppm
        for r in pagerank(_edges(spark, pairs).repartition(9), iters=4).collect()
    }
    assert one == many  # integer sums commute; floats would not
    assert one[7] == max(one.values())  # the planted hub wins


def test_bloom_no_false_negatives_and_packing(spark):
    from memo_fraktur_ocr_code_spark.operators.sketches import (
        bloom_build,
        bloom_might_contain,
    )

    keys = spark.createDataFrame(
        [(f"key{i}",) for i in range(200)], "k string"
    )
    bloom = bloom_build(keys, "k", m_bits=1 << 12, k=4)
    rows = bloom.collect()
    assert all(0 <= r.widx < (1 << 12) // 32 for r in rows)
    assert all(0 < r.bits < (1 << 32) for r in rows)  # 32-bit words
    hits = {
        r.k: r.bloom_hit
        for r in bloom_might_contain(
            bloom, keys, "k", m_bits=1 << 12, k=4
        ).collect()
    }
    assert all(hits[f"key{i}"] == 1 for i in range(200))  # never misses


def test_bloom_false_positives_are_one_sided_only(spark):
    from memo_fraktur_ocr_code_spark.operators.sketches import (
        bloom_build,
        bloom_might_contain,
    )

    members = spark.createDataFrame(
        [(f"in{i}",) for i in range(300)], "k string"
    )
    outsiders = spark.createDataFrame(
        [(f"out{i}",) for i in range(300)], "k string"
    )
    # tiny filter (256 bits, 300 keys * 4 hashes): heavily saturated,
    # so some outsiders MUST collide — and every member still hits
    bloom = bloom_build(members, "k", m_bits=256, k=4)
    mh = bloom_might_contain(bloom, members, "k", m_bits=256, k=4)
    oh = bloom_might_contain(bloom, outsiders, "k", m_bits=256, k=4)
    assert all(r.bloom_hit == 1 for r in mh.collect())
    fp = sum(r.bloom_hit for r in oh.collect())
    assert fp > 0  # saturation makes false positives live
