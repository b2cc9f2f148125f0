"""Unit tests for the corpus-curation operators (operators/curation.py):
benchmark decontamination and deterministic stratified sampling."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from memo_fraktur_ocr_code_spark.operators.curation import (
    decontaminate,
    pack_token_budget,
    redact_pii,
    split_assign,
    stratified_sample,
    word_ngram_table,
)

SENT = "the quick brown fox jumps over the lazy dog near the old mill"
# 13 tokens exactly — one 13-gram.
assert len(SENT.split()) == 13


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_word_ngram_table_counts_and_short_doc_guard(spark):
    df = _docs(
        spark,
        [
            (1, SENT + " extra token"),  # 15 tokens → 3 distinct 13-grams
            (2, "too short"),  # < 13 tokens → no rows
        ],
    )
    out = word_ngram_table(df, n=13).collect()
    ids = {r.id for r in out}
    assert ids == {1}
    assert len(out) == 3
    assert all(len(r.gram.split(" ")) == 13 for r in out)


def test_decontaminate_flags_overlap_and_keeps_clean_docs(spark):
    bench = _docs(spark, [(100, SENT.upper())])  # case-insensitive match
    train = _docs(
        spark,
        [
            (1, SENT),  # exact 13-gram overlap → contaminated
            (2, "Prefix words here " + SENT + " and a suffix"),  # interior
            (3, " ".join(SENT.split()[:12])),  # only 12 shared tokens
            (4, "totally unrelated text entirely"),  # clean, short
            (5, "a b c d e f g h i j k l m n o p q r"),  # clean, long
        ],
    )
    out = {r.doc_id: r for r in decontaminate(train, bench, n=13).collect()}
    assert set(out) == {1, 2, 3, 4, 5}  # every train doc appears once
    assert out[1].contaminated == 1 and out[1].n_hits == 1
    assert out[2].contaminated == 1 and out[2].n_hits >= 1
    assert out[3].contaminated == 0 and out[3].n_hits == 0
    assert out[4].contaminated == 0
    assert out[5].contaminated == 0


def test_decontaminate_plan_no_cartesian(spark):
    # r5: the gram join is UNHINTED (no static BroadcastExchange
    # assertion any more — AQE picks broadcast vs shuffle at runtime;
    # test_decontaminate_join_is_unhinted_aqe_decides pins both
    # choices).  The invariant that must hold in ANY plan: the join is
    # an equi-join on the gram key, never a cartesian.
    bench = _docs(spark, [(100, SENT)])
    train = _docs(spark, [(1, SENT), (2, "x y z")])
    plan = decontaminate(train, bench)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan


def _expected_bucket(doc_id: int, salt: str = "strat") -> int:
    hx = hashlib.md5(f"{salt}:{doc_id}".encode()).hexdigest()
    return int(hx[:8], 16) % 10000


def test_stratified_sample_matches_python_md5_replica(spark):
    rows = [(i, "lang%d" % (i % 3)) for i in range(300)]
    df = spark.createDataFrame(rows, "doc_id bigint, lang string")
    rates = {"lang0": 10000, "lang1": 2500, "lang2": 0}
    out = stratified_sample(df, rates, default_bp=0).collect()
    got = {(r.doc_id, r.lang, r.bucket) for r in out}
    want = {
        (i, lang, _expected_bucket(i))
        for i, lang in rows
        if _expected_bucket(i) < rates[lang]
    }
    assert got == want
    # rate 10000 keeps the whole stratum; rate 0 keeps none of it
    assert {r.doc_id for r in out if r.lang == "lang0"} == {
        i for i, l in rows if l == "lang0"
    }
    assert not [r for r in out if r.lang == "lang2"]


def test_stratified_sample_is_deterministic_and_salt_sensitive(spark):
    rows = [(i, "en") for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id bigint, lang string")
    a = sorted(r.doc_id for r in stratified_sample(df, {"en": 5000}).collect())
    b = sorted(r.doc_id for r in stratified_sample(df, {"en": 5000}).collect())
    assert a == b  # same salt → identical sample across runs
    c = sorted(
        r.doc_id
        for r in stratified_sample(df, {"en": 5000}, salt="other").collect()
    )
    assert a != c  # different salt → different (but still valid) sample
    # default_bp applies to strata missing from the map
    d = stratified_sample(
        df.withColumn("lang", F.lit("xx")), {"en": 5000}, default_bp=10000
    ).count()
    assert d == 200


def test_pack_token_budget_quota_bins(spark):
    # one shard (n_shards=1) so the packing sequence is easy to follow:
    # token counts 3, 4, 5 at budget 5 → cums 3, 7, 12 → packs 0, 1, 2
    df = _docs(spark, [(0, "a b c"), (1, "d e f g"), (2, "h i j k l")])
    out = {r.doc_id: r for r in pack_token_budget(df, 5, n_shards=1).collect()}
    assert [out[i].n_tokens for i in range(3)] == [3, 4, 5]
    assert [out[i].pack_id for i in range(3)] == [0, 1, 2]
    assert all(out[i].shard == 0 for i in range(3))


def test_pack_token_budget_shards_are_independent(spark):
    df = _docs(spark, [(i, "w " * (i + 1)) for i in range(40)])
    out = pack_token_budget(df, 100, n_shards=4).collect()
    # md5-hashed sharding, replicated in Python (engine-portable)
    def _shard(i):
        return int(
            hashlib.md5(f"shard:{i}".encode()).hexdigest()[:8], 16
        ) % 4

    assert {r.doc_id: r.shard for r in out} == {
        i: _shard(i) for i in range(40)
    }
    assert {r.shard for r in out} == {0, 1, 2, 3}
    # within a shard, pack_id is non-decreasing in doc order
    by_shard: dict[int, list] = {}
    for r in sorted(out, key=lambda r: r.doc_id):
        by_shard.setdefault(r.shard, []).append(r.pack_id)
    for packs in by_shard.values():
        assert packs == sorted(packs)


def test_pack_token_budget_accepts_string_ids(spark):
    """Sharding must hash, not pmod, the id — string conv_ids are the
    corpus convention; pmod(string) silently NULLed every shard and
    collapsed the window to one task (ADVICE r3)."""
    df = spark.createDataFrame(
        [(f"conv{i:04d}", "a b c") for i in range(12)],
        "doc_id string, text string",
    )
    out = pack_token_budget(df, 5, n_shards=4, id_col="doc_id").collect()
    assert len(out) == 12
    assert all(r.shard is not None and 0 <= r.shard < 4 for r in out)
    assert all(r.pack_id is not None and r.pack_id >= 0 for r in out)


def test_pack_token_budget_window_is_partitioned(spark):
    df = _docs(spark, [(i, "a b c") for i in range(20)])
    plan = (
        pack_token_budget(df, 10, n_shards=4)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Window" in plan
    # the shuffle feeding the window is hash-partitioned by shard, never
    # a single global partition
    assert "SinglePartition" not in plan


def test_redact_pii_replaces_and_counts(spark):
    df = _docs(
        spark,
        [
            (1, "mail bob.smith+x@sub.example.org now"),
            (2, "call +45 5550-1234 or +1 800 5551"),
            (3, "host 192.168.0.1 up"),
            (4, "nothing sensitive here"),
        ],
    )
    out = {r.doc_id: r for r in redact_pii(df).collect()}
    assert out[1].redacted == "mail <EMAIL> now"
    assert out[1].n_redactions == 1
    assert out[2].redacted == "call <PHONE> or <PHONE>"
    assert out[2].n_redactions == 2
    assert out[3].redacted == "host <IP> up"
    assert out[3].n_redactions == 1
    assert out[4].redacted == "nothing sensitive here"
    assert out[4].n_redactions == 0


def test_redact_pii_counts_matches_not_placeholders(spark):
    """Counting is per-stage on matches, so pre-existing placeholder
    text is not miscounted and metacharacter tags are safe."""
    df = _docs(spark, [(1, "already has <EMAIL> literal"),
                       (2, "mail a@b.org now")])
    out = {r.doc_id: r for r in redact_pii(df).collect()}
    assert out[1].n_redactions == 0  # no actual email matched
    assert out[1].redacted == "already has <EMAIL> literal"
    assert out[2].n_redactions == 1
    # custom tag with regex metacharacters ($, character class)
    custom = [(r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "[$EM]")]
    out2 = {
        r.doc_id: r for r in redact_pii(df, patterns=custom).collect()
    }
    assert out2[2].redacted == "mail [$EM] now"
    assert out2[2].n_redactions == 1
    assert out2[1].n_redactions == 0


def test_redact_pii_plan_has_no_shuffle(spark):
    df = _docs(spark, [(1, "a@b.dk")])
    plan = redact_pii(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_split_assign_matches_replica_and_is_growth_stable(spark):
    """Split labels must match the Python md5 replica exactly AND be
    invariant under corpus growth: adding rows never moves an existing
    row's split (the property that keeps eval sets stable while a crawl
    corpus is extended)."""

    def _label(i):
        b = int(
            hashlib.md5(f"split:{i}".encode()).hexdigest()[:8], 16
        ) % 10000
        return "test" if b < 500 else ("train" if b < 9500 else "val")

    small = spark.createDataFrame(
        [(i, "en") for i in range(200)], "doc_id bigint, lang string"
    )
    big = spark.createDataFrame(
        [(i, "en") for i in range(400)], "doc_id bigint, lang string"
    )
    s = {r.doc_id: r.split for r in split_assign(small).collect()}
    assert s == {i: _label(i) for i in range(200)}
    b = {r.doc_id: r.split for r in split_assign(big).collect()}
    assert all(b[i] == s[i] for i in range(200))  # growth-stable
    # custom weights, and the sum guard
    w = {"train": 5000, "heldout": 5000}
    out = split_assign(small, w).collect()
    assert {r.split for r in out} <= {"train", "heldout"}
    import pytest as _pytest

    with _pytest.raises(AssertionError, match="sum to 10000"):
        split_assign(small, {"train": 9000})


def test_stratified_sample_plan_is_narrow_filter(spark):
    df = spark.createDataFrame([(i, "en") for i in range(50)],
                               "doc_id bigint, lang string")
    plan = (
        stratified_sample(df, {"en": 5000})
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan  # no shuffle: pure per-row filter
    assert "Window" not in plan


def test_domain_mix_weights_uniform_target(spark):
    """Integer-exact domain rebalancing: shares in ppm, weights in bp,
    hand-computed on a 3-domain corpus (r4)."""
    from memo_fraktur_ocr_code_spark.operators.curation import (
        domain_mix_weights,
    )

    rows = [
        (0, "a b c", "X"), (1, "d", "X"),
        (2, "e f", "Y"), (3, "g h", "Y"),
        (4, "i", "Z"),
    ]
    df = spark.createDataFrame(
        rows, "doc_id bigint, text string, source string"
    )
    got = {
        r.domain: (r.n_docs, r.n_tokens, r.share_ppm, r.weight_bp)
        for r in domain_mix_weights(df).collect()
    }
    # total 9 tokens; uniform target = 1e6 DIV 3 = 333333 ppm
    assert got["X"] == (2, 4, 444444, 7500)  # 3333330000 // 444444
    assert got["Y"] == (2, 4, 444444, 7500)
    assert got["Z"] == (1, 1, 111111, 3333330000 // 111111)
    # explicit target shares override the uniform default
    got2 = {
        r.domain: r.weight_bp
        for r in domain_mix_weights(
            df, target_shares_ppm={"X": 500000, "Y": 250000, "Z": 250000}
        ).collect()
    }
    assert got2["X"] == 500000 * 10000 // 444444
    assert got2["Z"] == 250000 * 10000 // 111111


def test_incremental_dedup_merge_on_read(spark):
    """Only never-seen, first-in-batch content survives; batch-internal
    duplicate counts are carried; whitespace variants collapse (r4)."""
    from memo_fraktur_ocr_code_spark.operators.dedup import (
        incremental_dedup,
    )

    existing = spark.createDataFrame(
        [(0, "Alpha text"), (1, "beta  text")],
        "doc_id bigint, text string",
    )
    batch = spark.createDataFrame(
        [
            (10, "alpha   text"),   # dup of existing (case+ws normalized)
            (11, "gamma text"),     # new, first
            (12, "gamma  text"),    # batch-internal dup of 11
            (13, "delta"),          # new
        ],
        "doc_id bigint, text string",
    )
    got = {
        r.doc_id: r.batch_dups
        for r in incremental_dedup(existing, batch).collect()
    }
    assert got == {11: 2, 13: 1}


def test_bigram_lm_score_hand_computed(spark):
    """Corpus-trained bigram LM ppm scores, integer-exact (r4):
    c(a,b)=2, c(a,c)=1, c(a)=3 over the corpus below."""
    from memo_fraktur_ocr_code_spark.operators.textstats import (
        bigram_lm_score,
    )

    df = spark.createDataFrame(
        [(0, "a b"), (1, "a b"), (2, "a c"), (3, "z")],
        "doc_id bigint, text string",
    )
    got = {
        r.doc_id: (r.n_pairs, r.lm_ppm)
        for r in bigram_lm_score(df).collect()
    }
    assert got[0] == (1, 2 * 1000000 // 3)
    assert got[1] == (1, 666666)
    assert got[2] == (1, 1 * 1000000 // 3)
    assert got[3] == (0, 0)  # single-token doc: no pairs, score 0


def test_domain_mix_weights_missing_target_domain_is_zero(spark):
    """A domain absent from an explicit target map gets weight_bp 0
    (excluded from the mix), never a silent NULL (code-review r4)."""
    from memo_fraktur_ocr_code_spark.operators.curation import (
        domain_mix_weights,
    )

    df = spark.createDataFrame(
        [(0, "a b", "books"), (1, "c d", "crawl")],
        "doc_id bigint, text string, source string",
    )
    got = {
        r.domain: r.weight_bp
        for r in domain_mix_weights(
            df, target_shares_ppm={"books": 1000000}
        ).collect()
    }
    assert got["crawl"] == 0
    assert got["books"] == 1000000 * 10000 // 500000


def test_incremental_dedup_null_text_matches_oracle(spark, tmp_path):
    """NULL-text parity with the DuckDB oracle (code-review r4): Spark
    maps NULL text to the single signature xxhash64(NULL); the oracle's
    NOT EXISTS / IS NOT DISTINCT FROM anti-join must reproduce that —
    the previous NOT IN formulation went three-valued and returned zero
    rows on any corpus with a NULL-text established row."""
    import duckdb

    import __spark_entry__ as e
    from memo_fraktur_ocr_code_spark.operators.dedup import (
        incremental_dedup,
    )

    rows = [
        (0, None),          # established NULL text
        (1, "alpha"),
        (300, None),        # batch NULL -> suppressed (seen as NULL)
        (301, "alpha  "),   # dup of established after normalization
        (302, "beta"),      # new
        (303, "beta"),      # batch-internal dup
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    pq_path = str(tmp_path / "docs.parquet")
    df.coalesce(1).write.parquet(pq_path)
    got = {
        (r.doc_id, r.batch_dups)
        for r in incremental_dedup(
            df.where(F.col("doc_id") < 250),
            df.where(F.col("doc_id") >= 250),
        ).collect()
    }
    assert got == {(302, 2)}
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{pq_path}/*.parquet'"
    )
    oracle = {
        tuple(r)
        for r in con.execute(
            e.oracle_sql()["incremental_dedup"]
        ).fetchall()
    }
    assert oracle == got


def test_r4_operators_match_python_replicas_on_random_corpora(spark):
    """Seeded randomized corpora: each r4 operator must equal a plain
    Python replica of its spec — the same style of independent check the
    connected-components union-find test uses."""
    import random
    from collections import Counter

    from memo_fraktur_ocr_code_spark.operators.curation import (
        domain_mix_weights,
    )
    from memo_fraktur_ocr_code_spark.operators.dedup import (
        incremental_dedup,
    )
    from memo_fraktur_ocr_code_spark.operators.textstats import (
        bigram_lm_score,
    )

    rng = random.Random(11)
    vocab = ["alpha", "beta", "Gamma", "delta", "x"]
    for trial in range(2):
        rows = []
        for i in range(60):
            k = rng.randrange(0, 5)
            txt = (
                None
                if rng.random() < 0.05
                else "  ".join(rng.choice(vocab) for _ in range(k))
            )
            rows.append((i, txt, rng.choice(["s1", "s2", "s3"])))
        df = spark.createDataFrame(
            rows, "doc_id bigint, text string, source string"
        )

        def norm(t):
            return (
                None if t is None else " ".join(t.lower().split()).strip()
            )

        # --- incremental dedup vs replica (NULL maps to one group) ---
        cut = 30
        seen = {norm(t) for i, t, _s in rows if i < cut}
        firsts: dict = {}
        counts: Counter = Counter()
        for i, t, _s in rows:
            if i < cut:
                continue
            key = norm(t)
            counts[key] += 1
            firsts.setdefault(key, i)
        want = {
            (firsts[k], counts[k]) for k in firsts if k not in seen
        }
        got = {
            (r.doc_id, r.batch_dups)
            for r in incremental_dedup(
                df.where(F.col("doc_id") < cut),
                df.where(F.col("doc_id") >= cut),
            ).collect()
        }
        assert got == want, f"incremental trial {trial}"

        # --- bigram LM vs replica (integer-exact) ---
        toks = {
            i: ([] if t is None else t.lower().split())
            for i, t, _s in rows
        }
        cu: Counter = Counter()
        cb: Counter = Counter()
        for ts in toks.values():
            cu.update(ts)
            cb.update(zip(ts, ts[1:]))
        want_lm = {}
        for i, ts in toks.items():
            if rows[i][1] is None:  # filtered out on the Spark side too
                continue
            pairs = list(zip(ts, ts[1:]))
            if pairs:
                ppms = [cb[p] * 1000000 // cu[p[0]] for p in pairs]
                want_lm[i] = (len(pairs), sum(ppms) // len(pairs))
            else:
                want_lm[i] = (0, 0)
        got_lm = {
            r.doc_id: (r.n_pairs, r.lm_ppm)
            for r in bigram_lm_score(
                df.where(F.col("text").isNotNull())
            ).collect()
        }
        assert got_lm == want_lm, f"lm trial {trial}"

        # --- domain mix vs replica ---
        dom_tokens: Counter = Counter()
        dom_docs: Counter = Counter()
        for i, _t, s in rows:
            dom_tokens[s] += len(toks[i])
            dom_docs[s] += 1
        tot = sum(dom_tokens.values())
        nd = len(dom_tokens)
        want_mix = {}
        for s in dom_tokens:
            share = dom_tokens[s] * 1000000 // tot
            want_mix[s] = (
                dom_docs[s],
                dom_tokens[s],
                share,
                (1000000 // nd) * 10000 // max(share, 1),
            )
        got_mix = {
            r.domain: (r.n_docs, r.n_tokens, r.share_ppm, r.weight_bp)
            for r in domain_mix_weights(df).collect()
        }
        assert got_mix == want_mix, f"mix trial {trial}"


def test_strip_boilerplate_lines(spark):
    """High-df lines drop, short lines are exempt, order and casing of
    survivors are preserved, all-dropped docs yield empty text (r4)."""
    from memo_fraktur_ocr_code_spark.operators.curation import (
        strip_boilerplate_lines,
    )

    header = "COOKIE Banner Accept All"
    rows = [
        (0, f"{header}\nUnique Content zero\nok"),
        (1, f"{header}\nunique content one here"),
        (2, f"{header}\nanother unique body two"),
        (3, f"{header}\nfourth unique body line"),
        (4, f"{header}\nfifth unique body entry"),
        (5, header),  # all boilerplate -> empty text
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    out = {
        r.doc_id: (r.clean_text, r.n_kept, r.n_dropped)
        for r in strip_boilerplate_lines(df, max_line_df=3).collect()
    }
    assert len(out) == 6  # every doc survives, even fully-boilerplate
    # header df=6 > 3 -> dropped everywhere; 'ok' is short -> exempt
    assert out[0] == ("Unique Content zero\nok", 2, 1)
    assert out[1] == ("unique content one here", 1, 1)
    assert out[5] == ("", 0, 1)
    # casing + whitespace variants of the header still count as one key
    df2 = spark.createDataFrame(
        [(i, "cookie  banner ACCEPT all\nbody %d unique" % i) for i in range(5)],
        "doc_id bigint, text string",
    )
    out2 = strip_boilerplate_lines(df2, max_line_df=3).collect()
    assert all(r.n_dropped == 1 for r in out2)


def test_strip_boilerplate_null_text_doc_survives(spark):
    """NULL text is the empty document, not a vanishing one: posexplode
    over split(NULL) yields no rows, which silently dropped the doc from
    the output before the coalesce (ADVICE r4) — funnel accounting then
    attributed the loss to nothing."""
    from memo_fraktur_ocr_code_spark.operators.curation import (
        strip_boilerplate_lines,
    )

    rows = [(0, "Some Real Content Line"), (1, None), (2, "")]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    out = {
        r.doc_id: (r.clean_text, r.n_kept, r.n_dropped)
        for r in strip_boilerplate_lines(df, max_line_df=3).collect()
    }
    assert set(out) == {0, 1, 2}  # every input id present
    assert out[1] == ("", 1, 0)  # one (empty, short-exempt) line kept
    assert out[2] == ("", 1, 0)


def test_decontaminate_join_is_unhinted_aqe_decides(spark):
    """r5 (VERDICT r4 item 5): the bench-gram join carries NO broadcast
    hint.  With default thresholds AQE broadcasts the (small) gram set;
    with the broadcast threshold off, the SAME code degrades to a
    shuffle join instead of force-broadcasting an unbounded set — the
    behavior a forced hint would make impossible.  Verdicts identical
    on both paths."""
    from memo_fraktur_ocr_code_spark.operators.curation import (
        decontaminate,
    )

    gram13 = " ".join(f"w{i}" for i in range(13))
    train = spark.createDataFrame(
        [
            (0, gram13 + " tail tokens here"),
            (1, "completely unrelated words " * 5),
        ],
        "doc_id bigint, text string",
    )
    bench = spark.createDataFrame(
        [(100, gram13)], "doc_id bigint, text string"
    )

    def run_and_plan():
        df = decontaminate(train, bench)
        rows = {
            r.doc_id: (r.n_hits, r.contaminated) for r in df.collect()
        }
        plan = df._jdf.queryExecution().executedPlan().toString()
        return rows, plan

    rows_b, plan_b = run_and_plan()
    assert "BroadcastHashJoin" in plan_b  # AQE's pick for a small bench

    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        rows_s, plan_s = run_and_plan()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    assert "BroadcastHashJoin" not in plan_s  # shuffle path taken
    assert rows_s == rows_b
    assert rows_b[0] == (1, 1) and rows_b[1] == (0, 0)


# ---------------------------------------------------------------------------
# sliding-window chunking (r5 session 2)
# ---------------------------------------------------------------------------


def test_chunk_sliding_tokens_grid(spark):
    from memo_fraktur_ocr_code_spark.operators.curation import (
        chunk_sliding_tokens,
    )

    txt = " ".join(f"t{i}" for i in range(10))
    df = spark.createDataFrame(
        [(1, txt), (2, "a  b"), (3, ""), (4, None), (5, "solo")],
        "doc_id long, text string",
    )
    rows = [r.asDict() for r in
            chunk_sliding_tokens(df, chunk_tokens=4, overlap=2)
            .orderBy("id", "chunk_idx").collect()]
    by_id = {}
    for r in rows:
        by_id.setdefault(r["id"], []).append(r)
    # starts step by stride=2; start 8 suppressed (8+overlap == n: its
    # tokens are fully inside the 6..9 chunk)
    assert [(r["start_tok"], r["n_tok"]) for r in by_id[1]] == [
        (0, 4), (2, 4), (4, 4), (6, 4)]
    assert by_id[1][1]["chunk_text"] == "t2 t3 t4 t5"
    # short doc -> one whole-doc chunk; multi-space splits collapse
    assert by_id[2] == [{"id": 2, "chunk_idx": 0, "start_tok": 0,
                         "n_tok": 2, "chunk_text": "a b"}]
    assert by_id[5][0]["chunk_text"] == "solo"
    # empty and NULL docs emit nothing (exploded child table)
    assert 3 not in by_id and 4 not in by_id
    # every token index is covered by some chunk
    covered = set()
    for r in by_id[1]:
        covered.update(range(r["start_tok"], r["start_tok"] + r["n_tok"]))
    assert covered == set(range(10))


def test_chunk_sliding_tokens_guards(spark):
    import pytest as _pytest

    from memo_fraktur_ocr_code_spark.operators.curation import (
        chunk_sliding_tokens,
    )

    df = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    with _pytest.raises(ValueError):
        chunk_sliding_tokens(df, chunk_tokens=8, overlap=8)
    # exact multiple: last window reaches the end, no phantom tail
    rows = chunk_sliding_tokens(
        spark.createDataFrame(
            [(1, " ".join(str(i) for i in range(8)))],
            "doc_id long, text string"),
        chunk_tokens=4, overlap=0,
    ).collect()
    assert [(r["start_tok"], r["n_tok"]) for r in rows] == [(0, 4), (4, 4)]


# ---------------------------------------------------------------------------
# Exact rank-quantile thresholds + bucket assignment (r5 session 2)
# ---------------------------------------------------------------------------


def test_quantile_cuts_hand_computed_with_ties(spark):
    """scores [10,9,9,8,1], tertiles: rank(3333bp)=ceil(1.67)=2 ->
    cut=9 (count>=9 is 3>=2, count>=10 is 1); rank(6667bp)=ceil(3.33)=4
    -> cut=8.  Tie at 9 must land whole in the higher bucket."""
    from memo_fraktur_ocr_code_spark.operators.curation import (
        assign_quantile_buckets,
        quantile_cuts,
    )

    df = spark.createDataFrame(
        [(i, s) for i, s in enumerate([10, 9, 9, 8, 1])],
        "id long, score long",
    )
    cuts = quantile_cuts(df, "score", fracs_bp=[3333, 6667])
    assert cuts == [9, 8]
    out = {
        r["id"]: r["bucket"]
        for r in assign_quantile_buckets(
            df, "score", cuts, labels=["head", "middle", "tail"]
        ).collect()
    }
    assert out == {0: "head", 1: "head", 2: "head", 3: "middle", 4: "tail"}


def test_quantile_cuts_full_fraction_is_min_score(spark):
    from memo_fraktur_ocr_code_spark.operators.curation import quantile_cuts

    df = spark.createDataFrame(
        [(i, s) for i, s in enumerate([5, 3, 3, 1])], "id long, score long"
    )
    assert quantile_cuts(df, "score", fracs_bp=[10000]) == [1]
    # top-quarter: rank=1 -> the max score
    assert quantile_cuts(df, "score", fracs_bp=[2500]) == [5]


def test_quantile_cuts_validation(spark):
    import pytest as _pytest

    from memo_fraktur_ocr_code_spark.operators.curation import (
        assign_quantile_buckets,
        quantile_cuts,
    )

    df = spark.createDataFrame([(1, 2)], "id long, score long")
    with _pytest.raises(ValueError):  # descending fracs
        quantile_cuts(df, "score", fracs_bp=[6667, 3333])
    with _pytest.raises(ValueError):  # out of range
        quantile_cuts(df, "score", fracs_bp=[0])
    with _pytest.raises(ValueError):  # empty input
        quantile_cuts(df.where("id < 0"), "score", fracs_bp=[5000])
    with _pytest.raises(TypeError):  # non-integer score
        quantile_cuts(
            df.select("id", F.col("score").cast("double").alias("score")),
            "score",
            fracs_bp=[5000],
        )
    with _pytest.raises(ValueError):  # domain wider than the bin budget
        wide = spark.range(10).select(
            F.col("id"), F.col("id").alias("score")
        )
        quantile_cuts(wide, "score", fracs_bp=[5000], max_bins=5)
    with _pytest.raises(ValueError):  # label arity
        assign_quantile_buckets(df, "score", [3, 1], labels=["a", "b"])
    with _pytest.raises(ValueError):  # increasing cuts rejected
        assign_quantile_buckets(df, "score", [1, 3])


def test_quantile_filter_keeps_at_least_fraction(spark):
    """score >= cuts[0] keeps AT LEAST ceil(f*N/10000) rows (ties
    inflate, never deflate)."""
    from memo_fraktur_ocr_code_spark.operators.curation import quantile_cuts

    rows = [(i, (i * 7) % 13) for i in range(200)]
    df = spark.createDataFrame(rows, "id long, score long")
    for f in (1000, 3333, 5000, 9000):
        (cut,) = quantile_cuts(df, "score", fracs_bp=[f])
        kept = df.where(F.col("score") >= cut).count()
        assert kept >= -(-f * 200 // 10000)


# ---------------------------------------------------------------------------
# Unicode normalization (r5 session 2)
# ---------------------------------------------------------------------------


def test_normalize_unicode_nfc(spark):
    """Combining sequences compose, singletons (U+212B) map to their
    canonical char, compatibility ligatures are NFC-invariant, NULL
    passes through, changed is an exact 0/1."""
    from memo_fraktur_ocr_code_spark.operators.curation import (
        normalize_unicode,
    )

    rows = [
        (1, "Café"),          # e + combining acute -> é
        (2, "Å"),               # ANGSTROM SIGN -> Å (U+00C5)
        (3, "ﬁsh"),             # fi ligature: NFC keeps it
        (4, "plain ascii"),
        (5, None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["id"]: (r["norm_text"], r["changed"])
           for r in normalize_unicode(df).collect()}
    assert out[1] == ("Café", 1)
    assert out[2] == ("Å", 1)
    assert out[3] == ("ﬁsh", 0)
    assert out[4] == ("plain ascii", 0)
    assert out[5] == (None, 0)


def test_normalize_unicode_nfkc_and_validation(spark):
    import pytest as _pytest

    from memo_fraktur_ocr_code_spark.operators.curation import (
        normalize_unicode,
    )

    df = spark.createDataFrame(
        [(1, "ﬁsh ｆｕｌｌ")],
        "doc_id long, text string",
    )
    out = normalize_unicode(df, form="NFKC").collect()[0]
    assert out["norm_text"] == "fish full" and out["changed"] == 1
    with _pytest.raises(ValueError):
        normalize_unicode(df, form="NFX")
