"""Text analysis operators for training-data pipelines.

Language ID (stopword n-gram heuristic), quality scoring, token counting
(whitespace + BPE-ish regex) and document fingerprinting — all pure
Catalyst expressions (regexp + array ops + md5), zero Python, fully
whole-stage-codegen and portable to any SQL oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Tiny deterministic stopword inventories (spec constants).
LANG_STOPWORDS = {
    "en": ("the", "and", "of", "to", "a", "in", "is", "that", "it", "for"),
    "da": ("og", "i", "det", "en", "at", "der", "til", "af", "ikke", "den"),
    "de": ("der", "die", "das", "und", "ist", "nicht", "ein", "zu", "den", "mit"),
    "es": ("el", "la", "de", "que", "y", "en", "un", "es", "no", "los"),
    "fr": ("le", "la", "de", "et", "un", "est", "pas", "que", "les", "en"),
}

BPE_ISH_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def _ws_tokens(text_col) -> F.Column:
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    return F.filter(
        F.split(F.lower(c), r"\s+"), lambda t: t != ""
    )


def lang_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Stopword-hit language scoring; winner by (hits desc, lang asc)."""
    toks = _ws_tokens(text_col)
    scores = [
        F.size(
            F.filter(toks, lambda t: t.isin(*LANG_STOPWORDS[lang]))
        ).alias(f"hits_{lang}")
        for lang in sorted(LANG_STOPWORDS)
    ]
    df = df.select("*", *scores)
    langs = sorted(LANG_STOPWORDS)
    best = F.greatest(*[F.col(f"hits_{lg}") for lg in langs])
    pred = F.lit("und")
    for lg in reversed(langs):  # earlier langs win ties → fold from the back
        pred = F.when(
            (best > 0) & (F.col(f"hits_{lg}") == best), F.lit(lg)
        ).otherwise(pred)
    return df.withColumn("lang_pred", pred)


def quality_score(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Integer-exact quality features + a basis-point composite score:
    token count, mean token length, punctuation/uppercase/digit ratios,
    stopword ratio (any language)."""
    c = F.col(text_col)
    toks = _ws_tokens(text_col)
    all_stop = sorted({w for ws in LANG_STOPWORDS.values() for w in ws})
    n_tokens = F.size(toks)
    n_chars = F.length(c)
    n_punct = n_chars - F.length(F.regexp_replace(c, r"[^\w\s]", ""))
    n_upper = n_chars - F.length(F.regexp_replace(c, r"[A-Z]", ""))
    n_digit = n_chars - F.length(F.regexp_replace(c, r"[0-9]", ""))
    n_stop = F.size(F.filter(toks, lambda t: t.isin(*all_stop)))
    out = df.select(
        "*",
        n_tokens.alias("n_tokens"),
        n_chars.alias("n_chars_m"),
        n_punct.alias("n_punct"),
        n_upper.alias("n_upper"),
        n_digit.alias("n_digit"),
        n_stop.alias("n_stopword"),
    )
    nz = F.greatest(F.col("n_chars_m"), F.lit(1))
    nt = F.greatest(F.col("n_tokens"), F.lit(1))
    return out.select(
        "*",
        (F.col("n_punct") * 10000 / nz).cast("bigint").alias("punct_bp"),
        (F.col("n_upper") * 10000 / nz).cast("bigint").alias("upper_bp"),
        (F.col("n_stopword") * 10000 / nt).cast("bigint").alias("stop_bp"),
    )


def token_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Whitespace and BPE-ish token counts per document."""
    c = F.col(text_col)
    return df.select(
        "*",
        F.size(_ws_tokens(text_col)).alias("ws_tokens"),
        F.size(
            F.filter(
                F.regexp_extract_all(c, F.lit(BPE_ISH_PATTERN), 0),
                lambda t: t != "",
            )
        ).alias("bpe_tokens"),
    )


def fingerprint(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Deterministic document fingerprint: md5 over whitespace-normalized
    lowercase text (portable to every SQL engine), plus a 64-bit prefix."""
    norm = F.trim(F.regexp_replace(F.lower(F.col(text_col)), r"\s+", " "))
    md5 = F.md5(norm)
    return df.select(
        "*",
        md5.alias("fp_md5"),
        F.conv(F.substring(md5, 1, 15), 16, 10).cast("bigint").alias("fp64"),
    )


def repetition_stats(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Gopher-style repetition filters (Rae et al. 2021 §A1.1), the
    standard web-scale quality gates:

    * ``dup_line_bp``        — fraction of lines that are duplicates of an
                               earlier line (basis points)
    * ``dup_line_char_bp``   — fraction of line characters inside those
                               duplicate occurrences
    * ``top2gram_char_bp``   — fraction of text characters covered by the
                               most frequent word 2-gram

    Line measures are per-row array expressions (codegen, shuffle-free);
    the 2-gram mode needs one shuffle keyed by (doc, gram) + a per-doc
    window — both scale with corpus size, never corpus².  Ties on the top
    gram break lexicographically (deterministic, oracle-matched)."""
    c = F.col(text_col)
    lines = F.filter(
        F.transform(F.split(c, "\n"), lambda t: F.trim(t)),
        lambda t: t != "",
    )
    n_lines = F.size(lines)
    n_distinct = F.size(F.array_distinct(lines))
    chars_all = F.aggregate(
        lines, F.lit(0).cast("bigint"), lambda a, x: a + F.length(x)
    )
    chars_distinct = F.aggregate(
        F.array_distinct(lines),
        F.lit(0).cast("bigint"),
        lambda a, x: a + F.length(x),
    )
    base = df.select(
        F.col(id_col),
        c.alias("_text"),
        ((n_lines - n_distinct) * 10000 / F.greatest(n_lines, F.lit(1)))
        .cast("bigint")
        .alias("dup_line_bp"),
        (
            (chars_all - chars_distinct)
            * 10000
            / F.greatest(chars_all, F.lit(1))
        )
        .cast("bigint")
        .alias("dup_line_char_bp"),
    )
    toks = df.select(F.col(id_col), _ws_tokens(text_col).alias("ts"))
    grams = toks.select(
        id_col,
        F.explode(
            # guard: sequence(1, 0) is DESCENDING in Spark, so short docs
            # must short-circuit to an empty array, not an empty sequence
            F.expr(
                "CASE WHEN size(ts) < 2 THEN array()"
                " ELSE transform(sequence(1, size(ts) - 1),"
                " i -> concat(ts[i-1], ' ', ts[i])) END"
            )
        ).alias("gram"),
    )
    from pyspark.sql import Window

    counted = grams.groupBy(id_col, "gram").agg(F.count("*").alias("cnt"))
    # the MOST FREQUENT 2-gram (Gopher §A1.1; count desc, gram asc
    # tie-break — ADVICE r2 corrected an accidental cnt×length ranking),
    # coverage measured as that winner's cnt × gram length
    w = Window.partitionBy(id_col).orderBy(F.desc("cnt"), "gram")
    top = (
        counted.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(
            id_col,
            (F.col("cnt") * F.length("gram")).alias("_covered"),
        )
    )
    return (
        base.join(top, id_col, "left")
        .select(
            id_col,
            "dup_line_bp",
            "dup_line_char_bp",
            (
                F.coalesce(F.col("_covered"), F.lit(0))
                * 10000
                / F.greatest(F.length("_text"), F.lit(1))
            )
            .cast("bigint")
            .alias("top2gram_char_bp"),
        )
    )


def rolling_fingerprint(df: DataFrame, text_col: str = "text") -> DataFrame:
    """64-bit polynomial rolling hash of the normalized text — computed
    as a sequential JVM fold over char codes, engine-portable (same fold
    exists in any SQL dialect with list_reduce): h = (h*31 + code) mod p."""
    norm = F.trim(F.regexp_replace(F.lower(F.col(text_col)), r"\s+", " "))
    chars = F.split(norm, "")
    prime = F.lit((1 << 31) - 1)
    fp = F.aggregate(
        chars,
        F.lit(0).cast("bigint"),
        lambda acc, c: F.pmod(acc * 31 + F.ascii(c), prime),
    )
    return df.select("*", fp.alias("fp_roll"))


def bigram_lm_score(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Corpus-trained bigram language-model quality signal, integer-exact.

    Trains token bigram/unigram counts on the corpus ITSELF, then scores
    every document by the mean conditional probability of its adjacent
    token pairs: per pair ``ppm = c(w1,w2) * 1e6 DIV c(w1)``, per doc
    ``lm_ppm = sum(ppm) DIV n_pairs``.  High scores = text whose local
    word transitions are typical of the corpus; boilerplate/garbled text
    scores low — the classic LM-based quality filter (CCNet-style), with
    the arithmetic mean of conditional probabilities standing in for the
    transcendental ``exp(mean log p)``: log/exp differ across libm
    implementations in the last ulp, while integer ratio+sum is
    associative and engine-portable bit for bit, which is what lets the
    DuckDB oracle verify it exactly at any partitioning.

    Scale: two count aggregations (unigram, bigram — Zipf-skewed keys;
    partial map-side combine absorbs the head) + one join of the pairs
    table against each count table keyed on the gram, + the per-doc sum.
    The pairs table is scan-side row amplification, never a shuffle of
    its own.  Docs with < 2 tokens carry ``n_pairs = 0`` and score 0
    (coalesced, keeping the output column integer-typed on every
    engine — a NULL here turns the pandas column float on both sides of
    the oracle compare).
    """
    from memo_fraktur_ocr_code_spark.operators.dedup import (
        _register_cache,
    )

    toks = _ws_tokens(text_col)
    base = df.select(F.col(id_col).alias("id"), toks.alias("ts"))
    pairs = base.where(F.size("ts") >= 2).select(
        "id",
        F.explode(
            F.expr(
                "transform(sequence(1, size(ts) - 1),"
                " i -> struct(ts[i-1] AS w1, ts[i] AS w2))"
            )
        ).alias("p"),
    ).select("id", F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))
    # The pair stream feeds the corpus bigram counts AND the scoring
    # join — cache the occurrence rows so the explode runs once (r7).
    # (A distinct-(id, pair) pre-aggregation was tried and measured 5×
    # SLOWER: it introduces a high-cardinality string-keyed shuffle
    # where the original occurrence joins are map-side under AQE's
    # broadcast of the count tables.)
    pairs = _register_cache(pairs)
    unigrams = (
        base.select(F.explode("ts").alias("w1"))
        .groupBy("w1")
        .agg(F.count("*").alias("cu"))
    )
    bigrams = pairs.groupBy("w1", "w2").agg(F.count("*").alias("cb"))
    scored_pairs = (
        pairs.join(bigrams, ["w1", "w2"])
        .join(unigrams, "w1")
        .select("id", F.expr("cb * 1000000 DIV cu").alias("ppm"))
    )
    per_doc = scored_pairs.groupBy("id").agg(
        F.count("*").alias("n_pairs"),
        F.expr("sum(ppm) DIV count(*)").alias("lm_ppm"),
    )
    return (
        base.select("id")
        .join(per_doc, "id", "left")
        .select(
            F.col("id").alias(id_col),
            F.coalesce("n_pairs", F.lit(0)).alias("n_pairs"),
            F.coalesce("lm_ppm", F.lit(0).cast("bigint")).alias(
                "lm_ppm"
            ),
        )
    )


def quality_gate_verdict(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_tokens: int = 20,
    min_stop_bp: int = 500,
    max_dup_line_bp: int = 3000,
    max_top2gram_bp: int = 2000,
) -> DataFrame:
    """Composite Gopher-style training-data gate — lang-ID + quality
    features + repetition filters joined per document into one 0/1
    ``keep`` verdict.  THE shared definition: the oracle-verified
    ``training_quality_gate`` driver query and the production curation
    job (jobs/run_curation.py) both call this, so a threshold tweak can
    never desynchronize them (code-review r4).

    Scale: three per-doc operators joined on the co-partitioned id —
    no shuffle shape beyond the operators' own."""
    li = lang_id(df, text_col).select(id_col, "lang_pred")
    qs = quality_score(df, text_col).select(
        id_col, "n_tokens", "stop_bp"
    )
    rep = repetition_stats(df, id_col, text_col).select(
        id_col, "dup_line_bp", "top2gram_char_bp"
    )
    out = qs.join(li, id_col).join(rep, id_col)
    keep = (
        (F.col("n_tokens") >= min_tokens)
        & (F.col("stop_bp") >= min_stop_bp)
        & (F.col("dup_line_bp") <= max_dup_line_bp)
        & (F.col("top2gram_char_bp") <= max_top2gram_bp)
        & (F.col("lang_pred") != "und")
    ).cast("int")
    return out.select(
        id_col,
        "lang_pred",
        "n_tokens",
        "stop_bp",
        "dup_line_bp",
        "top2gram_char_bp",
        keep.alias("keep"),
    )


def tfidf_topk_terms(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 5,
    min_term_chars: int = 2,
) -> DataFrame:
    """Per-document top-``k`` keyword extraction by tf·idf — the
    standard corpus-level keyword/topic signal (Salton & Buckley 1988),
    and at training-data scale the feature that feeds topic-balanced
    sampling and index-time document expansion.

    Terms are the lowercased whitespace tokens with at least
    ``min_term_chars`` characters.  The score is integer-exact (the
    repo-wide no-libm rule — identical in any engine, no float
    ordering hazards)::

        idf_e6(term)  = (N * 1_000_000) DIV doc_freq(term)
        score_e6      = tf(doc, term) * idf_e6(term)

    a monotone transform of the classic tf · N/df (log-free variant;
    the RANKING inside one document is what downstream consumes, and
    dropping the log only compresses the ranking toward rare terms,
    deterministically).  Overflow bound: ``tf * 1e6 * N < 2^63`` holds
    through N = 10^9 docs with tf ≤ 9×10^3; beyond that, rescale the
    idf unit to e3 — the ordering is unchanged because the rescale is
    per-term constant.

    Output: ``(id, term, tf, doc_freq, score_e6, rnk)`` with ``rnk`` =
    1..k per document, ordered by (score desc, term asc) — a total
    order, so ties elect the same winners in every engine.

    Scale shape: one ``(id, term)`` count aggregation (map-side combine
    absorbs within-doc repetition), one term-keyed doc-frequency
    aggregation OVER the first (already distinct per doc — no second
    pass over the corpus), a term-keyed join left UNHINTED (the term
    table is vocabulary-sized: Zipf head broadcasts well, but a
    web-scale vocabulary can exceed the broadcast ceiling — AQE
    decides), and a top-k window partitioned BY DOCUMENT (never a
    global sort).  The single-row corpus count joins as a literal-free
    cross join that Spark plans as a broadcast.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    from pyspark.sql import Window

    terms = df.select(
        F.col(id_col).alias("id"),
        F.explode(
            F.filter(
                _ws_tokens(text_col),
                lambda t: F.length(t) >= min_term_chars,
            )
        ).alias("term"),
    )
    tf = terms.groupBy("id", "term").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("term").agg(
        F.count(F.lit(1)).alias("doc_freq")
    )
    n_docs = df.select(
        F.countDistinct(id_col).alias("n_docs")
    )
    scored = (
        tf.join(dfreq, "term")
        .crossJoin(F.broadcast(n_docs))
        .withColumn(
            "score_e6",
            F.col("tf")
            * F.expr("n_docs * 1000000 DIV doc_freq"),
        )
    )
    w = Window.partitionBy("id").orderBy(
        F.col("score_e6").desc(), F.col("term").asc()
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= k)
        .select(
            "id",
            "term",
            F.col("tf").cast("long").alias("tf"),
            F.col("doc_freq").cast("long").alias("doc_freq"),
            F.col("score_e6").cast("long").alias("score_e6"),
            F.col("rnk").cast("long").alias("rnk"),
        )
    )


def stupid_backoff_score(
    df: DataFrame,
    train: DataFrame | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Trigram language-model quality signal with Stupid Backoff
    (Brants et al., EMNLP 2007 §4 — the web-scale LM smoothing that
    deliberately drops normalization so counts need only ONE pass):

        S(w3 | w1 w2) = c(w1 w2 w3) / c(w1 w2)        if seen
                      = 0.4 * c(w2 w3) / c(w2)         else if seen
                      = 0.4^2 * c(w3) / N              else

    scored per trigram position in integer ppm (0.4 = ``*2 DIV 5``,
    0.4^2 = ``*4 DIV 25`` — no floats, no libm, engine-portable bit for
    bit), averaged per document: ``(id, n_scored, sb_ppm)`` with
    ``sb_ppm = sum(s) DIV n_scored`` and docs under 3 tokens scoring 0.
    Counts are trained on ``train`` (default: the corpus itself — then
    every trigram is seen and backoff is dead; pass a held-out or
    earlier-epoch slice to exercise it, as the driver query does).

    Deepens the CCNet story started by ``bigram_lm_score``: CCNet
    (Wenzek et al. 2020) filters on a 5-gram KenLM; a trigram model
    with the published web-scale backoff is the same signal family
    with state that still fits a count table.

    Scale shape: three count aggregations over Zipf-skewed gram keys
    (map-side combine absorbs the head) + five left joins of the
    positions table against them, all UNHINTED — AQE broadcasts the
    count tables while they fit and shuffle-joins on the gram key at
    corpus scale, the same no-assumptions plan as bigram_lm_score; the
    positions table is scan-side row amplification; one single-row
    total broadcast."""
    toks = _ws_tokens(text_col)
    base = df.select(F.col(id_col).alias("id"), toks.alias("ts"))
    tbase = (
        base
        if train is None
        else train.select(F.col(id_col).alias("id"), toks.alias("ts"))
    )
    pos = base.where(F.size("ts") >= 3).select(
        "id",
        F.explode(
            F.expr(
                "transform(sequence(2, size(ts) - 1), i ->"
                " struct(ts[i-2] AS w1, ts[i-1] AS w2, ts[i] AS w3))"
            )
        ).alias("p"),
    ).select("id", "p.w1", "p.w2", "p.w3")
    from memo_fraktur_ocr_code_spark.operators.dedup import (
        _register_cache,
    )

    # unigram counts feed two join legs AND the token total; bigram
    # counts feed two join legs — cache both vocabulary-sized tables
    # so each training aggregation runs once (r7)
    t_uni = _register_cache(
        tbase.select(F.explode("ts").alias("w"))
        .groupBy("w")
        .agg(F.count("*").alias("cu"))
    )
    t_bi = _register_cache(
        tbase.where(F.size("ts") >= 2)
        .select(
            F.explode(
                F.expr(
                    "transform(sequence(1, size(ts) - 1), i ->"
                    " struct(ts[i-1] AS a, ts[i] AS b))"
                )
            ).alias("p")
        )
        .select("p.a", "p.b")
        .groupBy("a", "b")
        .agg(F.count("*").alias("cb"))
    )
    t_tri = (
        tbase.where(F.size("ts") >= 3)
        .select(
            F.explode(
                F.expr(
                    "transform(sequence(2, size(ts) - 1), i ->"
                    " struct(ts[i-2] AS a, ts[i-1] AS b, ts[i] AS c))"
                )
            ).alias("p")
        )
        .select("p.a", "p.b", "p.c")
        .groupBy("a", "b", "c")
        .agg(F.count("*").alias("ct"))
    )
    # total training tokens = the unigram counts summed — one aggregate
    # over the (cached) vocabulary table instead of a fourth full
    # explode of the training corpus (r7)
    n_tok = t_uni.agg(
        F.coalesce(F.sum("cu"), F.lit(0)).cast("bigint").alias("n_tok")
    )
    j = (
        pos.join(
            t_tri.select(
                F.col("a").alias("w1"),
                F.col("b").alias("w2"),
                F.col("c").alias("w3"),
                F.col("ct").alias("c3"),
            ),
            ["w1", "w2", "w3"],
            "left",
        )
        .join(
            t_bi.select(
                F.col("a").alias("w1"),
                F.col("b").alias("w2"),
                F.col("cb").alias("cctx2"),
            ),
            ["w1", "w2"],
            "left",
        )
        .join(
            t_bi.select(
                F.col("a").alias("w2"),
                F.col("b").alias("w3"),
                F.col("cb").alias("c2"),
            ),
            ["w2", "w3"],
            "left",
        )
        .join(
            t_uni.select(F.col("w").alias("w2"), F.col("cu").alias("cctx1")),
            ["w2"],
            "left",
        )
        .join(
            t_uni.select(F.col("w").alias("w3"), F.col("cu").alias("c1")),
            ["w3"],
            "left",
        )
        .crossJoin(F.broadcast(n_tok))
    )
    s = F.expr(
        "CASE WHEN coalesce(c3, CAST(0 AS BIGINT)) > 0"
        "       THEN c3 * 1000000 DIV cctx2"
        "     WHEN coalesce(c2, CAST(0 AS BIGINT)) > 0"
        "       THEN 2 * (c2 * 1000000 DIV cctx1) DIV 5"
        "     ELSE 4 * (coalesce(c1, CAST(0 AS BIGINT)) * 1000000"
        "               DIV greatest(n_tok, 1)) DIV 25 END"
    )
    per_doc = (
        j.select("id", s.alias("s"))
        .groupBy("id")
        .agg(
            F.count("*").alias("n_scored"),
            F.expr("sum(s) DIV count(*)").alias("sb_ppm"),
        )
    )
    return (
        base.select("id")
        .join(per_doc, "id", "left")
        .select(
            F.col("id").alias(id_col),
            F.coalesce("n_scored", F.lit(0).cast("bigint")).alias(
                "n_scored"
            ),
            F.coalesce("sb_ppm", F.lit(0).cast("bigint")).alias(
                "sb_ppm"
            ),
        )
    )
