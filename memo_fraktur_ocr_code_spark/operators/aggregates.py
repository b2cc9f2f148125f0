"""Aggregation operators (SURVEY.md §2.5 A1-A11, §2.8 U1/U3).

All pure Catalyst hash aggregates / window expressions — partial (map-side)
aggregation, AQE-coalesced shuffles, no Python anywhere.

Numeric-stability rule for cross-engine verifiability: aggregate only
integers (exact, associative); derive any ratio by a single IEEE division
at the end.  Double summation across partitions is not associative and is
banned in this module.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from memo_fraktur_ocr_code_spark.functions.textspec import FREQCOUNT_DROP


def unigram_freqlist(tokens: DataFrame, token_col: str = "token") -> DataFrame:
    """A1 — lowercased unigram counts, punctuation dropped, sorted
    (-count, token) (correct_ocr.py:259-266)."""
    return (
        tokens.select(F.lower(F.col(token_col)).alias("token"))
        .where(~F.col("token").isin(list(FREQCOUNT_DROP)))
        .groupBy("token")
        .agg(F.count("*").alias("freq"))
        .orderBy(F.desc("freq"), "token")
    )


def bigram_freqlist(tokens: DataFrame) -> DataFrame:
    """A2 — adjacent-pair counts per line (make_dictionary.py:47-53)."""
    w = Window.partitionBy("conv_id", "turn_idx", "line_idx").orderBy(
        "word_on_line"
    )
    pairs = tokens.select(
        F.lower("token").alias("tok1"),
        F.lower(F.lead("token").over(w)).alias("tok2"),
    ).where(F.col("tok2").isNotNull())
    return (
        pairs.groupBy("tok1", "tok2")
        .agg(F.count("*").alias("freq"))
        .orderBy(F.desc("freq"), "tok1", "tok2")
    )


def freq_breakdown(df: DataFrame, col: str) -> DataFrame:
    """A4 — value counts + percentage (analyze_gold_vrt.py:196-200).
    Percentage returned in exact basis points (count*10000 div total) to
    stay engine-portable."""
    counts = df.groupBy(col).agg(F.count("*").alias("count"))
    # grand total via broadcast scalar join, not an unpartitioned window:
    # stays distributed even when `col` has 10^9 distinct values.
    total = counts.groupBy().agg(F.sum("count").alias("_total"))
    return (
        counts.crossJoin(F.broadcast(total))
        .select(
            col,
            "count",
            (F.col("count") * 10000 / F.col("_total"))
            .cast("bigint")
            .alias("pct_bp"),
        )
        .orderBy(F.desc("count"), col)
    )


def novel_quality_rollup(df: DataFrame) -> DataFrame:
    """A5 — per-conversation mean ratio and match rate
    (analyze_gold_vrt.py:140-147).  Integer-safe: sums + counts exposed,
    means derived by one division.  Centipoints ROUND before the cast —
    ratios are 2-dp doubles whose IEEE representation sits a hair below
    the decimal value (0.29 stores as 0.2899…), so a bare bigint cast
    truncates 29 to 28 and biases every mean low (ADVICE r3)."""
    return (
        df.groupBy("conv_id")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.round(F.col("ratio") * 100).cast("bigint")).alias(
                "ratio_cp_sum"
            ),
            F.sum(
                F.when(F.col("levcat") == "match", 1).otherwise(0)
            ).alias("n_match"),
        )
        .select(
            "conv_id",
            "n",
            (F.col("ratio_cp_sum") / F.col("n") / 100).alias("avg_ratio"),
            (F.col("n_match") / F.col("n")).alias("match_rate"),
        )
        .orderBy(F.desc("avg_ratio"), "conv_id")
    )


def confusion_categories(
    df: DataFrame,
    gold_col: str = "token",
    base_col: str = "base_ocrtok",
    corr_col: str = "corr_ocrtok",
) -> DataFrame:
    """A6 (classification step) — row classification into the P/R/F1
    confusion categories (analyze_gold_vrt.py:106-137)."""
    g, b, c = F.col(gold_col), F.col(base_col), F.col(corr_col)
    fine = (
        F.when((b != g) & (c == g), "TruePos")
        .when((b != g) & (c != g) & (b == c), "FalseNegMiss")
        .when((b != g) & (c != g) & (b != c), "FalseNegWrong")
        .when((b == g) & (c != g), "FalsePos")
        .otherwise("TrueNeg")
    )
    df = df.withColumn("finecategory", fine)
    cat = F.when(
        F.col("finecategory").isin("FalseNegMiss", "FalseNegWrong"),
        "FalseNeg",
    ).otherwise(F.col("finecategory"))
    return df.withColumn("category", cat)


def precision_recall_f1(categorized: DataFrame) -> DataFrame:
    """A6 (rollup step) — P/R/F1 from the category counts; one row."""
    counts = categorized.groupBy().agg(
        F.sum(F.when(F.col("category") == "TruePos", 1).otherwise(0)).alias(
            "tp"
        ),
        F.sum(F.when(F.col("category") == "FalsePos", 1).otherwise(0)).alias(
            "fp"
        ),
        F.sum(F.when(F.col("category") == "FalseNeg", 1).otherwise(0)).alias(
            "fn"
        ),
        F.sum(F.when(F.col("category") == "TrueNeg", 1).otherwise(0)).alias(
            "tn"
        ),
    )
    p = F.col("tp") / (F.col("tp") + F.col("fp"))
    r = F.col("tp") / (F.col("tp") + F.col("fn"))
    return counts.select(
        "tp",
        "fp",
        "fn",
        "tn",
        p.alias("precision"),
        r.alias("recall"),
        (2 * p * r / (p + r)).alias("f1"),
    )


def opcode_breakdown(df: DataFrame, subst_col: str = "subst") -> DataFrame:
    """A7 — substitution-opcode frequency (analyze_gold_vrt.py:227-231)."""
    return freq_breakdown(df.where(F.col(subst_col).isNotNull()), subst_col)


def error_cases(
    df: DataFrame, n: int = 2, m: int = 3
) -> DataFrame:
    """A8 — unique orig/corr pairs with leven in [n, m], tabulated
    (analyze_gold_vrt.py:203-207)."""
    return (
        df.where(F.col("leven").between(n, m))
        .groupBy("token", "ocrtok")
        .agg(F.count("*").alias("n_cases"))
        .orderBy("n_cases", "token", "ocrtok")
    )


def same_char_aggregates(df: DataFrame) -> DataFrame:
    """A9 — grouped set collection for same_chars errors
    (analyze_gold_vrt.py:277-300).  The set is sorted and joined for a
    deterministic scalar representation."""
    return (
        df.where(F.col("levcat") == "same_chars")
        .groupBy("token")
        .agg(
            F.count("*").alias("n"),
            F.array_join(
                F.array_sort(F.collect_set("ocrtok")), ","
            ).alias("orig_set"),
        )
        .orderBy(F.desc("n"), "token")
    )


def top_n_sum(freqlist: DataFrame, n: int = 50) -> DataFrame:
    """A11 — calibration sum over the top-N frequency rows
    (correct_ocr.py:274-276).

    Distributed top-k (``orderBy.limit`` → per-partition TakeOrdered +
    driver merge of n rows), NOT a global ``row_number`` window — the
    window form funnels the whole lexicon through one task, a
    driver-sized bottleneck on a 10^9-row freqlist."""
    return (
        freqlist.orderBy(F.desc("freq"), "token")
        .limit(n)
        .groupBy()
        .agg(F.sum("freq").alias("top_sum"))
    )


def dict_overlay(base: DataFrame, new: DataFrame) -> DataFrame:
    """U1 — token-keyed union with new-side priority (last-wins overlay,
    correct_ocr.py:248-251): full outer join + coalesce."""
    b = base.select("token", F.col("freq").alias("base_freq"))
    n = new.select("token", F.col("freq").alias("new_freq"))
    return b.join(n, "token", "full_outer").select(
        "token",
        F.coalesce("new_freq", "base_freq").alias("freq"),
    )


def augmented_dictionary(
    base: DataFrame, corpus: DataFrame, lower: int = 2, upper: int = 10000
) -> DataFrame:
    """A10 — scaled corpus-frequency overlay onto the base dictionary
    (correct_ocr.py:236-256 / :269-286): scale corpus counts by the ratio
    of top-50 sums, ceil, BAND-FILTER on the *raw* corpus count (only
    tokens with ``lower <= freq <= upper`` are overlaid — tokens outside
    the band keep their base frequency, exactly the reference's list
    comprehension at correct_ocr.py:246; this is a filter, not a clamp),
    overlay last-wins, re-sort."""
    base_top = top_n_sum(base, 50)
    corp_top = top_n_sum(corpus, 50)
    ratio = (
        base_top.crossJoin(
            corp_top.select(F.col("top_sum").alias("corp_sum"))
        )
        .select((F.col("top_sum") / F.col("corp_sum")).alias("ratio"))
    )
    scaled = (
        corpus.where(F.col("freq").between(lower, upper))
        .crossJoin(F.broadcast(ratio))
        .select(
            "token",
            F.ceil(F.col("freq") * F.col("ratio")).alias("freq"),
        )
    )
    return dict_overlay(base, scaled).orderBy(F.desc("freq"), "token")


def salted_count(
    df: DataFrame, key_cols: list[str], salt_buckets: int = 16
) -> DataFrame:
    """Two-phase skew-proof count: partial count on (key, salt) then final
    merge on key.  For Zipf-skewed keys (token frequencies are the classic
    case) the hot key's rows split across ``salt_buckets`` reducers in
    phase 1 instead of hammering one.  Output is identical to a plain
    ``groupBy(key).count()`` — verified against the same SQL oracle."""
    salt = F.pmod(F.monotonically_increasing_id(), F.lit(salt_buckets))
    partial = (
        df.withColumn("_salt", salt)
        .groupBy(*key_cols, "_salt")
        .agg(F.count("*").alias("_c"))
    )
    return partial.groupBy(*key_cols).agg(F.sum("_c").alias("freq"))


def salted_unigram_freqlist(
    tokens: DataFrame, token_col: str = "token", salt_buckets: int = 16
) -> DataFrame:
    """A1 with explicit salting (SURVEY.md §4.3 skew note): same result as
    ``unigram_freqlist``, skew-resistant physical plan."""
    base = tokens.select(F.lower(F.col(token_col)).alias("token")).where(
        ~F.col("token").isin(list(FREQCOUNT_DROP))
    )
    return salted_count(base, ["token"], salt_buckets).orderBy(
        F.desc("freq"), "token"
    )


def mode_per_key(
    counted: DataFrame,
    key_cols: list[str] | tuple[str, ...],
    value_col: str,
    count_col: str = "c",
) -> DataFrame:
    """Total-order mode election over a pre-counted ``(key..., value,
    count)`` table: per key, the value with the highest count, ties
    broken by the lexicographically smallest value — a total order, so
    every engine and every partitioning elect the same representative.

    Output: ``(key..., mode_value, mode_count)``.

    Shared by :func:`~...operators.extraction.anchor_text_stats` (the
    anchor-text representative) and
    :func:`~...operators.transcripts.tool_call_stats` (the dominant
    tool) — one election rule, one implementation.

    Scale: the input is already distinct-pair-sized; one per-key max
    aggregation and one equi-join back, no windows.
    """
    keys = list(key_cols)
    peak = counted.groupBy(*keys).agg(
        F.max(count_col).alias("_peak")
    )
    return (
        counted.join(peak, keys)
        .where(F.col(count_col) == F.col("_peak"))
        .groupBy(*keys)
        .agg(
            F.min(value_col).alias("mode_value"),
            F.max("_peak").alias("mode_count"),
        )
    )


def corpus_cube_report(
    df: DataFrame,
    dims: tuple[str, ...] = ("lang", "source"),
    chars_col: str = "n_chars",
) -> DataFrame:
    """Corpus report card over every combination of the ``dims``
    dimensions in ONE pass via CUBE grouping sets: per (lang, source)
    cell, per lang, per source, and the grand total — the single-scan
    answer to "what is in this corpus" that a mix-curation run wants
    before weighting (``curation.domain_mix_weights`` consumes the
    per-source marginal this report previews).

    ``gid`` is the grouping-set id (bit per dimension, first dim =
    MSB — Spark's ``grouping_id`` convention, mirrored in SQL as
    ``grouping(d1)*2 + grouping(d2)``); rolled-up dimension values are
    rendered as ``'(all)'`` so a real NULL cell and a rollup row stay
    distinguishable via ``gid``.

    Scale: CUBE over k dims expands each input row into 2^k grouping
    rows BEFORE one hash aggregation — the expansion happens map-side
    and partial-aggregates immediately, so the shuffle carries only
    (cells × 2^k) aggregated rows, not data.  Integer-exact aggregates
    only (counts/sums/min/max) — portable across engines.
    """
    cube_cols = [F.col(d) for d in dims]
    coalesced = [
        F.coalesce(F.col(d), F.lit("(all)")).alias(d) for d in dims
    ]
    return (
        df.cube(*cube_cols)
        .agg(
            F.grouping_id().cast("long").alias("gid"),
            F.count("*").alias("n_docs"),
            F.sum(F.coalesce(F.col(chars_col), F.lit(0))).alias(
                "sum_chars"
            ),
            F.min(F.coalesce(F.col(chars_col), F.lit(0))).alias(
                "min_chars"
            ),
            F.max(F.coalesce(F.col(chars_col), F.lit(0))).alias(
                "max_chars"
            ),
        )
        .select(*coalesced, "gid", "n_docs", "sum_chars", "min_chars", "max_chars")
    )
