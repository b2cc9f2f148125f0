"""Distributed BPE tokenizer training and encoding (Sennrich et al.
2016, arXiv:1508.07909) — the tokenizer-construction stage of a
training-data pipeline, Spark-first.

Scale decomposition (the reason BPE distributes at all): merges are
learned from the WORD-FREQUENCY table, not the raw corpus.  The only
corpus-sized operation is therefore the initial ``groupBy(word)``
count — one shuffle with map-side combine, Zipf-bounded output (a
100 TB corpus still has ~10^6-10^7 distinct words).  Every merge round
then runs on that small table: one pair-count aggregation (shuffle
keyed by symbol pair) plus a narrow fold that applies the chosen merge
per word.  Driver work per round is a single ``limit(1).collect()`` —
one row, the argmax pair — the same bounded-driver-action budget as the
skew router's whale pick (plans/pipeline.py).

Determinism: the reference implementation breaks pair-count ties by
dict insertion order; this spec replaces that with the total order
``(count DESC, left ASC, right ASC)`` so both engines (and any two
runs) learn identical merge tables.  The greedy merge application is a
single left-to-right pass (``aggregate`` fold with an array
accumulator): overlapping occurrences collapse left-first —
``a a a`` + merge ``(a,a)`` → ``aa a`` — exactly the reference's
non-overlapping left-to-right replace.

Plan hygiene: each round's fold is stamped with a lazy
``localCheckpoint(eager=False)`` (the connected-components lesson,
operators/dedup.py:connected_components): composing ``n_merges`` folds
lazily doubles the Catalyst plan per round; the checkpoint resets the
logical plan to a LogicalRDD with NO extra driver job — the round's
own argmax action materializes it.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: End-of-word marker appended to every word's character sequence —
#: Sennrich's ``</w>``, which lets the tokenizer distinguish word-final
#: subwords from interior ones.
END_MARKER = "</w>"


def _ws_token_array(text_col: str):
    """Whitespace-split non-empty tokens — the shared word definition
    for training, encoding, and counting (must stay identical or the
    learned vocabulary and the counted corpus diverge)."""
    return F.filter(
        F.split(F.trim(F.coalesce(F.col(text_col), F.lit(""))), r"\s+"),
        lambda t: F.length(t) > 0,
    )


def word_counts(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(word, wc): whitespace-token frequency table — the ONE
    corpus-sized aggregation of BPE training."""
    return (
        df.select(F.explode(_ws_token_array(text_col)).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("wc"))
    )


def _merge_fold(syms, left: str, right: str):
    """Greedy left-to-right single-pass application of merge
    ``(left, right)`` to a symbol array: fold with an array
    accumulator, replacing a trailing ``left`` followed by ``right``
    with the concatenated symbol."""
    merged = left + right
    return F.aggregate(
        syms,
        F.array().cast("array<string>"),
        lambda acc, x: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(left))
            & (x == F.lit(right)),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1),
                F.array(F.lit(merged)),
            ),
        ).otherwise(F.concat(acc, F.array(x))),
    )


def bpe_train(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_merges: int = 16,
    end_marker: str = END_MARKER,
) -> list[tuple[int, str, str, str, int]]:
    """Learn ``n_merges`` BPE merges from a text column.

    Returns the merge table as a LIST of
    ``(merge_idx, left, right, merged, pair_count)`` — the tokenizer
    artifact is driver-sized by definition (n_merges rows; a production
    vocab is 10^4-10^5 rows), exactly like the centroid codebook
    :func:`similarity.kmeans_centroids` returns a small DataFrame.
    Wrap with ``spark.createDataFrame(rows, BPE_MERGE_SCHEMA)`` when a
    DataFrame is wanted.

    Exactly ``n_merges`` rounds run — no data-dependent early stop, so
    a SQL oracle can unroll the identical fixed number of rounds
    (``ValueError`` on an empty corpus instead of a truncated table).
    """
    counts = word_counts(df, id_col, text_col)
    syms0 = F.concat(
        F.split(F.col("word"), ""), F.array(F.lit(end_marker))
    )
    cur = counts.select(F.col("wc"), syms0.alias("syms"))
    merges: list[tuple[int, str, str, str, int]] = []
    for idx in range(int(n_merges)):
        pairs = cur.select(
            "wc",
            F.explode(
                F.zip_with(
                    F.slice(F.col("syms"), 1, F.size("syms") - 1),
                    F.slice(F.col("syms"), 2, F.size("syms") - 1),
                    lambda l, r: F.struct(l.alias("l"), r.alias("r")),
                )
            ).alias("p"),
        )
        best = (
            pairs.groupBy("p.l", "p.r")
            .agg(F.sum("wc").alias("cnt"))
            .orderBy(F.desc("cnt"), "l", "r")
            .limit(1)
            .collect()
        )
        if not best:
            raise ValueError(
                "bpe_train: corpus has no symbol pairs (empty input?)"
            )
        left, right, cnt = best[0]["l"], best[0]["r"], int(best[0]["cnt"])
        merges.append((idx, left, right, left + right, cnt))
        cur = cur.select(
            "wc", _merge_fold(F.col("syms"), left, right).alias("syms")
        ).localCheckpoint(eager=False)
    return merges


BPE_MERGE_SCHEMA = (
    "merge_idx long, left string, right string, merged string,"
    " pair_count long"
)


def bpe_encode_words(
    words: DataFrame,
    merges: list[tuple[int, str, str, str, int]],
    word_col: str = "word",
    end_marker: str = END_MARKER,
) -> DataFrame:
    """Encode a word table with a learned merge list: one Arrow-batched
    pandas UDF applying the merges IN TRAINING ORDER, each as the same
    greedy left-to-right pass :func:`_merge_fold` performs — the
    encoder is by construction the training-time transformation, so
    ``bpe_encode_words(vocab, bpe_train(corpus))`` reproduces the
    trainer's final symbol table exactly (asserted in
    tests/test_operators.py).

    Returns ``(word, bpe_syms array<string>, n_syms)``.  This is the
    legitimate Pandas-UDF case: a dictionary-driven per-word loop over
    ranked merges has no efficient Catalyst expression once the merge
    table is thousands of rows (a chained fold per merge grows the plan
    linearly with vocab size) — the merge list ships to executors as a
    broadcast-sized closure and each Arrow batch loops in-process.
    """
    from pyspark.sql.functions import pandas_udf

    pairs = [(m[1], m[2]) for m in merges]

    @pandas_udf("array<string>")
    def _encode(col: pd.Series) -> pd.Series:
        def enc(w):
            if w is None:
                return None
            syms = list(w) + [end_marker]
            for left, right in pairs:
                out = []
                for s in syms:
                    if out and out[-1] == left and s == right:
                        out[-1] = left + right
                    else:
                        out.append(s)
                syms = out
            return syms

        return col.map(enc)

    return words.select(
        F.col(word_col).alias("word"),
        _encode(F.col(word_col)).alias("bpe_syms"),
    ).withColumn("n_syms", F.size("bpe_syms"))


def bpe_doc_token_counts(
    df: DataFrame,
    merges: list[tuple[int, str, str, str, int]],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document token counts under a LEARNED BPE merge table —
    the real-tokenizer counterpart of ``textstats.token_counts``:
    token budgets (shard packing, domain mixing, context-window
    chunking) are denominated in tokenizer tokens, and whitespace
    counts misprice morphologically rich or OCR-noisy text.

    Returns ``(id, n_words, bpe_tokens)`` with zero-token documents
    kept at ``(0, 0)``.

    Scale shape: the expensive greedy encoder runs ONCE PER DISTINCT
    WORD (vocabulary-sized Arrow work, Zipf-bounded ~10^6-10^7 rows at
    any corpus size), never per occurrence.  The corpus-sized steps
    are one ``(id, word)`` count aggregation (map-side combine absorbs
    within-doc repetition) and one join of that table against the
    encoded vocabulary keyed on the word — left UNHINTED: the vocab
    usually broadcasts, but Zipf tails are unbounded and AQE should
    decide (the strip_boilerplate rule).  The final per-doc sum
    re-shuffles on the id only.
    """
    base = df.select(
        F.col(id_col).alias("id"), _ws_token_array(text_col).alias("ts")
    )
    dw = (
        base.select("id", F.explode("ts").alias("word"))
        .groupBy("id", "word")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    enc = bpe_encode_words(dw.select("word").distinct(), merges)
    per = (
        dw.join(enc.select("word", "n_syms"), "word")
        .groupBy("id")
        .agg(
            F.sum("cnt").alias("n_words"),
            F.sum(F.col("cnt") * F.col("n_syms")).alias("bpe_tokens"),
        )
    )
    return (
        base.select("id")
        .join(per, "id", "left")
        .select(
            "id",
            F.coalesce("n_words", F.lit(0).cast("bigint")).alias(
                "n_words"
            ),
            F.coalesce("bpe_tokens", F.lit(0).cast("bigint")).alias(
                "bpe_tokens"
            ),
        )
    )
