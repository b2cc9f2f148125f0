"""J3 — CONLL annotation join (align_ocr.py:273-324 semantics).

Fast path: when both sides were produced by the same deterministic
tokenizer, tokens agree positionally and the merge is a plain equi-join on
``(conv_id, position)`` — pure Catalyst, broadcast when the annotation
side is small.

Fallback: for externally produced CONLL whose tokens drift, the
per-conversation alignment kernel re-buckets annotation rows onto the
token table with SequenceMatcher spans: CONLL-only tokens are dropped,
token-table-only or mismatched tokens get dummy ('_') annotations —
exactly the reference's repair rules (align_ocr.py:292-324).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from memo_fraktur_ocr_code_spark.functions.alignment import get_align_indexes

_OUT_SCHEMA = (
    "conv_id string, word_idx int, token string, sent_word_num string, "
    "lemma string, pos string"
)


def join_conll_fast(tokens: DataFrame, conll: DataFrame) -> DataFrame:
    """Positional equi-join — valid when tokenizers agree.  ``conll``
    columns: (conv_id, word_idx, token, sent_word_num, lemma, pos)."""
    c = conll.select(
        "conv_id",
        "word_idx",
        F.col("token").alias("conll_token"),
        "sent_word_num",
        "lemma",
        "pos",
    )
    out = tokens.join(c, ["conv_id", "word_idx"], "left")
    mismatch = F.col("conll_token").isNotNull() & (
        F.col("conll_token") != F.col("token")
    )
    return out.select(
        *tokens.columns,
        F.when(mismatch, "_").otherwise(F.col("sent_word_num")).alias(
            "sent_word_num"
        ),
        F.when(mismatch, "_").otherwise(F.col("lemma")).alias("lemma"),
        F.when(mismatch, "_").otherwise(F.col("pos")).alias("pos"),
    )


def _align_group(pdf: pd.DataFrame) -> pd.DataFrame:
    vrt = pdf[pdf["side"] == "v"].sort_values("word_idx")
    con = pdf[pdf["side"] == "c"].sort_values("word_idx")
    vrt_tokens = vrt["token"].tolist()
    conll_tokens = con["token"].tolist()
    ann = list(
        zip(
            con["sent_word_num"].tolist(),
            con["lemma"].tolist(),
            con["pos"].tolist(),
        )
    )
    out_rows = []
    if vrt_tokens == conll_tokens:
        merged = ann
    else:
        merged = []
        for ai, aj, bi, bj, match in get_align_indexes(
            tuple(vrt_tokens), tuple(conll_tokens)
        ):
            n_v = aj - ai
            n_c = bj - bi
            if match:
                merged.extend(ann[bi:bj])
            elif n_v == 0:
                continue  # CONLL-only tokens dropped
            elif n_v > n_c:
                merged.extend([("_", "_", "_")] * n_v)
            else:  # same length, tokens differ: keep word number only
                merged.extend(
                    [(ann[bi + k][0], "_", "_") for k in range(n_v)]
                )
    for (widx, tok), (swn, lemma, pos) in zip(
        zip(vrt["word_idx"].tolist(), vrt_tokens), merged
    ):
        out_rows.append(
            (pdf["conv_id"].iloc[0], widx, tok, str(swn), lemma, pos)
        )
    return pd.DataFrame(
        out_rows,
        columns=[
            "conv_id", "word_idx", "token", "sent_word_num", "lemma", "pos",
        ],
    )


def join_conll_aligned(tokens: DataFrame, conll: DataFrame) -> DataFrame:
    """Fallback alignment join: one grouped kernel per conversation over
    the union of both sides (single conv_id shuffle)."""
    v = tokens.select(
        "conv_id",
        "word_idx",
        "token",
        F.lit("v").alias("side"),
        F.lit(None).cast("string").alias("sent_word_num"),
        F.lit(None).cast("string").alias("lemma"),
        F.lit(None).cast("string").alias("pos"),
    )
    c = conll.select(
        "conv_id",
        "word_idx",
        "token",
        F.lit("c").alias("side"),
        F.col("sent_word_num").cast("string"),
        "lemma",
        "pos",
    )
    return (
        v.unionByName(c)
        .groupBy("conv_id")
        .applyInPandas(_align_group, schema=_OUT_SCHEMA)
    )
