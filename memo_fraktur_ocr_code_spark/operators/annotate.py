"""Token-level annotation operators.

Spark mapping of SURVEY.md §2.4 E6-E8, §2.3 J5, §2.6 W1/W2: the
reference's positional VRT string columns become a properly typed
token-level DataFrame ``(conv_id, turn_idx, line_idx, word_on_line,
word_idx, token, ...)`` with real NULLs instead of 'NA' strings
(add_vrt_annotations.py:379-382).

Design notes:
* tokenization + enumeration is pure Catalyst (regexp_replace + split +
  posexplode + row_number windows) — whole-stage codegen end to end;
* ``levenshtein`` is the Spark built-in; the *indel ratio* is not a
  Catalyst expression, so ratio/CER/difftype/opcode run in one Arrow
  pandas UDF over the aligned pair (SURVEY.md §2.10 annotate_batch);
* freqlist membership is a broadcast set lookup inside the batch — the
  broadcast-semi-join pattern without a shuffle per annotation layer
  (add_vrt_annotations.py:372-376).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

from memo_fraktur_ocr_code_spark.functions.levtools import (
    cer_from_ratio,
    get_difftype,
    get_op_str,
    indel_ratio,
    levenshtein,
)

# Same punctuation class as functions/textspec.py (the tokenizer spec),
# expressed for Catalyst regexp_replace.
TOKENIZE_PAD_PATTERN = '([.,:;„“”"»«\'!?()])'


def tokenize_col(col):
    """Catalyst expression: text → array<string> of tokens (the exact
    tokenizer spec of functions/textspec.tokenize, JVM-side)."""
    c = F.col(col) if isinstance(col, str) else col
    padded = F.regexp_replace(c, TOKENIZE_PAD_PATTERN, " $1 ")
    return F.filter(F.split(padded, r"\s+"), lambda t: t != "")


def tokens_table(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-turn text → token table with the reference's three enumeration
    layers (make_corpus_vrt.py:82-101 page2tokens): word# in turn (i),
    word# on line (j), line# — all 1-based — plus a conversation-global
    word index (W1)."""
    lines = df.select(
        "conv_id",
        "turn_idx",
        F.posexplode(F.split(F.col(text_col), "\n")).alias(
            "line_off", "line"
        ),
    ).withColumn("line_idx", F.col("line_off") + 1)
    toks = lines.select(
        "conv_id",
        "turn_idx",
        "line_idx",
        F.posexplode(tokenize_col("line")).alias("word_off", "token"),
    ).withColumn("word_on_line", F.col("word_off") + 1)
    w_turn = Window.partitionBy("conv_id", "turn_idx").orderBy(
        "line_idx", "word_on_line"
    )
    w_conv = Window.partitionBy("conv_id").orderBy(
        "turn_idx", "line_idx", "word_on_line"
    )
    return toks.select(
        "conv_id",
        "turn_idx",
        "line_idx",
        "word_on_line",
        F.row_number().over(w_turn).alias("word_idx"),
        F.row_number().over(w_conv).alias("conv_word_idx"),
        "token",
    )


_MEASURE_SCHEMA = StructType(
    [
        StructField("leven", IntegerType()),
        StructField("ratio", DoubleType()),
        StructField("cer", DoubleType()),
        StructField("cer_pct", DoubleType()),
        StructField("levcat", StringType()),
        StructField("subst", StringType()),
    ]
)


# per-worker memo for the pure pair→measures computation: aligned token
# pairs are Zipf-distributed, so the same (a, b) recurs constantly and
# the Python diff chain (levenshtein + SequenceMatcher opcodes) is the
# whole cost of E6-E8.  Capped; results are identical with or without
# (pure function of the pair) so the oracle contract is untouched.
_PAIR_MEMO: dict = {}
_PAIR_MEMO_CAP = 1 << 17


@F.pandas_udf(_MEASURE_SCHEMA)
def _pair_measures(corr: pd.Series, ocr: pd.Series) -> pd.DataFrame:
    """Arrow-batched diff measures for aligned (correct, ocr) token pairs
    (add_vrt_annotations.py:357-369 + align_ocr.py:33-52)."""
    levs, ratios, cers, cer_pcts, cats, ops = [], [], [], [], [], []
    for a, b in zip(corr.tolist(), ocr.tolist()):
        a = a or ""
        b = b or ""
        got = _PAIR_MEMO.get((a, b))
        if got is None:
            lv = levenshtein(a, b)
            rt = round(indel_ratio(a, b), 2)
            got = (
                lv,
                rt,
                cer_from_ratio(rt),
                0.0 if lv == 0 or not a else round(lv / len(a) * 100, 2),
                get_difftype(a, b),
                get_op_str(a, b),
            )
            if len(_PAIR_MEMO) < _PAIR_MEMO_CAP:
                _PAIR_MEMO[(a, b)] = got
        levs.append(got[0])
        ratios.append(got[1])
        cers.append(got[2])
        cer_pcts.append(got[3])
        cats.append(got[4])
        ops.append(got[5])
    return pd.DataFrame(
        {
            "leven": pd.Series(levs, dtype="int32"),
            "ratio": ratios,
            "cer": cers,
            "cer_pct": cer_pcts,
            "levcat": cats,
            "subst": ops,
        }
    )


def annotate_pair_measures(
    df: DataFrame, corr_col: str = "token", ocr_col: str = "ocrtok"
) -> DataFrame:
    """E6-E8: add leven/ratio/cer/levcat/subst columns for an aligned
    token-pair table.  'NA' → real NULL: measures NULL when either side is
    missing."""
    m = _pair_measures(F.col(corr_col), F.col(ocr_col))
    df = df.withColumn("_m", m)
    both = F.col(corr_col).isNotNull() & F.col(ocr_col).isNotNull()
    out = df.select(
        "*",
        F.when(both, F.col("_m.leven")).alias("leven"),
        F.when(both, F.col("_m.ratio")).alias("ratio"),
        F.when(both, F.col("_m.cer")).alias("cer"),
        F.when(both, F.col("_m.cer_pct")).alias("cer_pct"),
        F.when(both, F.col("_m.levcat")).alias("levcat"),
        F.when(both, F.col("_m.subst")).alias("subst"),
    ).drop("_m")
    return out


def add_in_freqlist(df: DataFrame, bc_freq_forms, token_col: str = "token"):
    """J5 — broadcast freqlist membership flag (1/0), zero-shuffle
    (add_vrt_annotations.py:372-376)."""

    @F.pandas_udf(IntegerType())
    def _in_freq(tokens: pd.Series) -> pd.Series:
        forms = bc_freq_forms.value
        return (
            tokens.fillna("").str.lower().isin(forms).astype("int32")
        )

    return df.withColumn("infreq", _in_freq(F.col(token_col)))


def add_sentence_idx(
    df: DataFrame, sent_word_col: str = "sent_word_num"
) -> DataFrame:
    """W2 — running sentence id: a new sentence whenever the CONLL
    word-in-sentence number restarts at 1 (add_vrt_annotations.py:429-451),
    as the classic session-boundary running sum."""
    w = (
        Window.partitionBy("conv_id")
        .orderBy("turn_idx", "line_idx", "word_on_line")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    marker = F.when(F.col(sent_word_col) == 1, 1).otherwise(0)
    return df.withColumn("sent_idx", F.sum(marker).over(w))
