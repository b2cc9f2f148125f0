"""Dictionary building — memoocr/make_dictionary.py re-expressed.

Builds the unigram (and bigram) frequency dictionaries from a corpus of
turn texts, with the reference's top-K truncation (1.5M unigrams / 6M
bigrams, make_dictionary.py:66-78) and its ``token count`` text format
(one shuffle each; the text export is a distributed write)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from memo_fraktur_ocr_code_spark.operators.aggregates import (
    bigram_freqlist,
    unigram_freqlist,
)
from memo_fraktur_ocr_code_spark.operators.annotate import tokens_table

UNIGRAM_TOP_K = 1_500_000
BIGRAM_TOP_K = 6_000_000


def build_unigram_dictionary(
    turns: DataFrame, top_k: int = UNIGRAM_TOP_K
) -> DataFrame:
    """(token, freq) sorted (-freq, token), truncated to top_k."""
    toks = tokens_table(turns)
    return unigram_freqlist(toks).limit(top_k)


def build_bigram_dictionary(
    turns: DataFrame, top_k: int = BIGRAM_TOP_K
) -> DataFrame:
    toks = tokens_table(turns)
    return bigram_freqlist(toks).limit(top_k)


def write_dictionary_text(freqlist: DataFrame, path: str) -> None:
    """``token count`` lines (the SymSpell load format,
    correct_ocr.py:208), written distributed."""
    cols = [c for c in freqlist.columns]
    line = F.concat_ws(" ", *cols)
    freqlist.select(line.alias("value")).write.mode("overwrite").text(path)
