"""sym_wordcorrect: SymSpell word-level correction, per turn.

Spark mapping of SURVEY.md §2.3 J6/J7 + §2.4 E5 (correct_ocr.py:159-233,
335-375): the frequency lexicon becomes a driver-built deletion-variant
index broadcast to every executor; the per-line tokenize → lookup →
reassemble loop runs as a ``mapInPandas`` Arrow kernel with a per-batch
memo (token streams are Zipfian, so the memo absorbs almost all lookups).

This is the idiomatic Spark form of the reference's fuzzy edit-distance
join: a broadcast-index lookup, not an exploded deletion-variant equi-join
(which at 10^12 turns would shuffle 10-100× the corpus; rejected in
SURVEY.md §2.3 J6).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from memo_fraktur_ocr_code_spark.functions.symspell import (
    SymSpellIndex,
    word_correct_text,
)

_OUT_SCHEMA = "conv_id string, turn_idx int, text string"


def broadcast_lexicon(
    spark: SparkSession, lexicon_pairs, top_n_guard: int = 600
):
    """Build the SymSpell index + top-N guard set once on the driver and
    broadcast both (the reference loads them as process-globals,
    myutils/__init__.py:340-341)."""
    index = SymSpellIndex.from_pairs(lexicon_pairs)
    guard = frozenset(t for t, _c in list(lexicon_pairs)[:top_n_guard])
    sc = spark.sparkContext
    return sc.broadcast(index), sc.broadcast(guard)


def sym_wordcorrect(df: DataFrame, bc_index, bc_bigrams=None) -> DataFrame:
    """(conv_id, turn_idx, text) → SymSpell-corrected text.  With
    ``bc_bigrams`` (broadcast {(prev, cand): count}) lookups are reranked
    by bigram context instead of plain TOP."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        index: SymSpellIndex = bc_index.value
        bgc = bc_bigrams.value if bc_bigrams is not None else None
        memo: dict = {}
        for pdf in batches:
            out = [
                word_correct_text(t, index, memo, bgc)
                if isinstance(t, str)
                else t
                for t in pdf["text"].tolist()
            ]
            yield pd.DataFrame(
                {
                    "conv_id": pdf["conv_id"].to_numpy(),
                    "turn_idx": pdf["turn_idx"].to_numpy(),
                    "text": out,
                }
            )

    return df.mapInPandas(kernel, schema=_OUT_SCHEMA)
