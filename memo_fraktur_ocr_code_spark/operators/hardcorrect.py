"""correct_hard: alt-OCR-informed selective char transfer, per turn.

Spark mapping of SURVEY.md §2.3 J1/J2 + §2.4 E4 (correct_ocr.py:57-156).
The two OCR channels are equi-joined on (conv_id, turn_idx) — a plain
shuffle (or broadcast, if one side is small) hash join Catalyst plans
itself — and the order-sensitive token alignment + char transfer runs
inside a ``mapInPandas`` Arrow kernel on the joined rows.  Per-turn (not
per-conversation!) granularity makes this stage embarrassingly parallel:
no grouped shuffle, no skew concern beyond row-size variance, which the
Arrow batch size bounds.

The 250-token chunking inside the kernel reproduces the reference's
overgeneralization guard and is what would make further chunk-level
salting *correct* if single turns were ever huge.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from memo_fraktur_ocr_code_spark.functions.alignment import alt_ocr_correct

_OUT_SCHEMA = "conv_id string, turn_idx int, text string"


def correct_hard(
    df: DataFrame, alt_df: DataFrame, bc_most_frequent
) -> DataFrame:
    """``df``/``alt_df``: (conv_id, turn_idx, text) — base channel and
    assembled alternative channel.  ``bc_most_frequent``: broadcast of the
    top-600 guard frozenset (myutils/__init__.py:340)."""
    joined = df.join(
        alt_df.select(
            "conv_id", "turn_idx", F.col("text").alias("alt_text")
        ),
        on=["conv_id", "turn_idx"],
        how="left",
    )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        mf = bc_most_frequent.value
        for pdf in batches:
            texts = pdf["text"].tolist()
            alts = pdf["alt_text"].tolist()
            out = [
                alt_ocr_correct(t, a if isinstance(a, str) else "", mf)
                if t
                else t
                for t, a in zip(texts, alts)
            ]
            yield pd.DataFrame(
                {
                    "conv_id": pdf["conv_id"].to_numpy(),
                    "turn_idx": pdf["turn_idx"].to_numpy(),
                    "text": out,
                }
            )

    return joined.mapInPandas(kernel, schema=_OUT_SCHEMA)
