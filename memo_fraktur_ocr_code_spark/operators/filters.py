"""F1 — discard/quarantine entry gate (SURVEY.md §2.2 F1).

The reference applies this first in the production flow: any item whose
metadata row is marked ``discard`` or ``quarantine`` is removed from the
work list before OCR/correction starts (run_ocr_pipeline.py:38-44,
``metadata[name]['discard'] or metadata[name]['quarantine']``).

Spark form: the flag table is tiny (per-novel / per-conversation
metadata), so the flagged keys broadcast and the gate is a broadcast
LEFT ANTI join — no shuffle of the corpus side, applied before any
expensive stage so Catalyst can push it into the scan pipeline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def filter_discarded(
    df: DataFrame,
    metadata: DataFrame,
    key_col: str = "conv_id",
    meta_key: str = "name",
    discard_col: str = "discard",
    quarantine_col: str = "quarantine",
) -> DataFrame:
    """Drop rows of ``df`` whose key appears in ``metadata`` with the
    discard OR quarantine flag set.  NULL flags count as not-set (the
    reference treats missing metadata fields as falsy)."""
    flagged = metadata.where(
        F.coalesce(F.col(discard_col), F.lit(False))
        | F.coalesce(F.col(quarantine_col), F.lit(False))
    ).select(F.col(meta_key).alias(key_col))
    return df.join(F.broadcast(flagged.distinct()), key_col, "left_anti")
