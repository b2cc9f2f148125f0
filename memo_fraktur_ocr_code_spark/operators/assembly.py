"""Turn assembly: stable ordering + line filtering + dehyphenation.

Spark mapping of SURVEY.md §2.1 S1/S2 and §2.4 E2/W3: the reference's
``get_novel_string`` (correct_ocr.py:289-305) re-expressed per
conversation.  Cross-turn hyphen donation is an order-dependent sequential
scan (a donated single-word turn changes the next boundary's eligibility),
so the exact spec runs as ONE grouped Arrow kernel per conversation —
``applyInPandas`` over ``conv_id`` — rather than a lead/lag window
approximation.  This is the pipeline's single conv-grouped shuffle; every
later correction stage is per-turn (embarrassingly parallel).

Scale notes (100 TB / 10^12 turns):
* one shuffle keyed by conv_id; AQE skew-join handles *partition*-level
  skew, and pathological single-conversation skew is bounded because the
  kernel is O(total chars in conv) with no quadratic step;
* only (conv_id, turn_idx, ts, text) columns enter the shuffle (column
  pruning — role/tool never ship);
* group results stream back as Arrow batches; no driver collection.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame

from memo_fraktur_ocr_code_spark.functions.textspec import assemble_turns

_OUT_SCHEMA = "conv_id string, turn_idx int, text string"


def _assemble_group(pdf: pd.DataFrame) -> pd.DataFrame:
    order_cols = ["turn_idx", "ts"] if "ts" in pdf.columns else ["turn_idx"]
    pdf = pdf.sort_values(order_cols, kind="mergesort")
    texts = assemble_turns(
        [t if isinstance(t, str) else "" for t in pdf["text"].tolist()]
    )
    return pd.DataFrame(
        {
            "conv_id": pdf["conv_id"].to_numpy(),
            "turn_idx": pdf["turn_idx"].to_numpy(),
            "text": texts,
        }
    )


def assemble_transcripts(df: DataFrame) -> DataFrame:
    """(conv_id, turn_idx, [role, tool,] ts?, text) → assembled per-turn
    text under the stable (turn_idx, ts) window order."""
    cols = ["conv_id", "turn_idx", "text"]
    if "ts" in df.columns:
        cols.append("ts")
    return (
        df.select(*cols)
        .groupBy("conv_id")
        .applyInPandas(_assemble_group, schema=_OUT_SCHEMA)
    )
