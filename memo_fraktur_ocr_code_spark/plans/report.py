"""Text report rendering — the analog of the reference's
``analyses/<params>.txt`` output (analyze_gold_vrt.py:42-103 via
print_and_write, myutils/__init__.py:249-254).

Report tables are tiny aggregates; only they are collected.  The heavy
token-level tables never reach the driver."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _fmt(df: DataFrame, limit: int = 50) -> str:
    pdf = df.limit(limit).toPandas()
    return pdf.to_string(index=False) if len(pdf) else "(empty)"


def with_reference_percentage(breakdown: DataFrame) -> DataFrame:
    """Reference-parity rendering of a frequency breakdown: the engine
    keeps exact basis points (``pct_bp``, cross-engine-hashable ints);
    this view adds the reference's 2-decimal ``percentage`` column
    (analyze_gold_vrt.py:196-200 ``round(pct, 2)``) at render time,
    derived from the exact counts so no double rounding accumulates."""
    total = breakdown.groupBy().agg(F.sum("count").alias("_total"))
    return breakdown.crossJoin(F.broadcast(total)).select(
        *[c for c in breakdown.columns if c != "pct_bp"],
        F.round(F.col("count") * 100.0 / F.col("_total"), 2).alias(
            "percentage"
        ),
    )


def render_report(
    reports: dict[str, DataFrame],
    param_str: str,
    reference_parity: bool = False,
) -> str:
    """Render the evaluation report dict (plans/evaluate.py) to the text
    layout of the reference's analysis files.  ``reference_parity=True``
    formats breakdown percentages the reference's way (2dp) instead of
    exposing the engine's exact basis-point column."""
    if reference_parity:
        reports = {
            k: with_reference_percentage(v)
            if "pct_bp" in v.columns
            else v
            for k, v in reports.items()
        }
    prf = reports["precision_recall_f1"].collect()[0]

    def _r2(v) -> str:
        # precision/recall/F1 are NULL when their denominator is 0
        # (e.g. a run that changed nothing has no corrections at all);
        # render n/a instead of crashing on round(None) (ADVICE r3)
        return "n/a" if v is None else f"{round(v, 2)}"

    sections = [
        f"--------\n\n{param_str}\nlevcat breakdown (base OCR)\n",
        _fmt(reports["base_levcat_breakdown"]),
        f"--------\n\n{param_str}\nlevcat breakdown (corrected)\n",
        _fmt(reports["corr_levcat_breakdown"]),
        f"--------\n\n{param_str}\nopcode breakdown (corrected)\n",
        _fmt(reports["corr_opcode_breakdown"]),
        f"--------\n\n{param_str}\nper-conversation quality\n",
        _fmt(reports["per_conv_quality"]),
        f"--------\n\n{param_str}\n"
        "Precision, recall, F1 for corrections\n",
        f"\nError counts:\ntp {prf.tp}  fp {prf.fp}  fn {prf.fn}"
        f"  tn {prf.tn}",
        "\nPrecision (how many successful corrections out of all"
        f" corrections?):\n{_r2(prf.precision)}",
        "\nRecall (how many errors did we successfully correct?):\n"
        f"{_r2(prf.recall)}",
        f"\nF1 (overall performance):\n{_r2(prf.f1)}",
        "\nMissed errors:\n",
        _fmt(reports["missed_errors"]),
        "\nErrors replaced by new errors:\n",
        _fmt(reports["new_errors"]),
        "\nCorrect words wrongly corrected:\n",
        _fmt(reports["bad_corrections"]),
    ]
    return "\n".join(sections) + "\n"


def param_str(
    base_ocr: str = "kb",
    freqs: str = "freqs10",
    correct_easy: bool = True,
    correct_hard: bool = True,
    sym_wordcorrect: bool = True,
) -> str:
    """The reference's run-identifier string (myutils/__init__.py:257-264
    ``get_params``) — names report files and checkpoint stages."""
    parts = [
        base_ocr,
        freqs,
        "correasy" if correct_easy else "",
        "corrhard" if correct_hard else "",
        "symwordcorr" if sym_wordcorrect else "",
    ]
    return "_".join(p for p in parts if p)
