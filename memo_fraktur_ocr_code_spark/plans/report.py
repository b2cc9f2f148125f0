"""Text report rendering — the analog of the reference's
``analyses/<params>.txt`` output (analyze_gold_vrt.py:42-103 via
print_and_write, myutils/__init__.py:249-254).

Report tables are tiny aggregates; only they are collected.  The heavy
token-level tables never reach the driver."""

from __future__ import annotations

from pyspark.sql import DataFrame


def _fmt(df: DataFrame, limit: int = 50) -> str:
    pdf = df.limit(limit).toPandas()
    return pdf.to_string(index=False) if len(pdf) else "(empty)"


def render_report(reports: dict[str, DataFrame], param_str: str) -> str:
    """Render the evaluation report dict (plans/evaluate.py) to the text
    layout of the reference's analysis files."""
    prf = reports["precision_recall_f1"].collect()[0]
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
        f" corrections?):\n{round(prf.precision, 2)}",
        "\nRecall (how many errors did we successfully correct?):\n"
        f"{round(prf.recall, 2)}",
        f"\nF1 (overall performance):\n{round(prf.f1, 2)}",
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
