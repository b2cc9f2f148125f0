"""Single-node oracle: the reference-shaped sequential execution of the
same spec kernels.

This mirrors the reference's per-novel loop structure
(run_eval_pipeline.py:54-64: assemble → correct_easy → correct_hard →
sym_wordcorrect) at conversation granularity, with zero Spark.  The Spark
pipeline's per-turn output must byte-equal this oracle's output for every
turn under stable turn ordering — that is the correctness contract from
BASELINE.json.
"""

from __future__ import annotations

from memo_fraktur_ocr_code_spark.functions.alignment import alt_ocr_correct
from memo_fraktur_ocr_code_spark.functions.symspell import (
    SymSpellIndex,
    build_conv_delta,
    conv_freqlist,
    word_correct_text,
)
from memo_fraktur_ocr_code_spark.functions.textspec import (
    assemble_turns,
    correct_easy,
)


def correct_conversation(
    turn_texts: list[str],
    alt_texts: list[str] | None,
    index: SymSpellIndex | None,
    most_frequent: frozenset,
    do_easy: bool = True,
    do_hard: bool = True,
    do_sym: bool = True,
    bigram_counts: dict | None = None,
    augment: tuple | None = None,
) -> list[str]:
    """Run the full correction pipeline over one conversation's turns
    (already in stable (turn_idx, ts) order).  Returns per-turn corrected
    text, same arity as the input."""
    texts = assemble_turns(list(turn_texts))
    if do_easy:
        texts = [correct_easy(t) for t in texts]
    if do_hard and alt_texts is not None:
        alt = assemble_turns(list(alt_texts))
        if len(alt) != len(texts):
            raise ValueError("alt channel turn count mismatch")
        texts = [
            alt_ocr_correct(t, a, most_frequent) if t else t
            for t, a in zip(texts, alt)
        ]
    if do_sym and index is not None:
        overlay = None
        if augment is not None:
            overlay = build_conv_delta(
                index.words, conv_freqlist(texts), *augment,
                base_top50=index.top50_sum,
            )
        memo: dict = {}
        texts = [
            word_correct_text(t, index, memo, bigram_counts, overlay)
            for t in texts
        ]
    return texts


def correct_corpus(
    transcripts: list[dict],
    alt_transcripts: list[dict] | None,
    lexicon_pairs: list[tuple[str, int]],
    top_n_guard: int = 600,
    **flags,
) -> list[dict]:
    """Sequential reference-shaped run over a list of transcript rows
    ``{conv_id, turn_idx, role, text, tool, ts}``.

    Returns rows ``{conv_id, turn_idx, corrected_text}`` for every input
    turn.  The top-N guard set replicates myutils/__init__.py:340
    (``most_frequent = top 600 of the frequency list``).
    """
    index = SymSpellIndex.from_pairs(lexicon_pairs)
    most_frequent = frozenset(t for t, _c in lexicon_pairs[:top_n_guard])
    # same kwarg surface as plans.pipeline.correct_pipeline
    if "bigram_pairs" in flags:
        bp = flags.pop("bigram_pairs")
        flags["bigram_counts"] = dict(bp) if bp is not None else None
    # plan-shape knobs with no semantic effect on the spec
    flags.pop("long_conv_threshold", None)
    # same kwarg surface as correct_pipeline for per-conv augmentation
    if "augment_per_conv" in flags:
        ap = flags.pop("augment_per_conv")
        if ap:
            flags["augment"] = ap if isinstance(ap, tuple) else (2, 250)

    by_conv: dict[str, list[dict]] = {}
    for row in transcripts:
        by_conv.setdefault(row["conv_id"], []).append(row)
    alt_by_conv: dict[str, dict[int, str]] = {}
    if alt_transcripts is not None:
        for row in alt_transcripts:
            alt_by_conv.setdefault(row["conv_id"], {})[row["turn_idx"]] = row[
                "text"
            ]

    out = []
    for conv_id in sorted(by_conv):
        turns = sorted(by_conv[conv_id], key=lambda r: (r["turn_idx"], r["ts"]))
        texts = [r["text"] for r in turns]
        alts = None
        if alt_transcripts is not None:
            amap = alt_by_conv.get(conv_id, {})
            alts = [amap.get(r["turn_idx"], "") for r in turns]
        corrected = correct_conversation(
            texts, alts, index, most_frequent, **flags
        )
        for r, c in zip(turns, corrected):
            out.append(
                {
                    "conv_id": conv_id,
                    "turn_idx": r["turn_idx"],
                    "corrected_text": c,
                }
            )
    return out
