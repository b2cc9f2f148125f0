"""Per-turn byte-equality: Spark pipeline vs single-node oracle.

The correctness contract from BASELINE.json: per-turn corrected text must
byte-equal the reference-shaped sequential implementation under the stable
(turn_idx, ts) turn ordering — for every turn, including empty /
noise-only / hyphen-donating turns and long (skewed) conversations.
"""

from __future__ import annotations

import pytest

from memo_fraktur_ocr_code_spark.oracle.spec import correct_corpus
from memo_fraktur_ocr_code_spark.plans.pipeline import correct_pipeline
from memo_fraktur_ocr_code_spark.sources.fixtures import make_fixture


def _to_dfs(spark, transcripts, alt_rows):
    tdf = spark.createDataFrame(
        transcripts,
        schema="conv_id string, turn_idx int, role string, text string, "
        "tool string, ts timestamp",
    )
    adf = spark.createDataFrame(
        alt_rows, schema="conv_id string, turn_idx int, text string"
    )
    return tdf, adf


def _compare(spark, transcripts, alt_rows, lexicon, fused=True, **flags):
    tdf, adf = _to_dfs(spark, transcripts, alt_rows)
    got = {
        (r.conv_id, r.turn_idx): r.corrected_text
        for r in correct_pipeline(
            spark, tdf, adf if flags.get("do_hard", True) else None,
            lexicon, fused=fused, **flags
        ).collect()
    }
    want = {
        (r["conv_id"], r["turn_idx"]): r["corrected_text"]
        for r in correct_corpus(
            transcripts,
            alt_rows if flags.get("do_hard", True) else None,
            lexicon,
            **flags,
        )
    }
    assert set(got) == set(want)
    mismatches = {
        k: (got[k], want[k]) for k in want if got[k] != want[k]
    }
    assert not mismatches, f"{len(mismatches)} turns differ: " + str(
        list(mismatches.items())[:3]
    )
    assert len(got) == len(transcripts)


@pytest.mark.parametrize(
    "fused", [True, "cogroup", False], ids=["partition", "cogroup", "staged"]
)
@pytest.mark.parametrize(
    "flags",
    [
        {"do_easy": True, "do_hard": False, "do_sym": False},
        {"do_easy": True, "do_hard": False, "do_sym": True},
        {"do_easy": True, "do_hard": True, "do_sym": True},
    ],
    ids=["easy", "easy+sym", "full"],
)
def test_pipeline_byte_equality(spark, flags, fused):
    transcripts, alt_rows, lexicon = make_fixture(n_convs=9)
    _compare(spark, transcripts, alt_rows, lexicon, fused=fused, **flags)


def test_pipeline_row_count_and_schema(spark):
    transcripts, alt_rows, lexicon = make_fixture(n_convs=4)
    tdf, adf = _to_dfs(spark, transcripts, alt_rows)
    out = correct_pipeline(spark, tdf, adf, lexicon)
    assert [f.name for f in out.schema.fields] == [
        "conv_id",
        "turn_idx",
        "corrected_text",
    ]
    assert out.count() == len(transcripts)


def test_pipeline_handles_pathological_skew(spark):
    """One conversation 100× longer than the rest (power-law skew): the
    partition-walk kernel must carry it across many Arrow batches and
    still byte-equal the oracle."""
    transcripts, alt_rows, lexicon = make_fixture(n_convs=4)
    giant = [
        {
            "conv_id": "giant",
            "turn_idx": t,
            "role": "user",
            "text": f"tyste mand paa gœrden linje {t}\nog sœ en til-",
            "tool": None,
            "ts": transcripts[0]["ts"],
        }
        for t in range(800)
    ]
    alt_giant = [
        {"conv_id": "giant", "turn_idx": t, "text": f"tyske mand paa garden linje {t}\nog sa en til-"}
        for t in range(800)
    ]
    _compare(
        spark,
        transcripts + giant,
        alt_rows + alt_giant,
        lexicon,
        do_easy=True,
        do_hard=True,
        do_sym=True,
    )


@pytest.mark.parametrize(
    "fused", [True, "cogroup", False], ids=["partition", "cogroup", "staged"]
)
def test_bigram_rerank_mode_equality(spark, fused):
    """Bigram-context reranking mode: Spark output byte-equals the oracle
    in all three physical plans, and the context actually changes at
    least one correction vs plain TOP mode."""
    transcripts, alt_rows, lexicon = make_fixture(n_convs=4)
    # deterministic bigram table derived from the lexicon's top tokens
    toks = [t for t, _c in lexicon[:20]]
    bigrams = {
        (toks[i], toks[(i + 1) % len(toks)]): 5 + i
        for i in range(len(toks))
    }
    _compare(
        spark, transcripts, alt_rows, lexicon,
        fused=fused, bigram_pairs=bigrams,
    )


def test_bigram_context_flips_a_correction(spark):
    """A crafted lexicon where TOP and bigram-context winners differ."""
    from memo_fraktur_ocr_code_spark.oracle.spec import correct_conversation
    from memo_fraktur_ocr_code_spark.functions.symspell import SymSpellIndex

    lex = [("hus", 100), ("hud", 10), ("gammel", 50)]
    idx = SymSpellIndex.from_pairs(lex)
    plain = correct_conversation(
        ["gammel hux"], None, idx, frozenset(), do_hard=False
    )
    ctx = correct_conversation(
        ["gammel hux"], None, idx, frozenset(), do_hard=False,
        bigram_counts={("gammel", "hud"): 9},
    )
    assert plain == ["gammel hus"]  # TOP: highest count wins
    assert ctx == ["gammel hud"]  # context flips to the supported bigram


def test_skew_routed_auto_plan_equality(spark):
    """fused='auto': long conversations route to the staged plan, short
    ones to the partition plan — union output still byte-equals the
    oracle for every turn."""
    transcripts, alt_rows, lexicon = make_fixture(n_convs=5)
    # threshold below the max conv length so the router actually splits
    from collections import Counter

    lens = Counter(r["conv_id"] for r in transcripts)
    thr = sorted(lens.values())[len(lens) // 2]  # median → both routes hit
    assert min(lens.values()) <= thr < max(lens.values())
    _compare(
        spark, transcripts, alt_rows, lexicon,
        fused="auto", long_conv_threshold=thr,
    )


@pytest.mark.parametrize(
    "fused", [True, "cogroup"], ids=["partition", "cogroup"]
)
def test_per_conv_augmentation_equality(spark, fused):
    """Per-conversation dictionary augmentation (correct_ocr.py:210-229
    production mode): Spark output byte-equals the oracle in both
    conv-grouped plans."""
    transcripts, alt_rows, lexicon = make_fixture(n_convs=4)
    _compare(
        spark, transcripts, alt_rows, lexicon,
        fused=fused, augment_per_conv=(2, 250),
    )


def test_per_conv_augmentation_rescues_conv_word(spark):
    """A token frequent within its own conversation joins that conv's
    dictionary and survives correction; the same token in a conversation
    where it is rare still gets corrected to the global lexicon entry."""
    from memo_fraktur_ocr_code_spark.oracle.spec import correct_conversation
    from memo_fraktur_ocr_code_spark.functions.symspell import SymSpellIndex

    lex = [("hus", 100), ("dag", 90), ("mur", 80)]
    idx = SymSpellIndex.from_pairs(lex)
    base = dict(lex)
    # 'hux' appears 3 times in this conv -> augmented in ([2,250] clamp)
    texts_freq = ["hux dag", "hux mur", "hux dag"]
    got = correct_conversation(
        texts_freq, None, idx, frozenset(), do_hard=False,
        augment=(2, 250),
    )
    assert all(t.startswith("hux") for t in got), got
    # same token appearing once stays below lower=2 -> corrected to 'hus'
    got_rare = correct_conversation(
        ["hux dag"], None, idx, frozenset(), do_hard=False,
        augment=(2, 250),
    )
    assert got_rare == ["hus dag"]


def test_augment_mode_guards(spark):
    transcripts, alt_rows, lexicon = make_fixture(n_convs=2)
    tdf, adf = _to_dfs(spark, transcripts, alt_rows)
    with pytest.raises(ValueError, match="conv-grouped"):
        correct_pipeline(
            spark, tdf, adf, lexicon, fused=False, augment_per_conv=True
        )
    with pytest.raises(ValueError, match="rerank"):
        correct_pipeline(
            spark, tdf, adf, lexicon, augment_per_conv=True,
            bigram_pairs={("a", "b"): 1},
        )
