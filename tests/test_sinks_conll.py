"""Sinks (S8-S11), CONLL joins (J3), compound lookup (J8)."""

from __future__ import annotations

from pyspark.sql import functions as F

from memo_fraktur_ocr_code_spark.functions.symspell import (
    SymSpellIndex,
    line_correct_text,
    lookup_compound,
)
from memo_fraktur_ocr_code_spark.operators.annotate import tokens_table
from memo_fraktur_ocr_code_spark.operators.conll import (
    join_conll_aligned,
    join_conll_fast,
)
from memo_fraktur_ocr_code_spark.sources.sinks import (
    write_corrected_turns,
    write_single_line,
    write_vrt_export,
    write_year_partitioned,
)


def _turns(spark):
    return spark.createDataFrame(
        [
            ("c1", 0, "den gamle Mur\nstod fast"),
            ("c1", 1, "ved Aaen"),
            ("c2", 0, "en linje"),
        ],
        "conv_id string, turn_idx int, text string",
    )


def test_write_corrected_turns_bucketed(spark, tmp_path):
    df = _turns(spark).withColumnRenamed("text", "corrected_text")
    p = str(tmp_path / "s8")
    write_corrected_turns(df, p, n_buckets=4)
    back = spark.read.parquet(p)
    assert back.count() == 3
    assert "conv_bucket" in back.columns
    # one conversation lands in exactly one bucket
    n = (
        back.groupBy("conv_id")
        .agg(F.countDistinct("conv_bucket").alias("nb"))
        .agg(F.max("nb"))
        .collect()[0][0]
    )
    assert n == 1


def test_vrt_export(spark, tmp_path):
    toks = tokens_table(_turns(spark))
    p = str(tmp_path / "vrt")
    write_vrt_export(toks, p)
    lines = [r.value for r in spark.read.text(p).collect()]
    body = "\n".join(lines)
    assert '<text id="c1">' in body
    assert "den\t1\t1\t1\t0\tc1" in body
    assert body.count("</text>") == 2


def test_year_partitioned_write(spark, tmp_path):
    meta = spark.createDataFrame(
        [("c1", 1870), ("c2", 1871)], "conv_id string, year int"
    )
    p = str(tmp_path / "s10")
    write_year_partitioned(_turns(spark), meta, p)
    back = spark.read.parquet(p)
    assert {r.year for r in back.select("year").distinct().collect()} == {
        1870,
        1871,
    }


def test_single_line_sink(spark, tmp_path):
    df = _turns(spark).withColumnRenamed("text", "corrected_text")
    p = str(tmp_path / "s11")
    write_single_line(df, p)
    back = {
        (r.conv_id, r.turn_idx): r.single_line
        for r in spark.read.parquet(p).collect()
    }
    assert back[("c1", 0)] == "den gamle Mur \x0b stod fast"


def _conll(spark, rows):
    return spark.createDataFrame(
        rows,
        "conv_id string, word_idx int, token string, sent_word_num string,"
        " lemma string, pos string",
    )


def test_join_conll_fast_and_mismatch(spark):
    toks = tokens_table(_turns(spark)).where(F.col("conv_id") == "c2")
    conll = _conll(
        spark,
        [("c2", 1, "en", "1", "en", "pron"), ("c2", 2, "LINJE", "2", "linje", "sb")],
    )
    out = {r.word_idx: r for r in join_conll_fast(toks, conll).collect()}
    assert out[1].lemma == "en" and out[1].pos == "pron"
    # token mismatch → annotations dummied, reference rule
    assert out[2].lemma == "_" and out[2].sent_word_num == "_"


def test_join_conll_aligned_drops_and_dummies(spark):
    toks = tokens_table(_turns(spark)).where(F.col("conv_id") == "c2")
    # CONLL has an extra leading token (dropped) and matches the rest
    conll = _conll(
        spark,
        [
            ("c2", 1, "EXTRA", "1", "x", "x"),
            ("c2", 2, "en", "2", "en", "pron"),
            ("c2", 3, "linje", "3", "linje", "sb"),
        ],
    )
    out = {
        r.word_idx: r for r in join_conll_aligned(toks, conll).collect()
    }
    assert len(out) == 2  # arity == token table, CONLL-only dropped
    assert out[1].lemma == "en"
    assert out[2].pos == "sb"


def test_lookup_compound_and_line_correct():
    idx = SymSpellIndex.from_pairs(
        [("tyske", 100), ("mand", 50), ("hus", 60), ("et", 70)]
    )
    assert lookup_compound("tyste mand", idx) == "tyske mand"
    assert lookup_compound("ethus", idx) in ("et hus", "ethus")
    assert line_correct_text("tyste mand, ja!", idx) == "tyske mand, ja!"


def test_line_correct_split_does_not_desync_later_words():
    """A binary split (one word → two) must splice only its own word —
    the old global zip of re-tokenized output shifted every later pair,
    rewriting correct words (ADVICE r3: 'ethus stor mand' destroyed
    'mand' and replaced 'stor')."""
    idx = SymSpellIndex.from_pairs(
        [("et", 70), ("hus", 60), ("stor", 50), ("mand", 40)]
    )
    assert lookup_compound("ethus stor mand", idx) == "et hus stor mand"
    assert (
        line_correct_text("ethus stor mand!", idx) == "et hus stor mand!"
    )
    # split mid-line, punctuation elsewhere preserved, later correction
    # still lands on the right word
    assert (
        line_correct_text("ethus tand, et!", idx) == "et hus mand, et!"
    )


def test_line_correct_split_replacement_is_word_anchored(monkeypatch):
    """The binary-split splice must not land inside an earlier longer
    token: literal ``str.replace('ordet', ...)`` on 'Nordet ordet'
    spliced the two-word replacement into the middle of 'Nordet'
    (ADVICE r3).  The compound lookup is stubbed so the test pins the
    splice logic itself, independent of index contents."""
    from memo_fraktur_ocr_code_spark.functions import symspell as sy

    monkeypatch.setattr(
        sy,
        "lookup_compound_tokens",
        lambda line, idx: [("Nordet", "Nordet"), ("ordet", "or det")],
    )
    assert sy.line_correct_text("Nordet ordet", None) == "Nordet or det"
    # word edged by punctuation still matches (lookaround, not \b-only)
    assert (
        sy.line_correct_text("Nordet ordet!", None) == "Nordet or det!"
    )
    # backslashes in the replacement are literal, not group references
    monkeypatch.setattr(
        sy,
        "lookup_compound_tokens",
        lambda line, idx: [("ordet", "or\\1 det")],
    )
    assert sy.line_correct_text("ordet", None) == "or\\1 det"


def test_readers(spark, tmp_path):
    from memo_fraktur_ocr_code_spark.sources.readers import (
        read_conll,
        read_freq_dictionary,
        read_metadata_tsv,
    )

    fd = tmp_path / "freq.txt"
    fd.write_text("﻿den 100\ngamle 50\n")
    lex = read_freq_dictionary(spark, str(fd)).collect()
    assert [(r.token, r.freq) for r in lex] == [("den", 100), ("gamle", 50)]

    md = tmp_path / "meta.tsv"
    md.write_text(
        "conv_id\tnovel_start\tnovelstart_rescan\tnovel_end\tyear\n"
        "c1\t3\t\t\t1870\n"
        "c2\t2\t5\t120\t1871\n"
    )
    meta = {r.conv_id: r for r in read_metadata_tsv(spark, str(md)).collect()}
    assert meta["c1"].realstart == 3 and meta["c1"].novel_end == 1000000
    assert meta["c2"].realstart == 5 and meta["c2"].novel_end == 120

    cf = tmp_path / "x.conll"
    cf.write_text(
        "1\tden\tden\tden\tpron\tx\t_\t_\t_\t_\t_\t_\t_\t_\n"
        "\n"
        "2\tUge\tUge\tUge\tsb\tx\t_\t_\t_\t_\t_\t_\t_\t_\n"
    )
    con = read_conll(spark, str(cf)).orderBy("sent_word_num").collect()
    assert [(r.sent_word_num, r.token, r.lemma, r.pos) for r in con] == [
        (1, "den", "den", "pron"),
        (2, "Uge", "Uge", "sb"),
    ]


def test_texton_lines_export(spark, tmp_path):
    from memo_fraktur_ocr_code_spark.sources.sinks import write_texton_lines

    toks = tokens_table(_turns(spark))
    p = str(tmp_path / "texton")
    write_texton_lines(toks, p)
    out = {r.conv_id: r.token_line for r in spark.read.parquet(p).collect()}
    assert out["c2"] == "en linje"
    assert out["c1"].startswith("den gamle Mur stod fast")


def test_wide_vrt_roundtrip(spark, tmp_path):
    """VRT → long token table → VRT byte-stable (migration path for
    existing reference wide-VRT data, analyze_gold_vrt.py:156-193)."""
    from memo_fraktur_ocr_code_spark.sources.readers import (
        read_wide_vrt,
        wide_vrt_token_lines,
    )

    cols = (
        "token wordnum lineword line page novel_id "
        "kb_ocrtok kb_leven kb_ratio kb_cer kb_levcat kb_subst "
        "tess_ocrtok tess_leven tess_ratio tess_cer tess_levcat tess_subst"
    ).split()
    tok_lines = [
        "Den\t1\t1\t1\t1\tnov1\tDen\t0\t1.0\t0.0\tmatch\tsame"
        "\tDcn\t1\t0.5\t0.33\tlev_1\te2c",
        "gamle\t2\t2\t1\t1\tnov1\tgamlc\t1\t0.8\t0.2\tlev_1\te2c"
        "\tgamle\t0\tNA\t0.0\tmatch\tsame",
        "Mur\t3\t1\t2\t1\tnov1\tMur\t0\t1.0\t0.0\tmatch\tsame"
        "\tMvr\t1\t0.66\t0.33\tlev_1\tu2v",
    ]
    vrt = "\n".join(
        ["<corpus>", "<text id=\"nov1\">", "<sentence>"]
        + tok_lines
        + ["</sentence>", "</text>", "</corpus>"]
    )
    path = str(tmp_path / "wide.vrt")
    with open(path, "w") as f:
        f.write(vrt)

    # lossless mode: every field a raw string
    long = read_wide_vrt(spark, path, cols, n_datasets=2, typed=False)
    assert long.count() == 6  # 3 tokens × 2 sources
    srcs = {r.src for r in long.select("src").distinct().collect()}
    assert srcs == {"kb_ocrtok", "tess_ocrtok"}

    back = wide_vrt_token_lines(long, cols, n_datasets=2)
    got = [
        r.vrt_line
        for r in back.orderBy(
            F.col("line").cast("int"), F.col("lineword").cast("int")
        ).collect()
    ]
    assert got == tok_lines  # byte-stable round trip

    # typed mode: reference dtype map (NA ratio → NULL, int positions)
    t = read_wide_vrt(spark, path, cols, n_datasets=2, typed=True)
    row = {
        (r.src, r.token): r
        for r in t.collect()
    }
    assert row[("tess_ocrtok", "gamle")].ratio is None
    assert row[("kb_ocrtok", "Den")].ratio == 1.0
    assert isinstance(row[("kb_ocrtok", "Den")].line, int)
