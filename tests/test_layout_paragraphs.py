"""Unit tests for the r5 session-5 operators: paragraph-level exact
dedup (dedup.paragraph_dedup), the CUBE corpus report card
(aggregates.corpus_cube_report), and Z-order layout keys
(operators/layout.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from memo_fraktur_ocr_code_spark.operators.aggregates import (
    corpus_cube_report,
)
from memo_fraktur_ocr_code_spark.operators.dedup import paragraph_dedup
from memo_fraktur_ocr_code_spark.operators.layout import (
    zorder_key,
    zorder_layout,
    zorder_scan_stats,
)


def _pdedup(spark, rows, **kw):
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    out = paragraph_dedup(df, **kw).orderBy("doc_id").collect()
    return {r.doc_id: (r.clean_text, r.n_kept, r.n_dropped) for r in out}


def test_paragraph_dedup_keeps_first_occurrence(spark):
    dup = "this paragraph repeats verbatim"
    got = _pdedup(
        spark,
        [
            (1, f"unique paragraph one\n\n{dup}"),
            (2, f"{dup}\n\nunique paragraph two"),
        ],
    )
    # doc 1 owns the duplicate (smaller id); doc 2 loses its copy only
    assert got[1] == (f"unique paragraph one\n\n{dup}", 2, 0)
    assert got[2] == ("unique paragraph two", 1, 1)


def test_paragraph_dedup_within_doc_and_short_exemption(spark):
    dup = "a paragraph repeated inside one document"
    got = _pdedup(
        spark,
        [(7, f"{dup}\n\nok\n\n{dup}\n\nok")],
    )
    # second long copy dropped; the short 'ok' paragraphs are exempt
    assert got[7] == (f"{dup}\n\nok\n\nok", 3, 1)


def test_paragraph_dedup_survivors_for_null_and_empty(spark):
    dup = "only content paragraph in both docs"
    got = _pdedup(spark, [(1, dup), (2, dup), (3, None)])
    assert got[1] == (dup, 1, 0)
    assert got[2] == ("", 0, 1)  # all paragraphs dropped, doc survives
    assert got[3] == ("", 1, 0)  # NULL text = empty doc, short-exempt


def test_corpus_cube_report_grouping_sets(spark):
    df = spark.createDataFrame(
        [(1, "en", "web", 10), (2, "en", "book", 20), (3, "de", "web", 5)],
        "doc_id bigint, lang string, source string, n_chars bigint",
    )
    rows = corpus_cube_report(df).collect()
    by = {(r.lang, r.source, r.gid): r for r in rows}
    assert len(rows) == 3 + 2 + 2 + 1  # cells + lang + source + total
    total = by[("(all)", "(all)", 3)]
    assert (total.n_docs, total.sum_chars) == (3, 35)
    en = by[("en", "(all)", 1)]
    assert (en.n_docs, en.sum_chars, en.min_chars, en.max_chars) == (
        2, 30, 10, 20,
    )
    web = by[("(all)", "web", 2)]
    assert (web.n_docs, web.sum_chars) == (2, 15)
    assert by[("de", "web", 0)].n_docs == 1


def _morton_ref(a: int, b: int, bits: int) -> int:
    z = 0
    for i in range(bits):
        z |= ((a >> i) & 1) << (2 * i + 1)
        z |= ((b >> i) & 1) << (2 * i)
    return z


def test_zorder_key_matches_reference_interleave(spark):
    rows = [(a, b) for a in (0, 1, 5, 255, 4095) for b in (0, 3, 64, 4095)]
    df = spark.createDataFrame(rows, "a long, b long")
    got = {
        (r.a, r.b): r.z
        for r in df.select(
            "a", "b", zorder_key("a", "b", bits=12).alias("z")
        ).collect()
    }
    for a, b in rows:
        assert got[(a, b)] == _morton_ref(a % 4096, b % 4096, 12), (a, b)


def test_zorder_layout_sorts_by_key(spark):
    df = spark.range(0, 512).select(
        (F.col("id") * 7 % 64).alias("a"), (F.col("id") % 64).alias("b")
    )
    out = zorder_layout(df, "a", "b", bits=6, num_files=4)
    keys = [r.zkey for r in out.select("zkey").collect()]
    # range-partitioned + sorted within partitions = globally sorted
    assert keys == sorted(keys)


def test_zorder_scan_stats_bounds_both_dims(spark):
    # full 64x64 grid: with 64 equal-width key files, Z-order bounds
    # EVERY file to an 8x8 tile — both dims tight, the property a
    # single-column sort cannot give (it leaves dim b spanning 0..63)
    df = spark.range(0, 4096).select(
        (F.col("id") / 64).cast("long").alias("a"),
        (F.col("id") % 64).alias("b"),
    )
    stats = zorder_scan_stats(df, "a", "b", bits=6, files=64).collect()
    assert len(stats) == 64
    assert sum(r.n_rows for r in stats) == 4096
    for r in stats:
        assert r.max_a - r.min_a <= 7, r
        assert r.max_b - r.min_b <= 7, r
