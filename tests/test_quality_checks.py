"""Unit tests for the data-quality audit operators
(operators/quality_checks.py)."""

from __future__ import annotations

from memo_fraktur_ocr_code_spark.operators.quality_checks import (
    accepted_values_check,
    column_profile,
    fk_violations,
)


def test_fk_violations_counts_orphans_and_nulls_once(spark):
    child = spark.createDataFrame(
        [(1,), (1,), (2,), (3,), (None,), (None,)], "fk bigint"
    )
    parent = spark.createDataFrame([(1,), (9,)], "pk bigint")
    got = {
        r.fk: r.n_rows
        for r in fk_violations(child, parent, "fk", "pk").collect()
    }
    # key 2 and 3 are orphans; the two NULLs are ONE violation class of
    # count 2 (not double-counted through the anti-join)
    assert got == {2: 1, 3: 1, None: 2}


def test_fk_violations_empty_when_intact(spark):
    child = spark.createDataFrame([(1,), (2,)], "fk bigint")
    parent = spark.createDataFrame([(1,), (2,), (3,)], "pk bigint")
    assert fk_violations(child, parent, "fk", "pk").count() == 0


def test_column_profile_single_pass_stats(spark):
    df = spark.createDataFrame(
        [("a", 1), ("a", None), (None, 3)], "s string, v int"
    )
    got = {
        r.column_name: (r.n_rows, r.n_nulls, r.n_distinct)
        for r in column_profile(df, ("s", "v")).collect()
    }
    assert got == {"s": (3, 1, 1), "v": (3, 1, 2)}


def test_accepted_values_flags_outsiders_and_null(spark):
    df = spark.createDataFrame(
        [("F",), ("O",), ("X",), ("X",), (None,)], "st string"
    )
    got = {
        r.value: r.n_rows
        for r in accepted_values_check(df, "st", ("F", "O", "P")).collect()
    }
    assert got == {"X": 2, None: 1}


def test_expand_epochs_replicates_by_weight(spark):
    from pyspark.sql import functions as F

    from memo_fraktur_ocr_code_spark.operators.curation import (
        expand_epochs,
    )

    docs = spark.createDataFrame(
        [(i, "rare" if i < 10 else "big",
          "w" + " w" * (3 if i < 10 else 400))
         for i in range(110)],
        "doc_id bigint, source string, text string",
    )
    weights = spark.createDataFrame(
        # rare at 2.5 epochs, big capped to sampling at 0.6 epochs
        [("rare", 100, 25_000), ("big", 100, 6_000)],
        "domain string, share_ppm bigint, temp_ppm bigint",
    ).withColumn("share_ppm", F.lit(10_000))
    out = expand_epochs(docs, weights=weights).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append(r.epoch)
    rare_copies = [len(by_doc.get(i, [])) for i in range(10)]
    big_copies = [len(by_doc.get(i, [])) for i in range(10, 110)]
    # 25000 bp = 2 full copies + fractional half; every rare doc has 2
    # or 3 copies with contiguous 1-based epoch numbering
    assert all(c in (2, 3) for c in rare_copies), rare_copies
    assert any(c == 3 for c in rare_copies)
    for i in range(10):
        assert sorted(by_doc[i]) == list(range(1, len(by_doc[i]) + 1))
    # 6000 bp < 1 epoch degenerates to the sampling filter: 0/1 copies,
    # and roughly 60% kept (deterministic md5 buckets)
    assert all(c in (0, 1) for c in big_copies)
    kept = sum(big_copies)
    assert 40 <= kept <= 80, kept
