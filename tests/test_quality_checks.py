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
