"""Driver-contract smoke tests for __spark_entry__."""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entrymod  # noqa: E402


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert set(df.columns) == {"conv_id", "turn_idx", "corrected_text"}
    assert df.count() > 0


def test_queries_and_oracles_aligned(spark):
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    assert set(oracles) <= set(qs)
    # every oracle-verified query documents a SURVEY §2 operator id prefix
    assert len(oracles) >= 25
    # rows-only entries are the genuinely non-SQL-expressible ops
    rows_only = set(qs) - set(oracles)
    assert "pipeline_correct_turns" in rows_only


def test_sample_query_runs(spark):
    qs = entrymod.queries()
    df = qs["a1_unigram_freq"](spark, "/root/testdata/sf0.001")
    rows = df.collect()
    assert rows and rows[0]["freq"] >= rows[-1]["freq"]
