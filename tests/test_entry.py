"""Driver-contract smoke tests for __spark_entry__.

(The repo root reaches sys.path via conftest.py — no per-file or
machine-specific path setup.)"""

from __future__ import annotations

import __spark_entry__ as entrymod  # noqa: E402


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert set(df.columns) == {"conv_id", "turn_idx", "corrected_text"}
    assert df.count() > 0


def test_queries_and_oracles_aligned(spark):
    qs = entrymod.queries()
    extras = entrymod.extra_queries()
    oracles = entrymod.oracle_sql()
    # every oracle belongs to a registered query (driver window or extra)
    assert set(oracles) <= set(qs) | set(extras)
    # every extra is oracle-verified (the rotation loses no coverage)
    assert set(extras) <= set(oracles)
    assert len(oracles) >= 25
    # r4: NO rows-only entries — the flagship's oracle is the frozen
    # spec-oracle fixture (tools/make_expected.py), so every registry
    # query gets rows+schema+hash in the driver artifact
    rows_only = set(qs) - set(oracles)
    assert rows_only == set()


def test_sample_query_runs(spark):
    qs = entrymod.queries()
    df = qs["a1_unigram_freq"](spark, "/root/testdata/sf0.001")
    rows = df.collect()
    assert rows and rows[0]["freq"] >= rows[-1]["freq"]


def test_sql_surface(spark):
    """The engine is usable through plain spark.sql over registered
    views — the declarative surface Catalyst optimizes end to end."""
    sf = "/root/testdata/sf0.001"
    for t in ("lineitem", "orders"):
        spark.read.parquet(f"{sf}/{t}.parquet").createOrReplaceTempView(t)
    out = spark.sql(
        """
        SELECT l_returnflag, count(*) AS n,
               CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
                 AS sum_qty
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        GROUP BY l_returnflag ORDER BY l_returnflag
        """
    ).collect()
    assert len(out) == 3 and all(r.n > 0 for r in out)
