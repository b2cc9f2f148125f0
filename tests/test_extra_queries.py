"""Oracle gate for ``extra_queries()`` — the redundant-coverage variants
rotated OUT of the driver's 50-entry registry window (r3).  Each of these
had a green driver row in CORRECTNESS_r02.json; this test keeps them
under the identical rows+schema+values contract so the rotation loses no
verification coverage.
"""

from __future__ import annotations


import duckdb


SF = "/root/testdata/sf0.001"
TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def test_extra_queries_match_their_oracles(spark):
    import __spark_entry__ as e
    from tools.check_oracle import canon

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    oracles = e.oracle_sql()
    extras = e.extra_queries()
    assert set(extras) <= set(oracles), "every extra query needs an oracle"
    for name, fn in extras.items():
        spark_df = fn(spark, SF).toPandas()
        duck_df = con.execute(oracles[name]).df()
        assert sorted(spark_df.columns) == sorted(duck_df.columns), name
        assert len(spark_df) == len(duck_df), name
        assert canon(spark_df) == canon(duck_df), name


def test_driver_registry_is_exactly_50(spark):
    """The driver's correctness gate records only the first 50 registry
    entries (observed r2) — the registry must stay at exactly 50 so every
    entry gets a driver row, and must not overlap the extras."""
    import __spark_entry__ as e

    qs = e.queries()
    assert len(qs) == 50
    assert not set(qs) & set(e.extra_queries())
    # every registry entry has an oracle — including the flagship,
    # whose oracle is the frozen spec-oracle fixture (r4)
    missing = [n for n in qs if n not in e.oracle_sql()]
    assert missing == []
