"""Local replica of the driver's correctness gate: run every queries()
entry and its oracle_sql() on the same sf dir, compare row count, column
names, and order-insensitive values.

Usage: python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import decimal
import math
import sys
import time

import duckdb
import pandas as pd

sys.path.insert(0, ".")

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def _norm_cell(v):
    if v is None or (isinstance(v, float) and math.isnan(v)):
        return "<NULL>"
    if isinstance(v, decimal.Decimal):
        return f"dec:{v}"
    if isinstance(v, float):
        return f"f:{v!r}"
    if isinstance(v, (int,)):
        return f"i:{v}"
    if hasattr(v, "isoformat"):
        return f"t:{v.isoformat()}"
    return f"s:{v}"


def canon(df: pd.DataFrame) -> list[tuple]:
    cols = sorted(df.columns)
    rows = [
        tuple(_norm_cell(v) for v in row)
        for row in df[cols].itertuples(index=False, name=None)
    ]
    return sorted(rows)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])

    import __spark_entry__ as entrymod
    from memo_fraktur_ocr_code_spark.session import get_spark

    spark = get_spark(master="local[4]", shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    qs = dict(entrymod.queries())
    # redundant-coverage variants rotated out of the driver's 50-entry
    # window stay under the same gate here
    qs.update(entrymod.extra_queries())
    oracles = entrymod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            spark_df = fn(spark, sf_dir).toPandas()
        except Exception as e:
            failures.append((name, f"SPARK ERROR: {e}"))
            print(f"FAIL  {name}: spark error {str(e)[:300]}")
            continue
        if name not in oracles:
            print(
                f"rows-only  {name}: {len(spark_df)} rows, "
                f"cols={list(spark_df.columns)} ({time.time()-t0:.1f}s)"
            )
            continue
        try:
            duck_df = con.execute(oracles[name]).df()
        except Exception as e:
            failures.append((name, f"DUCKDB ERROR: {e}"))
            print(f"FAIL  {name}: duckdb error {str(e)[:300]}")
            continue
        ok = True
        if sorted(spark_df.columns) != sorted(duck_df.columns):
            failures.append(
                (name, f"cols {sorted(spark_df.columns)} vs {sorted(duck_df.columns)}")
            )
            ok = False
        elif len(spark_df) != len(duck_df):
            failures.append(
                (name, f"rowcount {len(spark_df)} vs {len(duck_df)}")
            )
            ok = False
        else:
            a, b = canon(spark_df), canon(duck_df)
            if a != b:
                diff = [
                    (x, y) for x, y in zip(a, b) if x != y
                ][:3]
                failures.append((name, f"values differ, e.g. {diff}"))
                ok = False
        status = "ok   " if ok else "FAIL "
        print(
            f"{status} {name}: {len(spark_df)} rows ({time.time()-t0:.1f}s)"
        )

    print()
    if failures:
        print(f"{len(failures)} FAILURES:")
        for n, msg in failures:
            print(f"  {n}: {msg[:500]}")
        sys.exit(1)
    print("ALL OK")


if __name__ == "__main__":
    main()
