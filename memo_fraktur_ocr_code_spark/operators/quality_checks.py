"""Data-quality audit operators: the checks a table contract runs
before a corpus (or a fact table) is allowed into a pipeline.

Production pipelines gate ingestion on exactly these three: referential
integrity (does every fact row resolve its dimension?), column
completeness (null rates), and domain conformance (values outside the
accepted set).  All three are single-pass aggregations or anti-joins —
no row leaves the executors except the (small) violation summaries.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def fk_violations(
    child: DataFrame,
    parent: DataFrame,
    child_key: str,
    parent_key: str,
) -> DataFrame:
    """Referential-integrity audit: child keys with no matching parent
    row → ``(child_key, n_rows)`` per violating key, NULL child keys
    included as a violation class of their own (a NULL FK can never
    resolve; anti-join would report it, and hiding it under-counts).

    Scale: one anti-join on the key (AQE broadcasts the parent side
    when it is small, shuffle-joins otherwise — unhinted) + one
    violating-key aggregation whose output is bounded by the violation
    count, not the table size.
    """
    # NULL keys are routed around the anti-join: a NULL never equals the
    # parent key, so the anti-join would ALSO keep it and the union
    # below would double-count
    viol = (
        child.where(F.col(child_key).isNotNull())
        .select(F.col(child_key).alias("k"))
        .join(
            parent.select(F.col(parent_key).alias("k")).distinct(),
            "k",
            "left_anti",
        )
    )
    nulls = child.where(F.col(child_key).isNull()).select(
        F.lit(None).cast(child.schema[child_key].dataType).alias("k")
    )
    return (
        viol.unionByName(nulls)
        .groupBy(F.col("k").alias(child_key))
        .agg(F.count("*").alias("n_rows"))
    )


def column_profile(df: DataFrame, cols: tuple[str, ...]) -> DataFrame:
    """Per-column completeness/cardinality profile in ONE pass:
    ``(column, n_rows, n_nulls, n_distinct)`` — the summary a schema
    contract asserts ranges over (``n_nulls == 0`` for required
    columns, ``n_distinct`` sanity for enum-ish ones).

    A single aggregation computes every column's three statistics
    (Catalyst plans the multi-distinct via expand), then one ``stack``
    unpivots the single result row — no per-column scans, no driver
    loop over columns.
    """
    # internal aliases are index-based and source columns resolved via
    # df[...] (literal lookup), so column names containing spaces,
    # dots, or SQL keywords cannot break the expr (code-review r5 s5);
    # quotes in names are escaped for the stack string literal
    aggs = [F.count("*").alias("_n")]
    for i, c in enumerate(cols):
        aggs.append(
            F.sum(df[c].isNull().cast("long")).alias(f"_nulls_{i}")
        )
        aggs.append(F.countDistinct(df[c]).alias(f"_dist_{i}"))
    row = df.agg(*aggs)
    stack = ", ".join(
        "'{}', _nulls_{}, _dist_{}".format(c.replace("'", "''"), i, i)
        for i, c in enumerate(cols)
    )
    return row.select(
        F.expr(
            f"stack({len(cols)}, {stack})"
            " AS (column_name, n_nulls, n_distinct)"
        ),
        F.col("_n").alias("n_rows"),
    ).select("column_name", "n_rows", "n_nulls", "n_distinct")


def accepted_values_check(
    df: DataFrame, col: str, allowed: tuple[str, ...]
) -> DataFrame:
    """Domain-conformance audit: rows whose ``col`` is outside the
    accepted set → ``(value, n_rows)`` per offending value (NULL is
    its own offending value unless listed).  One filter + one
    aggregation bounded by the offending-value cardinality."""
    c = F.col(col)
    bad = ~c.isin(list(allowed))
    if None not in allowed:
        bad = bad | c.isNull()
    return (
        df.where(bad)
        .groupBy(c.alias("value"))
        .agg(F.count("*").alias("n_rows"))
    )
