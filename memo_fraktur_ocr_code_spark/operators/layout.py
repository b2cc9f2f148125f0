"""Table-layout operators: multi-dimensional clustering keys.

Z-ordering is the standard lakehouse layout action (Iceberg's
``rewrite_data_files(strategy => 'sort', sort_order => zorder(...))``,
Delta's ``OPTIMIZE ... ZORDER BY``): interleave the bits of two scan
dimensions into one sort key so that sorting by the key co-locates rows
that are close in EITHER dimension, and per-file min/max statistics then
prune files for range predicates on both columns — the complement to
``sources/bucketed.py``'s hash bucketing (which serves equi-joins, not
range scans).

Everything here is pure integer Catalyst expressions — portable
bit-for-bit to the DuckDB oracle and JVM-side at any scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def zorder_key(
    col_a, col_b, bits: int = 16
) -> F.Column:
    """Morton (Z-order) interleave of the low ``bits`` bits of two
    non-negative integer expressions: ``col_a``'s bit *i* lands at
    output position ``2i+1`` (the higher slot), ``col_b``'s at ``2i``.
    ``2*bits`` must stay ≤ 63 so the key fits a signed long.

    Inputs are masked to ``bits`` bits first, so callers map their real
    dimensions into the key domain explicitly (e.g. quantile ranks or
    ``value % 2^bits``) — Z-order locality only means anything on a
    bounded domain.
    """
    if 2 * bits > 63:
        raise ValueError("2*bits must be <= 63 to fit a signed long")
    mask = (1 << bits) - 1
    a = (
        (F.col(col_a) if isinstance(col_a, str) else col_a)
        .cast("long")
        .bitwiseAND(F.lit(mask))
    )
    b = (
        (F.col(col_b) if isinstance(col_b, str) else col_b)
        .cast("long")
        .bitwiseAND(F.lit(mask))
    )
    z = F.lit(0).cast("long")
    for i in range(bits):
        z = z.bitwiseOR(
            F.shiftleft(F.shiftright(a, i).bitwiseAND(F.lit(1)), 2 * i + 1)
        )
        z = z.bitwiseOR(
            F.shiftleft(F.shiftright(b, i).bitwiseAND(F.lit(1)), 2 * i)
        )
    return z


def zorder_layout(
    df: DataFrame,
    col_a: str,
    col_b: str,
    bits: int = 16,
    out_col: str = "zkey",
    num_files: int | None = None,
) -> DataFrame:
    """Attach the Morton key and lay the table out in Z-order: one
    range exchange on the key (``repartitionByRange`` samples split
    points, so files end up balanced even under skew) + an in-partition
    sort — exactly the physical shape an Iceberg ``rewrite_data_files``
    sort-strategy compaction produces.  Downstream writers emit one
    file per partition; per-file min/max stats on ``col_a``/``col_b``
    then prune range scans on either dimension.
    """
    keyed = df.withColumn(out_col, zorder_key(col_a, col_b, bits))
    parted = (
        keyed.repartitionByRange(num_files, out_col)
        if num_files
        else keyed.repartitionByRange(out_col)
    )
    return parted.sortWithinPartitions(out_col)


def zorder_scan_stats(
    df: DataFrame,
    col_a: str,
    col_b: str,
    bits: int = 16,
    files: int = 64,
) -> DataFrame:
    """Locality evidence for a Z-order layout: split the keyed, sorted
    table into ``files`` equal-width key ranges (stand-ins for data
    files) and report each range's min/max of both dimensions — the
    exact statistics a scan planner prunes on.  Tight per-file ranges
    on BOTH columns is the property Z-ordering buys over a single-column
    sort (which makes one dimension tight and leaves the other
    unbounded per file).
    """
    keyed = df.select(
        F.col(col_a).alias("a"),
        F.col(col_b).alias("b"),
        zorder_key(col_a, col_b, bits).alias("zkey"),
    )
    span = 1 << (2 * bits)
    # integer DIV, not float division: exact at any key width and it
    # matches the DuckDB oracle's // on non-negative operands.
    # Overflow guard (ADVICE r5): zkey reaches span-1 ≈ 2^(2*bits), so
    # the multiply-first form needs 2*bits + ceil(log2(files)) bits —
    # near the 63-bit cap (bits ≤ 31) `zkey * files` wraps signed
    # 64-bit BEFORE the division.  When files divides the key span
    # (the overwhelmingly common power-of-two case) divide FIRST:
    # floor(zkey*files/span) == floor(zkey/(span/files)) exactly.
    # Otherwise keep the exact multiply form but refuse widths where
    # it would overflow.
    if span % files == 0:
        file_id = F.expr(f"zkey DIV {span // files}").alias("file_id")
    else:
        if 2 * bits + (files - 1).bit_length() > 62:
            raise ValueError(
                "zorder_scan_stats: zkey * files would overflow"
                f" int64 (bits={bits}, files={files}); use a files"
                " count dividing 2^(2*bits) or fewer bits"
            )
        file_id = F.expr(f"(zkey * {files}) DIV {span}").alias(
            "file_id"
        )
    return (
        keyed.select(file_id, "a", "b")
        .groupBy("file_id")
        .agg(
            F.count("*").alias("n_rows"),
            F.min("a").alias("min_a"),
            F.max("a").alias("max_a"),
            F.min("b").alias("min_b"),
            F.max("b").alias("max_b"),
        )
    )
