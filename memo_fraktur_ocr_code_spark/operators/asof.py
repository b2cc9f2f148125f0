"""As-of and range joins — order-sensitive joins Spark lacks as
primitives, built scale-correct from union + window (as-of) and
bin-bucketed equi-join (range).  SURVEY.md §2.3 classes the reference's
alignments as fuzzy positional joins; these are their exact-timestamp
cousins, required by any transcript/event analytics engine.

* as-of join — for each left row, the latest right row with
  ``right_ts <= left_ts`` per key.  NOT a per-key loop and NOT a raw
  inequality join: both sides union into one stream sorted by
  (key, ts, side) and a ``last_value(ignore nulls)`` window carries the
  most recent right payload forward — one shuffle, linear work,
  arbitrarily large keys are fine (the classic sort-merge as-of shape).
* range join — left rows matched to right intervals [start, end].  A raw
  ``ON l.ts BETWEEN r.start AND r.end`` is a cartesian at scale; instead
  each interval explodes to the time bins it covers and the join is an
  equi-join on (key, bin) + residual filter — shuffle scales with
  bins covered, not |L|×|R|.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    payload_cols: list[str],
) -> DataFrame:
    """Left as-of join: every left row + the payload of the latest right
    row at or before its timestamp (NULLs when none).

    The payload is carried as ONE struct, not per-column: independent
    per-column ``last(ignorenulls)`` would assemble a franken-row mixing
    fields from different right rows whenever the latest right row has
    a NULL in one payload column — and would resurrect an older value a
    genuinely-NULL latest field should shadow (ADVICE r3).  A struct
    with NULL fields is itself non-NULL, so the latest right ROW wins
    wholesale, matching DuckDB's native ASOF semantics the oracle runs."""
    payload_struct = F.struct(
        *[F.col(c).alias(c) for c in payload_cols]
    )
    r_tagged = right.select(
        F.col(key).alias("_k"),
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        payload_struct.alias("_p"),
    )
    l_tagged = left.select(
        F.col(key).alias("_k"),
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_side"),
        F.lit(None).cast(r_tagged.schema["_p"].dataType).alias("_p"),
        F.struct(*left.columns).alias("_left"),
    )
    r_tagged = r_tagged.withColumn(
        "_left", F.lit(None).cast(l_tagged.schema["_left"].dataType)
    )
    u = l_tagged.unionByName(r_tagged)
    # right rows sort before left rows at equal ts (side 0 < 1) so an
    # exactly-equal timestamp matches (<= semantics)
    w = (
        Window.partitionBy("_k")
        .orderBy("_ts", "_side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = u.select(
        "_side",
        "_left",
        F.last("_p", ignorenulls=True).over(w).alias("_c"),
    )
    out = carried.where(F.col("_side") == 1).select(
        F.col("_left.*"),
        *[F.col(f"_c.{c}").alias(f"asof_{c}") for c in payload_cols],
    )
    return out


def range_join_binned(
    points: DataFrame,
    intervals: DataFrame,
    key: str,
    point_ts: str,
    start_col: str,
    end_col: str,
    bin_seconds: int = 3600,
) -> DataFrame:
    """Points-in-interval join via time-bin bucketing (inclusive bounds).

    ``points``: (key, point_ts, ...); ``intervals``: (key, start, end, ...).
    """
    def _secs(c):
        col = F.col(c)
        return F.unix_timestamp(col)

    p = points.withColumn(
        "_bin", (_secs(point_ts) / bin_seconds).cast("long")
    )
    i = intervals.withColumn(
        "_bin",
        F.explode(
            F.sequence(
                (_secs(start_col) / bin_seconds).cast("long"),
                (_secs(end_col) / bin_seconds).cast("long"),
            )
        ),
    )
    joined = p.join(i, [key, "_bin"]).where(
        (F.col(point_ts) >= F.col(start_col))
        & (F.col(point_ts) <= F.col(end_col))
    )
    return joined.drop("_bin")
