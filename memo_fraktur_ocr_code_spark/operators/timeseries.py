"""Batch event-time window rollups.

The streaming side already has watermarked windowed aggregation
(streaming/correct_stream.turn_rate_stream); this is the BATCH twin —
`F.window` tumbling/hopping buckets over an event table, the backfill
shape of the same rollup (run the stream for the live edge, run this
over the historical partitions).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def window_rollup(
    df: DataFrame,
    ts_col: str = "ts",
    size_s: int = 3600,
    slide_s: int | None = None,
    dims: tuple[str, ...] = ("event_type",),
    user_col: str = "user_id",
) -> DataFrame:
    """Tumbling (``slide_s`` omitted) or hopping event-time rollup:
    ``(win_start, *dims, n_events, n_users)`` with ``win_start`` as
    epoch seconds (never a raw timestamp — epoch longs are
    engine-portable, timestamps are not).

    Hopping windows replicate each row ``size/slide`` times map-side
    (that is the semantics, not an implementation artifact) and then
    it is ONE hash aggregation on (window, dims); the distinct-user
    count adds the usual expand-distinct shuffle.  Windows are aligned
    to the epoch, matching the streaming twin's alignment, so a
    backfill and the live stream produce byte-identical buckets.

    NULL timestamps are excluded explicitly (``F.window`` would drop
    them silently; making the filter visible keeps the count honest).
    """
    slide = slide_s or size_s
    win = F.window(
        F.col(ts_col), f"{size_s} seconds", f"{slide} seconds"
    )
    return (
        df.where(F.col(ts_col).isNotNull())
        .groupBy(win.alias("w"), *[F.col(d) for d in dims])
        .agg(
            F.count("*").alias("n_events"),
            F.countDistinct(user_col).alias("n_users"),
        )
        .select(
            # unix_timestamp, not cast: the events table reads as
            # TIMESTAMP_NTZ and the session timezone is pinned UTC
            # (session.get_spark), so this equals DuckDB's epoch()
            F.unix_timestamp(F.col("w.start")).alias("win_start"),
            *dims,
            "n_events",
            "n_users",
        )
    )
