"""Distributed, mergeable sketches for corpus-scale profiling.

Two classic summaries, both built as ordinary aggregations so they
shuffle only sketch-sized state, merge associatively (partial
aggregation / map-side combine applies), and stay integer-exact so the
DuckDB oracle can recompute them bit-for-bit:

* **Count-min sketch** (Cormode & Muthukrishnan 2005): ``depth``
  md5-derived hash rows x ``width`` counters; point estimates are
  one-sided (never under the true count).  The sketch table is at most
  ``depth*width`` rows regardless of corpus size — estimating against
  it is a broadcast join by construction.
* **KMV / bottom-k distinct sketch** (Bar-Yossef et al. 2002, the
  theta-sketch family): the k smallest 32-bit hash values of the
  distinct keys per group; ``(k-1) * 2^32 DIV h_k`` estimates the
  distinct count.  Mergeable by unioning value lists and re-taking the
  k smallest.

Hashes are md5-derived (not xxhash64) for the same reason as
``curation._md5_mod`` (which is built on this module's ``_md5_u32``):
the oracle engine must be able to recompute them.

NULL keys carry no membership and no counts: every sketch filters them
out explicitly.  (Spark's ``concat_ws`` silently drops NULL arguments
while the oracle's ``||`` nulls the whole expression — without the
filter a NULL key would set real bits in the Spark filter and none in
the oracle's, a latent cross-engine divergence; code-review r5 s5.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

HASH_DOMAIN = 1 << 32  # md5-derived slot values live in [0, 2^32)


def _md5_u32(salted) -> F.Column:
    """First 32 bits of md5 of an already-salted string expression, as a
    non-negative bigint in [0, 2^32) — the engine-portable hash every
    sketch here is built on."""
    return F.conv(F.substring(F.md5(salted), 1, 8), 16, 10).cast("bigint")


def cms_build(
    df: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 1024,
) -> DataFrame:
    """Build a count-min sketch over ``key_col`` occurrences: output
    ``(d, slot, cnt)`` with at most ``depth*width`` rows.

    Scale: each input row expands to ``depth`` (d, slot) pairs map-side
    and partial-aggregates immediately — the shuffle carries counter
    state bounded by ``depth*width`` per map task, never data.  Hot keys
    are absorbed by the map-side combine (they hit the same counters).
    """
    keyed = (
        df.where(F.col(key_col).isNotNull())
        .select(F.col(key_col).cast("string").alias("k"))
        .withColumn("d", F.explode(F.sequence(F.lit(0), F.lit(depth - 1))))
    )
    slot = (
        _md5_u32(F.concat_ws(":", F.lit("cms"), F.col("d"), F.col("k")))
        % width
    )
    return (
        keyed.select("d", slot.alias("slot"))
        .groupBy("d", "slot")
        .agg(F.count("*").alias("cnt"))
    )


def cms_estimate(
    sketch: DataFrame,
    keys: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 1024,
) -> DataFrame:
    """Point-estimate counts for ``keys`` from a count-min sketch built
    with the same (depth, width): ``min`` over the key's ``depth``
    counters; a slot never touched estimates 0.

    The sketch side is broadcast EXPLICITLY and justifiably: its size is
    bounded by ``depth*width`` rows at build time — a structural bound,
    not a data-dependent guess (contrast decontaminate_bench, whose
    bench-gram side is unbounded and therefore left to AQE).
    """
    probes = (
        keys.where(F.col(key_col).isNotNull())
        .select(F.col(key_col).cast("string").alias("k"))
        .withColumn("d", F.explode(F.sequence(F.lit(0), F.lit(depth - 1))))
    )
    slot = (
        _md5_u32(F.concat_ws(":", F.lit("cms"), F.col("d"), F.col("k")))
        % width
    )
    joined = probes.select("k", "d", slot.alias("slot")).join(
        F.broadcast(sketch), ["d", "slot"], "left"
    )
    return (
        joined.groupBy("k")
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("cms_cnt"))
        .withColumnRenamed("k", key_col)
    )


def kmv_build(
    df: DataFrame,
    key_col: str,
    group_col: str | None = None,
    k: int = 64,
) -> DataFrame:
    """Bottom-k distinct sketch per group: ``(group, hs)`` where ``hs``
    is the sorted array of the k smallest 32-bit hashes of the DISTINCT
    keys (fewer than k when the group has fewer distinct keys).

    Scale, in three bounded stages: (1) distinct ``(group, h)`` — one
    map-side-combinable shuffle on 8-byte hash rows; (2) per input
    partition, the k smallest per group (``spark_partition_id()``
    pre-aggregation — transient state is one partition's hash rows, the
    same order of memory the rows themselves occupy); (3) global merge
    of the partials — bounded by ``partitions * k`` values per group.
    No corpus-wide window, no unbounded collect over raw data.
    """
    g = (
        F.col(group_col)
        if group_col
        else F.lit("(all)")
    ).alias("grp")
    hashed = (
        df.where(F.col(key_col).isNotNull())
        .select(
            g,
            _md5_u32(
                F.concat(F.lit("kmv:"), F.col(key_col).cast("string"))
            ).alias("h"),
        )
        .distinct()
    )
    partials = (
        hashed.groupBy(F.spark_partition_id().alias("pid"), "grp")
        .agg(
            F.slice(F.array_sort(F.collect_list("h")), 1, k).alias("hs")
        )
    )
    return partials.groupBy("grp").agg(
        F.slice(
            F.array_sort(F.flatten(F.collect_list("hs"))), 1, k
        ).alias("hs")
    )


def kmv_estimate(sketch: DataFrame, k: int = 64) -> DataFrame:
    """Distinct-count estimate from a bottom-k sketch: exact
    ``size(hs)`` when the group holds fewer than k distinct keys,
    else ``(k-1) * 2^32 DIV h_k`` (integer DIV on non-negative
    operands — engine-portable)."""
    n = F.size("hs")
    est = F.when(n < k, n.cast("bigint")).otherwise(
        F.expr(
            f"CAST(({k} - 1) * {HASH_DOMAIN}"
            f" DIV greatest(element_at(hs, {k}), 1) AS BIGINT)"
        )
    )
    return sketch.select(
        "grp",
        n.cast("bigint").alias("sketch_size"),
        est.alias("kmv_distinct"),
    )


def bloom_build(
    df: DataFrame,
    key_col: str,
    m_bits: int = 1 << 16,
    k: int = 4,
) -> DataFrame:
    """Bloom filter over the distinct keys, bit-packed into 32-bit
    words: ``(widx, bits)`` with at most ``m_bits/32`` rows — the
    membership sketch that pre-filters a huge probe stream before an
    exact check (the decontamination / incremental-dedup fast path:
    definite-miss rows skip the expensive join entirely; only
    might-contain rows go on).

    Each key sets ``k`` md5-derived positions; positions pack via
    ``bit_or(1 << (pos % 32))`` grouped by ``pos DIV 32`` — one
    map-side-combinable aggregation whose output is bounded by the
    filter geometry, never the corpus.  32-bit words keep every shift
    inside non-negative BIGINT range on both engines.  One-sided like
    the count-min sketch: false positives possible, false negatives
    impossible.
    """
    keyed = (
        df.where(F.col(key_col).isNotNull())
        .select(F.col(key_col).cast("string").alias("key"))
        .withColumn("j", F.explode(F.sequence(F.lit(0), F.lit(k - 1))))
    )
    pos = (
        _md5_u32(F.concat_ws(":", F.lit("bf"), F.col("j"), F.col("key")))
        % m_bits
    )
    return (
        keyed.select(pos.alias("pos"))
        .select(
            F.expr("pos DIV 32").alias("widx"),
            F.expr(
                "shiftleft(CAST(1 AS BIGINT), CAST(pos % 32 AS INT))"
            ).alias("mask"),
        )
        .groupBy("widx")
        .agg(F.expr("bit_or(mask)").alias("bits"))
    )


def bloom_might_contain(
    bloom: DataFrame,
    probes: DataFrame,
    key_col: str,
    m_bits: int = 1 << 16,
    k: int = 4,
) -> DataFrame:
    """Probe a bit-packed Bloom filter: ``(key_col, bloom_hit)`` with
    ``bloom_hit = 1`` iff ALL ``k`` of the key's bit positions are set.

    The filter side is broadcast EXPLICITLY and justifiably — its row
    count is bounded by ``m_bits/32`` at build time (structural, like
    the count-min sketch's depth*width bound).  A missing word row
    means those 32 bits are all zero.
    """
    keyed = (
        probes.where(F.col(key_col).isNotNull())
        .select(F.col(key_col).cast("string").alias("key"))
        .withColumn("j", F.explode(F.sequence(F.lit(0), F.lit(k - 1))))
    )
    pos = (
        _md5_u32(F.concat_ws(":", F.lit("bf"), F.col("j"), F.col("key")))
        % m_bits
    )
    probed = keyed.select(
        "key",
        pos.alias("pos"),
    ).select(
        "key",
        F.expr("pos DIV 32").alias("widx"),
        F.expr(
            "shiftleft(CAST(1 AS BIGINT), CAST(pos % 32 AS INT))"
        ).alias("mask"),
    )
    joined = probed.join(F.broadcast(bloom), "widx", "left")
    hit = (
        F.coalesce(F.col("bits"), F.lit(0)).bitwiseAND(F.col("mask")) != 0
    ).cast("int")
    return (
        joined.select("key", hit.alias("h"))
        .groupBy("key")
        .agg(F.min("h").alias("bloom_hit"))
        .withColumnRenamed("key", key_col)
    )
