"""Link-graph ranking: deterministic integer-arithmetic PageRank.

Completes the web-graph family (extraction.extract_links →
canonicalize_url → dedup.connected_components): components tell you
WHICH pages are the same, PageRank tells you which pages MATTER — the
classic quality prior a crawl-selection pipeline feeds into document
scoring (Page et al. 1999; the quality-signal role is the same one
``textstats.quality_score`` plays for content).

All arithmetic is integer (ranks in ppm units, damping 0.85 as the
exact rational 17/20), so results are bit-identical across engines,
partitionings, and summation orders — integer addition commutes where
float addition does not.  The DuckDB oracle unrolls the same iteration
count symbolically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

PPM = 1_000_000
# damping 0.85 as an exact rational: numerator/denominator — multiply
# THEN integer-divide, so no rounding drift accumulates across engines
DAMP_NUM, DAMP_DEN = 17, 20


def pagerank(
    edges: DataFrame,
    iters: int = 5,
    src: str = "src",
    dst: str = "dst",
    checkpoint_every: int = 5,
    dangling: bool | None = None,
) -> DataFrame:
    """Integer-ppm PageRank over a directed edge list → ``(node,
    rank_ppm)`` for every node that appears as a source or target.

    Per iteration: each node splits its rank evenly over its out-edges
    (``rank DIV out_deg`` — truncating integer division, deterministic),
    targets sum the incoming shares, and
    ``new_rank = (1 - d) * PPM + d * (shares + dangling_redist)`` with
    ``d = 17/20`` applied as multiply-then-DIV.  Dangling nodes (no
    out-edges) do NOT leak: their summed rank is folded back uniformly
    as ``dangling_mass DIV N`` per node each iteration — the standard
    correction (Page et al. 1999 §2.7), so ranks stay a conserved
    distribution (total = N·PPM up to DIV truncation) instead of
    draining on sink-heavy graphs (VERDICT r5).  ``(17 * shares)``
    overflows only past ~5.4e17 ppm of incoming mass per node
    (≈ 5*10^11 in-edges of average rank) — documented bound, not a
    practical one.

    Scale: each iteration is one src-keyed join (ranks × edges — both
    sides hash-partition on the same key, so consecutive iterations
    reuse the exchange) + one dst-keyed aggregation with map-side
    combine absorbing hub skew + ONE single-row dangling-mass
    aggregate (an anti-join of ranks vs the degree table, shrinking to
    one row — the price of mass conservation).  When the graph has
    dangling nodes, that aggregate runs a job every iteration anyway,
    so lineage is ALSO cut every iteration via ``localCheckpoint`` —
    the recompute-free shape.  A graph with NO dangling nodes (checked
    once, structurally) can never leak mass: the per-iteration
    aggregate is skipped and the loop keeps the original lazy shape
    with ``checkpoint_every``-cadence checkpoints — zero extra jobs on
    the common closed-graph case.
    """
    from memo_fraktur_ocr_code_spark.operators.dedup import (
        _release_local_checkpoint,
    )

    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    out_deg = e.groupBy("src").agg(F.count("*").alias("out_deg"))
    # out-edges annotated with degree once, reused every iteration
    fan = e.join(out_deg, "src")
    ranks = nodes.withColumn("rank_ppm", F.lit(PPM).cast("long"))
    base = PPM - (DAMP_NUM * PPM) // DAMP_DEN
    # A graph with no dangling nodes (every node has out-edges — e.g.
    # a graph closed under "links to") can never leak mass, so the
    # per-iteration dangling aggregate and its forced materialization
    # are skipped entirely and the loop keeps the original lazy shape
    # with cadence checkpoints.  ``dangling=None`` auto-detects with
    # ONE structural pre-check job; callers that KNOW their graph is
    # closed (e.g. every src/dst generated from the same node set)
    # pass ``dangling=False`` and skip that job too.
    if dangling is None:
        dang_nodes = nodes.join(
            out_deg, nodes["node"] == out_deg["src"], "left_anti"
        )
        has_dangling = dang_nodes.limit(1).count() > 0
    else:
        has_dangling = bool(dangling)
    n_nodes = nodes.count() if has_dangling else 0
    prev_ck = None
    for i in range(1, iters + 1):
        if has_dangling:
            # Materialize last iteration's ranks once; BOTH consumers
            # (the dangling aggregate and the shares join) read the
            # checkpoint, so the double consumption costs no recompute.
            ranks = ranks.localCheckpoint(eager=True)
            if prev_ck is not None:
                _release_local_checkpoint(prev_ck)
            prev_ck = ranks
            # dangling mass folded back uniformly (integer DIV — the
            # < n_nodes ppm remainder is the only mass lost per
            # iteration, deterministic on every engine)
            dang = (
                ranks.join(
                    out_deg,
                    ranks["node"] == out_deg["src"],
                    "left_anti",
                )
                .agg(F.sum("rank_ppm").alias("d"))
                .head()[0]
            )
            redist = int(dang or 0) // n_nodes
        else:
            redist = 0
        shares = (
            fan.join(ranks, fan["src"] == ranks["node"])
            .select(
                "dst",
                F.expr("rank_ppm DIV out_deg").alias("share"),
            )
            .groupBy("dst")
            .agg(F.sum("share").alias("in_ppm"))
        )
        ranks = (
            nodes.join(shares, nodes["node"] == shares["dst"], "left")
            .select(
                "node",
                (
                    F.lit(base)
                    + F.expr(
                        f"({DAMP_NUM} * (coalesce(in_ppm, 0)"
                        f" + {redist})) DIV {DAMP_DEN}"
                    )
                ).cast("long").alias("rank_ppm"),
            )
        )
        if not has_dangling and (
            i % checkpoint_every == 0 or i == iters
        ):
            nxt = ranks.localCheckpoint(eager=True)
            if prev_ck is not None:
                _release_local_checkpoint(prev_ck)
            ranks, prev_ck = nxt, nxt
    if has_dangling:
        ranks = ranks.localCheckpoint(eager=True)
        if prev_ck is not None:
            _release_local_checkpoint(prev_ck)
    return ranks
