"""Physical-plan regression guards over every registered driver query.

Catches the silent scale-killers at plan level:

* an unexpected CartesianProduct sneaking into a rewrite;
* an UNPARTITIONED window — ``Window.orderBy(...)`` with no
  ``partitionBy`` funnels the whole input through one task.  This class
  of bug appeared twice (a10's top_n_sum in r1, ivf_topk's centroid pick
  in r2), so the guard is generalized to every query (VERDICT r2 item 3):
  a physical ``Window`` node must carry a partition spec.  In plan text a
  partitioned window prints three top-level bracket groups
  ``Window [exprs], [partition], [order]``; an unpartitioned one prints
  two — ``Window [exprs], [order]``.
* the A10 calibration top-k regressing from TakeOrdered to a window;
* the fused flagship growing a second shuffle.
"""

from __future__ import annotations



SF = "/root/testdata/sf0.001"

# the one deliberate all-pairs plan: the exact embedding baseline that the
# verified SRP scale path is measured against (now in extra_queries)
ALLOWED_CARTESIAN = {"dedup_embedding_cosine"}

# queries allowed an unpartitioned window (none today; add here ONLY with
# a justification — e.g. a window over a post-limit ≤k-row relation)
ALLOWED_GLOBAL_WINDOW: set[str] = set()


def _plan(df) -> str:
    return df._jdf.queryExecution().sparkPlan().toString()


def _all_queries():
    import __spark_entry__ as e

    qs = dict(e.queries())
    qs.update(e.extra_queries())
    return qs


def _unpartitioned_windows(plan: str) -> list[str]:
    """Window plan lines with no partition spec (2 top-level bracket
    groups instead of 3)."""
    bad = []
    for line in plan.splitlines():
        s = line.strip().lstrip("+-:* ")
        if not s.startswith("Window "):
            continue
        groups = 0
        depth = 0
        for ch in s:
            if ch == "[":
                if depth == 0:
                    groups += 1
                depth += 1
            elif ch == "]":
                depth -= 1
        if groups < 3:
            bad.append(s[:160])
    return bad


def test_no_unexpected_cartesian_products(spark):
    offenders = []
    for name, fn in _all_queries().items():
        plan = _plan(fn(spark, SF))
        if "CartesianProduct" in plan and name not in ALLOWED_CARTESIAN:
            offenders.append(name)
    assert not offenders, f"cartesian products appeared in: {offenders}"


def test_no_unpartitioned_windows_anywhere(spark):
    """No registered query may plan a global (partition-less) window —
    the whole-input-through-one-task anti-pattern (VERDICT r2 item 3)."""
    offenders = {}
    for name, fn in _all_queries().items():
        if name in ALLOWED_GLOBAL_WINDOW:
            continue
        bad = _unpartitioned_windows(_plan(fn(spark, SF)))
        if bad:
            offenders[name] = bad
    assert not offenders, f"unpartitioned windows: {offenders}"


def test_detector_catches_a_global_window(spark):
    """Self-test of the detector: it must flag a deliberately
    unpartitioned window and pass a partitioned one."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    df = spark.range(10).withColumn("g", F.col("id") % 2)
    g = df.withColumn("rn", F.row_number().over(Window.orderBy("id")))
    p = df.withColumn(
        "rn", F.row_number().over(Window.partitionBy("g").orderBy("id"))
    )
    assert _unpartitioned_windows(_plan(g))
    assert not _unpartitioned_windows(_plan(p))


def test_a10_top_k_stays_distributed(spark):
    """top_n_sum must plan as TakeOrdered (per-partition top-k + driver
    merge of n rows), never an unpartitioned row_number window."""
    import __spark_entry__ as e

    plan = _plan(e.queries()["a10_augmented_dict"](spark, SF))
    assert "TakeOrdered" in plan
    assert "Window" not in plan


def test_flagship_single_shuffle(spark):
    """The fused pipeline plans exactly one SHUFFLE exchange (the
    conv_id repartition) before the kernel.  Count shuffle exchanges
    specifically — the bare 'Exchange' substring also matches
    BroadcastExchange/ReusedExchange, which would fail this guard on a
    legitimate broadcast join that preserves the single-shuffle
    property (ADVICE r3)."""
    import __spark_entry__ as e

    plan = _plan(e.entry(spark))
    assert plan.count("Exchange hashpartitioning") == 1, plan
