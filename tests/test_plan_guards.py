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


def _window_spec_bodies(s: str) -> list[str]:
    """Balanced-paren bodies of every ``windowspecdefinition(...)`` in a
    plan line (partition columns may themselves contain calls, so a
    regex up to the first ')' would truncate)."""
    out, i, key = [], 0, "windowspecdefinition("
    while True:
        j = s.find(key, i)
        if j < 0:
            return out
        depth, k = 1, j + len(key)
        start = k
        while k < len(s) and depth:
            if s[k] == "(":
                depth += 1
            elif s[k] == ")":
                depth -= 1
            k += 1
        out.append(s[start : k - 1])
        i = k


def _top_level_args(body: str) -> list[str]:
    args, depth, cur = [], 0, []
    for ch in body:
        if ch == "," and depth == 0:
            args.append("".join(cur).strip())
            cur = []
            continue
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        cur.append(ch)
    if cur:
        args.append("".join(cur).strip())
    return args


def _unpartitioned_windows(plan: str) -> list[str]:
    """Window plan lines whose spec has NO partition column.  A spec
    prints as ``windowspecdefinition(part..., order..., frame)`` with
    partition columns first (bare expressions), order expressions next
    (carrying ``ASC``/``DESC``), and the frame last — so the window is
    unpartitioned iff the FIRST top-level argument is already an order
    expression or the frame.  (The old 3-bracket-group count
    false-positived on legitimate partition-only windows, e.g.
    ``count(*) OVER (PARTITION BY cluster_id)``, which print only two
    groups just like the global windows this guard exists to catch.)"""
    bad = []
    for line in plan.splitlines():
        s = line.strip().lstrip("+-:* ")
        if not s.startswith("Window "):
            continue
        for body in _window_spec_bodies(s):
            args = _top_level_args(body)
            if not args:
                continue
            first = args[0]
            if first.startswith("specifiedwindowframe") or (
                " ASC" in first or " DESC" in first
            ):
                bad.append(s[:160])
                break
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
    # partition-only window (no order): bounded per group — must PASS
    po = df.withColumn("n", F.count("*").over(Window.partitionBy("g")))
    # global frame-only window: whole input through one task — must FLAG
    go = df.withColumn(
        "n", F.count("*").over(Window.partitionBy())
    )
    assert _unpartitioned_windows(_plan(g))
    assert not _unpartitioned_windows(_plan(p))
    assert not _unpartitioned_windows(_plan(po))
    assert _unpartitioned_windows(_plan(go))


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
