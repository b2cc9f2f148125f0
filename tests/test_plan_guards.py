"""Physical-plan regression guards over every registered driver query.

Catches the silent scale-killers at plan level: an unexpected
CartesianProduct sneaking into a rewrite, or the A10 calibration sum
falling back to a single-partition global window (VERDICT r1 item 5).
"""

from __future__ import annotations

import sys

sys.path.insert(0, ".")

SF = "/root/testdata/sf0.001"

# the one deliberate all-pairs plan: the exact embedding baseline that the
# verified SRP scale path is measured against
ALLOWED_CARTESIAN = {"dedup_embedding_cosine"}


def _plan(df) -> str:
    return df._jdf.queryExecution().sparkPlan().toString()


def test_no_unexpected_cartesian_products(spark):
    import __spark_entry__ as e

    offenders = []
    for name, fn in e.queries().items():
        plan = _plan(fn(spark, SF))
        if "CartesianProduct" in plan and name not in ALLOWED_CARTESIAN:
            offenders.append(name)
    assert not offenders, f"cartesian products appeared in: {offenders}"


def test_a10_top_k_stays_distributed(spark):
    """top_n_sum must plan as TakeOrdered (per-partition top-k + driver
    merge of n rows), never an unpartitioned row_number window."""
    import __spark_entry__ as e

    plan = _plan(e.queries()["a10_augmented_dict"](spark, SF))
    assert "TakeOrdered" in plan
    assert "Window" not in plan


def test_flagship_single_shuffle(spark):
    """The fused pipeline plans exactly one Exchange (the conv_id
    repartition) before the kernel."""
    import __spark_entry__ as e

    plan = _plan(e.entry(spark))
    assert plan.count("Exchange") == 1, plan
