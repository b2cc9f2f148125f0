"""Bucketed transcripts layout (sources/bucketed.py): prove the
conv_id bucket spec elides every conv_id-clustered shuffle, and that
the correction pipeline over bucketed inputs stays byte-equal to the
unbucketed path."""

from __future__ import annotations

import pytest

from memo_fraktur_ocr_code_spark.plans.pipeline import correct_pipeline
from memo_fraktur_ocr_code_spark.sources.bucketed import (
    conv_rollup,
    read_bucketed,
    write_bucketed,
)
from memo_fraktur_ocr_code_spark.sources.fixtures import make_fixture

BASE_T = "test_bucketed_base"
ALT_T = "test_bucketed_alt"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture(scope="module")
def bucketed(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("bucketed_tables")
    base_rows, alt_rows, lexicon = make_fixture(n_convs=12)
    base = spark.createDataFrame(
        [
            (r["conv_id"], r["turn_idx"], r["role"], r["text"], r["tool"],
             r["ts"])
            for r in base_rows
        ],
        "conv_id string, turn_idx int, role string, text string,"
        " tool string, ts timestamp",
    )
    alt = spark.createDataFrame(
        [(r["conv_id"], r["turn_idx"], r["text"]) for r in alt_rows],
        "conv_id string, turn_idx int, text string",
    )
    write_bucketed(base, BASE_T, n_buckets=4, path=str(root / "base"))
    write_bucketed(
        alt, ALT_T, n_buckets=4, path=str(root / "alt"),
        sort_cols=("conv_id", "turn_idx"),
    )
    yield {"base": base, "alt": alt, "lexicon": lexicon}
    spark.sql(f"DROP TABLE IF EXISTS {BASE_T}")
    spark.sql(f"DROP TABLE IF EXISTS {ALT_T}")


def test_conv_rollup_is_shuffle_free_over_buckets(spark, bucketed):
    plan = _plan(conv_rollup(spark, BASE_T))
    assert "Exchange" not in plan  # bucket spec satisfies the groupBy
    # the same rollup over a bucket-less read of the same rows shuffles
    naive = (
        bucketed["base"]
        .groupBy("conv_id")
        .count()
    )
    assert "Exchange" in _plan(naive)
    # and the values agree
    a = {
        (r.conv_id, r.n_turns)
        for r in conv_rollup(spark, BASE_T).collect()
    }
    b = {(r.conv_id, r["count"]) for r in naive.collect()}
    assert a == b


def test_self_join_on_conv_id_is_shuffle_free(spark, bucketed):
    # force the sort-merge path (the fixture is small enough to
    # broadcast, which would sidestep the bucketing demonstration —
    # at corpus scale neither side broadcasts)
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        t = read_bucketed(spark, BASE_T)
        j = t.alias("l").join(
            read_bucketed(spark, BASE_T).alias("r"), "conv_id"
        )
        plan = _plan(j)
        assert "SortMergeJoin" in plan
        # both sides read pre-hashed buckets: no shuffle exchange
        assert "Exchange hashpartitioning" not in plan
        assert j.count() > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_cogroup_pipeline_over_buckets_elides_both_shuffles(
    spark, bucketed
):
    out = correct_pipeline(
        spark,
        read_bucketed(spark, BASE_T),
        read_bucketed(spark, ALT_T),
        bucketed["lexicon"],
        fused="cogroup",
    )
    plan = _plan(out)
    assert "FlatMapCoGroupsInPandas" in plan
    # both cogroup children are satisfied by the bucket spec: the plan
    # that costs 2 full-corpus shuffles on unbucketed input costs none
    assert "Exchange" not in plan
    unbucketed = correct_pipeline(
        spark,
        bucketed["base"],
        bucketed["alt"],
        bucketed["lexicon"],
        fused="cogroup",
    )
    assert "Exchange" in _plan(unbucketed)
    # byte-equality against the unbucketed path
    key = lambda r: (r.conv_id, r.turn_idx)  # noqa: E731
    assert sorted(map(tuple, out.collect()), key=lambda t: t[:2]) == sorted(
        map(tuple, unbucketed.collect()), key=lambda t: t[:2]
    )


def test_job_cli_bucketed_input(spark, bucketed, tmp_path):
    """--bucketed-input reads catalog tables (keeping the bucket spec)
    and produces the same corrected output as the path-based run."""
    from jobs.run_correction import main

    lex_path = str(tmp_path / "lex.parquet")
    spark.createDataFrame(
        bucketed["lexicon"], "token string, freq bigint"
    ).write.parquet(lex_path)
    out_b = str(tmp_path / "out_bucketed")
    main([BASE_T, lex_path, out_b, ALT_T, "--bucketed-input"])

    base_path = str(tmp_path / "base.parquet")
    alt_path = str(tmp_path / "alt.parquet")
    bucketed["base"].write.parquet(base_path)
    bucketed["alt"].write.parquet(alt_path)
    out_p = str(tmp_path / "out_plain")
    main([base_path, lex_path, out_p, alt_path])

    a = sorted(
        map(tuple, spark.read.parquet(f"{out_b}/corrected_turns")
            .select("conv_id", "turn_idx", "corrected_text").collect())
    )
    b = sorted(
        map(tuple, spark.read.parquet(f"{out_p}/corrected_turns")
            .select("conv_id", "turn_idx", "corrected_text").collect())
    )
    assert a == b and len(a) > 0


def test_compaction_folds_files_and_preserves_content(
    spark, bucketed, tmp_path
):
    """Small-file maintenance: a fragmented ingest (16 writer tasks ×
    4 buckets) compacts to exactly one file per bucket at
    parallelism=1, preserving row count, content checksum, and the
    bucket spec (post-compaction rollup still shuffle-free)."""
    from memo_fraktur_ocr_code_spark.sources.bucketed import (
        bucket_file_stats,
        compact_bucketed,
        table_checksum,
    )

    frag_t, comp_t = "test_compact_frag", "test_compact_out"
    try:
        write_bucketed(
            bucketed["base"].repartition(16),
            frag_t,
            n_buckets=4,
            path=str(tmp_path / "frag"),
        )
        before = bucket_file_stats(spark, frag_t)
        assert before["n_buckets"] == 4
        assert before["max_files_per_bucket"] > 1  # genuinely fragmented

        report = compact_bucketed(
            spark, frag_t, comp_t, str(tmp_path / "compact"),
            parallelism=1,
        )
        after = report["after"]
        assert after["n_buckets"] == 4
        # exactly ONE file per populated bucket (an empty bucket
        # writes no file), over the same bucket population
        assert after["max_files_per_bucket"] == 1
        assert after["n_files"] == len(after["files_per_bucket"])
        assert set(after["files_per_bucket"]) == set(
            before["files_per_bucket"]
        )
        assert report["verified"]["rows"] == bucketed["base"].count()
        assert table_checksum(spark, frag_t) == table_checksum(
            spark, comp_t
        )
        # the compacted table still carries the bucket spec: the
        # rollup's aggregation plan has no Exchange at all
        plan = _plan(conv_rollup(spark, comp_t))
        assert "Exchange" not in plan
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {frag_t}")
        spark.sql(f"DROP TABLE IF EXISTS {comp_t}")


def test_compaction_verify_catches_drift(spark, bucketed, tmp_path):
    """The content-drift guard really fires: pre-planting a DIFFERENT
    destination table under the same name and calling the checksum
    comparison must mismatch (simulating a torn rewrite)."""
    from memo_fraktur_ocr_code_spark.sources.bucketed import (
        table_checksum,
    )

    a_t, b_t = "test_drift_a", "test_drift_b"
    try:
        write_bucketed(
            bucketed["base"], a_t, n_buckets=4,
            path=str(tmp_path / "a"),
        )
        write_bucketed(
            bucketed["base"].where("turn_idx > 0"), b_t, n_buckets=4,
            path=str(tmp_path / "b"),
        )
        assert table_checksum(spark, a_t) != table_checksum(spark, b_t)
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {a_t}")
        spark.sql(f"DROP TABLE IF EXISTS {b_t}")


def test_maintenance_job_demo(spark, tmp_path):
    """jobs/run_maintenance.py --demo end-to-end: fragmented synthetic
    ingest folds to one file per bucket with checksum verification."""
    from jobs.run_maintenance import main

    report = main(["--demo", str(tmp_path / "maint")])
    assert report["demo"] == "ok"
    assert report["before"]["max_files_per_bucket"] > 1
    assert report["after"]["max_files_per_bucket"] == 1
    assert report["verified"]["rows"] > 0


def _snap_rows(spark, n, tag):
    from pyspark.sql import functions as F

    return (
        spark.range(n)
        .select(
            F.concat(F.lit("c"), (F.col("id") % 7)).alias("conv_id"),
            F.col("id").cast("int").alias("turn_idx"),
            F.timestamp_seconds(F.col("id") + 1).alias("ts"),
            F.concat(F.lit(tag), F.col("id")).alias("text"),
        )
    )


def test_snapshot_write_read_and_time_travel(spark, tmp_path):
    from memo_fraktur_ocr_code_spark.sources import bucketed as b

    root = str(tmp_path / "snaps")
    v1 = b.write_snapshot(
        spark, _snap_rows(spark, 40, "a"), root, n_buckets=4
    )
    assert v1 == 1 and b.current_snapshot_version(spark, root) == 1
    v2 = b.write_snapshot(
        spark, _snap_rows(spark, 60, "b"), root, n_buckets=4
    )
    assert v2 == 2 and b.current_snapshot_version(spark, root) == 2
    # current read = v2; time travel reads the untouched v1
    assert b.read_snapshot(spark, root).count() == 60
    assert b.read_snapshot(spark, root, version=1).count() == 40
    assert (
        b.read_snapshot(spark, root, 1)
        .where("text like 'a%'")
        .count()
        == 40
    )
    # unknown / uncommitted versions refuse loudly
    import pytest

    with pytest.raises(FileNotFoundError):
        b.read_snapshot(spark, root, version=9)


def test_snapshot_uncommitted_write_is_invisible_until_flip(
    spark, tmp_path
):
    """ADVICE r6 fix: compact_snapshot must verify BEFORE the flip.
    The mechanism: write_snapshot(commit=False) leaves the new version
    invisible to every reader surface (current version, version list,
    read_snapshot), its number is never reused, and _commit_snapshot
    is the only thing that makes it current."""
    import pytest

    from memo_fraktur_ocr_code_spark.sources import bucketed as b

    root = str(tmp_path / "snaps_vbf")
    b.write_snapshot(spark, _snap_rows(spark, 40, "a"), root, n_buckets=4)
    v2 = b.write_snapshot(
        spark, _snap_rows(spark, 60, "b"), root, n_buckets=4,
        commit=False,
    )
    # still invisible everywhere — readers keep v1
    assert b.current_snapshot_version(spark, root) == 1
    assert b.snapshot_versions(spark, root) == [1]
    assert b.read_snapshot(spark, root).count() == 40
    with pytest.raises(FileNotFoundError):
        b.read_snapshot(spark, root, version=v2)
    # the uncommitted number is burned, not reused
    v3 = b.write_snapshot(
        spark, _snap_rows(spark, 10, "c"), root, n_buckets=4,
        commit=False,
    )
    assert v3 == v2 + 1
    # the flip makes exactly the flipped version current
    b._commit_snapshot(spark, root, v2)
    assert b.current_snapshot_version(spark, root) == v2
    assert b.read_snapshot(spark, root).count() == 60


def test_snapshot_compaction_flip_is_atomic_and_preserves_old(
    spark, tmp_path
):
    """write -> compact -> read-old-version (VERDICT r5 #9): the
    compaction flip is a commit-marker create (atomic), the prior
    snapshot remains readable byte-for-byte, and the compacted table
    keeps the bucket spec (conv-keyed agg stays Exchange-free)."""
    from memo_fraktur_ocr_code_spark.sources import bucketed as b

    root = str(tmp_path / "snaps2")
    # fragmented v1: two separate appends' worth of files via high
    # parallelism write
    df = _snap_rows(spark, 200, "x").repartition(8)
    b.write_snapshot(spark, df, root, n_buckets=4)
    out = b.compact_snapshot(spark, root, parallelism=1)
    assert out["from_version"] == 1 and out["to_version"] == 2
    assert out["after"]["max_files_per_bucket"] == 1
    assert "verified" in out
    assert b.current_snapshot_version(spark, root) == 2
    # prior snapshot still readable and identical content
    n1, x1 = b.table_checksum(
        spark, b._snapshot_table_name(root, 1)
    )
    n2, x2 = b.table_checksum(
        spark, b._snapshot_table_name(root, 2)
    )
    assert (n1, x1) == (n2, x2)
    # bucket spec survives: conv-keyed agg over the compacted snapshot
    # plans with ZERO Exchange
    plan = (
        b.read_snapshot(spark, root)
        .groupBy("conv_id")
        .count()
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan
    # a crashed (uncommitted) writer dir is invisible to readers and
    # never reused by the next writer
    import os

    os.makedirs(f"{root}/v3/data", exist_ok=True)
    assert b.current_snapshot_version(spark, root) == 2
    v4 = b.write_snapshot(
        spark, _snap_rows(spark, 10, "y"), root, n_buckets=4
    )
    assert v4 == 4  # skipped the crashed v3
    # expire the oldest snapshot; current stays readable
    b.expire_snapshot(spark, root, 1)
    assert b.snapshot_versions(spark, root) == [2, 4]
    import pytest

    with pytest.raises(ValueError):
        b.expire_snapshot(spark, root, 4)


def test_snapshot_reregisters_catalog_entry_from_spec(spark, tmp_path):
    """The session catalog is ephemeral: after dropping the catalog
    entry (a fresh session's situation), read_snapshot must rebuild it
    from the snapshot's own spec file — with the bucket spec intact, so
    conv-keyed aggregation over the re-registered table still plans
    with zero Exchange."""
    from memo_fraktur_ocr_code_spark.sources import bucketed as b

    root = str(tmp_path / "snaps3")
    b.write_snapshot(spark, _snap_rows(spark, 50, "z"), root, n_buckets=4)
    name = b._snapshot_table_name(root, 1)
    before = b.read_snapshot(spark, root).count()
    spark.sql(f"DROP TABLE {name}")
    assert not spark.catalog.tableExists(name)
    got = b.read_snapshot(spark, root)
    assert got.count() == before == 50
    plan = (
        got.groupBy("conv_id")
        .count()
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan


def test_maintenance_job_snapshot_mode(spark, tmp_path):
    """run_maintenance --snapshot drives compact_snapshot end to end:
    fragmented v1 compacts into v2 with the atomic marker flip, the
    report carries the layout before/after + checksum, and v1 remains
    readable (time travel)."""
    from jobs.run_maintenance import main as maint_main
    from memo_fraktur_ocr_code_spark.sources import bucketed as b

    root = str(tmp_path / "snap_maint")
    b.write_snapshot(
        spark, _snap_rows(spark, 120, "m").repartition(6), root,
        n_buckets=4,
    )
    report = maint_main(["--snapshot", root, "--parallelism", "1"])
    assert report["from_version"] == 1 and report["to_version"] == 2
    assert report["after"]["max_files_per_bucket"] == 1
    assert "verified" in report
    assert b.read_snapshot(spark, root, version=1).count() == 120
    assert b.current_snapshot_version(spark, root) == 2
