"""qcommon.reuse — the subtree-pinning seam (round 10).

Every operator that fans a derived frame out to multiple consumers
routes through ``reuse()``; which pinning flavor runs is a deployment
property (SPARK_GRAFT_REUSE / the cluster's checkpoint dir), not an
operator decision. These tests pin the mode-selection contract and
prove the flavors are result-identical on an operator that exercises
the seam end-to-end.
"""

from __future__ import annotations

import pytest

from earthquake_data_pipeline_spark.qcommon import reuse


def _toy(spark):
    return spark.range(0, 200).selectExpr("id", "id % 7 as k")


def _reset_checkpoint_dir(spark):
    """Clear the session-wide checkpoint dir (sticky; no public unset)."""
    jsc = spark.sparkContext._jsc.sc()
    none = getattr(getattr(spark.sparkContext._jvm.scala, "None$"), "MODULE$")
    getattr(jsc, "checkpointDir_$eq")(none)
    assert spark.sparkContext.getCheckpointDir() is None


def test_reuse_default_is_local_checkpoint(spark, monkeypatch):
    monkeypatch.delenv("SPARK_GRAFT_REUSE", raising=False)
    assert spark.sparkContext.getCheckpointDir() is None
    df = reuse(_toy(spark))
    # both checkpoint flavors rebase the plan onto a LogicalRDD
    # immediately (lazily materialized); persist would show
    # InMemoryRelation instead
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    assert "LogicalRDD" in plan
    assert "InMemoryRelation" not in plan
    assert df.count() == 200


def test_reuse_persist_keeps_lineage_and_caches(spark, monkeypatch):
    monkeypatch.setenv("SPARK_GRAFT_REUSE", "persist")
    df = reuse(_toy(spark))
    try:
        assert df.storageLevel.useMemory  # cache registered
        plan = df._jdf.queryExecution().optimizedPlan().toString()
        # lineage kept: the plan is NOT rebased onto an opaque RDD scan
        assert "LogicalRDD" not in plan
        assert df.count() == 200
        # eager persist materializes on the spot
        df2 = reuse(_toy(spark), eager=True)
        assert df2.storageLevel.useMemory
    finally:
        df.unpersist()
        spark.catalog.clearCache()


def test_reuse_auto_upgrades_to_reliable_checkpoint(spark, monkeypatch, tmp_path):
    monkeypatch.delenv("SPARK_GRAFT_REUSE", raising=False)
    ckdir = tmp_path / "ck"
    spark.sparkContext.setCheckpointDir(str(ckdir))
    try:
        df = reuse(_toy(spark))
        assert df.count() == 200
        # reliable checkpoint wrote recoverable files under the dir
        files = [p for p in ckdir.rglob("*") if p.is_file()]
        assert files, "no reliable checkpoint files written in auto mode"
    finally:
        _reset_checkpoint_dir(spark)


def test_reuse_explicit_local_ignores_checkpoint_dir(spark, monkeypatch, tmp_path):
    monkeypatch.setenv("SPARK_GRAFT_REUSE", "local")
    ckdir = tmp_path / "ck"
    spark.sparkContext.setCheckpointDir(str(ckdir))
    try:
        df = reuse(_toy(spark))
        assert df.count() == 200
        files = [p for p in ckdir.rglob("*") if p.is_file()]
        assert not files, "local mode must not write reliable checkpoints"
    finally:
        _reset_checkpoint_dir(spark)


@pytest.mark.parametrize("mode", ["local", "reliable", "persist"])
def test_prefix_filter_join_is_flavor_invariant(spark, monkeypatch, tmp_path, mode):
    """End-to-end through a seam consumer: the pinning flavor changes
    recovery semantics only, never results."""
    from earthquake_data_pipeline_spark.operators.fuzzy_dedup import (
        prefix_filter_join,
    )

    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "the quick brown fox jumps over the lazy cat"),
            (3, "a completely different document about spark"),
            (4, "the quick brown fox jumps over the lazy dog"),
            (5, "spark document about something completely different"),
        ],
        ["doc_id", "text"],
    )
    monkeypatch.setenv("SPARK_GRAFT_REUSE", mode)
    if mode == "reliable":
        spark.sparkContext.setCheckpointDir(str(tmp_path / "ck"))
    try:
        got = sorted(
            (r.id_a, r.id_b)
            for r in prefix_filter_join(
                docs, threshold_num=1, threshold_den=2
            ).collect()
        )
    finally:
        if mode == "reliable":
            _reset_checkpoint_dir(spark)
        if mode == "persist":
            spark.catalog.clearCache()
    assert got == [(1, 2), (1, 4), (2, 4), (3, 5)]


def test_reliable_reuse_computes_once_and_drops_staging_cache(
    spark, monkeypatch, tmp_path
):
    """ADVICE r10: Dataset.checkpoint does NOT cache first — the
    checkpoint pass RE-COMPUTES the subtree (2x the plan) unless reuse()
    stages it through a persist. Pin both halves of the fix: the subtree
    evaluates exactly once per row, and the staging cache is gone once
    the checkpoint files exist (no per-pin cache residue in iterative
    drivers)."""
    from pyspark.sql import functions as F

    from earthquake_data_pipeline_spark.qcommon import reuse

    monkeypatch.setenv("SPARK_GRAFT_REUSE", "reliable")
    spark.sparkContext.setCheckpointDir(str(tmp_path / "ck"))
    acc = spark.sparkContext.accumulator(0)

    def counting(x):
        acc.add(1)
        return x

    u = F.udf(counting, "long")
    try:
        # other tests' localCheckpoint blocks share the session's RDD
        # storage — diff against a pre-snapshot instead of asserting 0
        pre = {i.id() for i in spark.sparkContext._jsc.sc().getRDDStorageInfo()}
        base = spark.range(0, 100, 1, 4).select(u("id").alias("id"))
        out = reuse(base)  # reliable: eager persist+checkpoint+unpersist
        assert acc.value == 100, "checkpoint pass recomputed the subtree"
        # the staging cache must not linger after the files are written
        infos = [
            i
            for i in spark.sparkContext._jsc.sc().getRDDStorageInfo()
            if i.id() not in pre
        ]
        assert len(infos) == 0, [i.name() for i in infos]
        # and the pinned frame replays from the checkpoint, not the plan
        assert out.count() == 100
        assert acc.value == 100, "action re-ran the original subtree"
    finally:
        _reset_checkpoint_dir(spark)


def test_reliable_reuse_respects_caller_held_cache_pin(
    spark, monkeypatch, tmp_path
):
    """Review-hardened (r11): persist() is plan-keyed, so reuse()'s
    staging unpersist must NOT drop a cache entry the CALLER created —
    only a pin reuse() itself staged."""
    from pyspark.storagelevel import StorageLevel

    from earthquake_data_pipeline_spark.qcommon import reuse

    monkeypatch.setenv("SPARK_GRAFT_REUSE", "reliable")
    spark.sparkContext.setCheckpointDir(str(tmp_path / "ck"))
    try:
        df = spark.range(50).selectExpr("id", "id * 2 AS d")
        df.persist(StorageLevel.MEMORY_AND_DISK)
        df.count()  # materialize the caller's pin
        out = reuse(df)
        assert out.count() == 50
        # the caller's cache entry survives reuse()'s staging pass
        assert df.storageLevel != StorageLevel.NONE
        assert spark.sparkContext._jsc.sc().getRDDStorageInfo()  # blocks live
    finally:
        df.unpersist(blocking=True)
        _reset_checkpoint_dir(spark)
