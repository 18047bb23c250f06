"""Scale primitives: salted-join equivalence under skew; bucketed tables
join without an Exchange."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from earthquake_data_pipeline_spark.operators.scale import (
    bucketed_join_ready,
    salted_join,
    write_bucketed,
)


def test_salted_join_matches_plain_join(spark):
    # skewed left: key 1 holds 90% of rows
    left = spark.createDataFrame(
        [(1, f"v{i}") for i in range(90)] + [(k, f"w{k}") for k in range(2, 12)],
        ["k", "payload"],
    )
    right = spark.createDataFrame(
        [(k, f"dim{k}") for k in range(1, 12)], ["k", "attr"]
    )
    plain = {
        (r.k, r.payload, r.attr)
        for r in left.join(right, "k").collect()
    }
    salted = {
        (r.k, r.payload, r.attr)
        for r in salted_join(left, right, ["k"], salt_factor=4).collect()
    }
    assert salted == plain
    assert len(salted) == 100  # every left row matched exactly once


def test_salted_join_left_outer(spark):
    left = spark.createDataFrame([(1, "a"), (2, "b"), (99, "c")], ["k", "p"])
    right = spark.createDataFrame([(1, "x"), (2, "y")], ["k", "q"])
    rows = {
        (r.k, r.p, r.q)
        for r in salted_join(left, right, ["k"], how="left", salt_factor=3).collect()
    }
    assert rows == {(1, "a", "x"), (2, "b", "y"), (99, "c", None)}


def test_bucketed_join_has_no_exchange(spark):
    spark.sql("CREATE DATABASE IF NOT EXISTS bkt")
    fact = spark.range(0, 1000).select(
        F.col("id").alias("k"), (F.col("id") % 7).alias("v")
    )
    dim = spark.range(0, 1000).select(
        F.col("id").alias("k"), (F.col("id") % 13).alias("w")
    )
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        write_bucketed(fact, "bkt.fact_b", ["k"], num_buckets=8, sort_keys=["k"])
        write_bucketed(dim, "bkt.dim_b", ["k"], num_buckets=8, sort_keys=["k"])
        joined = bucketed_join_ready(spark, "bkt.fact_b", "bkt.dim_b", ["k"])
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan  # bucketing satisfies the distribution
        assert joined.count() == 1000
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS bkt.fact_b")
        spark.sql("DROP TABLE IF EXISTS bkt.dim_b")
        spark.sql("DROP DATABASE IF EXISTS bkt")


def test_salted_join_rejects_outer_and_keyonly(spark):
    left = spark.createDataFrame([(1, "a")], ["k", "p"])
    right = spark.createDataFrame([(1, "x")], ["k", "q"])
    with pytest.raises(ValueError, match="does not support"):
        salted_join(left, right, ["k"], how="full")
    with pytest.raises(ValueError, match="salt_source"):
        salted_join(left.select("k"), right, ["k"])
