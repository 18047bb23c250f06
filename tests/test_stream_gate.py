"""Gate-facing streaming queries: the final streaming output must equal
the batch equivalent (the property that makes a batch SQL oracle valid),
and running one must not perturb the session it borrowed."""

from __future__ import annotations

from pyspark.sql import functions as F

from earthquake_data_pipeline_spark.driver_queries_stream import (
    q_stream_dedup_days,
    q_stream_running_totals,
    q_stream_window_counts,
)
from earthquake_data_pipeline_spark.qcommon import _table

SF = "/root/testdata/sf0.001"


def _sorted_rows(df, cols):
    return [tuple(r) for r in df.orderBy(*cols).collect()]


def test_stream_window_counts_equals_batch(spark):
    got = q_stream_window_counts(spark, SF)
    ev = _table(spark, SF, "events")
    want = (
        ev.groupBy(
            F.unix_timestamp(F.window("ts", "1 day").start).alias(
                "window_start_s"
            ),
            "event_type",
        )
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)"))
            .cast("double")
            .alias("sum_value"),
        )
    )
    keys = ["window_start_s", "event_type"]
    assert _sorted_rows(got, keys) == _sorted_rows(want, keys)


def test_stream_running_totals_equals_batch(spark):
    got = q_stream_running_totals(spark, SF)
    ev = _table(spark, SF, "events")
    want = ev.groupBy("user_id").agg(
        F.count("*").alias("n_events"),
        F.sum((F.col("value").cast("decimal(18,2)") * 100).cast("long")).alias(
            "total_cents"
        ),
    )
    assert _sorted_rows(got, ["user_id"]) == _sorted_rows(want, ["user_id"])


def test_stream_dedup_days_equals_batch_distinct(spark):
    got = q_stream_dedup_days(spark, SF)
    ev = _table(spark, SF, "events")
    want = ev.select(
        "event_type",
        (F.floor(F.unix_timestamp("ts") / 86400) * 86400).alias("day_s"),
    ).distinct()
    keys = ["event_type", "day_s"]
    assert _sorted_rows(got, keys) == _sorted_rows(want, keys)


def test_streaming_query_restores_shuffle_partitions(spark):
    before = spark.conf.get("spark.sql.shuffle.partitions")
    q_stream_dedup_days(spark, SF)
    assert spark.conf.get("spark.sql.shuffle.partitions") == before


def test_table_schema_memo_raw_schema_and_invalidation(spark, tmp_path):
    """r17 optimization: the stream schema probe memoizes the RAW
    (pre-normalization) parquet schema on file identity — a hit must not
    re-read, and a rewritten file must invalidate."""
    import os
    import shutil

    from pyspark.sql.types import TimestampNTZType

    from earthquake_data_pipeline_spark import qcommon

    sf = str(tmp_path)
    shutil.copy(f"{SF}/events.parquet", f"{sf}/events.parquet")

    s1 = qcommon._table_schema(spark, sf, "events")
    # RAW layout: ts stays TIMESTAMP_NTZ (the stream source must declare
    # the pre-normalization schema so normalize_events_ts applies)
    assert isinstance(s1["ts"].dataType, TimestampNTZType)
    # memo hit: same object, no fresh probe
    assert qcommon._table_schema(spark, sf, "events") is s1
    # rewritten file (new mtime) -> fresh probe, not the stale entry
    os.utime(f"{sf}/events.parquet", ns=(1, 1))
    s2 = qcommon._table_schema(spark, sf, "events")
    assert s2 is not s1
    assert s2 == s1  # same bytes -> same schema value
