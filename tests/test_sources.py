"""Ingest source tests: adaptive window planning, GeoJSON flattening, the
registered Python DataSource (offline modes only), IO helpers."""

from __future__ import annotations

import json
from datetime import date

import pytest
from pyspark.sql import functions as F

from earthquake_data_pipeline_spark.schemas import RAW_EVENT_SCHEMA
from earthquake_data_pipeline_spark.sources.io import (
    empty_clone,
    read_csv,
    write_month_partitioned,
    write_parquet,
)
from earthquake_data_pipeline_spark.sources.usgs import (
    PAGE_CAP,
    FixtureFetcher,
    SyntheticFetcher,
    UsgsDataSource,
    fetch_to_dataframe,
    flatten_feature,
    plan_windows,
)


def test_plan_windows_respects_page_cap():
    # 2000 rows/day: 15-day probe = 30k > cap → back off to 7 days
    f = SyntheticFetcher(rows_per_day=2000)
    windows = plan_windows(f, date(2000, 1, 1), date(2000, 6, 1))
    assert len(windows) > 1
    for ws, we in windows:
        assert f.count(ws, we) <= PAGE_CAP
    # contiguity + coverage
    assert windows[0][0] == date(2000, 1, 1)
    assert windows[-1][1] == date(2000, 6, 1)
    for (_, e1), (s2, _) in zip(windows, windows[1:]):
        assert e1 == s2


def test_plan_windows_epoch_jumps():
    # sparse density: the 1500→1949→1965 era jumps emit single windows
    f = SyntheticFetcher(rows_per_day=0)
    windows = plan_windows(f, date(1500, 1, 1), date(1970, 1, 1))
    assert windows[0] == (date(1500, 1, 1), date(1949, 1, 1))
    assert windows[1] == (date(1949, 1, 1), date(1965, 1, 1))


def test_flatten_feature_contract():
    entry = {
        "properties": {"place": "x", "time": 1000, "mag": 5.0, "alert": None,
                       "tsunami": 1, "tz": None, "type": "earthquake"},
        "geometry": {"coordinates": [120.5, -30.2, 10.0]},
    }
    row = flatten_feature(entry)
    # coordinate order: GeoJSON is (lon, lat, depth) → schema (lat, lon)
    assert row[3] == -30.2 and row[4] == 120.5 and row[5] == 10.0
    assert flatten_feature({"properties": {}}) is None  # malformed → skipped


def test_datasource_synthetic_roundtrip(spark):
    spark.dataSource.register(UsgsDataSource)
    df = (
        spark.read.format("usgs_fdsn")
        .option("mode", "synthetic")
        .option("rows_per_day", "3")
        .option("start_date", "2024-01-01")
        .option("end_date", "2024-01-11")
        .load()
    )
    assert df.schema == RAW_EVENT_SCHEMA
    assert df.count() == 30  # 10 days × 3
    # deterministic: same options → same data
    again = (
        spark.read.format("usgs_fdsn")
        .option("mode", "synthetic")
        .option("rows_per_day", "3")
        .option("start_date", "2024-01-01")
        .option("end_date", "2024-01-11")
        .load()
    )
    assert sorted(df.collect()) == sorted(again.collect())


def test_fixture_fetcher_and_fallback(spark, tmp_path):
    fixture = {
        "counts": {"2024-01-01|2024-01-31": 2},
        "pages": {
            "2024-01-01|2024-01-31": {
                "features": [
                    {"properties": {"place": "a", "time": 1, "mag": 1.0,
                                    "alert": None, "tsunami": 0, "tz": None,
                                    "type": "earthquake"},
                     "geometry": {"coordinates": [1.0, 2.0, 3.0]}},
                    {"properties": {}},  # malformed, skipped
                ]
            }
        },
    }
    p = tmp_path / "fixture.json"
    p.write_text(json.dumps(fixture))
    df = fetch_to_dataframe(
        spark, FixtureFetcher(str(p)), date(2024, 1, 1), date(2024, 1, 31)
    )
    rows = df.collect()
    assert len(rows) == 1 and rows[0].place == "a"


def test_io_month_partitioned_pruning(spark, tmp_path):
    df = spark.createDataFrame(
        [(1, "2024-01-05 00:00:00"), (2, "2024-02-10 00:00:00")], ["id", "ts"]
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    out = str(tmp_path / "months")
    write_month_partitioned(df, out, "ts")
    back = spark.read.parquet(out)
    jan = back.filter(F.col("event_month") == "2024-01")
    assert [r.id for r in jan.collect()] == [1]
    # partition pruning visible in the physical plan
    plan = jan._jdf.queryExecution().executedPlan().toString()
    assert "event_month" in plan


def test_io_csv_roundtrip_and_empty_clone(spark, tmp_path):
    df = spark.createDataFrame(
        [("p", 1000, 5.0, 1.0, 2.0, 3.0, None, 0, None, "earthquake")],
        RAW_EVENT_SCHEMA,
    )
    out = str(tmp_path / "csv")
    df.write.mode("overwrite").option("header", "true").csv(out)
    back = read_csv(spark, out, RAW_EVENT_SCHEMA)
    assert back.schema == RAW_EVENT_SCHEMA and back.count() == 1
    clone = empty_clone(back)
    assert clone.count() == 0 and clone.schema == back.schema
    write_parquet(clone, str(tmp_path / "pq"), num_files=1)
    assert spark.read.parquet(str(tmp_path / "pq")).count() == 0
