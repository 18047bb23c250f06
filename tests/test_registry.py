"""Model registry: dependency-ordered materialization of the full DAG
(dbt-run restatement, SURVEY.md §3.3)."""

from __future__ import annotations

from datetime import date

import pytest
from pyspark.sql import functions as F

from earthquake_data_pipeline_spark.operators.cleaning import clean_events
from earthquake_data_pipeline_spark.plans.models import (
    ANALYTICS_MODELS,
    fact_earthquake_data,
    stg_earthquake,
)
from earthquake_data_pipeline_spark.plans.registry import ModelRegistry
from earthquake_data_pipeline_spark.sources.usgs import (
    SyntheticFetcher,
    fetch_to_dataframe,
)


def test_registry_runs_full_dag(spark, tmp_path):
    raw = fetch_to_dataframe(
        spark, SyntheticFetcher(rows_per_day=4), date(2020, 1, 1), date(2020, 2, 1)
    )
    reg = ModelRegistry(spark, warehouse_dir=str(tmp_path / "wh"))
    reg.source("raw_events", raw)
    reg.model(
        "cleaned",
        lambda df: clean_events(df)
        .withColumn("country", F.lit(None).cast("string"))
        .withColumn("region", F.lit(None).cast("string")),
        ["raw_events"],
        materialization="ephemeral",
    )
    reg.model("stg_earthquake", stg_earthquake, ["cleaned"], materialization="table")
    reg.model(
        "fact_earthquake_data",
        fact_earthquake_data,
        ["stg_earthquake"],
        materialization="table",
    )
    for name, fn in ANALYTICS_MODELS.items():
        reg.model(name, fn, ["fact_earthquake_data"], materialization="view")

    results = reg.run()
    fact = results["fact_earthquake_data"]
    assert fact.count() > 0
    assert {"event_id", "severity", "event_year", "event_decade"} <= set(fact.columns)
    # views are registered for spark.sql access (the dbt-view analog)
    assert spark.sql("SELECT * FROM yearly_earthquake_stats").count() > 0
    # table materialization persisted to the warehouse dir
    assert (tmp_path / "wh" / "fact_earthquake_data").exists()


def test_registry_cycle_detection(spark):
    reg = ModelRegistry(spark)
    reg.model("a", lambda df: df, ["b"])
    reg.model("b", lambda df: df, ["a"])
    with pytest.raises(ValueError, match="cycle"):
        reg.run()
