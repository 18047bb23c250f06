"""Golden pipeline tests: synthetic raw events → clean → stg → fact → models
(FIXTURES.md F1/F4 invariants; SURVEY.md §5 notebook-derived checks)."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from earthquake_data_pipeline_spark.operators.cleaning import clean_events
from earthquake_data_pipeline_spark.plans.models import (
    ANALYTICS_MODELS,
    fact_earthquake_data,
    stg_earthquake,
)
from earthquake_data_pipeline_spark.schemas import RAW_EVENT_SCHEMA


def _ms(y, m, d):
    return int(dt.datetime(y, m, d, tzinfo=dt.timezone.utc).timestamp() * 1000)


@pytest.fixture(scope="module")
def raw(spark):
    rows = [
        # (place, time_ms, magnitude, lat, lon, depth, alert, tsunami, tz, type)
        ("10 km SE of Tokyo, Japan", _ms(2011, 3, 11), 9.1, 38.3, 142.4, 29.0, "red", 1, None, "earthquake"),
        ("10 km SE of Tokyo, Japan", _ms(2011, 3, 11), 9.1, 38.3, 142.4, 29.0, "red", 1, None, "earthquake"),  # dup key
        ("off the coast of Chile", _ms(1960, 5, 22), 9.5, -38.1, -73.4, None, "red", 1, None, "earthquake"),
        ("Nevada test site", _ms(1968, 4, 26), 5.2, 37.2, -116.2, 1.0, None, 0, None, "nuclear explosion"),
        ("nowhere", _ms(2020, 1, 1), 20.0, 0.0, 0.0, 1.0, None, 0, None, "earthquake"),   # mag out of range
        ("bad lat", _ms(2020, 1, 1), 5.0, 95.0, 0.0, 1.0, None, 0, None, "earthquake"),   # lat out of range
        ("null mag", _ms(2020, 1, 1), None, 0.0, 0.0, 1.0, None, 0, None, "earthquake"),  # dropped
        ("too old", _ms(1400, 1, 1), 5.0, 0.0, 0.0, 1.0, None, 0, None, "earthquake"),    # before min_date
        ("quiet town", _ms(2005, 7, 9), 3.2, 10.0, 10.0, 12.0, "green", 0, None, "earthquake"),
    ]
    return spark.createDataFrame(rows, RAW_EVENT_SCHEMA)


def test_clean_invariants(spark, raw):
    cleaned = clean_events(raw)
    rows = cleaned.collect()
    # count-invariance census: 9 raw - 1 dup - 4 invalid = 4 survivors
    assert len(rows) == 4
    assert cleaned.filter(F.col("magnitude").isNull()).count() == 0
    assert cleaned.filter(F.col("depth").isNull()).count() == 0
    # null depth was filled with 0
    chile = [r for r in rows if "Chile" in r.place][0]
    assert chile.depth == 0.0
    # dedup key uniqueness
    assert cleaned.select("place", "earthquake_datetime").distinct().count() == 4


def test_stg_fact_schema_and_derivations(spark, raw):
    cleaned = clean_events(raw).withColumn("country", F.lit(None).cast("string")) \
        .withColumn("region", F.lit(None).cast("string"))
    fact = fact_earthquake_data(stg_earthquake(cleaned))
    rows = {r.place: r for r in fact.collect()}
    tokyo = rows["10 km SE of Tokyo, Japan"]
    assert tokyo.severity == "Great" and tokyo.event_year == 2011 and tokyo.event_decade == 2010
    assert len(tokyo.event_id) == 32  # md5 hex surrogate
    nevada = rows["Nevada test site"]
    assert nevada.severity == "Moderate" and nevada.event_decade == 1960
    assert rows["quiet town"].severity == "Minor"


def test_analytics_models_run(spark, raw):
    cleaned = clean_events(raw).withColumn(
        "country", F.when(F.col("place").contains("Japan"), "Japan")
    ).withColumn("region", F.when(F.col("place").contains("Japan"), "Asia"))
    fact = fact_earthquake_data(stg_earthquake(cleaned))
    for name, model in ANALYTICS_MODELS.items():
        out = model(fact)
        assert out.count() >= 0, name
    yearly = ANALYTICS_MODELS["yearly_earthquake_stats"](fact).collect()
    assert [r.year for r in yearly] == sorted(r.year for r in yearly)
    # mag > 3 filter: 'quiet town' (3.2) qualifies, so 4 rows across years
    assert sum(r.earthquake_count for r in yearly) == 4
    tsu = ANALYTICS_MODELS["tsunami_flags"](fact).collect()
    assert len(tsu) == 1 and tsu[0].country == "Japan"
    assert tsu[0].percent_tsunami_flagged == 100.0


def test_expectation_report_semantics(spark):
    from earthquake_data_pipeline_spark.operators.quality import (
        expectation_report,
    )

    df = spark.createDataFrame(
        [
            (1, "a", 5.0),
            (1, "a", -3.0),   # duplicate id + below range
            (None, "b", 50.0),  # null id
            (3, "zzz", 200.0),  # bad value + above range
            (4, None, None),    # nulls never violate unique/values/range
        ],
        "id long, cat string, v double",
    )
    suite = [
        ("not_null", "id"),
        ("unique", "id"),
        ("accepted_values", "cat", ["a", "b"]),
        ("between", "v", 0.0, 100.0),
    ]
    out = {
        (r["expectation"], r["column"]): (r["n_violations"], r["passed"])
        for r in expectation_report(df, suite).collect()
    }
    assert out[("not_null", "id")] == (1, False)
    assert out[("unique", "id")] == (1, False)       # one extra '1'
    assert out[("accepted_values", "cat")] == (1, False)  # 'zzz'
    assert out[("between", "v")] == (2, False)       # -3 and 200
    clean = expectation_report(df.filter("id = 4"), [("not_null", "cat")])
    assert clean.collect()[0]["n_violations"] == 1


def test_expectation_report_single_pass_plan(spark):
    from earthquake_data_pipeline_spark.operators.quality import (
        expectation_report,
    )

    df = spark.range(100).selectExpr("id", "cast(id as double) v")
    rep = expectation_report(
        df, [("not_null", "id"), ("between", "v", 0.0, 1e9)]
    )
    plan = rep._jdf.queryExecution().executedPlan().toString()
    # the whole suite is ONE aggregation over ONE scan — adding
    # expectations must not add passes
    assert plan.count("Scan") <= 2  # range scan (+reused exchange view)
    assert "Generate explode" in plan or "Generate" in plan
