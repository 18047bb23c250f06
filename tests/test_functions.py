"""Unit tests for Column-expression helpers (SURVEY.md §2.3, §5.3 properties)."""

from __future__ import annotations

import hashlib

from pyspark.sql import Row
from pyspark.sql import functions as F

from earthquake_data_pipeline_spark.functions.scalar import (
    case_rank,
    decade_of,
    epoch_ms_to_timestamp,
    severity_of,
    surrogate_key,
    token_pattern,
)


def test_severity_bucket_boundaries(spark):
    # D4 boundary semantics: magnitude exactly 8/7/6/5/4 (FIXTURES.md §5.3).
    rows = [(8.0, "Great"), (7.9, "Major"), (7.0, "Major"), (6.0, "Strong"),
            (5.0, "Moderate"), (4.0, "Light"), (3.99, "Minor"), (-1.0, "Minor")]
    df = spark.createDataFrame([(m,) for m, _ in rows], ["magnitude"])
    got = df.select("magnitude", severity_of("magnitude").alias("s")).collect()
    expected = dict(rows)
    for r in got:
        assert r.s == expected[r.magnitude], r


def test_decade_boundaries(spark):
    # D3: years x0 and x9 land in the same decade (FIXTURES.md §5.3).
    df = spark.createDataFrame(
        [("1990-01-01",), ("1999-12-31",), ("2000-01-01",), ("1905-06-15",)], ["d"]
    ).select(F.col("d").cast("timestamp").alias("ts"))
    got = [r.dec for r in df.select(decade_of("ts").alias("dec")).collect()]
    assert got == [1990, 1990, 2000, 1900]


def test_epoch_ms_roundtrip(spark):
    # D1 property: ms → timestamp → ms is the identity (exact variant).
    ms = [0, 1_700_000_000_123, -3_600_000]
    df = spark.createDataFrame([(m,) for m in ms], ["t"])
    got = df.select(
        F.unix_millis(epoch_ms_to_timestamp("t", exact=True)).alias("back")
    ).collect()
    assert [r.back for r in got] == ms


def test_surrogate_key_matches_dbt_utils(spark):
    # D6: exact dbt_utils.generate_surrogate_key semantics
    # (md5 of '-'-joined coalesced string casts, null sentinel).
    df = spark.createDataFrame(
        [Row(place="Tokyo", ts="2024-01-01 00:00:00"), Row(place=None, ts="x")]
    )
    got = [r.k for r in df.select(surrogate_key(["place", "ts"]).alias("k")).collect()]
    exp0 = hashlib.md5(b"Tokyo-2024-01-01 00:00:00").hexdigest()
    exp1 = hashlib.md5(b"_dbt_utils_surrogate_key_null_-x").hexdigest()
    assert got == [exp0, exp1]


def test_case_rank_order(spark):
    df = spark.createDataFrame([("red",), ("green",), ("???",)], ["alert"])
    ranks = {"red": 1, "orange": 2, "yellow": 3, "green": 4}
    got = [r.r for r in df.select(case_rank("alert", ranks, 5).alias("r")).collect()]
    assert got == [1, 4, 5]


def test_token_pattern_word_boundaries(spark):
    # D11: 'Japan' matches as a token, not inside 'Japanese'.
    df = spark.createDataFrame(
        [("off the coast of Japan",), ("Japanese trench",), ("JAPAN deep",)], ["place"]
    )
    got = [r.m for r in df.select(
        F.col("place").rlike(token_pattern("Japan")).alias("m")).collect()]
    assert got == [True, False, False]


def test_let_resists_collapse_project_duplication(spark):
    """qcommon.let (review-extracted r11): CollapseProject substitutes
    an aliased expression into EVERY downstream reference (and codegen
    CSE does not rescue lambda-bearing trees); the let form must keep
    the bound expression appearing ONCE in the optimized plan however
    many times the body references it — and produce identical values."""
    from pyspark.sql import functions as F

    from earthquake_data_pipeline_spark.qcommon import let

    base = spark.range(0, 20, 1, 2)
    h = F.md5(F.col("id").cast("string"))
    # the trap shape: one Column expression referenced from several
    # places in one projection (exactly how the lang-id ladder and the
    # cosine guard duplicated their subtrees) — each reference is a
    # fresh copy of the whole tree in the plan. (CollapseProject across
    # two selects has a multi-reference cost guard in Spark 4, so an
    # intermediate alias would NOT reproduce the trap.)
    naive = base.select("id", F.concat(h, h, h).alias("q"))
    letform = base.select(
        "id", let(h, lambda b: F.concat(b, b, b)).alias("q")
    )
    nplan = naive._jdf.queryExecution().optimizedPlan().toString()
    lplan = letform._jdf.queryExecution().optimizedPlan().toString()
    assert nplan.count("md5(") == 3  # the trap the helper exists for
    assert lplan.count("md5(") == 1  # bound once
    a = sorted((r.id, r.q) for r in naive.collect())
    b = sorted((r.id, r.q) for r in letform.collect())
    assert a == b


def test_nonfinite_flag_truth_table(spark):
    """r13: qcommon.nonfinite_flag — TRUE for NaN and ±Inf; FALSE for
    NULL and finite values (NULL-safety is the point: F.isnan(NULL)
    must not leak a NULL flag into the poison max(); isnan(Inf) is
    FALSE, which is why the flag checks |x| == inf too)."""
    from earthquake_data_pipeline_spark.qcommon import nonfinite_flag

    df = spark.createDataFrame(
        [(1, float("nan")), (2, None), (3, 0.0), (4, -0.0), (5, 1.5),
         (6, float("inf")), (7, float("-inf"))],
        "id long, v double",
    )
    got = {
        r["id"]: r["f"]
        for r in df.select("id", nonfinite_flag("v").alias("f")).collect()
    }
    assert got == {1: True, 2: False, 3: False, 4: False, 5: False,
                   6: True, 7: True}


def test_spark_nonfinite_decimal_cast_is_silent_null(spark):
    """r13 engine-fact pin: the non-finite-poisoning discipline exists BECAUSE
    CAST(NaN AS DECIMAL) is silently NULL in Spark even under ANSI
    (so a decimal sum silently drops NaN addends) and floor(NaN)
    casts to 0. If a future Spark version starts raising here, this
    test flags the assumption so the discipline can be revisited
    (the poison flags would then be belt-and-braces, not the only
    defense)."""
    assert spark.conf.get("spark.sql.ansi.enabled") == "true"
    row = (
        spark.createDataFrame(
            [(float("nan"),), (float("inf"),), (float("-inf"),), (1.0,)],
            "v double",
        )
        .agg(
            F.sum(F.col("v").cast("decimal(18,6)")).alias("s"),
            F.max(F.floor(F.col("v")).cast("long")).alias("fl"),
        )
        .collect()[0]
    )
    # NaN AND ±Inf addends all vanished from the sum (isnan(inf) is
    # False, hence nonfinite_flag, not a bare isnan); the long cast
    # SATURATES silently: floor(NaN)->0, floor(+Inf)->Long.MAX
    assert str(row["s"]) == "1.000000"
    assert row["fl"] == 9223372036854775807


def test_epoch_s_floors_where_unix_timestamp_truncates(spark):
    """r13 ts-domain axis engine-fact pin: F.unix_timestamp TRUNCATES
    TOWARD ZERO on pre-1970 fractional timestamps while CAST(ts AS
    LONG) (= qcommon.epoch_s) floor-divides the microseconds — the
    floor matches DuckDB's floor(epoch(ts)) and the calendar meaning
    of "the second the event occurred in". unix_millis, by contrast,
    already FLOORS (the two Spark functions disagree with each other).
    DuckDB-side twin facts (probed, recorded in the oracles): integer
    ``//`` TRUNCATES (-7 // 2 = -3) and epoch_ms() truncates — floors
    there are spelled via epoch_us(date_trunc(...)) // k (r14 ADVICE
    fix; see test_duckdb_date_trunc_floor_route_is_exact)."""
    import datetime

    from earthquake_data_pipeline_spark.qcommon import epoch_s

    rows = [
        (1, datetime.datetime(1969, 12, 31, 23, 59, 59, 500000)),
        (2, datetime.datetime(1970, 1, 1, 0, 0, 0, 500000)),
        (3, datetime.datetime(1904, 1, 1, 12, 0, 0, 420000)),
    ]
    df = spark.createDataFrame(rows, ["id", "ts"])
    got = {
        r["id"]: (r["u"], r["e"], r["ms"])
        for r in df.select(
            "id",
            F.unix_timestamp("ts").alias("u"),
            epoch_s("ts").alias("e"),
            F.unix_millis("ts").alias("ms"),
        ).collect()
    }
    assert got[1] == (0, -1, -500)          # truncate vs FLOOR vs floor
    assert got[2] == (0, 0, 500)            # agree on non-negative
    assert got[3][0] == got[3][1] + 1       # truncation is one second late
    assert got[3][1] == -2082801600


def test_nan_poisoned_sum_matches_native_float_semantics(spark):
    """r13: the poison pattern (max(nonfinite_flag) beside the decimal sum)
    must reproduce exactly what sum(double) does on NaN-bearing
    groups — NaN out, not a silently smaller number."""
    from earthquake_data_pipeline_spark.qcommon import nonfinite_flag

    df = spark.createDataFrame(
        [("a", 1.0), ("a", float("nan")), ("b", 2.0), ("b", 3.0)],
        "k string, v double",
    )
    got = {
        r["k"]: r["s"]
        for r in df.groupBy("k")
        .agg(
            F.when(F.max(nonfinite_flag("v")), F.lit(float("nan")))
            .otherwise(F.sum(F.col("v").cast("decimal(18,6)")).cast("double"))
            .alias("s")
        )
        .collect()
    }
    native = {
        r["k"]: r["s"]
        for r in df.groupBy("k").agg(F.sum("v").alias("s")).collect()
    }
    assert got["b"] == native["b"] == 5.0
    assert got["a"] != got["a"] and native["a"] != native["a"]  # both NaN


def test_duckdb_date_trunc_floor_route_is_exact():
    """r14 ADVICE fix, DuckDB-side engine-fact pin: the oracles spell
    "floor of ts to a second / millisecond / day bucket" as

        epoch_us(date_trunc(part, ts)) // k

    because (a) date_trunc is CALENDAR truncation — integer timestamp
    arithmetic that FLOORS for any sign (1969-12-31 23:59:59.5 →
    ...:59:59, never ...:00:00), and (b) epoch_us of the truncated
    value is an exact multiple of k, so DuckDB's truncate-toward-zero
    ``//`` cannot round it — exact over the full timestamp range.

    The routes they replace were NOT exact (probed, r13 ADVICE):
    - CAST(floor(CAST(epoch_us(ts) AS DECIMAL(20,0)) / 1000) AS BIGINT)
      lowers DECIMAL/INT division to DOUBLE — past 2^53 us (~2255) a
      ...999-us timestamp floors to the WRONG millisecond;
    - CAST(floor(epoch(ts)) AS BIGINT) rides epoch(ts) DOUBLE, whose
      granularity passes 2 us beyond 2^33 s (~2242) — a latent
      one-second shift for far-future rows near a boundary.
    """
    import duckdb

    con = duckdb.connect()
    cases = [
        # (ts literal, floor_s, floor_ms, floor_day)
        ("TIMESTAMP '1969-12-31 23:59:59.5'", -1, -500, -1),
        ("TIMESTAMP '1969-12-31 23:59:59.000001'", -1, -1000, -1),
        ("TIMESTAMP '1970-01-01 00:00:00'", 0, 0, 0),
        ("TIMESTAMP '1969-12-31 00:00:00.5'", -86400, -86399500, -1),
        ("TIMESTAMP '1969-12-30 23:59:59.5'", -86401, -86400500, -2),
        # +250y, 1999 us past an exact millisecond: the old decimal
        # route answered 9656409600002 here (double rounding)
        ("TIMESTAMP '2276-01-01 00:00:00.001999'",
         9656409600, 9656409600001, 111764),
    ]
    for ts, want_s, want_ms, want_day in cases:
        got = con.execute(
            f"""SELECT
                  epoch_us(date_trunc('second', {ts})) // 1000000,
                  epoch_us(date_trunc('millisecond', {ts})) // 1000,
                  epoch_us(date_trunc('day', {ts})) // 86400000000,
                  typeof(epoch_us(date_trunc('second', {ts})) // 1000000)
            """
        ).fetchone()
        assert got == (want_s, want_ms, want_day, "BIGINT"), (ts, got)
    # and the decimal route's documented failure, kept as the probe
    # that motivated the rewrite:
    bad = con.execute(
        "SELECT CAST(floor(CAST(9656409600001999 AS DECIMAL(20,0)) / 1000)"
        " AS BIGINT), 9656409600001999 // 1000"
    ).fetchone()
    assert bad == (9656409600002, 9656409600001)
