"""Engine-fact drift pins — twenty-first hostile axis (r15).

The oracle conventions lean on BEHAVIOR FACTS of the two engines that
no API contract guarantees across versions: which functions truncate
vs floor, where NULLs sort, what a decimal cast silently does to NaN,
that xxhash64/md5 are bit-stable (deterministic sampling and surrogate
keys replay ONLY if they are), how ntile splits remainders. Several are
pinned as suite tests beside the code that relies on them — but a
PySpark or DuckDB upgrade would surface as scattered hash mismatches
long before anyone re-read those tests. This axis is the single sweep
the r14 VERDICT ordered (item 7): one probe per pinned fact, Spark side
and DuckDB side, failing LOUD with the convention's name so an upgrade
names its own damage.

Probes assert CURRENT behavior exactly; a FAIL means the engine fact
drifted and every oracle convention citing it must be re-adjudicated —
the referenced docstrings say which (qcommon.epoch_s, qcommon.round6x,
qcommon.nonfinite_flag, operators/layout.zorder_key,
operators/curation.quality_decile_stats, operators/sampling,
functions/scalar.surrogate_key, tests/test_functions.py).

Usage: python tools/drift_pin_check.py
"""

from __future__ import annotations

import datetime
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

FAILURES: list[str] = []


def probe(name: str, got, want) -> None:
    ok = got == want
    print(f"{'PASS' if ok else 'FAIL'} {name}: got={got!r}"
          + ("" if ok else f" want={want!r}"), flush=True)
    if not ok:
        FAILURES.append(name)


def spark_probes() -> None:
    from pyspark.sql import functions as F

    from earthquake_data_pipeline_spark.qcommon import epoch_s, nonfinite_flag
    from earthquake_data_pipeline_spark.session import get_spark

    spark = get_spark(app_name="edps-drift-pins", cpus=4,
                      shuffle_partitions=4)
    spark.conf.set("spark.sql.session.timeZone", "UTC")

    # S1/S2 — pre-1970 fractional second: unix_timestamp TRUNCATES
    # toward zero, epoch_s (CAST AS LONG of the µs) FLOORS, unix_millis
    # floors. qcommon.epoch_s and every day/second bucket rely on this.
    ts = datetime.datetime(1969, 12, 31, 23, 59, 59, 500000)
    row = (spark.createDataFrame([(ts,)], "ts timestamp")
           .select(F.unix_timestamp("ts").alias("u"),
                   epoch_s("ts").alias("e"),
                   F.unix_millis("ts").alias("ms"),
                   F.unix_micros(F.date_trunc("second", "ts")).alias("dt"))
           .first())
    probe("spark.unix_timestamp_truncates_pre1970", row["u"], 0)
    probe("spark.epoch_s_floors_pre1970", row["e"], -1)
    probe("spark.unix_millis_floors_pre1970", row["ms"], -500)
    probe("spark.date_trunc_second_floors_pre1970", row["dt"], -1_000_000)

    # S3 — non-finite discipline's founding facts: CAST(NaN/Inf AS
    # DECIMAL) silently NULL under ANSI; floor()->long SATURATES.
    probe("spark.ansi_enabled_in_session",
          spark.conf.get("spark.sql.ansi.enabled"), "true")
    row = (spark.createDataFrame(
            [(float("nan"),), (float("inf"),), (1.0,)], "v double")
           .agg(F.sum(F.col("v").cast("decimal(18,6)")).alias("s"),
                F.max(F.floor("v").cast("long")).alias("fl"))
           .first())
    probe("spark.nonfinite_decimal_cast_silent_null", str(row["s"]),
          "1.000000")
    probe("spark.floor_inf_long_saturates", row["fl"], 9223372036854775807)
    row = (spark.createDataFrame([(float("nan"),), (float("inf"),),
                                  (float("-inf"),), (2.0,)], "v double")
           .agg(F.sum(nonfinite_flag("v").cast("int")).alias("n")).first())
    probe("spark.nonfinite_flag_counts_nan_and_infs", row["n"], 3)

    # S4 — ASC sort is NULLS FIRST (why null scores are out of contract
    # for the decile family: DuckDB defaults NULLS LAST).
    got = [r["v"] for r in spark.createDataFrame(
        [(2,), (None,), (1,)], "v int").orderBy("v").collect()]
    probe("spark.asc_sort_nulls_first", got, [None, 1, 2])

    # S5/S6 — pmod vs DIV on negatives: zorder_key uses pmod BECAUSE
    # plain % keeps the dividend sign; DIV truncates toward zero, so
    # the engine only ever applies it to non-negative operands.
    row = (spark.range(1)
           .select(F.pmod(F.lit(-7), F.lit(16)).alias("p"),
                   F.expr("-7 DIV 2").alias("d"),
                   F.expr("-7 % 2").alias("m")).first())
    probe("spark.pmod_nonnegative", row["p"], 9)
    probe("spark.div_truncates_toward_zero", row["d"], -3)
    probe("spark.percent_keeps_dividend_sign", row["m"], -1)

    # S7 — Java \s matches VERTICAL TAB (the corpus excludes \x0B
    # because RE2/DuckDB disagrees — test_testdata_contract).
    row = (spark.createDataFrame([("a\x0bb",)], "t string")
           .select(F.size(F.split("t", r"\s+")).alias("n")).first())
    probe("spark.java_regex_s_matches_vertical_tab", row["n"], 2)

    # S8 — ntile remainder distribution (standard SQL: fat bins first).
    from pyspark.sql import Window
    df = spark.range(25).withColumn(
        "b", F.ntile(10).over(Window.orderBy("id")))
    sizes = [r["c"] for r in
             df.groupBy("b").agg(F.count("*").alias("c")).orderBy("b")
             .collect()]
    probe("spark.ntile_fat_bins_first", sizes, [3, 3, 3, 3, 3, 2, 2, 2, 2, 2])

    # S9/S10 — hash bit-stability: deterministic sampling, salting,
    # minhash, and surrogate keys replay ONLY if these never drift.
    row = (spark.createDataFrame([("spark-graft",)], "t string")
           .select(F.xxhash64("t").alias("x"), F.md5("t").alias("m"),
                   F.hash("t").alias("h"),
                   F.sha2(F.lit("spark-graft"), 256).alias("s")).first())
    probe("spark.xxhash64_stable", row["x"], -5720403291101398215)
    probe("spark.murmur3_hash_stable", row["h"], 205319725)
    probe("spark.md5_stable", row["m"], "43310bf7538236ef205f00e6141945c9")
    probe("spark.sha256_stable", row["s"],
          "3cf10fa81d881c9a6917d464fb77a7ec1328dd26a266068b52a2859afa8e2767")

    # S11 — string comparison is binary UTF8 (locale axis relies on it).
    row = spark.range(1).select((F.lit("Z") < F.lit("a")).alias("c")).first()
    probe("spark.binary_string_collation", row["c"], True)

    # S12 — decimal round is HALF_UP on the 7-dp tie (round6x contract).
    row = (spark.range(1)
           .select(F.round(F.lit("0.0000005").cast("decimal(18,12)"), 6)
                   .cast("string").alias("r")).first())
    probe("spark.decimal_round_half_up", row["r"], "0.000001")

    # S13 — sequence() is inclusive on both ends (decile explode).
    row = spark.range(1).select(F.sequence(F.lit(1), F.lit(3)).alias("s")
                                ).first()
    probe("spark.sequence_inclusive", row["s"], [1, 2, 3])

    # S14 — tumbling windows align to the epoch grid in UTC (stream I2
    # windows equal date_trunc('day') only under this alignment).
    row = (spark.createDataFrame(
            [(datetime.datetime(2024, 3, 5, 23, 59, 59),)], "ts timestamp")
           .select(F.window("ts", "1 day").alias("w"))
           .select(F.unix_micros("w.start").alias("s")).first())
    probe("spark.window_epoch_aligned_utc", row["s"],
          1709596800000000)  # 2024-03-05 00:00:00 UTC
    spark.stop()


def duckdb_probes() -> None:
    import duckdb

    con = duckdb.connect()

    # D1 — integer // TRUNCATES toward zero in DuckDB (the reason
    # oracles only apply it to divisor-aligned numerators).
    probe("duckdb.intdiv_truncates_toward_zero",
          con.execute("SELECT -7 // 2").fetchone()[0], -3)

    # D2 — the exact-floor oracle route: epoch_us(date_trunc) // k
    # floors pre-1970 (matches Spark's epoch_s -1 above).
    got = con.execute(
        "SELECT epoch_us(date_trunc('second', "
        "TIMESTAMP '1969-12-31 23:59:59.5')) // 1000000").fetchone()[0]
    probe("duckdb.date_trunc_floor_route_pre1970", got, -1)

    # D3 — epoch_ms TRUNCATES (why the oracles avoid it).
    probe("duckdb.epoch_ms_truncates_pre1970",
          con.execute("SELECT epoch_ms(TIMESTAMP '1969-12-31 23:59:59.9995')"
                      ).fetchone()[0], -0)

    # D4 — ORDER BY ASC default is NULLS LAST (opposite of Spark).
    got = [r[0] for r in con.execute(
        "SELECT v FROM (VALUES (2), (NULL), (1)) t(v) ORDER BY v"
    ).fetchall()]
    probe("duckdb.asc_sort_nulls_last", got, [1, 2, None])

    # D5 — ntile remainder distribution matches Spark's.
    sizes = [r[0] for r in con.execute(
        "WITH s AS (SELECT range AS id FROM range(25)),"
        " b AS (SELECT ntile(10) OVER (ORDER BY id) AS b FROM s)"
        " SELECT count(*) FROM b GROUP BY b ORDER BY b").fetchall()]
    probe("duckdb.ntile_fat_bins_first", sizes,
          [3, 3, 3, 3, 3, 2, 2, 2, 2, 2])

    # D6 — decimal round half-up on the same 7-dp tie (round6x mirror).
    probe("duckdb.decimal_round_half_up",
          str(con.execute("SELECT round(CAST(0.0000005 AS DECIMAL(18,12)),"
                          " 6)").fetchone()[0]), "0.000001")

    # D7 — RE2 \s does NOT match \x0B (why the corpus excludes it).
    probe("duckdb.re2_s_ignores_vertical_tab",
          con.execute("SELECT len(regexp_split_to_array('a' || chr(11) ||"
                      " 'b', '\\s+'))").fetchone()[0], 1)

    # D8 — md5 parity with Spark (surrogate-key cross-engine equality).
    probe("duckdb.md5_matches_spark",
          con.execute("SELECT md5('spark-graft')").fetchone()[0],
          "43310bf7538236ef205f00e6141945c9")

    # D9 — BIGINT sum widens to HUGEINT instead of overflowing (oracle
    # aggregate sums never need decimal guards for pure-int inputs).
    probe("duckdb.bigint_sum_widens",
          con.execute("SELECT sum(v) FROM (VALUES (4611686018427387904),"
                      " (4611686018427387904)) t(v)").fetchone()[0],
          9223372036854775808)

    # D10 — string comparison is binary in the default collation.
    probe("duckdb.binary_string_collation",
          con.execute("SELECT 'Z' < 'a'").fetchone()[0], True)


def main() -> int:
    duckdb_probes()
    spark_probes()
    n_failed = len(FAILURES)
    if n_failed:
        print(f"drift-pins: {n_failed} FACT(S) DRIFTED: "
              + ", ".join(FAILURES))
        return 1
    print("drift-pins: all pinned engine facts hold on "
          "this PySpark/DuckDB pair")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
