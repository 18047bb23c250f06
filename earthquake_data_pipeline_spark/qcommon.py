"""Shared helpers for the driver-facing query catalogs.

Kept in a leaf module so both driver_queries and driver_queries_ext can
import them without a cycle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name == "events":
        # events.ts is parquet TIMESTAMP(NANOS), which Spark's vectorized
        # reader rejects; read the raw int64 nanos and convert (floor to
        # micros — exactly DuckDB's nanos→micros truncation).
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        raw = spark.read.parquet(f"{sf_dir}/events.parquet")
        return raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _utc(spark: SparkSession) -> None:
    # The driver owns the SparkSession; pin UTC at runtime so parquet
    # timestamps collate identically to DuckDB's UTC-naive timestamps.
    spark.conf.set("spark.sql.session.timeZone", "UTC")


def _fanout(df: DataFrame) -> DataFrame:
    """Widen a narrow scan before CPU-heavy per-row work (hashing, regex,
    vector math).

    A file smaller than maxPartitionBytes scans as ONE partition, which
    serializes the expensive expression chain on one core no matter how
    many the session has. On a real cluster the scan is already wide, the
    guard is false, and no shuffle is added — so this never becomes a
    100-TB repartition; it only fires for small inputs where the shuffle
    is trivially cheap.
    """
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


def round6x(col):
    """Engine-neutral 6-dp rounding for a double that is BIT-IDENTICAL in
    both engines (per-row expressions, int/int divisions — NOT raw float
    sums, which need decimal accumulation first).

    Plain round(double, 6) diverges between engines when the value sits
    on a 7+-dp tie (Spark rounds the shortest decimal representation,
    DuckDB the scaled binary value) — and small-integer ratios hit such
    ties SYSTEMATICALLY (x/128 always ends in ...5 at its 7th digit).
    Routing through decimal makes it deterministic: the double→
    decimal(18,12) cast is tie-free in practice (a ratio's binary
    expansion does not terminate on a 1e-12 grid), and rounding an exact
    decimal is HALF_UP in Spark and half-away-from-zero in DuckDB —
    identical for non-negative values.

    The DuckDB twin is: CAST(round(CAST(x AS DECIMAL(18,12)), 6) AS DOUBLE).
    """
    return F.round(col.cast("decimal(18,12)"), 6).cast("double")
