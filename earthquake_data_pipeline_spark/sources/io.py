"""Source/sink helpers (SURVEY.md §2.1 S3-S7, S9-S12; §2.9 I2 layout).

Thin, deliberate wrappers: each encodes one decision the reference made
ad hoc (schema-on-read, output file counts, month layout, DDL patterns)
as an explicit engine policy.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def read_csv(
    spark: SparkSession, path: str, schema: T.StructType, header: bool = True
) -> DataFrame:
    """S4 — CSV scan with an EXPLICIT schema. The reference infers
    (clean_historical.py:18), which costs a full extra file pass and yields
    drifting types; the engine always declares (§1.3)."""
    return spark.read.schema(schema).option("header", str(header).lower()).csv(path)


def write_csv(df: DataFrame, path: str, mode: str = "append") -> None:
    """S3 — CSV sink; Spark handles header-per-file (vs the reference's
    manual first-chunk header toggle, add_region_chunks.py:80-81)."""
    df.write.mode(mode).option("header", "true").csv(path)


def write_parquet(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    num_files: int | None = None,
    shrink_only: bool = True,
) -> None:
    """S6 — Parquet sink with output-file-count control.

    ``shrink_only=True`` uses coalesce (no shuffle) — the right call when
    reducing partitions, as in the reference's post-clean write
    (clean_historical.py:52-56); ``False`` forces a repartition shuffle
    for increasing/balancing. NEVER write to a path the input plan reads
    (the reference's self-overwrite hazard, SURVEY §3.1 step 6)."""
    if num_files is not None:
        df = df.coalesce(num_files) if shrink_only else df.repartition(num_files)
    df.write.mode(mode).parquet(path)


def write_month_partitioned(
    df: DataFrame, path: str, ts_col: str, mode: str = "overwrite"
) -> None:
    """I2 — month-partitioned layout: partition pruning turns incremental
    reads into O(new months), the property that keeps I1 cost flat at
    100 TB (merge only ever scans the months the increment touches)."""
    out = df.withColumn(
        "event_month", F.date_format(F.col(ts_col), "yyyy-MM")
    )
    out.write.mode(mode).partitionBy("event_month").parquet(path)


def write_table(
    df: DataFrame, path: str, fmt: str = "parquet", mode: str = "overwrite"
) -> None:
    """Format-parameterized sink over Spark's built-in writers (parquet /
    orc / json-lines / csv) — one policy point for the format decision so
    pipelines swap columnar formats without touching call sites. ORC and
    JSONL carry schemas end-to-end like parquet; CSV callers should pair
    with ``read_csv``'s explicit schema."""
    df.write.mode(mode).format(fmt).save(path)


def read_table(
    spark: SparkSession,
    path: str,
    fmt: str = "parquet",
    schema: T.StructType | None = None,
) -> DataFrame:
    """Format-parameterized scan. Pass ``schema`` for the self-describing
    formats too when the pipeline owns the contract — skipping inference
    saves a file-listing pass for JSONL and pins types across writers."""
    reader = spark.read.format(fmt)
    if schema is not None:
        reader = reader.schema(schema)
    return reader.load(path)


def register_external(
    spark: SparkSession, name: str, path: str, fmt: str = "parquet"
) -> DataFrame:
    """S10 — external-table-over-files: read + temp view (the BigQuery
    CREATE EXTERNAL TABLE analog, README.md:83-87)."""
    df = spark.read.format(fmt).load(path)
    df.createOrReplaceTempView(name)
    return df


def ctas(spark: SparkSession, name: str, select_sql: str) -> DataFrame:
    """S11 — CREATE TABLE AS SELECT into a temp-view materialization
    fence (localCheckpoint: compute once, reuse)."""
    df = spark.sql(select_sql).localCheckpoint(eager=True)
    df.createOrReplaceTempView(name)
    return df


def empty_clone(df: DataFrame) -> DataFrame:
    """S12 — schema-only copy (WHERE 1=0, README.md:92-94)."""
    return df.filter(F.lit(False))
