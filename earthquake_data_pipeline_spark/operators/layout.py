"""Data-layout operators: Z-order (Morton) clustering for multi-column
data skipping.

At 100 TB the cheapest query is the one that never reads the file:
parquet row-group/file min-max stats prune scans, but only if the data
is laid out so each file covers a SMALL range of the filtered columns.
Sorting clusters one column perfectly and leaves the others unsorted;
interleaving the bits of several columns (the Morton / Z-order curve)
bounds EVERY interleaved column's range per file — the layout trick
behind Delta/Iceberg ``OPTIMIZE ZORDER BY``.

The key here is built from pure integer arithmetic (div/mod/multiply,
no engine-specific bit intrinsics), which keeps it inside whole-stage
codegen AND makes it bit-identically replayable by a SQL oracle —
the determinism contract every operator in this repo follows.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def zorder_key(cols: list[Column | str], bits: int = 16) -> Column:
    """Morton-interleave the low ``bits`` bits of each column into one
    LONG sort key: bit b of column i lands at position len(cols)*b + i.

    Values are taken pmod 2**bits (floor-mod, always non-negative) so
    the key really is total for ANY integer input — Spark's plain ``%``
    preserves the dividend's sign, which would make negative inputs
    produce meaningless bit extractions. With the default 16 bits and 2
    columns the key spans 32 bits — small enough for exact DOUBLE-free
    arithmetic in any engine. The expression is 2·bits constant-folded
    terms of ((c div 2^b) % 2) · 2^(n·b+i): pure codegen, no shuffle,
    no UDF.
    """
    n = len(cols)
    if n * bits > 62:
        raise ValueError(f"{n} cols × {bits} bits overflows a signed long")
    terms = []
    for i, c in enumerate(cols):
        col = F.col(c) if isinstance(c, str) else c
        col = F.pmod(col.cast("long"), F.lit(1 << bits))
        for b in range(bits):
            terms.append(
                ((col / F.lit(1 << b)).cast("long") % 2)
                * F.lit(1 << (n * b + i))
            )
    out = terms[0]
    for t in terms[1:]:
        out = out + t
    return out.cast("long")


def compaction_plan(
    files: DataFrame,
    partition_col: str = "source",
    id_col: str = "doc_id",
    size_col: str = "n_chars",
    target_bytes: int = 4096,
) -> DataFrame:
    """Small-file compaction planner: assign each file to a rewrite bin
    of ≈ ``target_bytes`` per table partition, in ONE closed-form window
    pass — no iterative packing loop, no driver-side state.

    The assignment is next-fit over a size-DESCENDING walk (the FFD
    ordering): files are ordered (size desc, id), the EXCLUSIVE running
    total is divided by the target, and the floor is the raw bin; a
    dense_rank over raw bins renumbers them contiguously (an oversized
    file advances the floor by >1, leaving index gaps). Guarantees, all
    from the arithmetic: bins are consecutive runs of the walk; every
    bin's total is < target + its last file's size (≤ 2×target when all
    files are under target); a file ≥ target sits alone in its bin.

    Scale shape: this plans over file METADATA — one row per file, ~1e6
    rows for a 100 TB table — so the per-partition windows are trivial
    next to the data-scale rewrite jobs the plan drives (one
    read-coalesce-write per bin). Both windows share one partition-key
    exchange. Everything is integer arithmetic: the plan replays
    bit-identically in any engine.

    Returns the per-file assignment (partition, id, size, bin_id);
    aggregate by (partition, bin_id) for the audit/plan summary.
    """
    w_walk = (
        Window.partitionBy(partition_col)
        .orderBy(F.desc(size_col), id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # exclusive-cumsum div target, truncation == floor since both are
    # non-negative; exact while per-partition totals < 2^53 (9 PB — the
    # zorder_key div/cast idiom and bound)
    raw_bin = (
        (F.sum(size_col).over(w_walk) - F.col(size_col)) / F.lit(target_bytes)
    ).cast("long")
    w_dense = Window.partitionBy(partition_col).orderBy("raw_bin")
    return (
        files.select(partition_col, id_col, size_col)
        .withColumn("raw_bin", raw_bin)
        .withColumn("bin_id", F.dense_rank().over(w_dense))
        .drop("raw_bin")
    )


def write_zordered(
    df: DataFrame,
    path: str,
    cols: list[str],
    bits: int = 16,
    n_files: int = 8,
    fmt: str = "parquet",
) -> None:
    """Write ``df`` clustered along the Z-order curve of ``cols``:
    range-partition by the Morton key (each output file owns one key
    range → one bounded region of the multi-dim space), sort within
    partitions so row groups inherit the locality, drop the key.

    On a cluster this is exactly the Delta/Iceberg OPTIMIZE shape:
    one range shuffle, then embarrassingly parallel sorted writes; the
    min-max stats written per file/row-group are what later scans prune
    on.
    """
    keyed = df.withColumn("_zorder", zorder_key(cols, bits))
    (
        keyed.repartitionByRange(n_files, "_zorder")
        .sortWithinPartitions("_zorder")
        .drop("_zorder")
        .write.format(fmt)
        .mode("overwrite")
        .save(path)
    )


def zone_maps(
    df: DataFrame,
    file_col: Column,
    value_col: Column,
) -> DataFrame:
    """Per-file zone maps (min/max/count of a sort-relevant column) —
    the file-statistics table every lake format (Parquet footers, Delta
    `stats`, Iceberg manifests) keeps so the planner can prune files
    without opening them. `file_col` simulates the writer's file
    assignment (a date-range layout, a hash layout, a z-order bucket —
    see write_zordered); at 100 TB the real writer emits these stats
    for free, this derivation is the audit-side reconstruction.

    One hash aggregate keyed by file id: stats-table-sized output
    (#files rows), never the data.
    """
    return df.select(
        file_col.alias("file_id"), value_col.alias("v")
    ).groupBy("file_id").agg(
        F.min("v").alias("v_min"),
        F.max("v").alias("v_max"),
        F.count("*").alias("n_rows"),
    )


def skip_audit(zm: DataFrame, predicates: list[tuple[int, int, int]]) -> DataFrame:
    """Data-skipping audit: for each closed range predicate
    ``(pred_id, lo, hi)``, how many files the zone maps let the scanner
    skip (`v_max < lo OR v_min > hi`) and how many rows the surviving
    files still force it to read. The gap between `rows_scanned` and
    the true match count is the scan amplification a bad layout costs —
    the quantitative argument for zorder/clustering at 100 TB.

    Predicates are a handful of literals: they broadcast-cross the
    stats table (#files × #preds rows), never touch the data.
    """
    preds = zm.sparkSession.createDataFrame(
        predicates, "pred_id int, lo bigint, hi bigint"
    )
    hit = ~((F.col("v_max") < F.col("lo")) | (F.col("v_min") > F.col("hi")))
    return (
        zm.crossJoin(F.broadcast(preds))
        .groupBy("pred_id", "lo", "hi")
        .agg(
            F.count("*").cast("long").alias("files_total"),
            F.sum(hit.cast("long")).cast("long").alias("files_scanned"),
            F.sum(F.when(hit, F.col("n_rows")).otherwise(F.lit(0)))
            .cast("long")
            .alias("rows_scanned"),
        )
    )
