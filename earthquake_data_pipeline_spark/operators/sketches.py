"""Mergeable frequency sketches: Misra-Gries heavy hitters and a
Count-Min sketch.

The 100 TB question "which keys dominate this column" cannot afford a
full groupBy when the key space is huge (URLs, user ids, n-grams): the
exact answer shuffles every distinct key. Misra-Gries answers it in one
map-only pass with k counters per partition and a trivial merge, with a
HARD guarantee (Misra & Gries 1982; Berinde et al. merge bound):

- per partition, every counter UNDERCOUNTS its item by at most
  n_p/(k+1) and never overcounts;
- summing per-partition summaries keeps the bound additive: for any
  item, true − est ≤ n/(k+1) across the whole input;
- therefore every item with true frequency > n/(k+1) has est > 0 and
  SURVIVES the sketch, under ANY partitioning of the data.

That last property is what the gate query checks: presence and error
bound are partition-proof booleans even though the raw counter values
depend on how Spark split the input — the same guarantee-not-output
oracle style as approx_stats.

Scale shape: one Arrow-batched map pass emitting ≤ k rows per
partition, one tiny groupBy over ≤ k × partitions rows. Memory is O(k)
per task regardless of input size. The per-batch inner loop runs over
``value_counts()`` output (weighted MG), not raw rows, so the Python
cost is O(distinct-per-batch), not O(rows).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def mg_partition_summaries(df: DataFrame, key_col: str, k: int = 31) -> DataFrame:
    """One Misra-Gries summary per partition: ≤ k (key, est) rows whose
    counts undercount truth by at most n_partition/(k+1)."""
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("key", T.StringType(), False),
            T.StructField("est", T.LongType(), False),
        ]
    )

    def fn(batches):
        import pandas as pd

        counters: dict[str, int] = {}
        for pdf in batches:
            # weighted MG: fold each batch's exact value_counts into the
            # counter set — equivalent guarantee, vectorized counting
            for key, c in pdf[key_col].value_counts().items():
                c = int(c)
                if key in counters:
                    counters[key] += c
                elif len(counters) < k:
                    counters[key] = c
                else:
                    # decrement ALL counters by the largest amount the
                    # incoming weight and the current minimum allow
                    dec = min(c, min(counters.values()))
                    counters = {
                        kk: vv - dec for kk, vv in counters.items() if vv > dec
                    }
                    c -= dec
                    if c > 0:
                        if key in counters:
                            counters[key] += c
                        elif len(counters) < k:
                            counters[key] = c
        yield pd.DataFrame(
            {"key": list(counters.keys()), "est": list(counters.values())}
        )

    return df.select(F.col(key_col).alias(key_col)).mapInPandas(fn, schema)


def heavy_hitters_sketch(df: DataFrame, key_col: str, k: int = 31) -> DataFrame:
    """Merged global sketch: sum the per-partition summaries. Any key
    with true count > n/(k+1) is guaranteed present with
    true − n/(k+1) ≤ est ≤ true."""
    return (
        mg_partition_summaries(df, key_col, k)
        .groupBy("key")
        .agg(F.sum("est").alias("est"))
    )


def cms_auto_width(n_distinct_hint: int, floor: int = 64) -> int:
    """Scale-safe Count-Min width from a distinct-key estimate: the next
    power of two ≥ 2 × the hint, floored at ``floor`` (the historical
    default).

    Why auto-size (round-10 constants sweep, DESIGN.md): a FIXED
    width=64 grid is fine while distinct keys ≲ width (45 keys → mean
    relative overestimate 0.21) but collision mass explodes past it —
    at 358 distinct keys the sweep measured mean rel err 10.9 and max
    677 on a zipf-ish mix, i.e. the point estimates become noise. With
    width = next-pow2(2·distinct) the same mixes stay at mean rel err
    0.14–0.62 across 2k→128k rows. Memory cost is depth × width
    counters — 3 × 1024 longs for half a million distinct keys — so
    over-sizing is cheap and under-sizing is the only real failure
    mode. Get the hint from ``approx_count_distinct`` (one cheap pass /
    an existing column statistic); like ivf auto-nlist (round 8), the
    hint only tunes accuracy, never correctness: any width yields the
    same one-sided est ≥ true guarantee and the SQL oracle replays
    whatever width is used.

    Power of two keeps widths comparable across runs (and the pmod
    cheap); NOT used for mergeability — sketches merge only at EQUAL
    (depth, width), which callers must pin, auto or not.
    """
    n = max(1, int(n_distinct_hint))
    return max(int(floor), 1 << (2 * n - 1).bit_length())


def _cms_bucket(key, j: int, width: int):
    """Row j's bucket for ``key``: the repo-standard md5-prefix integer
    of the salted key, floor-mod width — engine-neutral and exactly
    replayable in SQL (no probabilistic seeding, no engine RNG)."""
    c = F.col(key) if isinstance(key, str) else key
    h = F.conv(
        F.substring(F.md5(F.concat(F.lit(f"cms{j}|"), c.cast("string"))), 1, 8),
        16,
        10,
    ).cast("long")
    return F.pmod(h, F.lit(width))


def cms_sketch(
    df: DataFrame,
    key_col: str,
    depth: int = 3,
    width: int = 64,
    weight_col: str | None = None,
) -> DataFrame:
    """Count-Min sketch of a key column as a (row j, bucket, n) frame —
    depth × width cells TOTAL, independent of input size.

    Count-Min (Cormode & Muthukrishnan 2005) complements Misra-Gries
    above: MG answers "which keys dominate" (top-k presence), CMS
    answers point queries "how often did THIS key occur" for any key,
    with the one-sided guarantee  true ≤ est ≤ true + εN  where
    ε ≈ e/width (the min over depth independent rows makes large
    overestimates exponentially unlikely; with deterministic md5 rows
    the bound that always holds is est ≥ true, overshoot bounded by
    collision mass actually present).

    Spark shape: each input row explodes to ``depth`` (j, bucket)
    pairs; ONE hash-aggregate with map-side combine collapses them to
    the d×w cell grid. The shuffle moves at most depth×width rows per
    task — the sketch is mergeable by construction because addition
    commutes. No UDF, no Python: md5 + pmod stay in codegen.

    Sizing: the width=64 default is only safe while distinct keys stay
    ≲ width — past that, collision mass makes point estimates useless
    (round-10 sweep: 358 keys at width 64 → mean rel err 10.9). Size
    real workloads with ``cms_auto_width(approx distinct count)``.

    ``weight_col`` (r17 optimization): feed a PRE-AGGREGATED
    (key, weight) frame and each cell sums the weights instead of
    counting rows — ``cms_sketch(df.groupBy(k).count(), k,
    weight_col="count")`` is cell-for-cell identical to sketching the
    raw rows (addition commutes), but hashes each DISTINCT key once
    instead of once per row: the md5×depth per-row cost drops to
    O(distinct keys), and the wide shuffle happens on the plain count
    aggregate (map-side combined) rather than on depth× exploded rows.
    """
    cells = df.select(
        *([F.col(weight_col).alias("_w")] if weight_col else []),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("j"),
                        _cms_bucket(key_col, j, width).alias("bucket"),
                    )
                    for j in range(depth)
                ]
            )
        ).alias("c"),
    )
    agg = (
        F.sum("_w").cast("long") if weight_col else F.count("*")
    ).alias("n")
    return (
        cells.groupBy(F.col("c.j").alias("j"), F.col("c.bucket").alias("bucket"))
        .agg(agg)
    )


def cms_point_estimates(
    sketch: DataFrame, probes: DataFrame, key_col: str, depth: int = 3, width: int = 64
) -> DataFrame:
    """Point-query the sketch for each probe key:
    ``est = min over rows j of cell[j][bucket_j(key)]``.

    The sketch is d×w rows — broadcast; each probe key expands to its
    ``depth`` (j, bucket) coordinates and LEFT-joins the cells: the
    sparse grid stores only touched cells, so a probe key outside the
    sketched domain can land on absent cells, which count 0 (a true CMS
    array is zero-initialized). The min aggregate keeps exactly one row
    per probe — an inner join here would silently drop absent
    coordinates from the min (overestimating novel keys) and drop
    fully-novel probes from the output entirely (round-8 review).
    """
    coords = probes.select(
        F.col(key_col),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("j"),
                        _cms_bucket(key_col, j, width).alias("bucket"),
                    )
                    for j in range(depth)
                ]
            )
        ).alias("c"),
    ).select(key_col, F.col("c.j").alias("j"), F.col("c.bucket").alias("bucket"))
    return (
        coords.join(F.broadcast(sketch), ["j", "bucket"], "left")
        .groupBy(key_col)
        .agg(F.min(F.coalesce(F.col("n"), F.lit(0))).alias("cms_est"))
    )


def cms_join_size(
    sketch_a: DataFrame, sketch_b: DataFrame
) -> DataFrame:
    """Equi-join cardinality estimation from two Count-Min sketches
    (Cormode & Muthukrishnan 2005, §4.2 inner-product estimation): for
    each row j, est_j = Σ_bucket a[j][bucket]·b[j][bucket]; the final
    estimate is min_j est_j. Upper-bounds the true join size (every
    colliding pair of DISTINCT keys adds spurious product mass, never
    removes any), with overshoot ≤ εNaNb, ε ≈ e/width per row.

    This is how a cost-based planner sizes a shuffle join from
    statistics it can maintain in one streaming pass per table — at
    100 TB you cannot count the join to decide whether to run it. Both
    sketches are depth×width cells regardless of input size, so this
    entire estimator runs on grid-sized frames: an equi-join on
    (j, bucket) then a depth-sized aggregate.

    Numeric envelope (round-10 overflow audit): a bucket count on a
    10^12-row table is ~N/width ≈ 2·10^9, so a SINGLE na·nb product is
    ~4·10^18 — already brushing 2^63 — and the sum over width buckets
    definitively overflows int64 (silently, in a permissive ANSI-off
    driver session). The estimate's own domain is ~Na·Nb/width, far
    past any integer type, so the accumulation is exact decimal(38,0)
    (good to 10^38) and the OUTPUT is double: a planner statistic
    needs magnitude, not 19 significant digits, and the single
    value-determined decimal→double cast is engine-identical (unlike
    float accumulation, which is shuffle-order-dependent).
    """
    a = sketch_a.select("j", "bucket", F.col("n").alias("na"))
    b = sketch_b.select("j", "bucket", F.col("n").alias("nb"))
    prod = F.col("na").cast("decimal(19,0)") * F.col("nb").cast(
        "decimal(19,0)"
    )
    per_row = (
        a.join(b, ["j", "bucket"])
        .groupBy("j")
        .agg(F.sum(prod).cast("double").alias("row_est"))
    )
    w = Window.partitionBy()  # depth rows total — trivially small
    return per_row.select(
        "j", "row_est", F.min("row_est").over(w).alias("join_size_est")
    )
