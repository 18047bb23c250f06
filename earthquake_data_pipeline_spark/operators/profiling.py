"""Dataset profiling and distribution-drift monitoring.

The data-quality face of a 100 TB pipeline: before training on (or
merging) a new drop, profile every column in one pass and compare the
value distribution against the previous drop. Extends the engine's
quality stack (operators/quality.py expectation suites = assertions
you already know to write; this module = the discovery pass that tells
you what to assert) and the reference's notebook-driven null-census /
domain-exploration workflow (SURVEY §5: exploration notebook cells
6-8, the manual profiling that became clean_historical.py's filters).

Design for 100 TB:
- ``column_profile`` is ONE aggregation pass over the table — every
  per-column statistic (null count, exact distinct, min, max) rides
  the same map-side-combined aggregate; the wide 1-row result is then
  exploded to one row per column driver-side-free. Exact
  count_distinct across k columns is k parallel distinct paths; swap
  in approx_count_distinct per column when 2% error is acceptable
  (the approx_distinct operator documents that guarantee pattern).
- ``histogram_drift`` bins values to integer cents buckets (map-only),
  counts per (key, half, bin), and scores drift with the
  cross-multiplied L1 statistic sum|c1·n2 − c2·n1| — integers only,
  no normalizing float division, exactly replayable. The shuffle is on
  (key, bin): tiny.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _min_max_str(col: str, dtype: str) -> tuple[Column, Column]:
    c = F.col(col)
    if dtype == "double":
        # double -> decimal(18,2) -> string: engine-neutral rendering
        # (raw double->string diverges on scientific notation)
        return (
            F.min(c).cast("decimal(18,2)").cast("string"),
            F.max(c).cast("decimal(18,2)").cast("string"),
        )
    return F.min(c).cast("string"), F.max(c).cast("string")


def column_profile(df: DataFrame, cols: dict[str, str]) -> DataFrame:
    """One-pass per-column profile: nulls, exact distinct count, min,
    max (stringified). ``cols`` maps column name -> type family
    ('double' gets decimal-mediated rendering).
    """
    aggs = []
    for name in cols:
        c = F.col(name)
        aggs.append(
            F.sum(F.when(c.isNull(), 1).otherwise(0)).alias(f"nn_{name}")
        )
        aggs.append(F.count_distinct(c).alias(f"nd_{name}"))
        lo, hi = _min_max_str(name, cols[name])
        aggs.append(lo.alias(f"lo_{name}"))
        aggs.append(hi.alias(f"hi_{name}"))
    wide = df.agg(*aggs)
    per_col = F.array(
        *[
            F.struct(
                F.lit(name).alias("column_name"),
                F.col(f"nn_{name}").cast("long").alias("n_nulls"),
                F.col(f"nd_{name}").cast("long").alias("n_distinct"),
                F.col(f"lo_{name}").alias("min_value"),
                F.col(f"hi_{name}").alias("max_value"),
            )
            for name in cols
        ]
    )
    return (
        wide.select(F.explode(per_col).alias("p"))
        .select("p.*")
        .orderBy("column_name")
    )


def histogram_drift(
    events: DataFrame,
    split_predicate: Column,
    key_col: str = "event_type",
    value_col: str = "value",
    bin_cents: int = 200,
    n_bins: int = 10,
) -> DataFrame:
    """Integer-exact distribution drift between the two halves a
    predicate defines (half 0 where true). Per key: half sizes and the
    scaled L1 histogram distance sum|c1·n2 − c2·n1| — zero iff the
    binned distributions are proportionally identical, and equal to
    n1·n2·(L1 distance between the normalized histograms).

    Numeric envelope (round-10 overflow audit, fixed r11): at 10^12
    rows per key the c·n cross products are ~10^24 — silent int64 wrap
    under the certified ANSI-off posture — so the accumulation is exact
    decimal(38,0) (the cms_join_size pattern) and ``drift_scaled`` is
    emitted as DOUBLE: a drift statistic needs magnitude, not 25
    significant digits, and the single value-determined decimal→double
    cast is engine-identical (unlike float accumulation, which is
    shuffle-order-dependent).
    """
    from ..qcommon import nonfinite_flag

    cents = (F.col(value_col).cast("decimal(18,2)") * 100).cast("long")
    # r13 non-finite discipline: a NaN/±Inf value cents-casts to a
    # silent NULL, and F.least SKIPS nulls — so a non-finite value
    # would silently land in the TOP bin (least(NULL, 9) = 9). It gets
    # its own NULL bin instead: still counted in n1/n2 and in the
    # drift distance (a distribution shifting INTO non-finite values
    # IS drift), never conflated with a real bucket. Genuine NULL
    # values keep their pre-existing top-bin behavior (both engines
    # agree on it); only non-finite is diverted.
    binned = events.select(
        F.col(key_col).alias("k"),
        F.when(split_predicate, 0).otherwise(1).alias("half"),
        F.when(
            ~nonfinite_flag(F.col(value_col)),
            F.least(F.floor(cents / bin_cents), F.lit(n_bins - 1)).cast(
                "long"
            ),
        ).alias("bin"),
    )
    g = binned.groupBy("k", "bin").agg(
        F.sum(F.when(F.col("half") == 0, 1).otherwise(0)).alias("c1"),
        F.sum(F.when(F.col("half") == 1, 1).otherwise(0)).alias("c2"),
    )
    w = Window.partitionBy("k")
    g2 = g.withColumn("n1", F.sum("c1").over(w)).withColumn(
        "n2", F.sum("c2").over(w)
    )
    return (
        g2.groupBy("k")
        .agg(
            F.max("n1").alias("n1"),
            F.max("n2").alias("n2"),
            F.sum(
                F.abs(
                    F.col("c1").cast("decimal(19,0)")
                    * F.col("n2").cast("decimal(19,0)")
                    - F.col("c2").cast("decimal(19,0)")
                    * F.col("n1").cast("decimal(19,0)")
                )
            )
            .cast("double")
            .alias("drift_scaled"),
        )
        .select(
            F.col("k").alias(key_col), "n1", "n2", "drift_scaled"
        )
        .orderBy(key_col)
    )


def join_explosion_audit(
    left: DataFrame,
    right: DataFrame,
    key_col: str,
    top_k: int = 10,
) -> DataFrame:
    """Pre-join skew/explosion audit — the planning query you run
    BEFORE a 100 TB join: per-key multiplicities on both sides, the
    exact output cardinality each key contributes (c_l · c_r), and its
    parts-per-million share of the total. The top offenders tell you
    whether to salt (operators/scale.py::salted_join), broadcast, or
    pre-aggregate; the total is the shuffle-size estimate.

    Cost: two key aggregates (map-side combined) + a key-count join —
    all on the KEY domain, never the fact rows; the global total is a
    1-row broadcast. Integer-only arithmetic (share in ppm via integer
    division), so the audit replays exactly in any engine.
    """
    lc = left.groupBy(F.col(key_col).alias("k")).agg(
        F.count("*").alias("c_left")
    )
    if left is right:
        # self-audit fast path: one aggregate, no key join — halves the
        # fact scans (plan-audited: 4 -> 2 FileScans)
        per_key = lc.select(
            "k",
            "c_left",
            F.col("c_left").alias("c_right"),
            (F.col("c_left") * F.col("c_left")).alias("out_rows"),
        )
    else:
        rc = right.groupBy(F.col(key_col).alias("k")).agg(
            F.count("*").alias("c_right")
        )
        per_key = lc.join(rc, "k").select(
            "k",
            "c_left",
            "c_right",
            (F.col("c_left") * F.col("c_right")).alias("out_rows"),
        )
    total = per_key.agg(F.sum("out_rows").alias("total_rows"))
    return (
        per_key.crossJoin(F.broadcast(total))
        .select(
            F.col("k").alias(key_col),
            "c_left",
            "c_right",
            "out_rows",
            F.floor(F.col("out_rows") * 1000000 / F.col("total_rows"))
            .cast("long")
            .alias("share_ppm"),
            "total_rows",
        )
        .orderBy(F.desc("out_rows"), key_col)
        .limit(top_k)
    )


def chi2_independence(
    df: DataFrame, col_a: str, col_b: str
) -> DataFrame:
    """Pearson chi-square independence test between two categorical
    columns — the feature/label leakage probe a curation pipeline runs
    before trusting a metadata column (is `source` informative of
    `lang`?).

    Exactness: each cell's term is (o − e)²/e with e = r·c/n computed
    in float64 — every op is correctly-rounded IEEE on identical
    doubles, so the per-cell term is bit-identical across engines at
    ANY corpus size (the old int64 identity (o·n − r·c)² overflowed
    long once the diff passed 3e9 — a few thousand rows under strong
    association; DEFERRED r07(d)). Accuracy: o − e is exactly rounded
    and e carries ~1e-16 relative error — statistically nil. Terms are
    cast to DECIMAL(28,12) before the Σ so the sum stays order-free
    (term ≤ n·min(nr,nc), inside the decimal range to n ~1e15).
    Cramér's V uses sqrt, which IEEE 754 rounds correctly — the one
    engine-identical transcendental.

    Shape: one (a,b) aggregate + two margin aggregates joined back —
    contingency-table-sized frames after the first pass, so the test
    costs one scan regardless of input size.
    """
    from ..qcommon import reuse

    cells = df.select(
        F.col(col_a).alias("a"), F.col(col_b).alias("b")
    ).groupBy("a", "b").agg(F.count("*").cast("long").alias("o"))
    # reuse() pin (r14 migration): margins + the join all read it
    cells = reuse(cells)
    ra = cells.groupBy("a").agg(F.sum("o").alias("r"))
    cb = cells.groupBy("b").agg(F.sum("o").alias("c"))
    tot = cells.agg(
        F.sum("o").alias("n"),
        F.count_distinct("a").alias("nr"),
        F.count_distinct("b").alias("nc"),
    )
    e = (
        F.col("r").cast("double")
        * F.col("c").cast("double")
        / F.col("n").cast("double")
    )
    o_d = F.col("o").cast("double")
    term = ((o_d - e) * (o_d - e) / e).cast("decimal(28,12)")
    # absent cells (o=0) contribute r*c/n each: total the closed form
    # Σ_all e − Σ_present e = n − Σ_present r·c/n, folded in below
    present = (
        cells.join(F.broadcast(ra), "a")
        .join(F.broadcast(cb), "b")
        .crossJoin(F.broadcast(tot))
        .agg(
            F.sum(term).alias("chi2_present"),
            F.sum(e.cast("decimal(28,12)")).alias("e_present"),
            F.first("n").alias("n"),
            F.first("nr").alias("nr"),
            F.first("nc").alias("nc"),
        )
    )
    from ..qcommon import round6u, round6x

    chi2 = (
        F.col("chi2_present").cast("double")
        + (F.col("n").cast("double") - F.col("e_present").cast("double"))
    )
    dof = (F.col("nr") - 1) * (F.col("nc") - 1)
    v = F.sqrt(
        chi2
        / (
            F.col("n")
            * F.least(F.col("nr") - 1, F.col("nc") - 1)
        )
    )
    return present.select(
        F.col("n").cast("long").alias("n_rows"),
        F.col("nr").cast("long").alias("n_rowcats"),
        F.col("nc").cast("long").alias("n_colcats"),
        dof.cast("long").alias("dof"),
        # chi2 grows with corpus size (up to n·min(nr,nc)-1): micro-unit
        # rounding, not round6x's decimal(18,12) envelope (DEFERRED
        # r07(d)); Cramér's V is bounded in [0, 1] so round6x is safe
        round6u(chi2).alias("chi2"),
        round6x(v).alias("cramers_v"),
    )


def equidepth_histogram(
    df: DataFrame, value_col: str, buckets: int = 8
) -> DataFrame:
    """Equi-depth histogram — the CBO statistic that complements
    zone_maps: bucket boundaries chosen so each bucket holds ~n/buckets
    rows, computed EXACTLY from the cumulative value histogram.

    A value's rows land in the bucket of their LAST cumulative position
    (((cum−1)·buckets) DIV n) — pure integer selection, so ties never
    straddle engines differently; heavy values may span fewer distinct
    buckets (a value with > n/buckets rows swallows its bucket — the
    standard histogram-skew signal, visible as n_rows imbalance).

    Scale shape: the groupBy collapses rows to DISTINCT VALUES before
    the cumulative window, so the single-partition sort the window
    needs runs on the value domain, not the data (same trade
    percentile_stats makes; for a domain too large for one task, range
    partition and offset per-partition cumsums).
    """
    h = df.select(F.col(value_col).alias("v")).groupBy("v").agg(
        F.count("*").alias("cnt")
    )
    w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
    cum = h.select(
        "v", "cnt", F.sum("cnt").over(w).alias("cum")
    ).crossJoin(
        F.broadcast(h.agg(F.sum("cnt").cast("long").alias("n")))
    )
    b = F.expr(f"((cum - 1) * {buckets}) DIV n")
    return (
        cum.groupBy(b.cast("long").alias("bucket"))
        .agg(
            F.min("v").alias("lo"),
            F.max("v").alias("hi"),
            F.sum("cnt").cast("long").alias("n_rows"),
            F.count("*").cast("long").alias("n_distinct"),
        )
    )
