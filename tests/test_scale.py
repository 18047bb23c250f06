"""Scale primitives: salted-join equivalence under skew; bucketed tables
join without an Exchange."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from earthquake_data_pipeline_spark.operators.scale import (
    bucketed_join_ready,
    salted_join,
    write_bucketed,
)


def test_salted_join_matches_plain_join(spark):
    # skewed left: key 1 holds 90% of rows
    left = spark.createDataFrame(
        [(1, f"v{i}") for i in range(90)] + [(k, f"w{k}") for k in range(2, 12)],
        ["k", "payload"],
    )
    right = spark.createDataFrame(
        [(k, f"dim{k}") for k in range(1, 12)], ["k", "attr"]
    )
    plain = {
        (r.k, r.payload, r.attr)
        for r in left.join(right, "k").collect()
    }
    salted = {
        (r.k, r.payload, r.attr)
        for r in salted_join(left, right, ["k"], salt_factor=4).collect()
    }
    assert salted == plain
    assert len(salted) == 100  # every left row matched exactly once


def test_salted_join_left_outer(spark):
    left = spark.createDataFrame([(1, "a"), (2, "b"), (99, "c")], ["k", "p"])
    right = spark.createDataFrame([(1, "x"), (2, "y")], ["k", "q"])
    rows = {
        (r.k, r.p, r.q)
        for r in salted_join(left, right, ["k"], how="left", salt_factor=3).collect()
    }
    assert rows == {(1, "a", "x"), (2, "b", "y"), (99, "c", None)}


def test_bucketed_join_has_no_exchange(spark):
    spark.sql("CREATE DATABASE IF NOT EXISTS bkt")
    fact = spark.range(0, 1000).select(
        F.col("id").alias("k"), (F.col("id") % 7).alias("v")
    )
    dim = spark.range(0, 1000).select(
        F.col("id").alias("k"), (F.col("id") % 13).alias("w")
    )
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        write_bucketed(fact, "bkt.fact_b", ["k"], num_buckets=8, sort_keys=["k"])
        write_bucketed(dim, "bkt.dim_b", ["k"], num_buckets=8, sort_keys=["k"])
        joined = bucketed_join_ready(spark, "bkt.fact_b", "bkt.dim_b", ["k"])
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan  # bucketing satisfies the distribution
        assert joined.count() == 1000
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS bkt.fact_b")
        spark.sql("DROP TABLE IF EXISTS bkt.dim_b")
        spark.sql("DROP DATABASE IF EXISTS bkt")


def test_salted_join_rejects_outer_and_keyonly(spark):
    left = spark.createDataFrame([(1, "a")], ["k", "p"])
    right = spark.createDataFrame([(1, "x")], ["k", "q"])
    with pytest.raises(ValueError, match="does not support"):
        salted_join(left, right, ["k"], how="full")
    with pytest.raises(ValueError, match="salt_source"):
        salted_join(left.select("k"), right, ["k"])


def test_zorder_key_interleaves_bits(spark):
    from earthquake_data_pipeline_spark.operators.layout import zorder_key

    def ref(x, y, bits=4):
        z = 0
        for b in range(bits):
            z |= ((x >> b) & 1) << (2 * b)
            z |= ((y >> b) & 1) << (2 * b + 1)
        return z

    rows = [(x, y) for x in (0, 1, 5, 10, 15) for y in (0, 3, 6, 15)]
    df = spark.createDataFrame(rows, "x long, y long").withColumn(
        "z", zorder_key(["x", "y"], bits=4)
    )
    for r in df.collect():
        assert r["z"] == ref(r["x"], r["y"]), (r["x"], r["y"])


def test_zorder_key_rejects_overflow(spark):
    from earthquake_data_pipeline_spark.operators.layout import zorder_key

    with pytest.raises(ValueError, match="overflows"):
        zorder_key(["a", "b", "c", "d"], bits=16)


def test_zorder_layout_bounds_both_dims(spark, tmp_path):
    """The point of Z-order: after range-partitioning on the Morton key,
    EVERY interleaved dimension has bounded min-max per file — versus a
    plain sort where the secondary column spans the full domain (no
    pruning possible on it)."""
    import pyarrow.parquet as pq

    from earthquake_data_pipeline_spark.operators.layout import write_zordered

    df = spark.range(0, 20000).select(
        ((F.col("id") * 2654435761) % 4096).alias("x"),
        ((F.col("id") * 40503 + 17) % 4096).alias("y"),
    )
    zpath, spath = str(tmp_path / "zord"), str(tmp_path / "xsort")
    # 16 files → the top 4 z bits (y11,x11,y10,x10) split BOTH dims twice
    write_zordered(df, zpath, ["x", "y"], bits=12, n_files=16)
    (
        df.repartitionByRange(16, "x").sortWithinPartitions("x")
        .write.parquet(spath, mode="overwrite")
    )

    def avg_range(path, col):
        import glob
        spans = []
        for f in glob.glob(f"{path}/part-*.parquet"):
            t = pq.read_table(f, columns=[col])[col].to_pylist()
            if t:
                spans.append(max(t) - min(t))
        return sum(spans) / len(spans)

    # x-sorted layout: x clustered, y spans ~the full 4096 domain
    assert avg_range(spath, "x") < 600
    assert avg_range(spath, "y") > 3500
    # z-ordered layout: BOTH dims bounded (sampled range boundaries can
    # straddle quadrants, so assert the decisive half-domain bound —
    # versus >3500 for the un-clustered dim above)
    assert avg_range(zpath, "x") < 2048
    assert avg_range(zpath, "y") < 2048


def test_percentile_by_counts_matches_exact_percentile(spark):
    """Round-11 straggler-audit fix (pre-staged for r12 migration): the
    value-count-histogram percentile must be BIT-identical to
    F.percentile (percentile_cont semantics) across hot-key duplicate
    mass, tiny groups, two-value groups, and integer-rank boundaries."""
    import random

    from pyspark.sql import functions as F

    from earthquake_data_pipeline_spark.operators.analytics import (
        percentile_by_counts,
    )

    random.seed(11)
    rows = []
    # hot key: 5k rows over only 7 distinct values (duplicate mass)
    rows += [("hot", float(random.choice([1, 2, 3, 5, 8, 13, 21])))
             for _ in range(5000)]
    # continuous-ish key
    rows += [("cont", round(random.uniform(0, 100), 3)) for _ in range(997)]
    # tiny and two-value edge groups
    rows += [("one", 42.0)]
    rows += [("two", 1.0), ("two", 2.0)]
    # exact integer-rank boundary: 11 rows, p=0.5 lands on a row
    rows += [("elev", float(i)) for i in range(11)]
    df = spark.createDataFrame(rows, ["k", "v"])

    ps = [0.0, 0.25, 0.5, 0.9, 1.0]
    want = {
        r["k"]: (r["pc"], r["n"])
        for r in df.groupBy("k")
        .agg(
            F.percentile("v", F.array(*[F.lit(p) for p in ps])).alias("pc"),
            F.count("*").alias("n"),
        )
        .collect()
    }
    got = {
        r["k"]: ([r[f"p_{i}"] for i in range(len(ps))], r["n"])
        for r in percentile_by_counts(df, "k", "v", ps).collect()
    }
    assert set(got) == set(want)
    for k in want:
        assert got[k][1] == want[k][1], k
        for i, (a, b) in enumerate(zip(got[k][0], want[k][0])):
            assert a == b, (k, ps[i], a, b)  # exact bits, no tolerance


def test_percentile_by_counts_plan_has_no_row_level_sort_buffer(spark):
    """The point of the histogram form: the only per-key window runs
    over DISTINCT VALUES (post-aggregation), and no sort-based
    percentile aggregate appears in the plan."""
    from earthquake_data_pipeline_spark.operators.analytics import (
        percentile_by_counts,
    )

    df = spark.range(1000).selectExpr("'k' AS k", "CAST(id % 10 AS DOUBLE) AS v")
    plan = (
        percentile_by_counts(df, "k", "v", [0.5])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "percentile" not in plan.lower()
    # the count aggregate reduces BEFORE any window: partial_count on
    # the raw side proves map-side combine ahead of the shuffle
    assert "partial_count" in plan


def test_mad_stats_by_counts_matches_window_arithmetic(spark):
    """Pre-staged r12 (straggler class): the histogram MAD engine must
    reproduce mad_outliers' integer-exact 2x-scale internals — med2 =
    lower+upper middle cents, mad2 likewise over |2x - med2| — on odd,
    even, duplicate-heavy, and single-row keys."""
    import random

    from earthquake_data_pipeline_spark.operators.analytics import (
        mad_stats_by_counts,
    )

    random.seed(23)
    rows = []
    rows += [("odd", float(v)) for v in (1, 7, 3, 9, 5)]
    rows += [("even", float(v)) for v in (10, 20, 30, 40)]
    rows += [("hot", float(random.choice([2, 4, 8])))
             for _ in range(3001)]  # duplicate mass, odd n
    rows += [("one", 12.34)]
    df = spark.createDataFrame(rows, ["event_type", "value"])

    def replay(vals):
        cents = sorted(round(v * 100) for v in vals)
        n = len(cents)
        lo, hi = (n + 1) // 2 - 1, (n + 2) // 2 - 1  # 0-based middles
        med2 = cents[lo] + cents[hi]
        devs = sorted(abs(2 * c - med2) for c in cents)
        mad2 = devs[lo] + devs[hi]
        return med2, mad2, n

    by_key: dict = {}
    for k, v in rows:
        by_key.setdefault(k, []).append(v)
    want = {k: replay(vs) for k, vs in by_key.items()}
    got = {
        r["event_type"]: (r["med2"], r["mad2"], r["n"])
        for r in mad_stats_by_counts(df).collect()
    }
    assert got == want


def test_trimmed_mean_by_counts_matches_window_form(spark):
    """Pre-staged r12: the histogram trim must be row-for-row identical
    to trimmed_mean (the id tie-break only chooses WHICH duplicate
    copies drop; the kept value multiset is id-independent)."""
    import random

    from pyspark.sql import functions as F

    from earthquake_data_pipeline_spark.operators.analytics import (
        trimmed_mean,
        trimmed_mean_by_counts,
    )

    random.seed(31)
    rows = []
    rows += [(i, "hot", float(random.choice([5, 5, 5, 7, 11])))
             for i in range(4001)]  # ties ACROSS the trim boundary
    rows += [(10_000 + i, "cont", round(random.uniform(0, 50), 2))
             for i in range(503)]
    rows += [(20_000, "one", 3.25)]
    df = spark.createDataFrame(rows, ["event_id", "event_type", "value"])
    for pct in (10, 25):
        a = {
            r["event_type"]: (
                r["n"], r["n_kept"], r["min_kept"], r["max_kept"],
                r["trimmed_mean"],
            )
            for r in trimmed_mean(df, trim_pct=pct).collect()
        }
        b = {
            r["event_type"]: (
                r["n"], r["n_kept"], r["min_kept"], r["max_kept"],
                r["trimmed_mean"],
            )
            for r in trimmed_mean_by_counts(df, trim_pct=pct).collect()
        }
        assert a == b, pct


def test_percentile_disc_by_counts_matches_robust_scale_bounds(spark):
    """Pre-staged r12: the disc-percentile histogram must select the
    same winsorize bounds as robust_scale's rank windows (value at
    1-based rank ceil(p*n/100) — id ties never change the value at a
    rank)."""
    import random

    from earthquake_data_pipeline_spark.operators.analytics import (
        percentile_disc_by_counts,
        robust_scale,
    )

    random.seed(41)
    rows = [(i, "hot", float(random.choice([1, 1, 2, 3, 50])))
            for i in range(2003)]
    rows += [(9_000 + i, "cont", round(random.uniform(-5, 5), 2))
             for i in range(211)]
    df = spark.createDataFrame(rows, ["event_id", "event_type", "value"])
    want = {
        r["event_type"]: (r["p_lo"], r["p_hi"])
        for r in robust_scale(df, lo_pct=5, hi_pct=95)
        .select("event_type", "p_lo", "p_hi")
        .distinct()
        .collect()
    }
    got = {
        r["event_type"]: (r["d_0"], r["d_1"])
        for r in percentile_disc_by_counts(
            df, "event_type", "value", [5, 95]
        ).collect()
    }
    assert got == want
