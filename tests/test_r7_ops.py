"""Round-7 operator tests: rate limiting, inverted index, zone-map
skipping, weight-proportional sampling."""

from __future__ import annotations

from pyspark.sql import functions as F

from earthquake_data_pipeline_spark.operators.analytics import rate_limit_flags
from earthquake_data_pipeline_spark.operators.indexing import inverted_index
from earthquake_data_pipeline_spark.operators.layout import skip_audit, zone_maps
from earthquake_data_pipeline_spark.operators.sampling import (
    _HASH_SPACE,
    hash_bucket,
    weighted_bernoulli,
)


def _events(spark, rows):
    df = spark.createDataFrame(rows, ["event_id", "user_id", "ts_s"])
    return df.withColumn("ts", F.col("ts_s").cast("timestamp")).drop("ts_s")


# ---------- rate_limit_flags ----------


def test_sliding_count_includes_self_and_window_edge(spark):
    # window 10 s, max 2: events at t=0, 5, 9, 10 — [t-9, t] inclusive
    ev = _events(
        spark, [(1, 7, 0), (2, 7, 5), (3, 7, 9), (4, 7, 10)]
    )
    out = {
        r["event_id"]: (r["n_in_window"], r["admitted_sliding"])
        for r in rate_limit_flags(ev, window_s=10, max_n=2).collect()
    }
    # t=9 sees {0,5,9}=3; t=10 sees {5,9,10}=3 (0 aged out exactly)
    assert out == {
        1: (1, True),
        2: (2, True),
        3: (3, False),
        4: (3, False),
    }


def test_sliding_ties_are_peers(spark):
    # two events same user same second: RANGE peers share one count
    ev = _events(spark, [(1, 3, 100), (2, 3, 100)])
    out = rate_limit_flags(ev, window_s=60, max_n=1).collect()
    assert {r["n_in_window"] for r in out} == {2}
    assert not any(r["admitted_sliding"] for r in out)


def test_fixed_window_admits_first_n_by_ts_then_id(spark):
    # window 100 s: bucket 0 = [0,100), bucket 1 = [100,200)
    ev = _events(
        spark,
        [(5, 1, 10), (4, 1, 10), (6, 1, 50), (7, 1, 150), (8, 2, 10)],
    )
    out = {
        r["event_id"]: r["admitted_fixed"]
        for r in rate_limit_flags(ev, window_s=100, max_n=2).collect()
    }
    # user 1 bucket 0: ties at ts=10 break by id (4 then 5), 6 is third
    assert out == {4: True, 5: True, 6: False, 7: True, 8: True}


def test_rate_limit_keys_are_independent(spark):
    ev = _events(spark, [(1, 1, 0), (2, 2, 0), (3, 3, 0)])
    out = rate_limit_flags(ev, window_s=1000, max_n=1).collect()
    assert all(r["admitted_sliding"] and r["admitted_fixed"] for r in out)


# ---------- inverted_index ----------


def _docs(spark, rows):
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_inverted_index_positions_and_counts(spark):
    docs = _docs(spark, [(1, "a b a"), (2, "b c"), (3, "a")])
    out = {r["term"]: r for r in inverted_index(docs).collect()}
    assert out["a"]["df"] == 2 and out["a"]["tf"] == 3
    assert out["a"]["postings"] == "1:1,3;3:1"
    assert out["b"]["postings"] == "1:2;2:1"
    assert out["c"]["df"] == 1 and out["c"]["postings"] == "2:2"


def test_inverted_index_postings_lexicographic_and_df_bounds(spark):
    # doc ids 2 and 10: lexicographic posting order puts "10:" first
    docs = _docs(spark, [(2, "x"), (10, "x y"), (11, "y"), (12, "y")])
    out = {r["term"]: r for r in inverted_index(docs).collect()}
    assert out["x"]["postings"] == "10:1;2:1"
    bounded = {
        r["term"]
        for r in inverted_index(docs, min_df=2, max_df=2).collect()
    }
    assert bounded == {"x"}  # y has df=3 > max_df


def test_inverted_index_blank_tokens_dropped(spark):
    docs = _docs(spark, [(1, "  a   b  "), (2, "")])
    terms = {r["term"] for r in inverted_index(docs).collect()}
    assert terms == {"a", "b"}


# ---------- zone_maps / skip_audit ----------


def test_zone_maps_minmax_per_file(spark):
    df = spark.createDataFrame(
        [(0, 5), (0, 9), (1, 100), (1, 101)], ["f", "v"]
    )
    zm = {
        r["file_id"]: (r["v_min"], r["v_max"], r["n_rows"])
        for r in zone_maps(df, F.col("f"), F.col("v")).collect()
    }
    assert zm == {0: (5, 9, 2), 1: (100, 101, 2)}


def test_skip_audit_prunes_disjoint_files(spark):
    df = spark.createDataFrame(
        [(0, 5), (0, 9), (1, 100), (1, 101), (2, 200)], ["f", "v"]
    )
    zm = zone_maps(df, F.col("f"), F.col("v"))
    out = {
        r["pred_id"]: (r["files_total"], r["files_scanned"], r["rows_scanned"])
        for r in skip_audit(
            zm, [(1, 0, 10), (2, 90, 150), (3, 300, 400), (4, 9, 100)]
        ).collect()
    }
    assert out[1] == (3, 1, 2)  # only file 0 overlaps
    assert out[2] == (3, 1, 2)  # only file 1
    assert out[3] == (3, 0, 0)  # nothing overlaps
    assert out[4] == (3, 2, 4)  # boundary-inclusive: files 0 and 1


def test_skip_audit_boundary_touch_is_scanned(spark):
    df = spark.createDataFrame([(0, 10)], ["f", "v"])
    zm = zone_maps(df, F.col("f"), F.col("v"))
    out = skip_audit(zm, [(1, 10, 10)]).collect()[0]
    assert out["files_scanned"] == 1


# ---------- weighted_bernoulli ----------


def test_weighted_bernoulli_extremes(spark):
    df = spark.createDataFrame(
        [(i, w) for i in range(50) for w in (0, 256)], ["k", "w"]
    )
    out = weighted_bernoulli(df, "k", "w", 256).collect()
    for r in out:
        assert r["admitted"] == (r["w"] == 256)


def test_weighted_bernoulli_matches_threshold_exactly(spark):
    # admit iff bucket * max_w < w * 2^32 — replay the rule row by row
    df = spark.createDataFrame([(i, 64) for i in range(200)], ["k", "w"])
    got = {
        r["k"]: r["admitted"]
        for r in weighted_bernoulli(df, "k", "w", 256).collect()
    }
    buckets = {
        r["k"]: r["b"]
        for r in df.select("k", hash_bucket("k", "wb").alias("b")).collect()
    }
    for k, b in buckets.items():
        assert got[k] == (b * 256 < 64 * _HASH_SPACE)
    # weight 64/256 admits roughly a quarter
    n_adm = sum(got.values())
    assert 20 <= n_adm <= 80


def test_weighted_bernoulli_monotone_in_weight(spark):
    # same key at two weights: higher weight can only add admissions
    df_lo = spark.createDataFrame([(i, 32) for i in range(100)], ["k", "w"])
    df_hi = spark.createDataFrame([(i, 128) for i in range(100)], ["k", "w"])
    lo = {
        r["k"]
        for r in weighted_bernoulli(df_lo, "k", "w", 256)
        .filter("admitted")
        .collect()
    }
    hi = {
        r["k"]
        for r in weighted_bernoulli(df_hi, "k", "w", 256)
        .filter("admitted")
        .collect()
    }
    assert lo <= hi


# ---------- token_bucket_admit ----------


def test_token_bucket_spends_and_refills(spark):
    from earthquake_data_pipeline_spark.operators.admission import (
        token_bucket_admit,
    )

    # burst 2, 1 token / 10 s (den=10): events at t=0,1,2,25
    ev = _events(spark, [(1, 9, 0), (2, 9, 1), (3, 9, 2), (4, 9, 25)])
    out = {
        r["event_id"]: (r["units_before"], r["admitted"])
        for r in token_bucket_admit(
            ev, burst=2, refill_num=1, refill_den=10
        ).collect()
    }
    # t=0: full 20, admit -> 10; t=1: 10+1=11, admit -> 1;
    # t=2: 1+1=2 < 10 deny; t=25: min(20, 2+23)=20 admit
    assert out == {
        1: (20, True),
        2: (11, True),
        3: (2, False),
        4: (20, True),
    }


def test_token_bucket_cap_never_exceeded_and_keys_isolated(spark):
    from earthquake_data_pipeline_spark.operators.admission import (
        token_bucket_admit,
    )

    ev = _events(spark, [(1, 1, 0), (2, 1, 10_000_000), (3, 2, 0)])
    out = token_bucket_admit(
        ev, burst=3, refill_num=1, refill_den=5
    ).collect()
    assert all(r["units_before"] <= 15 for r in out)
    assert all(r["admitted"] for r in out)


def test_token_bucket_tie_order_by_id(spark):
    from earthquake_data_pipeline_spark.operators.admission import (
        token_bucket_admit,
    )

    # burst 1: two events same second — lower id wins the only token
    ev = _events(spark, [(7, 4, 100), (6, 4, 100)])
    out = {
        r["event_id"]: r["admitted"]
        for r in token_bucket_admit(
            ev, burst=1, refill_num=1, refill_den=1000
        ).collect()
    }
    assert out == {6: True, 7: False}


def test_token_bucket_hot_key_state_survives_arrow_batches(spark):
    # the hot-key-safe shape streams a key's history across Arrow
    # batches with rolling state: force tiny batches so one key spans
    # many, and check bit-exact parity with a pure-Python replay
    from earthquake_data_pipeline_spark.operators.admission import (
        token_bucket_admit,
    )

    key = "spark.sql.execution.arrow.maxRecordsPerBatch"
    prev = spark.conf.get(key, None)
    spark.conf.set(key, "64")
    try:
        rows = [(i, 1, i * 3) for i in range(1000)] + [
            (10_000 + i, 2, i * 7) for i in range(100)
        ]
        got = {
            r["event_id"]: (r["units_before"], r["admitted"])
            for r in token_bucket_admit(
                _events(spark, rows), burst=2, refill_num=1, refill_den=10
            ).collect()
        }
    finally:
        if prev is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, prev)

    def replay(evts, burst=2, num=1, den=10):
        cap = burst * den
        exp = {}
        by_key: dict = {}
        for eid, k, ts in evts:
            by_key.setdefault(k, []).append((ts, eid))
        for k, es in by_key.items():
            units, prev_ts = cap, None
            for ts, eid in sorted(es):
                if prev_ts is not None:
                    units = min(cap, units + (ts - prev_ts) * num)
                prev_ts = ts
                ok = units >= den
                exp[eid] = (units, ok)
                if ok:
                    units -= den
        return exp

    assert got == replay(rows)


# ---------- cms_join_size ----------


def test_cms_join_size_overestimates_and_min_rule(spark):
    from earthquake_data_pipeline_spark.operators.sketches import (
        cms_join_size,
        cms_sketch,
    )

    a = spark.createDataFrame([(i % 5,) for i in range(100)], ["k"])
    b = spark.createDataFrame([(i % 5,) for i in range(50)], ["k"])
    est = cms_join_size(
        cms_sketch(a, "k", depth=3, width=64),
        cms_sketch(b, "k", depth=3, width=64),
    ).collect()
    exact = 100 * 50 // 5  # each key: 20*10 pairs, 5 keys
    final = {r["join_size_est"] for r in est}
    assert len(final) == 1
    (f,) = final
    assert f >= exact  # one-sided: inner product only adds collision mass
    assert f == min(r["row_est"] for r in est)


# ---------- trend_fit ----------


def test_trend_fit_exact_line(spark):
    from earthquake_data_pipeline_spark.operators.analytics import trend_fit

    # y = 2.5 + 0.001*hours -> y_milli = 2500 + 1*x
    rows = [
        (1, h * 3600, 2.5 + 0.001 * h) for h in range(10)
    ]
    ev = spark.createDataFrame(rows, ["user_id", "ts_s", "value"]).withColumn(
        "ts", F.col("ts_s").cast("timestamp")
    )
    out = trend_fit(ev).collect()[0]
    assert out["slope_milli_per_hr"] == 1.0
    assert out["intercept_milli"] == 2500.0
    assert out["r2"] == 1.0


def test_trend_fit_degenerate_x_gives_nulls(spark):
    from earthquake_data_pipeline_spark.operators.analytics import trend_fit

    ev = spark.createDataFrame(
        [(1, 100, 5.0), (1, 200, 7.0)], ["user_id", "ts_s", "value"]
    ).withColumn("ts", F.col("ts_s").cast("timestamp"))
    out = trend_fit(ev).collect()[0]  # both events in hour 0
    assert out["slope_milli_per_hr"] is None and out["r2"] is None


# ---------- bm25_scores ----------


def test_bm25_rarer_term_scores_higher(spark):
    from earthquake_data_pipeline_spark.operators.indexing import bm25_scores

    docs = _docs(
        spark,
        [
            (1, "common rare"),
            (2, "common x"),
            (3, "common y"),
            (4, "common z"),
        ],
    )
    out = {
        r["doc"]: float(r["score_dec"])
        for r in bm25_scores(docs, ["common", "rare"]).collect()
    }
    # doc 1 matches both terms, and rare carries higher idf
    assert out[1] > out[2] == out[3] == out[4]


def test_bm25_length_normalization_penalizes_long_docs(spark):
    from earthquake_data_pipeline_spark.operators.indexing import bm25_scores

    docs = _docs(spark, [(1, "q"), (2, "q " + "pad " * 50)])
    out = {
        r["doc"]: float(r["score_dec"])
        for r in bm25_scores(docs, ["q"]).collect()
    }
    assert out[1] > out[2]


# ---------- pagerank_ppm ----------


def test_pagerank_symmetric_cycle_is_uniform(spark):
    from earthquake_data_pipeline_spark.operators.graph import pagerank_ppm

    # a -> b -> c -> a, equal weights: ranks stay uniform
    e = spark.createDataFrame(
        [("a", "b", 1), ("b", "c", 1), ("c", "a", 1)], ["src", "dst", "w"]
    )
    out = {r["node"]: r["rank_ppm"] for r in pagerank_ppm(e).collect()}
    assert len(set(out.values())) == 1
    # 1e6/3 = 333333 init; fixed point: 50000 + 850000*333333//1e6 = 333333
    assert out["a"] == 333333


def test_pagerank_sink_attracts_mass(spark):
    from earthquake_data_pipeline_spark.operators.graph import pagerank_ppm

    # a and b both point at c; c points at a: c accumulates
    e = spark.createDataFrame(
        [("a", "c", 1), ("b", "c", 1), ("c", "a", 1)], ["src", "dst", "w"]
    )
    out = {r["node"]: r["rank_ppm"] for r in pagerank_ppm(e).collect()}
    assert out["c"] > out["a"] > out["b"]


def test_pagerank_weighted_edge_split(spark):
    from earthquake_data_pipeline_spark.operators.graph import pagerank_ppm

    # a splits 3:1 between b and c (one iteration, no back-edges):
    # b gets 3x c's incoming transfer
    e = spark.createDataFrame(
        [("a", "b", 3), ("a", "c", 1)], ["src", "dst", "w"]
    )
    out = {
        r["node"]: r["rank_ppm"]
        for r in pagerank_ppm(e, iterations=1).collect()
    }
    base = 150000 // 3
    init = 1000000 // 3
    assert out["b"] == base + (850000 * ((init * 3) // 4)) // 1000000
    assert out["c"] == base + (850000 * ((init * 1) // 4)) // 1000000


def test_pagerank_empty_and_zero_weight_edges(spark):
    """Round-8 review: an empty edge list must return the contract-
    schema empty frame (not a driver ZeroDivisionError on PPM//n), and
    w<=0 edges are non-edges for the transfer — a source with only such
    edges is dangling, not an ANSI DIVIDE_BY_ZERO in codegen."""
    from earthquake_data_pipeline_spark.operators.graph import pagerank_ppm

    empty = spark.createDataFrame([], "src string, dst string, w long")
    out = pagerank_ppm(empty)
    assert out.collect() == []
    assert [f.name for f in out.schema.fields] == ["node", "rank_ppm"]

    # a's only out-edge has weight 0 -> a is dangling; b/c unaffected
    e = spark.createDataFrame(
        [("a", "b", 0), ("b", "c", 1), ("c", "b", 1)], ["src", "dst", "w"]
    )
    got = {r["node"]: r["rank_ppm"] for r in pagerank_ppm(e).collect()}
    assert set(got) == {"a", "b", "c"}  # a still counts as a node
    # a holds only the teleport base (all its mass leaks); b and c
    # keep exchanging mass, so both sit above the base
    base = 150000 // 3
    assert got["a"] == base
    assert got["b"] > base and got["c"] > base


def test_pagerank_broadcasts_rank_vector_and_bounds_lineage(spark):
    """Scale shape (VERDICT r06 item 5): with a small node domain the
    per-iteration edges×ranks join must BROADCAST the node-sized rank
    vector (the edge side — the 100 TB side — is never shuffled), and
    each iteration's published plan must be checkpoint-bounded (Scan
    ExistingRDD at the leaves, not a k-deep join tower)."""
    from earthquake_data_pipeline_spark.operators.graph import pagerank_ppm

    e = spark.createDataFrame(
        [("a", "b", 1), ("b", "c", 1), ("c", "a", 1)], ["src", "dst", "w"]
    )
    out = pagerank_ppm(e, iterations=3)
    # final published frame is a lazy localCheckpoint: its own plan is
    # lineage-free (the iteration tower was truncated round by round)
    final_plan = out._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" not in final_plan
    assert "Scan ExistingRDD" in final_plan

    # broadcast pin: replay one iteration's join exactly as the operator
    # builds it and check Catalyst honored the broadcast on the rank side
    from pyspark.sql import functions as F

    ranks = out  # node-sized vector
    ew = e.selectExpr("src as s", "dst as d", "w")
    it_plan = (
        ew.join(F.broadcast(ranks), ew["s"] == ranks["node"])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in it_plan
    assert "SortMergeJoin" not in it_plan

    # forced shuffle path (huge-domain fallback) still computes the same
    got = {r["node"]: r["rank_ppm"] for r in out.collect()}
    shuffled = {
        r["node"]: r["rank_ppm"]
        for r in pagerank_ppm(e, iterations=3, broadcast_ranks=False).collect()
    }
    assert got == shuffled


# ---------- blocked_edit_join ----------


def test_blocked_edit_join_blocks_and_verifies(spark):
    from earthquake_data_pipeline_spark.operators.linkage import (
        blocked_edit_join,
    )

    df = spark.createDataFrame(
        [
            (1, "the quick brown fox", "en"),
            (2, "the quick brown fix", "en"),  # 1 edit from doc 1
            (3, "the quick brown fox", "de"),  # identical but other block
            (4, "completely different", "en"),
        ],
        ["doc_id", "text", "lang"],
    )
    out = {
        (r["id_a"], r["id_b"]): r["edit_dist"]
        for r in blocked_edit_join(
            df, "doc_id", "text", [F.col("lang")], max_dist=2
        ).collect()
    }
    assert out == {(1, 2): 1}  # cross-block identical pair NOT found


def test_blocked_edit_join_head_cap(spark):
    from earthquake_data_pipeline_spark.operators.linkage import (
        blocked_edit_join,
    )

    # identical 8-char heads, wildly different tails: head_chars=8
    # declares them 0 edits apart — the documented cap semantics
    df = spark.createDataFrame(
        [(1, "prefix00" + "a" * 50, "x"), (2, "prefix00" + "b" * 99, "x")],
        ["doc_id", "text", "lang"],
    )
    out = blocked_edit_join(
        df, "doc_id", "text", [F.col("lang")], max_dist=0, head_chars=8
    ).collect()
    assert len(out) == 1 and out[0]["edit_dist"] == 0


# ---------- robust_scale ----------


def test_robust_scale_winsorizes_and_scales(spark):
    from earthquake_data_pipeline_spark.operators.analytics import robust_scale

    # 100 values 1..100 in one group: p5 = 5th value = 5, p95 = 95
    rows = [(i, "t", float(i)) for i in range(1, 101)]
    ev = spark.createDataFrame(rows, ["event_id", "event_type", "value"])
    out = {r["event_id"]: r for r in robust_scale(ev).collect()}
    assert out[1]["p_lo"] == 5.0 and out[1]["p_hi"] == 95.0
    assert out[1]["scaled_ppm"] == 0  # clamped below p5
    assert out[100]["scaled_ppm"] == 1000000  # clamped above p95
    assert out[50]["scaled_ppm"] == 500000  # (50-5)/90 = 0.5
    assert out[5]["scaled_ppm"] == 0 and out[95]["scaled_ppm"] == 1000000


def test_robust_scale_degenerate_group_is_null(spark):
    from earthquake_data_pipeline_spark.operators.analytics import robust_scale

    ev = spark.createDataFrame(
        [(1, "t", 7.0), (2, "t", 7.0)], ["event_id", "event_type", "value"]
    )
    out = robust_scale(ev).collect()
    assert all(r["scaled_ppm"] is None for r in out)


# ---------- chi2_independence ----------


def test_chi2_independent_columns_zero(spark):
    from earthquake_data_pipeline_spark.operators.profiling import (
        chi2_independence,
    )

    # perfectly balanced 2x2: chi2 exactly 0
    rows = [("a", "x"), ("a", "y"), ("b", "x"), ("b", "y")] * 5
    df = spark.createDataFrame(rows, ["u", "v"])
    out = chi2_independence(df, "u", "v").collect()[0]
    assert out["chi2"] == 0.0 and out["cramers_v"] == 0.0
    assert out["dof"] == 1 and out["n_rows"] == 20


def test_chi2_perfect_association(spark):
    from earthquake_data_pipeline_spark.operators.profiling import (
        chi2_independence,
    )

    # u determines v: chi2 = n, Cramér's V = 1
    rows = [("a", "x")] * 10 + [("b", "y")] * 10
    df = spark.createDataFrame(rows, ["u", "v"])
    out = chi2_independence(df, "u", "v").collect()[0]
    assert out["chi2"] == 20.0 and out["cramers_v"] == 1.0


def test_chi2_beyond_decimal_envelope(spark):
    """DEFERRED r07(d): chi2 grows with corpus size — a perfectly
    associated 2x2 over 2.2M rows yields chi2 = n = 2.2e6, which
    overflows round6x's decimal(18,12) envelope (|x| < 1e6). The
    micro-unit emit must return it exactly instead of crashing."""
    from pyspark.sql import functions as F

    from earthquake_data_pipeline_spark.operators.profiling import (
        chi2_independence,
    )

    n = 2_200_000
    df = spark.range(n).select(
        (F.col("id") % 2).alias("u"), (F.col("id") % 2).alias("v")
    )
    out = chi2_independence(df, "u", "v").collect()[0]
    assert out["chi2"] == float(n) and out["cramers_v"] == 1.0


def test_chi2_absent_cells_counted(spark):
    from earthquake_data_pipeline_spark.operators.profiling import (
        chi2_independence,
    )

    # textbook 2x2 with a zero cell: [[4,0],[2,2]]
    # margins r=(4,4) c=(6,2) n=8; e=(3,1,3,1)
    # chi2 = 1/3 + 1 + 1/3 + 1 = 8/3
    rows = [("a", "x")] * 4 + [("b", "x")] * 2 + [("b", "y")] * 2
    df = spark.createDataFrame(rows, ["u", "v"])
    out = chi2_independence(df, "u", "v").collect()[0]
    assert abs(out["chi2"] - 8 / 3) < 1e-6


# ---------- equidepth_histogram ----------


def test_equidepth_uniform_buckets(spark):
    from earthquake_data_pipeline_spark.operators.profiling import (
        equidepth_histogram,
    )

    df = spark.createDataFrame([(float(i),) for i in range(80)], ["x"])
    out = {
        r["bucket"]: (r["lo"], r["hi"], r["n_rows"])
        for r in equidepth_histogram(df, "x", 8).collect()
    }
    assert len(out) == 8
    assert all(v[2] == 10 for v in out.values())
    assert out[0] == (0.0, 9.0, 10) and out[7] == (70.0, 79.0, 10)


def test_equidepth_heavy_value_swallows_bucket(spark):
    from earthquake_data_pipeline_spark.operators.profiling import (
        equidepth_histogram,
    )

    # one value holds half the rows: it lands in ONE bucket (ties never
    # split), so bucket sizes are skewed — the histogram-skew signal
    rows = [(1.0,)] * 50 + [(float(i),) for i in range(2, 52)]
    df = spark.createDataFrame(rows, ["x"])
    out = equidepth_histogram(df, "x", 4).collect()
    total = sum(r["n_rows"] for r in out)
    assert total == 100
    big = max(out, key=lambda r: r["n_rows"])
    assert big["n_rows"] >= 50 and big["lo"] == 1.0


# ---------- trimmed_mean ----------


def test_trimmed_mean_drops_tails(spark):
    from earthquake_data_pipeline_spark.operators.analytics import trimmed_mean

    # 10 values incl. two wild outliers; 10% trim drops exactly the
    # lowest and highest single rows
    vals = [-1000.0, 2.0, 3.0, 4.0, 5.0, 6.0, 7.0, 8.0, 9.0, 1000.0]
    ev = spark.createDataFrame(
        [(i, "t", v) for i, v in enumerate(vals)],
        ["event_id", "event_type", "value"],
    )
    out = trimmed_mean(ev).collect()[0]
    assert out["n"] == 10 and out["n_kept"] == 8
    assert out["min_kept"] == 2.0 and out["max_kept"] == 9.0
    assert out["trimmed_mean"] == 5.5


# ---------- k_anonymity_audit ----------


def test_k_anonymity_flags_small_classes(spark):
    from earthquake_data_pipeline_spark.operators.quality import (
        k_anonymity_audit,
    )

    rows = [("us", "A")] * 10 + [("us", "B")] * 2 + [("de", "A")] * 5
    df = spark.createDataFrame(rows, ["nation", "seg"])
    out = {
        r["nation"]: r
        for r in k_anonymity_audit(
            df, ["nation", "seg"], k=5, by_col="nation"
        ).collect()
    }
    us = out["us"]
    assert us["n_classes"] == 2 and us["n_violating"] == 1
    assert us["rows_at_risk"] == 2 and us["risk_ppm"] == 2 * 1000000 // 12
    de = out["de"]
    assert de["n_violating"] == 0 and de["rows_at_risk"] == 0


# ---------- boolean_search ----------


def test_boolean_search_and_not(spark):
    from earthquake_data_pipeline_spark.operators.indexing import (
        boolean_search,
    )

    docs = _docs(
        spark,
        [
            (1, "x y z"),
            (2, "x y bad"),  # excluded by NOT
            (3, "x z"),  # missing y
            (4, "y x x"),  # matches, tf_x=2
        ],
    )
    out = {
        r["doc"]: (r["tf_0"], r["tf_1"])
        for r in boolean_search(docs, ["x", "y"], ["bad"]).collect()
    }
    assert out == {1: (1, 1), 4: (2, 1)}


# ---------- incremental_join_agg ----------


def test_incremental_join_agg_equals_full_recompute(spark):
    from earthquake_data_pipeline_spark.operators.merge import (
        incremental_join_agg,
    )

    a = [(k, float(k * 10)) for k in range(20)]
    b = [(k % 10, float(k)) for k in range(40)]
    A = spark.createDataFrame(a, ["k", "va"])
    B = spark.createDataFrame(b, ["k", "vb"])
    # arbitrary splits
    inc = incremental_join_agg(
        A.filter("k % 3 != 0"), A.filter("k % 3 = 0"),
        B.filter("vb < 20"), B.filter("vb >= 20"),
        "k", "vb",
    )
    full = (
        A.join(B, "k")
        .groupBy("k")
        .agg(
            F.count("*").alias("n_pairs"),
            F.sum(F.col("vb").cast("decimal(18,2)")).alias("total"),
        )
    )
    got = {r["k"]: (r["n_pairs"], str(r["total"])) for r in inc.collect()}
    want = {r["k"]: (r["n_pairs"], str(r["total"])) for r in full.collect()}
    assert got == want and len(got) == 10


# ---------- pareto_frontier_2d ----------


def test_pareto_frontier_basic_dominance(spark):
    from earthquake_data_pipeline_spark.operators.analytics import (
        pareto_frontier_2d,
    )

    pts = [(1, 1.0, 10), (2, 2.0, 5), (3, 3.0, 1), (4, 1.5, 3), (5, 0.5, 12)]
    df = spark.createDataFrame(pts, ["id", "x", "y"])
    # frontier: 5 (0.5,12), 1 (1,10), 2 (2,5), 3 (3,1); 4 dominated by 2
    ids = {r["id"] for r in pareto_frontier_2d(df, "x", "y", "id").collect()}
    assert ids == {1, 2, 3, 5}


def test_pareto_frontier_ties_survive_together(spark):
    from earthquake_data_pipeline_spark.operators.analytics import (
        pareto_frontier_2d,
    )

    pts = [(1, 2.0, 5), (2, 2.0, 5), (3, 2.0, 4), (4, 1.0, 6)]
    df = spark.createDataFrame(pts, ["id", "x", "y"])
    ids = {r["id"] for r in pareto_frontier_2d(df, "x", "y", "id").collect()}
    # equal points 1,2 both survive; 3 dominated within its x group;
    # 4 survives (higher y than every larger-x point)
    assert ids == {1, 2, 4}


# ---------- fk_integrity_audit ----------


def test_fk_integrity_counts_orphans_and_nulls(spark):
    from earthquake_data_pipeline_spark.operators.quality import (
        fk_integrity_audit,
    )

    fact = spark.createDataFrame(
        [(1,), (1,), (2,), (99,), (99,), (99,), (None,)], ["fk"]
    )
    dim = spark.createDataFrame([(1,), (2,), (3,)], ["pk"])
    out = fk_integrity_audit(fact, "fk", dim, "pk").collect()[0]
    assert out["n_rows"] == 7 and out["n_null_fk"] == 1
    assert out["n_orphan_keys"] == 1 and out["n_orphan_rows"] == 3
    assert out["orphan_ppm"] == 3 * 1000000 // 7


def test_fk_integrity_clean_table_zeroes(spark):
    from earthquake_data_pipeline_spark.operators.quality import (
        fk_integrity_audit,
    )

    fact = spark.createDataFrame([(1,), (2,)], ["fk"])
    dim = spark.createDataFrame([(1,), (2,)], ["pk"])
    out = fk_integrity_audit(fact, "fk", dim, "pk").collect()[0]
    assert out["n_orphan_rows"] == 0 and out["orphan_ppm"] == 0


# ---------- golden_record ----------


def test_golden_record_field_level_recency(spark):
    from earthquake_data_pipeline_spark.operators.merge import golden_record

    rows = [
        # (user, id, ts, name, score) — newest name is at t=30 but its
        # score is null; newest score is at t=20
        (1, 1, 10, "old", 5.0),
        (1, 2, 20, None, 7.0),
        (1, 3, 30, "new", None),
        (2, 4, 10, None, None),
    ]
    df = spark.createDataFrame(rows, ["u", "id", "ts", "name", "score"])
    out = {
        r["u"]: r
        for r in golden_record(df, "u", "ts", "id", ["name", "score"]).collect()
    }
    assert out[1]["name"] == "new" and out[1]["name_ts"] == 30
    assert out[1]["score"] == 7.0 and out[1]["score_ts"] == 20
    assert out[1]["n_versions"] == 3
    assert out[2]["name"] is None and out[2]["name_ts"] is None


def test_golden_record_ts_tie_breaks_by_id(spark):
    from earthquake_data_pipeline_spark.operators.merge import golden_record

    rows = [(1, 1, 10, "a"), (1, 2, 10, "b")]
    df = spark.createDataFrame(rows, ["u", "id", "ts", "name"])
    out = golden_record(df, "u", "ts", "id", ["name"]).collect()[0]
    assert out["name"] == "b"  # higher id wins the ts tie


# ---------- cluster purity (query-level logic) ----------


def test_cluster_purity_majority_and_simpson(spark):
    """Purity math on a hand-built assignment: majority tie breaks by
    smallest label; Simpson collision ppm is integer-exact."""
    from pyspark.sql import Window

    pl = spark.createDataFrame(
        [(0, "a", 2), (0, "b", 2), (0, "c", 1), (1, "z", 4)],
        ["cluster_id", "label", "c"],
    )
    w = Window.partitionBy("cluster_id").orderBy(F.desc("c"), F.asc("label"))
    top = (
        pl.withColumn("rn", F.row_number().over(w))
        .filter("rn = 1")
        .collect()
    )
    by = {r["cluster_id"]: r["label"] for r in top}
    assert by == {0: "a", 1: "z"}  # tie a/b -> a
    stats = pl.groupBy("cluster_id").agg(
        F.sum("c").alias("n"), F.sum(F.col("c") * F.col("c")).alias("ss")
    ).collect()
    s0 = next(r for r in stats if r["cluster_id"] == 0)
    assert (s0["ss"] * 1000000) // (s0["n"] * s0["n"]) == 9 * 1000000 // 25


# ---------- last_touch_attribution ----------


def test_attribution_credits_latest_touch_within_lookback(spark):
    from earthquake_data_pipeline_spark.operators.analytics import (
        last_touch_attribution,
    )

    rows = [
        (1, 1, "click", 100),
        (2, 1, "view", 200),
        (3, 1, "purchase", 250),   # credits view (latest touch)
        (4, 2, "click", 0),
        (5, 2, "purchase", 9999),  # outside lookback 1000 -> none
        (6, 3, "purchase", 50),    # no prior touch -> none
    ]
    ev = spark.createDataFrame(
        rows, ["event_id", "user_id", "event_type", "ts_s"]
    ).withColumn("ts", F.col("ts_s").cast("timestamp"))
    out = {
        r["channel"]: (r["n_conversions"], r["sum_delay_s"])
        for r in last_touch_attribution(
            ev, ["click", "view"], "purchase", lookback_s=1000
        ).collect()
    }
    assert out == {"view": (1, 50), "none": (2, 0)}


def test_attribution_touch_strictly_before_conversion(spark):
    from earthquake_data_pipeline_spark.operators.analytics import (
        last_touch_attribution,
    )

    # touch at the SAME second but higher id than the purchase: the
    # (ts, id) total order puts it after -> not creditable
    rows = [(1, 1, "purchase", 100), (2, 1, "click", 100)]
    ev = spark.createDataFrame(
        rows, ["event_id", "user_id", "event_type", "ts_s"]
    ).withColumn("ts", F.col("ts_s").cast("timestamp"))
    out = last_touch_attribution(
        ev, ["click"], "purchase", lookback_s=1000
    ).collect()
    assert out[0]["channel"] == "none"


# ---------- kcenter_select ----------


def test_kcenter_farthest_point_traversal(spark):
    from earthquake_data_pipeline_spark.operators.clustering import (
        kcenter_select,
    )

    # 1-D points embedded in 2-D: 0, 1, 10, 11, 100
    pts = spark.createDataFrame(
        [(0, [0.0, 0.0]), (1, [1.0, 0.0]), (2, [10.0, 0.0]),
         (3, [11.0, 0.0]), (4, [100.0, 0.0])],
        ["id", "v"],
    )
    out = kcenter_select(pts, 3)
    # seed = id 0; farthest = 100 (id 4); then farthest from {0,100} is
    # 10 or 11 (dmin 10 vs 11 -> id 3 at 11... dmin(11)=min(11,89)=11,
    # dmin(10)=min(10,90)=10 -> id 3 wins)
    assert [(r[0], r[1]) for r in out] == [(0, 0), (1, 4), (2, 3)]
    # radius_after(0) = 100 (coverage with just the seed)
    assert out[0][2] == 100.0
    # radius_after for all 3 centers: worst point is 10 at dmin 1? no:
    # centers {0, 100, 11}: dmin(1)=1, dmin(10)=1 -> radius 1
    assert out[2][2] == 1.0


def test_kcenter_radius_monotone_nonincreasing(spark):
    from earthquake_data_pipeline_spark.operators.clustering import (
        kcenter_select,
    )

    import random

    rng = random.Random(7)
    pts = spark.createDataFrame(
        [(i, [rng.uniform(0, 10), rng.uniform(0, 10)]) for i in range(40)],
        ["id", "v"],
    )
    out = kcenter_select(pts, 5)
    radii = [r[2] for r in out]
    assert all(a >= b for a, b in zip(radii, radii[1:]))
