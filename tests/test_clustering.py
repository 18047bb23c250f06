"""Lloyd's k-means operator: separation, determinism, and degeneracy."""

from __future__ import annotations

from pyspark.sql import functions as F

from earthquake_data_pipeline_spark.operators.clustering import (
    assign_clusters,
    assign_clusters_gemm,
    lloyd_kmeans,
    split_oversized_clusters,
)


def _toy(spark):
    # two well-separated blobs around (0,0) and (10,10)
    rows = [
        (0, [0.0, 0.1]), (1, [0.2, 0.0]), (2, [0.1, 0.2]),
        (3, [10.0, 10.1]), (4, [10.2, 10.0]), (5, [9.9, 10.2]),
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_kmeans_separates_blobs(spark):
    df = _toy(spark)
    assigned, centroids = lloyd_kmeans(df, k=2, iters=3)
    got = {r["id"]: r["cluster_id"] for r in assigned.collect()}
    # init ids 0 and 1 both sit in blob A; after the first update the
    # cluster that captures blob B re-centers there, so the final
    # partition is exactly the two blobs
    assert len({got[0], got[1], got[2]}) == 1
    assert len({got[3], got[4], got[5]}) == 1
    assert got[0] != got[3]
    # centroids are the blob means
    [ca] = [c for c in centroids.values() if c[0] < 5]
    [cb] = [c for c in centroids.values() if c[0] > 5]
    assert abs(ca[0] - 0.1) < 1e-9 and abs(cb[1] - 10.1) < 1e-9


def test_kmeans_deterministic_rerun(spark):
    df = _toy(spark)
    _, c1 = lloyd_kmeans(df, k=2, iters=2)
    _, c2 = lloyd_kmeans(df, k=2, iters=2)
    assert c1 == c2


def test_assignment_tiebreak_prefers_lower_cid(spark):
    df = spark.createDataFrame(
        [(0, [1.0, 1.0])], "vec_id long, embedding array<double>"
    )
    pts = df.select(
        F.col("vec_id").alias("id"),
        F.col("embedding").cast("array<double>").alias("v"),
    )
    # equidistant centroids -> lexicographic struct min picks cid 3
    out = assign_clusters(pts, {7: [0.0, 0.0], 3: [2.0, 2.0]}).collect()
    assert out[0]["cluster_id"] == 3


def test_empty_cluster_drops_out(spark):
    # k=3 but only two distinct points: one centroid captures nothing
    rows = [(0, [0.0, 0.0]), (1, [0.0, 0.0]), (2, [5.0, 5.0])]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    assigned, centroids = lloyd_kmeans(df, k=3, iters=2)
    assert len(centroids) == 2
    assert assigned.count() == 3


def _rand_pts(spark, n=120, d=16, seed=7):
    import random

    rng = random.Random(seed)
    rows = [(i, [rng.uniform(-1, 1) for _ in range(d)]) for i in range(n)]
    df = spark.createDataFrame(rows, "id long, v array<double>")
    return df


def test_gemm_assignment_matches_literal_path(spark):
    import random

    rng = random.Random(13)
    pts = _rand_pts(spark, n=120, d=16)
    centroids = {
        cid: [rng.uniform(-1, 1) for _ in range(16)] for cid in range(6)
    }
    lit = assign_clusters(pts, centroids, gemm_threshold=10**9)
    gemm = assign_clusters_gemm(pts, centroids)
    a = {r["id"]: r["cluster_id"] for r in lit.collect()}
    b = {r["id"]: r["cluster_id"] for r in gemm.collect()}
    assert a == b


def test_gemm_path_keeps_literals_out_of_plan(spark):
    # above the threshold the plan must carry a broadcast handle, not
    # O(k·d) literal arrays: probe for a sentinel centroid component
    pts = _rand_pts(spark, n=10, d=64)
    sentinel = 0.123456789012345
    centroids = {cid: [sentinel] * 64 for cid in range(100)}  # k·d = 6400
    df = assign_clusters(pts, centroids)  # dispatches to GEMM
    plan = df._jdf.queryExecution().analyzed().toString()
    assert "mapInPandas" in plan or "MapInPandas" in plan
    assert str(sentinel) not in plan
    # below the threshold the literal (oracle-replayable) path remains
    small = assign_clusters(pts, {0: [sentinel] * 64})
    small_plan = small._jdf.queryExecution().analyzed().toString()
    assert str(sentinel) in small_plan


def test_kmeans_tolerance_convergence_stops_early(spark):
    # two separable blobs converge in ~2 updates; with max_iters=10 the
    # tolerance check must stop the loop as soon as centroids are stable
    # — same result as a long fixed-iteration run
    df = _toy(spark)
    _, c_tol = lloyd_kmeans(df, k=2, max_iters=10, tol=1e-9)
    _, c_fix = lloyd_kmeans(df, k=2, iters=10)
    assert set(c_tol) == set(c_fix)
    for cid in c_tol:
        for a, b in zip(c_tol[cid], c_fix[cid]):
            assert abs(a - b) < 1e-12


def _md5_sub(i: int, n_subs: int) -> int:
    import hashlib

    return int(hashlib.md5(f"sub|{i}".encode()).hexdigest()[:8], 16) % n_subs


def test_split_oversized_clusters_bounds_pairs(spark):
    # one deliberately skewed cluster (90 of 100 points) must be split
    # into ceil(90/16)=6 sub-clusters; pair counts per (cluster, sub) key
    # drop from C(90,2)=4005 toward C(~15,2) per sub key (md5 bucket:
    # near-uniform, not perfectly balanced)
    rows = [(i, 0 if i < 90 else 1) for i in range(100)]
    df = spark.createDataFrame(rows, "id long, cluster_id long")
    out = split_oversized_clusters(df, cap=16)
    sizes = {
        (r["cluster_id"], r["sub"]): r["n"]
        for r in out.groupBy("cluster_id", "sub").agg(
            F.count("*").alias("n")
        ).collect()
    }
    # skewed cluster split over ceil(90/16) = 6 subs, all populated at
    # this density, each load binomial around 15 (assert a loose 2x cap)
    assert {s for (c, s) in sizes if c == 0} == set(range(6))
    assert all(n <= 32 for (c, _), n in sizes.items() if c == 0)
    # small cluster untouched (single sub 0)
    assert {s for (c, s) in sizes if c == 1} == {0}
    # split is a deterministic md5 bucket: replayable bit-for-bit
    row = out.filter(F.col("id") == 77).collect()[0]
    assert row["sub"] == _md5_sub(77, 6)


def test_split_oversized_clusters_strided_ids_still_split(spark):
    """Regression (round-10 constants sweep): with the old ``id %
    n_subs`` sub key, a mega-cluster whose members are ALL-EVEN ids and
    n_subs == 2 put every member in sub 0 — the split silently did
    nothing and the quadratic pair blow-up survived. Sharded id schemes
    (low bits = shard id) make this a realistic 100 TB hazard, not a
    synthetic corner. The md5 bucket must spread any id stride."""
    rows = [(2 * i, 0) for i in range(1000)]  # even ids only, one cluster
    df = spark.createDataFrame(rows, "id long, cluster_id long")
    out = split_oversized_clusters(df, cap=512)  # n_subs = 2
    sizes = {
        r["sub"]: r["n"]
        for r in out.groupBy("sub").agg(F.count("*").alias("n")).collect()
    }
    assert set(sizes) == {0, 1}, f"strided ids collapsed to subs {set(sizes)}"
    # near-uniform: each sub within 20% of the 500 expectation
    assert all(400 <= n <= 600 for n in sizes.values()), sizes
    # and the assignment matches the documented replayable formula
    row = out.filter(F.col("id") == 1234).collect()[0]
    assert row["sub"] == _md5_sub(1234, 2)


def test_assign_clusters_large_magnitude_argmin_correct(spark):
    """Distances >= 1e6 used to overflow round6x's decimal(18,12) inside
    the literal-path argmin (ANSI: crash; legacy: NULL -> null-first
    struct-min picked the FARTHEST centroid). The micro-unit comparison
    must pick the near centroid and agree with the GEMM path."""
    from earthquake_data_pipeline_spark.operators.clustering import (
        assign_clusters,
        assign_clusters_gemm,
    )

    cents = {1: [2_000_000.0, 0.0], 2: [500_000.0, 0.0]}
    df = spark.createDataFrame(
        [(1, [0.0, 0.0]), (2, [1_900_000.0, 0.0])], ["id", "v"]
    )
    lit = {r.id: r.cluster_id for r in assign_clusters(df, cents).collect()}
    gemm = {
        r.id: r.cluster_id
        for r in assign_clusters_gemm(df, cents).collect()
    }
    # point 1 is 2e6 from c1, 5e5 from c2 -> c2; point 2 is 1e5 from c1
    assert lit == {1: 2, 2: 1}
    assert lit == gemm


def test_kcenter_select_edge_cases(spark):
    """k<=0 and empty frames return []; k beyond the distinct point
    count stops early instead of emitting duplicate centers."""
    from earthquake_data_pipeline_spark.operators.clustering import (
        kcenter_select,
    )

    empty = spark.createDataFrame([], "id long, v array<double>")
    assert kcenter_select(empty, k=3) == []

    df = spark.createDataFrame(
        [(1, [0.0, 0.0]), (2, [3.0, 0.0]), (3, [0.0, 4.0])], ["id", "v"]
    )
    assert kcenter_select(df, k=0) == []
    got = kcenter_select(df, k=10)
    ids = [cid for _, cid, _ in got]
    assert len(ids) == len(set(ids)) == 3  # no duplicate centers


def test_kcenter_select_single_center(spark):
    """k=1, and a 1-row corpus with k>=2 (early stop), both reach the
    final-radius aggregate with exactly ONE chosen center — F.least
    needs >=2 columns, so the final aggregate must use the same
    single-column guard as the in-loop code (ADVICE r07)."""
    from earthquake_data_pipeline_spark.operators.clustering import (
        kcenter_select,
    )

    df = spark.createDataFrame(
        [(1, [0.0, 0.0]), (2, [3.0, 0.0])], ["id", "v"]
    )
    got = kcenter_select(df, k=1)
    assert [(r, cid) for r, cid, _ in got] == [(0, 1)]
    assert got[0][2] == 3.0  # farthest point from the lone center

    one = spark.createDataFrame([(7, [1.0, 2.0])], ["id", "v"])
    got = kcenter_select(one, k=3)  # early stop after the seed
    assert [(r, cid) for r, cid, _ in got] == [(0, 7)]
    assert got[0][2] == 0.0


def test_kcenter_coreset_identical_to_exact_when_sample_covers(spark):
    """Parity contract: with sample_size >= |df| the coreset variant
    must reproduce kcenter_select EXACTLY — ranks, ids, and radii —
    because the sample is the corpus and every arithmetic step mirrors
    the distributed expressions (dimension-order fold, round6x
    replica, smallest-id seed, ties by id)."""
    import random

    from earthquake_data_pipeline_spark.operators.clustering import (
        kcenter_select,
        kcenter_select_coreset,
    )

    rng = random.Random(42)
    pts = [
        (i, [rng.uniform(-10, 10) for _ in range(5)]) for i in range(40)
    ]
    pts.append((100, list(pts[3][1])))  # duplicate vector, distinct id
    df = spark.createDataFrame(pts, ["id", "v"])
    for k in (1, 2, 6):
        exact = kcenter_select(df, k=k)
        coreset = kcenter_select_coreset(df, k=k, sample_size=1000)
        assert coreset == exact, f"k={k}: {coreset} vs {exact}"


def test_kcenter_coreset_proper_sample_properties(spark):
    """With a PROPER sample: k distinct centers drawn from the corpus,
    sample radii non-increasing, and the final entry is the exact
    full-corpus coverage radius (>= 0, >= what the k exact centers
    would not necessarily achieve — no cross-variant ordering is
    guaranteed, so assert the radius is the true max-dmin by
    recomputing it brute-force on the driver)."""
    import math
    import random

    from earthquake_data_pipeline_spark.operators.clustering import (
        _round6x_py,
        kcenter_select_coreset,
    )

    rng = random.Random(7)
    pts = [(i, [rng.uniform(0, 100), rng.uniform(0, 100)]) for i in range(300)]
    df = spark.createDataFrame(pts, ["id", "v"])
    k = 5
    got = kcenter_select_coreset(df, k=k, sample_size=64)
    assert len(got) == k
    ids = [cid for _, cid, _ in got]
    assert len(set(ids)) == k and set(ids) <= {i for i, _ in pts}
    radii = [r for _, _, r in got]
    assert all(radii[i] >= radii[i + 1] for i in range(k - 2))  # sample radii
    # final radius is the exact coverage radius of the chosen centers
    vecs = dict(pts)
    centers = [vecs[c] for c in ids]
    brute = max(
        min(
            _round6x_py(
                math.sqrt(sum((a - b) * (a - b) for a, b in zip(p, c)))
            )
            for c in centers
        )
        for _, p in pts
    )
    assert got[-1][2] == brute


def test_kcenter_coreset_edge_cases(spark):
    from earthquake_data_pipeline_spark.operators.clustering import (
        kcenter_select_coreset,
    )

    empty = spark.createDataFrame([], "id long, v array<double>")
    assert kcenter_select_coreset(empty, k=3) == []
    df = spark.createDataFrame(
        [(1, [0.0, 0.0]), (2, [3.0, 0.0])], ["id", "v"]
    )
    assert kcenter_select_coreset(df, k=0) == []
    got = kcenter_select_coreset(df, k=10, sample_size=8)
    ids = [cid for _, cid, _ in got]
    assert len(ids) == len(set(ids)) == 2  # early stop, no dup centers
