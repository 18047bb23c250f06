"""Lloyd's k-means operator: separation, determinism, and degeneracy."""

from __future__ import annotations

from pyspark.sql import functions as F

from earthquake_data_pipeline_spark.operators.clustering import (
    assign_clusters,
    lloyd_kmeans,
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
