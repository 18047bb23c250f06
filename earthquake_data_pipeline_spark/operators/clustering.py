"""Lloyd's k-means over an embedding column — the clustering stage of
cluster-based corpus curation (SemDeDup-style: cluster, then dedup or
diversity-sample within clusters).

Shape is the canonical distributed Lloyd's:

- centroids live on the DRIVER (k × d doubles — bounded and tiny, like
  the IVF training sample in operators/similarity.py), broadcast into
  the plan as literal arrays each iteration;
- assignment is a MAP-ONLY pass (no shuffle): per row, fold the squared
  distance to each centroid inside whole-stage codegen and take the
  lexicographic min of (rounded_distance, centroid_id) structs — the
  deterministic argmin;
- the update step shuffles only (cluster, component) partial sums — k × d
  groups regardless of corpus size, never vectors × rows.

At 100 TB the per-iteration cost is one scan + one k×d-group aggregate,
which is exactly how large-scale k-means is run; iterations are O(few).

Determinism contract (what makes a DuckDB oracle possible, mirroring
cosine_topk): distances are rounded to 6 dp before the argmin with the
centroid id as tiebreak, and centroid means accumulate per-component in
DECIMAL(28,12) — so both engines compute bit-identical centroids and
identical assignments.

Reference parity: the reference has no clustering; this extends the
north-star training-data operator set (SURVEY.md §6).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..qcommon import round6x


def _sq_dist(vec_col, centroid: list[float]):
    arr = F.array(*[F.lit(float(x)) for x in centroid])
    return F.aggregate(
        F.zip_with(vec_col, arr, lambda a, b: (a - b) * (a - b)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def assign_clusters(
    df: DataFrame, centroids: dict[int, list[float]], vec_col: str = "v"
) -> DataFrame:
    """Map-only deterministic assignment: argmin over centroids of the
    6dp-rounded euclidean distance, ties broken by centroid id (struct
    array_min is lexicographic on (dist, cid))."""
    structs = [
        F.struct(
            round6x(F.sqrt(_sq_dist(F.col(vec_col), c))).alias("d"),
            F.lit(int(cid)).alias("cid"),
        )
        for cid, c in sorted(centroids.items())
    ]
    return df.withColumn(
        "cluster_id", F.array_min(F.array(*structs)).getField("cid").cast("long")
    )


def _update_centroids(assigned: DataFrame, vec_col: str = "v") -> DataFrame:
    """Shuffle k×d partial sums; per-component mean in exact decimal so
    the result is addition-order-independent (bit-stable across retries,
    partitionings, and engines)."""
    long = assigned.select(
        "cluster_id", F.posexplode(vec_col).alias("pos0", "comp")
    )
    return long.groupBy(
        "cluster_id", (F.col("pos0") + 1).cast("long").alias("pos")
    ).agg(
        (
            F.sum(F.col("comp").cast("decimal(28,12)")).cast("double")
            / F.count("*")
        ).alias("c"),
        F.count("*").alias("n_points"),
    )


def lloyd_kmeans(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 8,
    iters: int = 2,
) -> tuple[DataFrame, dict[int, list[float]]]:
    """Run ``iters`` Lloyd iterations; initial centroids are the k rows
    with the lowest ids (deterministic, oracle-expressible init — seeded
    sampling would tie the result to an RNG implementation).

    Returns (assignments with final cluster_id, final centroid dict).
    A cluster that captures no points simply drops out of the centroid
    dict (standard Lloyd's degeneracy handling; deterministic, and the
    SQL oracle reproduces it because its update join drops the cid too).
    """
    pts = df.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).cast("array<double>").alias("v"),
    )
    init = pts.orderBy("id").limit(k).collect()
    centroids = {int(r["id"]): list(r["v"]) for r in init}
    for _ in range(iters):
        assigned = assign_clusters(pts, centroids)
        rows = _update_centroids(assigned).collect()  # k × d rows — bounded
        by_cid: dict[int, dict[int, float]] = {}
        for r in rows:
            by_cid.setdefault(int(r["cluster_id"]), {})[int(r["pos"])] = r["c"]
        centroids = {
            cid: [comps[p] for p in sorted(comps)]
            for cid, comps in sorted(by_cid.items())
        }
    return assign_clusters(pts, centroids), centroids
