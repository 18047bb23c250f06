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


# Above this k×d product, literal-array assignment is the wrong plan: the
# logical plan embeds k·d literals (multi-MB at SemDeDup-realistic scale)
# and the per-row fold is an O(k·d) interpreted expression. The GEMM path
# broadcasts the centroid matrix once instead (same trap the LSH plane
# signatures escaped — similarity.py's broadcast-matrix pattern).
GEMM_THRESHOLD = 4096


def _sq_dist(vec_col, centroid: list[float]):
    arr = F.array(*[F.lit(float(x)) for x in centroid])
    return F.aggregate(
        F.zip_with(vec_col, arr, lambda a, b: (a - b) * (a - b)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def assign_clusters(
    df: DataFrame,
    centroids: dict[int, list[float]],
    vec_col: str = "v",
    gemm_threshold: int = GEMM_THRESHOLD,
) -> DataFrame:
    """Map-only deterministic assignment: argmin over centroids of the
    6dp-rounded euclidean distance, ties broken by centroid id.

    Two physical strategies behind one contract:
    - small k×d (≤ ``gemm_threshold``): centroids as literal arrays,
      distance folded in whole-stage codegen, argmin via lexicographic
      ``array_min`` over (dist, cid) structs — zero Python, and the form
      a SQL oracle replays term by term;
    - large k×d: broadcast numpy centroid matrix + one Arrow-batched
      GEMM per partition (``assign_clusters_gemm``) — the plan carries a
      broadcast handle, not O(k·d) literals.
    """
    k = len(centroids)
    d = len(next(iter(centroids.values()))) if k else 0
    if k == 0:
        # Empty centroid dict (an empty table reached lloyd_kmeans'
        # driver-side init, or every cluster dropped out): zero structs
        # would build a zero-arg F.array() literal typed VOID, which
        # crashes at analysis — the round-10 empty-input audit's
        # crash-on-empty class. A null assignment of the correct type
        # keeps the operator total; at 100 TB an empty date-partition
        # is routine and must not kill the job.
        return df.withColumn("cluster_id", F.lit(None).cast("long"))
    if k * d > gemm_threshold:
        return assign_clusters_gemm(df, centroids, vec_col)
    # The comparison value is floor(dist·1e6 + 0.5) — the EXACT formula
    # the GEMM path uses — kept as a double of micro-units. round6x's
    # decimal(18,12) cast was wrong here: any distance ≥ 1e6 overflows
    # it (ANSI: crash; legacy: NULL, and null-first struct ordering then
    # picks the FARTHEST centroid as the argmin). The micro-unit double
    # is monotone to 2^53 (distances ~9e9) and argmin-identical to the
    # old form everywhere the old form was defined; the struct's "d" is
    # never emitted, so outputs are unchanged.
    structs = [
        F.struct(
            F.floor(
                F.sqrt(_sq_dist(F.col(vec_col), c)) * 1e6 + F.lit(0.5)
            ).alias("d"),
            F.lit(int(cid)).alias("cid"),
        )
        for cid, c in sorted(centroids.items())
    ]
    return df.withColumn(
        "cluster_id", F.array_min(F.array(*structs)).getField("cid").cast("long")
    )


def assign_clusters_gemm(
    df: DataFrame, centroids: dict[int, list[float]], vec_col: str = "v"
) -> DataFrame:
    """Broadcast-matrix assignment — same contract as the literal path
    (6 dp HALF_UP-rounded euclidean argmin, lowest cid on ties) without
    O(k·d) literals in the plan.

    ``||x-c||² = ||x||² - 2x·c + ||c||²`` as one GEMM per Arrow batch;
    the rounding is ``floor(d·1e6 + 0.5)`` — HALF_UP on non-negative
    values, matching the literal path's decimal rounding. The two paths
    can differ only when a distance sits within float ulps of a 1e-6
    rounding boundary AND that flips the argmin (tie-adjacent by < 1e-6)
    — the same measure-zero caveat round6x already documents.
    """
    import numpy as np
    from pyspark.sql import types as T

    cids = sorted(centroids)
    C = np.array([centroids[c] for c in cids], dtype=np.float64)
    cid_arr = np.array(cids, dtype=np.int64)
    bc = df.sparkSession.sparkContext.broadcast((C, cid_arr))
    out_schema = T.StructType(
        list(df.schema.fields) + [T.StructField("cluster_id", T.LongType(), False)]
    )

    def fn(batches):
        import pandas as pd  # noqa: F401 — Arrow batch type

        Cm, ids = bc.value
        c_sq = (Cm * Cm).sum(axis=1)
        for pdf in batches:
            if len(pdf) == 0:
                continue
            X = np.array(list(pdf[vec_col]), dtype=np.float64)
            x_sq = (X * X).sum(axis=1)
            d2 = np.maximum(x_sq[:, None] - 2.0 * (X @ Cm.T) + c_sq[None, :], 0.0)
            scaled = np.floor(np.sqrt(d2) * 1e6 + 0.5)  # HALF_UP at 6 dp
            # argmin returns the FIRST min; cids are sorted ascending, so
            # ties resolve to the lowest cid — the struct-min tiebreak
            pdf = pdf.copy()
            pdf["cluster_id"] = ids[scaled.argmin(axis=1)]
            yield pdf

    return df.mapInPandas(fn, out_schema)


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
    iters: int | None = None,
    max_iters: int = 20,
    tol: float = 1e-6,
) -> tuple[DataFrame, dict[int, list[float]]]:
    """Run Lloyd iterations until the max centroid L2 shift drops to
    ``tol`` or ``max_iters`` is hit; pass ``iters`` to run EXACTLY that
    many instead (the oracle-replayable fixed-step mode the gate query
    uses). Initial centroids are the k rows with the lowest ids
    (deterministic, oracle-expressible init — seeded sampling would tie
    the result to an RNG implementation).

    The convergence check is driver-side on the already-collected k×d
    centroid rows — no extra distributed work per iteration.

    Returns (assignments with final cluster_id, final centroid dict).
    A cluster that captures no points simply drops out of the centroid
    dict (standard Lloyd's degeneracy handling; deterministic, and the
    SQL oracle reproduces it because its update join drops the cid too).
    A dropped cluster counts as a shift of +inf for the tolerance check
    (the partition changed structurally, so iterate again).
    """
    from ..qcommon import reuse

    # Pin the iterated frame once (r17 optimization, guide §5): every
    # Lloyd round runs TWO actions over pts (assignment+update collect),
    # plus the init collect and the caller's final action — without the
    # pin each one re-runs the upstream scan/projection (and any
    # _fanout repartition the caller added). One materialization, then
    # every round reads executor-resident blocks; the standard persist
    # discipline for iterative ML inputs.
    pts = reuse(
        df.select(
            F.col(id_col).alias("id"),
            F.col(vec_col).cast("array<double>").alias("v"),
        )
    )
    init = pts.orderBy("id").limit(k).collect()
    centroids = {int(r["id"]): list(r["v"]) for r in init}
    n_steps = iters if iters is not None else max_iters
    for _ in range(n_steps):
        assigned = assign_clusters(pts, centroids)
        rows = _update_centroids(assigned).collect()  # k × d rows — bounded
        by_cid: dict[int, dict[int, float]] = {}
        for r in rows:
            by_cid.setdefault(int(r["cluster_id"]), {})[int(r["pos"])] = r["c"]
        new = {
            cid: [comps[p] for p in sorted(comps)]
            for cid, comps in sorted(by_cid.items())
        }
        converged = iters is None and set(new) == set(centroids) and all(
            sum((a - b) ** 2 for a, b in zip(new[cid], centroids[cid])) <= tol * tol
            for cid in new
        )
        centroids = new
        if converged:
            break
    return assign_clusters(pts, centroids), centroids


def split_oversized_clusters(
    assigned: DataFrame,
    cap: int,
    id_col: str = "id",
    cluster_col: str = "cluster_id",
) -> DataFrame:
    """Bound every cluster at ~``cap`` members by deterministically
    splitting oversized ones into ``ceil(n/cap)`` sub-clusters
    (``sub = md5_bucket(id) % n_subs``); adds a ``sub`` column (0 for
    clusters already under the cap).

    Why: within-cluster pair search is C(n_c, 2). Real embedding corpora
    reliably produce one dense mega-mode cluster, and at 100 TB that one
    key is a quadratic blow-up — a textbook skew scale-killer. With the
    cap, the worst cluster costs ceil(n/cap) · C(cap, 2) ≈ n·cap/2 pairs:
    LINEAR in n for fixed cap.

    The sub key is an md5-derived bucket of the id, NOT ``id % n_subs``:
    plain modulo silently degenerates when ids are strided — with
    sharded id schemes (low bits = shard, e.g. all-even ids) every
    member of a cluster can share ``id mod n_subs``, so the "split"
    produces ONE sub-cluster and the quadratic blow-up survives intact
    (round-10 constants sweep caught exactly this: a 64k-member
    mega-cluster of even ids, n_subs=2, pair-mass ratio 1.0). The md5
    bucket is near-uniform for ANY id distribution; per-sub load is
    binomial around cap with overflow probability exp(-Θ(cap)) by
    Chernoff, so the linear pair-mass bound holds with high probability
    instead of only for dense ids.

    Deterministic and SQL-replayable by design: the bucket is
    ``conv(substring(md5('sub|' || id), 1, 8), 16, 10) % n_subs`` —
    DuckDB replays it exactly as
    ``('0x' || substring(md5('sub|' || id), 1, 8))::BIGINT % n_subs``
    (the repo-standard md5-bucket idiom; 8 hex chars < 2^32 so the
    value is non-negative and fits BIGINT in both engines). The sizes
    side of the join is one row per cluster — broadcast, no extra
    shuffle of the points.
    """
    sizes = assigned.groupBy(cluster_col).agg(F.count("*").alias("_n"))
    n_subs = F.ceil(F.col("_n") / F.lit(int(cap))).cast("long")
    bucket = F.conv(
        F.substring(
            F.md5(F.concat(F.lit("sub|"), F.col(id_col).cast("string"))), 1, 8
        ),
        16,
        10,
    ).cast("long")
    return (
        assigned.join(
            F.broadcast(sizes.select(cluster_col, n_subs.alias("_n_subs"))),
            cluster_col,
        )
        .withColumn("sub", F.pmod(bucket, F.col("_n_subs")).cast("long"))
        .drop("_n_subs")
    )


def kcenter_select(
    df: DataFrame,
    k: int,
    vec_col: str = "v",
    id_col: str = "id",
) -> list[tuple[int, int, float | None]]:
    """Greedy k-center (Gonzalez 1985, farthest-point traversal):
    coverage-maximizing subset selection — the diversity complement to
    SemDeDup's redundancy pruning (pick the k exemplars that MINIMIZE
    the worst point's distance to its nearest exemplar, 2-approx of the
    optimal k-center radius).

    Deterministic contract: seed = smallest id; each step adds the
    point with the LARGEST 6dp-rounded euclidean distance to its
    nearest chosen center (ties -> smallest id) — the same rounded-
    distance discipline assign_clusters proved oracle-replayable.

    Returns [(sel_rank, id, radius_after)] driver-side: k+1 bounded
    actions (one TakeOrdered per step + a final max), each a full scan
    with the chosen vectors as literals — at 100 TB this is k linear
    passes, the canonical distributed farthest-point shape (and why k
    stays small; for large k, switch to k-means++ style sampling).
    ``radius_after`` for rank i is the coverage radius once centers
    0..i are all placed (max dmin over the corpus).

    Envelope: distances share round6x's decimal(18,12) range (< 1e6);
    beyond it, switch the comparison to the micro-unit form
    assign_clusters uses. Selecting more centers than there are
    distinct ids stops early (never re-selects an id; duplicate
    VECTORS under distinct ids are still eligible and appear with
    radius contribution 0 — dedupe upstream if exemplars must be
    vector-distinct); ``k <= 0`` or an empty frame returns [].
    """
    from ..qcommon import reuse, round6x

    if k <= 0:
        return []
    # Pin once (r17, guide §5): the traversal runs k+1 sequential
    # actions over this frame; without the pin each TakeOrdered re-runs
    # the caller's scan/projection (and any _fanout repartition) before
    # the distance fold. One materialization, k+1 checkpoint scans.
    df = reuse(df.select(id_col, vec_col))
    seed_rows = df.orderBy(id_col).limit(1).collect()
    if not seed_rows:
        return []
    seed = seed_rows[0]
    chosen: list[tuple[int, list[float]]] = [
        (int(seed[0]), list(seed[1]))
    ]
    radii: list[float] = []  # radii[i] = coverage radius of chosen[0..i]
    for _ in range(k - 1):
        dists = [
            round6x(F.sqrt(_sq_dist(F.col(vec_col), c)))
            for _, c in chosen
        ]
        dmin = dists[0] if len(dists) == 1 else F.least(*dists)
        far_rows = (
            df.filter(
                ~F.col(id_col).isin([cid for cid, _ in chosen])
            )
            .select(
                F.col(id_col).alias("id"),
                F.col(vec_col).alias("v"),
                dmin.alias("dmin"),
            )
            .orderBy(F.desc("dmin"), F.asc("id"))
            .limit(1)
            .collect()
        )
        if not far_rows:  # fewer distinct points than k: stop early
            break
        far = far_rows[0]
        radii.append(float(far["dmin"]))
        chosen.append((int(far["id"]), list(far["v"])))
    # final coverage radius with all k centers placed
    dists = [
        round6x(F.sqrt(_sq_dist(F.col(vec_col), c))) for _, c in chosen
    ]
    dmin_final = dists[0] if len(dists) == 1 else F.least(*dists)
    last = df.agg(F.max(dmin_final).alias("r")).collect()[0]["r"]
    radii.append(float(last))
    return [
        (i, cid, radii[i]) for i, (cid, _) in enumerate(chosen)
    ]


def _round6x_py(x: float) -> float:
    """Driver-side replica of qcommon.round6x's engine semantics:
    Spark's double→decimal(18,12) cast quantizes the SHORTEST decimal
    representation (BigDecimal.valueOf) HALF_UP at 12 dp, then round(,6)
    is HALF_UP again — Decimal(repr(x)) is the same shortest repr."""
    from decimal import ROUND_HALF_UP, Decimal

    d = Decimal(repr(float(x))).quantize(
        Decimal("1e-12"), rounding=ROUND_HALF_UP
    )
    return float(d.quantize(Decimal("1e-6"), rounding=ROUND_HALF_UP))


def kcenter_select_coreset(
    df: DataFrame,
    k: int,
    vec_col: str = "v",
    id_col: str = "id",
    sample_size: int = 4096,
) -> list[tuple[int, int, float | None]]:
    """Sampled (coreset) greedy k-center — the scale path for
    kcenter_select (VERDICT r09 item 7). The exact operator runs k−1
    sequential FULL corpus scans (one TakeOrdered per center): correct
    but O(k) full-scan latency at 100 TB. This variant:

    1. draws a deterministic hash-ordered sample (orderBy md5(id), id —
       engine-neutral, no RNG) of ``sample_size`` rows to the driver
       (bounded: sample_size × d doubles, same contract as the IVF
       training sample, similarity.py);
    2. runs the SAME greedy farthest-point traversal driver-side over
       the sample — numpy distance accumulation in dimension order
       (matching F.aggregate's left-to-right fold) and _round6x_py
       rounding (matching round6x bit-for-bit on both engines'
       shortest-repr semantics), seed = smallest sampled id, ties by
       smallest id;
    3. pays ONE distributed full scan at the end for the true coverage
       radius of the chosen centers (same F.least/round6x expression as
       the exact path's final aggregate).

    Parity contract (property-tested): when ``sample_size >= |df|`` the
    output — ranks, ids, AND radii — is identical to kcenter_select's,
    because the sample IS the corpus and every arithmetic step mirrors
    the distributed expressions. When the sample is proper, the
    intermediate ``radius_after`` values are sample-coverage radii
    (documented approximation; Gonzalez-on-a-uniform-sample is the
    standard coreset construction) while the FINAL radius is exact over
    the full corpus.

    The catalog query kcenter_select keeps the exact operator (its
    brute-force oracle replays k scans); this variant is the documented
    switch once k or the corpus outgrows the k-scan budget.
    """
    import numpy as np

    from ..qcommon import round6x

    if k <= 0:
        return []
    rows = (
        df.select(id_col, vec_col)
        .orderBy(
            F.md5(F.col(id_col).cast("string")), F.col(id_col)
        )
        .limit(int(sample_size))
        .collect()
    )
    if not rows:
        return []
    ids = np.array([int(r[0]) for r in rows], dtype=np.int64)
    X = np.array([list(r[1]) for r in rows], dtype=np.float64)
    n, d = X.shape

    def dists_to(c: np.ndarray) -> np.ndarray:
        acc = np.zeros(n, dtype=np.float64)
        for j in range(d):  # dimension-order fold == F.aggregate
            diff = X[:, j] - c[j]
            acc = acc + diff * diff
        raw = np.sqrt(acc)
        return np.array([_round6x_py(v) for v in raw], dtype=np.float64)

    seed_pos = int(np.argmin(ids))
    chosen_pos = [seed_pos]
    sample_radii: list[float] = []
    dmin = dists_to(X[seed_pos])
    dmin[seed_pos] = -1.0  # chosen ids never re-selected
    for _ in range(min(k, n) - 1):
        best = np.max(dmin)
        if best < 0:  # sample exhausted
            break
        cand = np.where(dmin == best)[0]
        pos = int(cand[np.argmin(ids[cand])])  # ties -> smallest id
        sample_radii.append(float(best))
        chosen_pos.append(pos)
        nd = dists_to(X[pos])
        dmin = np.minimum(dmin, nd)
        dmin[pos] = -1.0
    # one full-scan exact coverage radius, identical expression to the
    # exact path's final aggregate
    dists = [
        round6x(F.sqrt(_sq_dist(F.col(vec_col), list(X[p]))))
        for p in chosen_pos
    ]
    dmin_final = dists[0] if len(dists) == 1 else F.least(*dists)
    last = df.agg(F.max(dmin_final).alias("r")).collect()[0]["r"]
    sample_radii.append(float(last))
    return [
        (i, int(ids[p]), sample_radii[i])
        for i, p in enumerate(chosen_pos)
    ]
