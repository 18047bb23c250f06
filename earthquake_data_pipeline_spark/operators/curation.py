"""Score-driven corpus curation: quality binning and nucleus (top-p)
selection.

Training-data mixtures are rarely a flat keep/drop: pipelines bin
documents by a quality score (to up/down-weight bins in the mixture)
and take the best mass per stratum up to a budget (nucleus-style
selection — keep the highest-scoring documents until they account for
fraction p of the stratum's total mass). Both are one-window-one-agg
DataFrame shapes partitioned by the stratum key (language here) — no
GLOBAL sort anywhere.

Scale honesty (the percentile_stats/approx_stats pairing applies):
a partitioned window still sorts each stratum IN ONE TASK, so these
exact forms hold while every stratum fits an executor — fine for
many-strata keys (user, domain), NOT for "5 languages × 20 TB each".
At that shape the scale path is sketch-first: percentile_approx
boundaries per stratum (map-side-merged, k×10 rows) and a map-only
``width_bucket``-style assignment against the broadcast boundaries —
same output schema, approximate bin edges. These exact forms are the
oracle-checkable faces; pipelines at mega-stratum scale should swap in
the sketch boundary step (the approx_stats pattern) and keep the rest
of the plan unchanged.

Determinism contract: ordering keys always end with the unique doc id,
and the top-p boundary test is integer arithmetic (exclusive-cumsum·q <
total·p·q over integer masses), so every engine selects the identical
document set.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def quality_decile_stats(
    docs: DataFrame,
    stratum_col: str = "lang",
    score_col: str = "n_chars",
    id_col: str = "doc_id",
    n_bins: int = 10,
) -> DataFrame:
    """Per-stratum score deciles (ntile) with per-bin mass stats — the
    audit table behind bin-weighted mixture sampling.

    ntile runs per stratum (key-partitioned window, standard-SQL even
    distribution with remainders to the lower bins; (score, id) order
    makes the assignment total), then one aggregate per (stratum, bin).

    NULL policy (r14 pre-commitment, verified r15): both faces require
    NON-NULL (stratum, score) — Spark sorts ASC NULLS FIRST while
    DuckDB defaults to NULLS LAST, so a null score would land in a
    different bin per engine before any operator logic ran, and the
    histogram twin would additionally give NULL its own value-count
    group. Callers with nullable scores must filter or impute upstream;
    the corpus contract pins documents.(lang, n_chars) non-null
    (tests/test_testdata_contract.py).
    """
    w = Window.partitionBy(stratum_col).orderBy(score_col, id_col)
    return (
        docs.select(stratum_col, score_col, id_col)
        .withColumn("bin", F.ntile(n_bins).over(w))
        .groupBy(stratum_col, "bin")
        .agg(
            F.count("*").alias("n_docs"),
            F.min(score_col).alias("min_score"),
            F.max(score_col).alias("max_score"),
            F.sum(score_col).alias("total_score"),
        )
        .orderBy(stratum_col, "bin")
    )


def quality_decile_stats_by_counts(
    docs: DataFrame,
    stratum_col: str = "lang",
    score_col: str = "n_chars",
    n_bins: int = 10,
) -> DataFrame:
    """Skew-immune twin of :func:`quality_decile_stats` (round-11
    straggler audit, executed r12): the same ntile bin census composed
    from a (stratum, score) VALUE-COUNT histogram instead of a per-
    stratum row sort — a stratum with 10^12 rows but a bounded score
    domain does O(distinct scores) window work where ntile serializes
    the whole stratum into one AQE-opaque task.

    Exactness: ntile's id tie-break only decides WHICH equal-scored
    rows land each side of a bin boundary — tied rows have equal
    scores, so each bin's VALUE MULTISET is id-independent and the
    histogram replays it exactly. Standard-SQL ntile boundaries over n
    rows: base = n div B, rem = n mod B; bin b holds sorted positions
    ((b−1)·base + min(b−1, rem), b·base + min(b, rem)]. A distinct
    score covering cumulative positions (cum−c, cum] contributes
    min(cum, end_b) − max(cum−c, start_b) rows to bin b; the explode is
    over ONLY the bins a score's range overlaps (≤ 1 + its row share),
    so the exploded frame stays histogram-sized + B rows per stratum.
    All boundary arithmetic is integer (ceil(p/q) as (p+q−1) DIV q) —
    no double rounding at 10^12-row strata.

    Output schema identical to the ntile form: (stratum, bin int,
    n_docs, min_score, max_score, total_score), ordered.
    """
    from .analytics import _cum_value_counts

    j = (
        _cum_value_counts(
            docs.select(
                F.col(stratum_col).alias("k"), F.col(score_col).alias("v")
            )
        )
        .withColumn("base", F.expr(f"n DIV {int(n_bins)}"))
        .withColumn("rem", F.expr(f"n % {int(n_bins)}"))
        # positions 1..cut live in the fat (base+1-row) bins; when
        # base = 0 every position is ≤ cut = n, so the ELSE's DIV base
        # is never evaluated (CaseWhen is lazy per row)
        .withColumn("cut", F.expr("rem * (base + 1)"))
    )
    bin_lo = F.expr(
        "CASE WHEN cum - c + 1 <= cut"
        " THEN (cum - c + 1 + base) DIV (base + 1)"
        " ELSE rem + (cum - c + 1 - cut + base - 1) DIV base END"
    )
    bin_hi = F.expr(
        "CASE WHEN cum <= cut THEN (cum + base) DIV (base + 1)"
        " ELSE rem + (cum - cut + base - 1) DIV base END"
    )
    e = j.withColumn("b", F.explode(F.sequence(bin_lo, bin_hi)))
    kept = F.expr(
        "least(cum, b * base + least(b, rem))"
        " - greatest(cum - c, (b - 1) * base + least(b - 1, rem))"
    )
    return (
        e.select(
            "k",
            F.col("b").cast("int").alias("bin"),
            "v",
            kept.alias("kc"),
        )
        .filter(F.col("kc") > 0)
        .groupBy("k", "bin")
        .agg(
            F.sum("kc").alias("n_docs"),
            F.min("v").alias("min_score"),
            F.max("v").alias("max_score"),
            F.sum(F.col("kc") * F.col("v")).alias("total_score"),
        )
        .select(
            F.col("k").alias(stratum_col),
            "bin",
            "n_docs",
            "min_score",
            "max_score",
            "total_score",
        )
        .orderBy(stratum_col, "bin")
    )


def approx_bin_boundaries(
    docs: DataFrame,
    stratum_col: str = "lang",
    score_col: str = "n_chars",
    n_bins: int = 10,
    accuracy: int = 100,
) -> DataFrame:
    """Stage 1 of the sketch-first binning path promised above: per-
    stratum approximate quantile boundaries via ``percentile_approx``
    (Greenwald-Khanna sketch, map-side merged — no per-stratum sort, no
    single-task stratum bottleneck). Returns one row per stratum:
    ``(stratum, bounds array<n_bins-1>, n_total)`` — k rows total,
    broadcastable. Rank guarantee: each boundary's true rank is within
    ``n/accuracy`` of its target quantile.
    """
    qs = [i / n_bins for i in range(1, n_bins)]
    return docs.groupBy(stratum_col).agg(
        F.percentile_approx(score_col, qs, accuracy).alias("bounds"),
        F.count("*").alias("n_total"),
    )


def assign_approx_bins(
    docs: DataFrame,
    boundaries: DataFrame,
    stratum_col: str = "lang",
    score_col: str = "n_chars",
) -> DataFrame:
    """Stage 2: map-only bin assignment against the broadcast boundary
    frame — ``bin = 1 + #boundaries strictly below the score`` (ties land
    in the lower bin; deterministic). Same output meaning as
    quality_decile_stats' ntile bin, approximate edges, NO window sort —
    this composition is what replaces the exact form when single strata
    stop fitting one task.
    """
    nb = F.size("bounds") + 1
    bin_col = F.lit(1) + F.aggregate(
        "bounds",
        F.lit(0),
        lambda acc, b: acc + (b < F.col(score_col)).cast("int"),
    )
    return docs.join(F.broadcast(boundaries), stratum_col).select(
        *docs.columns, F.least(bin_col, nb).alias("bin")
    )


def approx_bins_audit(
    docs: DataFrame,
    stratum_col: str = "lang",
    score_col: str = "n_chars",
    n_bins: int = 10,
    accuracy: int = 100,
) -> DataFrame:
    """Guarantee audit of the sketch boundaries, tie-proof by design.

    A per-bin count check breaks on tied scores (a heavy tie straddling
    a boundary lumps mass into one bin no matter how exact the sketch),
    so the audit checks the RANK guarantee directly, which ties cannot
    violate: for boundary b at quantile q over n rows, the sketch
    promises a rank r with |r − qn| ≤ εn, and since
    ``count(x < b) ≤ r ≤ count(x ≤ b)`` both one-sided checks

        count(x < b)·n_bins ≤ q·n_bins·n + bound·n_bins
        count(x ≤ b)·n_bins ≥ q·n_bins·n − bound·n_bins

    are implied (bound = max(⌈2n/accuracy⌉, 2): twice the documented
    rank error, floored — generous but REAL; a broken sketch fails it).
    All comparisons are scaled-integer, no floats anywhere.

    Shape: one k-row boundary aggregate, one broadcast join, one
    conditional-sum aggregate per stratum — the per-boundary counts are
    n_bins−1 conditional sums inside ONE pass over the corpus, not a
    row fan-out. Output: (stratum, q_pct, within_bound, n_total),
    engine-portable because the engine-specific boundary VALUES never
    leave the plan — only the guarantee boolean does.
    """
    b = approx_bin_boundaries(docs, stratum_col, score_col, n_bins, accuracy)
    joined = docs.select(stratum_col, score_col).join(F.broadcast(b), stratum_col)
    sc = F.col(score_col)
    per_q = joined.groupBy(stratum_col).agg(
        F.first("n_total").alias("n_total"),
        *[
            F.sum((sc < F.element_at("bounds", i)).cast("long")).alias(f"lt{i}")
            for i in range(1, n_bins)
        ],
        *[
            F.sum((sc <= F.element_at("bounds", i)).cast("long")).alias(f"le{i}")
            for i in range(1, n_bins)
        ],
    )
    n = F.col("n_total")
    bound = F.greatest(F.ceil(n * 2 / accuracy), F.lit(2)).cast("long")
    checks = F.array(
        *[
            F.struct(
                F.lit(i * 100 // n_bins).alias("q_pct"),
                (
                    (F.col(f"lt{i}") * n_bins <= i * n + bound * n_bins)
                    & (F.col(f"le{i}") * n_bins >= i * n - bound * n_bins)
                ).alias("within_bound"),
            )
            for i in range(1, n_bins)
        ]
    )
    return (
        per_q.select(stratum_col, "n_total", F.explode(checks).alias("c"))
        .select(
            stratum_col,
            F.col("c.q_pct").alias("q_pct"),
            F.col("c.within_bound").alias("within_bound"),
            "n_total",
        )
        .orderBy(stratum_col, "q_pct")
    )


def top_p_select(
    docs: DataFrame,
    p_pct: int = 80,
    stratum_col: str = "lang",
    score_col: str = "n_chars",
    id_col: str = "doc_id",
) -> DataFrame:
    """Nucleus selection per stratum: walk documents best-first and keep
    them while the mass KEPT SO FAR (exclusive of the current doc) is
    under ``p_pct`` percent of the stratum total — the smallest
    best-first set covering ≥ p of the mass, every boundary decided in
    exact integers:

        keep  ⟺  100·cumsum_before < p_pct·total

    ``score_col`` must be integral (character/token counts are). One
    window pass per stratum computes both the running and total mass
    (same partitioning → one exchange), then a per-stratum aggregate
    reports kept counts vs totals. Selection itself never materializes
    driver-side; the returned audit frame is k rows.
    """
    w_order = (
        Window.partitionBy(stratum_col)
        .orderBy(F.desc(score_col), id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_all = Window.partitionBy(stratum_col)
    d = docs.select(stratum_col, score_col, id_col).withColumn(
        "cum", F.sum(score_col).over(w_order)
    ).withColumn("total", F.sum(score_col).over(w_all))
    keep = (
        (F.col("cum") - F.col(score_col)) * 100 < F.lit(p_pct) * F.col("total")
    ).cast("int")
    return (
        d.withColumn("keep", keep)
        .groupBy(stratum_col)
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("keep").alias("n_kept"),
            F.sum(F.col("keep") * F.col(score_col)).alias("kept_score"),
            F.sum(score_col).alias("total_score"),
        )
        .orderBy(stratum_col)
    )


def dedup_keep_list(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    quality_col: str = "n_chars",
) -> DataFrame:
    """The actionable last mile of the dedup stack: near-dup PAIRS
    (from MinHash-LSH / fingerprint join / prefix filter) → duplicate
    GROUPS (connected components) → a KEEP LIST that retains the
    highest-QUALITY document per group instead of dedup's default
    arbitrary/min-id survivor — the policy real corpus curation wants
    ("keep the longest/cleanest copy, drop the rest").

    Output: one row per document that appears in any duplicate group —
    (doc_id, component_id, quality, n_in_component, keep) with exactly
    one keep=1 per component (quality desc, id asc — a total order).

    Scale (round-11 window-skew audit): the old per-component
    row_number window serialized each component into ONE task — and
    duplicate-mass components (10^9 byte-identical copies of a hot
    page) are exactly where this operator runs, so the hot component
    became an unsplittable straggler (windows are AQE-opaque). The
    winner is now an ARGMIN AGGREGATE — min of a (null-rank, nan-rank,
    −quality, id) struct, lexicographically identical to the window's
    (quality DESC NULLS LAST, id ASC) total order including NULL and
    NaN quality (review-hardened round 11) — which
    partial-aggregates map-side, plus a component-count-sized stats
    join that AQE can skew-split: measured −45% on a 400k-row hot
    component at local[32], bit-identical output. The quality join and
    the stats join shuffle on component ids — group-count-sized, not
    corpus-sized.
    """
    from .dedup import connected_components

    comp = connected_components(pairs)
    q = docs.select(
        F.col(id_col).alias("doc_id"), F.col(quality_col).alias("quality")
    )
    j = comp.join(q, "doc_id")
    # argmin struct replaying the window's (quality DESC NULLS LAST,
    # id ASC) total order exactly: null quality loses to everything
    # (field 1 — a bare -quality would sort nulls FIRST and crown
    # them), NaN quality beats every number for float/double columns
    # (field 2 — desc ordering puts NaN first), then magnitude, then
    # id. doc_id is assumed unique in ``docs`` (it is an id): the
    # keep flag marks every row equal to the winner id.
    # the argmin rewrite builds its DESC key by NEGATION, which only
    # exists for numeric types — a string quality column would raise
    # CAST_INVALID_INPUT under ANSI or silently rank by a NULL-cast
    # double under permissive (ADVICE r11); fail loudly at plan time
    # instead
    qtype = dict(docs.dtypes).get(quality_col, "")
    _numeric = ("tinyint", "smallint", "int", "bigint", "float", "double")
    if not (qtype in _numeric or qtype.startswith("decimal")):
        raise TypeError(
            f"dedup_keep_list: quality_col {quality_col!r} must be "
            f"numeric (got {qtype or 'missing'}); the keep-winner is an "
            "argmin over -quality, which is undefined for non-numeric "
            "types — cast or derive a numeric quality score first"
        )
    order_fields = [F.col("quality").isNull().cast("int").alias("q_null")]
    if qtype in ("float", "double"):
        order_fields.append(
            (~F.isnan(F.coalesce(F.col("quality"), F.lit(0.0))))
            .cast("int")
            .alias("q_not_nan")
        )
    order_fields.append((-F.col("quality")).alias("nq"))
    stats = j.groupBy("component_id").agg(
        F.min(
            F.struct(*order_fields, F.col("doc_id").alias("id"))
        ).alias("win"),
        F.count("*").alias("n_in_component"),
    ).select(
        "component_id", F.col("win.id").alias("win_id"), "n_in_component"
    )
    return (
        j.join(stats, "component_id")
        .select(
            "doc_id",
            "component_id",
            "quality",
            "n_in_component",
            (F.col("doc_id") == F.col("win_id")).cast("int").alias("keep"),
        )
        .orderBy("doc_id")
    )
