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
