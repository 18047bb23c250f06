"""Shared LSH-bucket pair expansion (DEFERRED r07(c) extraction).

Both LSH families — MinHash over shingle sets (fuzzy_dedup) and
hyperplane signatures over dense vectors (similarity) — end the same
way: rows keyed by a (band, key) bucket become distinct candidate pairs
(id_a < id_b). The shape matters at scale:

- Bucket-side expansion instead of a self-join: a self-join would
  evaluate the whole scan→signature subtree TWICE (Catalyst reuses
  exchanges, not arbitrary subtrees) — measured 2× the query cost.
- One groupBy per bucket collects the bucket's sorted id set; pairs are
  the in-array (i<j) combinations via higher-order functions, so only
  IDS ever sit in a collect_set — shingle sets / dense vectors never do,
  keeping bucket memory O(ids).
- Bucket sizes are bounded by LSH design (the bands/rows trade-off) for
  DISTINCT inputs — but NOT for duplicate mass. A web-scale corpus
  reliably contains thousands-to-millions of byte-identical documents
  (empty pages, boilerplate, error pages); identical docs share every
  band key, so they all land in ONE bucket per band and the clique
  expansion is C(m, 2) regardless of LSH parameters. Measured
  (round-10 probe, local[32]): 8k identical docs → 32.0M candidate
  pairs in 100 s, pure quadratic; at 1M identical docs that is 5e11
  pairs — the job dies. ``star_over`` is the guard; see below.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..qcommon import reuse


def bucket_pairs(
    bands: DataFrame,
    bucket_cols: Sequence[str],
    id_col: str,
    star_over: int | None = None,
) -> DataFrame:
    """(bucket_cols..., id_col) rows → distinct (id_a, id_b), id_a < id_b,
    for every pair sharing any bucket.

    ``star_over`` (opt-in) bounds the quadratic hot-bucket hazard: a
    bucket with more than ``star_over`` members emits STAR pairs —
    (min id, other) for each other member, O(m) — instead of the full
    C(m, 2) clique. The star spans exactly the same vertex set, so any
    CONNECTIVITY consumer (connected components, duplicate groups,
    keep-lists, per-component counts) gets BIT-IDENTICAL results: every
    clique edge (b, c) is implied by the star path b–hub–c, and no new
    edge crosses buckets. Consumers whose OUTPUT is the pair list
    itself (minhash_lsh, lsh_jaccard_refine — each candidate pair gets
    individually verified/emitted) must keep the default ``None``:
    a star would skip verifying (b, c) even though near-duplicate
    similarity is not transitive at a threshold.

    With the guard, the worst bucket costs m star pairs instead of
    C(m, 2): the round-10 probe's 8k-identical-doc corpus drops from
    32.0M pairs / 100 s to ~8k pairs, and duplicate-mass corpora stop
    being a scale-killer for the dedup pipelines (dedup_components /
    dedup_keep_list opt in). Hub choice is the bucket's min id, so
    star pairs keep id_a < id_b and stay deterministic/SQL-replayable.

    Memory shape of the guarded path: the oversized branch NEVER
    collects the bucket into an array — the hub comes from a plain
    groupBy-min (constant state per bucket) and star pairs are emitted
    by an equi-join of the band rows against the hub row, so a bucket
    of a BILLION identical ids streams through in O(1) task memory.
    ``collect_set`` runs only over buckets already counted ≤
    ``star_over`` (the size filter happens BEFORE the collect, on the
    count aggregate). Both aggregations and the join hash-partition on
    the same bucket key, so the guard costs one extra exchange-reused
    pass, not a new shuffle of the data.
    """
    if star_over is None:
        buckets = (
            bands.groupBy(*bucket_cols)
            .agg(F.sort_array(F.collect_set(id_col)).alias("ids"))
            .filter(F.size("ids") > 1)
        )
        combos = F.flatten(
            F.transform(
                "ids",
                lambda x, i: F.transform(
                    F.slice(F.col("ids"), i + 2, F.size("ids")),
                    lambda y: F.struct(x.alias("id_a"), y.alias("id_b")),
                ),
            )
        )
        return (
            buckets.select(F.explode(combos).alias("p"))
            .select(F.col("p.id_a"), F.col("p.id_b"))
            .distinct()
        )

    cols = list(bucket_cols)
    # the guarded path references bands three times (sizes, small join,
    # big join) — pin with reuse() so the signature subtree runs ONCE
    # (Catalyst reuses exchanges, not arbitrary subtrees)
    bands = reuse(bands)
    # constant-state per-bucket stats: never an array, any bucket size
    sizes = reuse(
        bands.groupBy(*cols).agg(
            F.min(id_col).alias("_hub"), F.count_distinct(id_col).alias("_n")
        )
    )
    small = (
        bands.join(
            sizes.filter(
                (F.col("_n") > 1) & (F.col("_n") <= F.lit(int(star_over)))
            ).select(*cols),
            cols,
        )
        .groupBy(*cols)
        .agg(F.sort_array(F.collect_set(id_col)).alias("ids"))
    )
    clique = F.flatten(
        F.transform(
            "ids",
            lambda x, i: F.transform(
                F.slice(F.col("ids"), i + 2, F.size("ids")),
                lambda y: F.struct(x.alias("id_a"), y.alias("id_b")),
            ),
        )
    )
    small_pairs = small.select(F.explode(clique).alias("p")).select(
        F.col("p.id_a"), F.col("p.id_b")
    )
    big_pairs = (
        bands.join(
            sizes.filter(F.col("_n") > F.lit(int(star_over))).select(
                *cols, "_hub"
            ),
            cols,
        )
        .filter(F.col(id_col) != F.col("_hub"))
        .select(F.col("_hub").alias("id_a"), F.col(id_col).alias("id_b"))
    )
    return small_pairs.union(big_pairs).distinct()
