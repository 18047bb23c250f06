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
    dedup_keep_list opt in). Hub choice is ids[0] — the bucket's min
    id in the sorted collect_set — so star pairs keep id_a < id_b and
    stay deterministic/SQL-replayable.
    """
    buckets = (
        bands.groupBy(*bucket_cols)
        .agg(F.sort_array(F.collect_set(id_col)).alias("ids"))
        .filter(F.size("ids") > 1)
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
    if star_over is None:
        combos = clique
    else:
        star = F.transform(
            F.slice(F.col("ids"), 2, F.size("ids")),
            lambda y: F.struct(
                F.col("ids")[0].alias("id_a"), y.alias("id_b")
            ),
        )
        combos = F.when(F.size("ids") <= F.lit(int(star_over)), clique).otherwise(
            star
        )
    return (
        buckets.select(F.explode(combos).alias("p"))
        .select(F.col("p.id_a"), F.col("p.id_b"))
        .distinct()
    )
