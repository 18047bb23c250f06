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
- Bucket sizes are bounded by LSH design (the bands/rows trade-off), the
  same bound that keeps a self-join from exploding; the `distinct()` is
  the cross-band dedup every banded scheme needs.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def bucket_pairs(
    bands: DataFrame, bucket_cols: Sequence[str], id_col: str
) -> DataFrame:
    """(bucket_cols..., id_col) rows → distinct (id_a, id_b), id_a < id_b,
    for every pair sharing any bucket."""
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
