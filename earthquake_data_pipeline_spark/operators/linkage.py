"""Record linkage: blocked string-similarity join.

The classic two-phase shape (Fellegi-Sunter blocking + exact verify):
generate candidate pairs only WITHIN a cheap deterministic block key,
then verify with the expensive true metric (Levenshtein here — both
engines implement the identical unit-cost DP, so the distance is an
exact integer). Complements the token-set family in fuzzy_dedup.py:
edit distance catches character-level near-duplicates (typos, OCR
noise, template fills) that whole-token Jaccard misses.

Recall contract: a pair is found ONLY if it shares a block key — like
LSH, blocking trades recall for tractability, but deterministically
(same inputs, same blocks, forever). Choose block keys so true matches
agree on them (language + coarse length band here: edit distance ≤ d
implies length difference ≤ d, so a band of width ≥ d cannot split a
matching pair unless it straddles a band boundary — the documented
recall seam; run a second pass with offset bands to close it).

100 TB: pair work is Σ_blocks |block|² — the block key IS the skew
control. One shuffle on the block key; the verify predicate runs
inside the join, so no oversized candidate set ever materializes.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def blocked_edit_join(
    df: DataFrame,
    id_col: str,
    text_col: str,
    block_cols: list[Column],
    max_dist: int = 8,
    head_chars: int = 64,
) -> DataFrame:
    """Self-join: pairs (id_a < id_b) in the same block whose first
    ``head_chars`` characters are within ``max_dist`` edits. The head
    cap bounds the DP cost per pair at head_chars² — at corpus scale an
    unbounded levenshtein over multi-KB documents is the real hazard,
    not the pair count.
    """
    sel = df.select(
        F.col(id_col).alias("id"),
        F.substring(F.col(text_col), 1, head_chars).alias("head"),
        *[c.alias(f"b{i}") for i, c in enumerate(block_cols)],
    )
    a = sel.alias("a")
    b = sel.alias("b")
    on = F.col("a.id") < F.col("b.id")
    for i in range(len(block_cols)):
        on = on & (F.col(f"a.b{i}") == F.col(f"b.b{i}"))
    dist = F.levenshtein(F.col("a.head"), F.col("b.head"))
    return (
        a.join(b, on)
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            dist.cast("int").alias("edit_dist"),
        )
        .filter(F.col("edit_dist") <= max_dist)
    )
