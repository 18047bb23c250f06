"""Corpus collocation mining: PMI-family association scores over
adjacent token pairs.

The training-data use: collocation lift separates real multi-word
expressions ("new york", "machine learning") from chance adjacency —
a vocabulary-construction and tokenizer-audit primitive. The reference
has no corpus-statistics layer at all (its text column is only ever
regex-matched, add_region.py:40-46); this extends the engine's text
stack (tfidf_top_terms, bigram_lm_score) with the association face.

Design for 100 TB:
- Unigram and bigram counts are plain map-side-combined aggregates over
  the exploded token stream — two shuffles on token keys, the same
  shape as bigram_lm_scores.
- The joins attaching c_x / c_y to each bigram shuffle on single-token
  keys; vocabulary-sized sides, never corpus-sized.
- Selection (min count) and ordering are integer-only. The lift score
  itself is a float DISPLAY column: both engines evaluate the
  IDENTICAL expression tree over exactly-represented integers, and
  IEEE-754 ops are correctly rounded per operation, so the doubles
  match bit-for-bit without any magnitude precondition. Lift GROWS
  with corpus size (rare-token pairs: ~n_uni²/(c_x·c_y·n_bi)), so the
  emitted rounding is the micro-unit round6u form, not round6x's
  decimal(18,12) envelope (DEFERRED r07(d)).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..qcommon import reuse, round6u
from .text import tokens_of


def pmi_collocations(
    docs: DataFrame,
    text_col: str = "text",
    min_count: int = 50,
) -> DataFrame:
    """Adjacent-pair lift: lift(x,y) = p(x,y) / (p(x)·p(y)) with
    p(x,y) = c_xy / n_bigrams and p(x) = c_x / n_unigrams. PMI is
    log2(lift); the log is monotone, so ranking/thresholding on lift
    is ranking on PMI without ever taking an inexact logarithm.

    Output: one row per bigram with c_xy >= min_count, counts + lift,
    ordered by (c_xy desc, bigram) — a total, integer-decided order.
    """
    # the token-array subtree is referenced by four consumers (unigram
    # agg, unigram total, pair agg, pair total) — Catalyst reuses
    # exchanges, not arbitrary subtrees, so without a pin the corpus
    # is scanned and tokenized 5x (plan-audited); with it, once.
    # qcommon.reuse, not a raw localCheckpoint (r13, the r10 ledger's
    # per-rotation migration): on a cluster with a checkpoint dir the
    # pin survives executor loss
    toks = reuse(docs.select(tokens_of(text_col).alias("t")))
    uni = toks.select(F.explode("t").alias("w"))
    pairs = toks.select(
        F.explode(
            F.when(
                F.size("t") >= 2,
                F.transform(
                    F.sequence(F.lit(1), F.size("t") - 1),
                    lambda i: F.struct(
                        F.element_at(F.col("t"), i).alias("x"),
                        F.element_at(F.col("t"), i + 1).alias("y"),
                    ),
                ),
            ).otherwise(F.array().cast("array<struct<x:string,y:string>>"))
        ).alias("p")
    ).select(F.col("p.x").alias("x"), F.col("p.y").alias("y"))

    uc = uni.groupBy("w").agg(F.count("*").alias("c"))
    totals = uni.agg(
        F.count("*").alias("n_uni"),
    ).crossJoin(pairs.agg(F.count("*").alias("n_bi")))
    bc = (
        pairs.groupBy("x", "y")
        .agg(F.count("*").alias("c_xy"))
        .filter(F.col("c_xy") >= min_count)
    )
    out = (
        bc.join(uc.select(F.col("w").alias("x"), F.col("c").alias("c_x")), "x")
        .join(uc.select(F.col("w").alias("y"), F.col("c").alias("c_y")), "y")
        .crossJoin(F.broadcast(totals))
    )
    # identical parenthesization in the oracle — see module docstring
    lift = (
        (F.col("c_xy") / F.col("n_bi"))
        / ((F.col("c_x") / F.col("n_uni")) * (F.col("c_y") / F.col("n_uni")))
    )
    return (
        out.select(
            F.concat_ws(" ", "x", "y").alias("bigram"),
            "c_xy",
            "c_x",
            "c_y",
            round6u(lift).alias("lift"),
        )
        .orderBy(F.desc("c_xy"), "bigram")
    )
