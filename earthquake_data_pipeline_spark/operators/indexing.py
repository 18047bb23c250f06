"""Inverted-index construction: term -> posting list with positions.

The retrieval-side counterpart of the curation stack: the same corpus
the dedup/quality operators filter is what a search or RAG layer indexes
(reference parity: the reference's warehouse exposes keyword lookups
only as full-scan LIKE predicates over `place` — dbt models filter with
string matching, e.g. dbt_files/models/staging/stg_earthquake.sql's
column projections feeding region LIKE joins; an inverted index is the
data structure that query family compiles to at scale).

Design: everything is two keyed aggregations — (term, doc) then (term) —
so the plan is exactly the word-count shape Spark's shuffle machinery is
built around. Posting lists are emitted as strings ("doc:p1,p2,..."
joined by ';' in lexicographic order) because a deterministic, engine-
neutral total representation is the point: the same index built twice,
or built by the DuckDB oracle, is byte-identical.

100 TB: the explode produces one row per token occurrence — large but
perfectly partitionable; both aggregates hash-shuffle on the term (the
classic skew hazard is stopword terms, which `min_df`/`max_df` bounds
cut before the heavy per-term reduction; for a web-scale index you'd
also shard postings per term with a (term, doc_bucket) key). No window,
no driver state, no UDF.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .text import tokens_of


def inverted_index(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_df: int = 1,
    max_df: int | None = None,
) -> DataFrame:
    """Build term -> (df, tf, postings-with-positions).

    Positions are 1-based token offsets within the whitespace token
    sequence (1-based to match SQL ``generate_subscripts``). Each
    posting is ``"<doc_id>:<p1>,<p2>,..."``; the per-term posting list
    joins postings with ';' in lexicographic posting order — a total,
    engine-neutral order that needs no numeric doc sort.

    ``min_df``/``max_df`` bound document frequency: `min_df` drops
    hapax noise, `max_df` drops stopword-degree terms (the skew cap —
    at corpus scale a term appearing in every document otherwise
    funnels the whole corpus through one reducer).
    """
    tok = (
        docs.select(
            F.col(id_col).alias("doc"),
            F.posexplode(tokens_of(text_col)).alias("pos0", "term"),
        )
        .filter(F.col("term") != "")
        .select("doc", "term", (F.col("pos0") + 1).alias("pos"))
    )
    per_doc = tok.groupBy("term", "doc").agg(
        F.count("*").alias("tf_doc"),
        F.array_join(
            F.transform(
                F.sort_array(F.collect_list("pos")),
                lambda p: p.cast("string"),
            ),
            ",",
        ).alias("poss"),
    )
    entry = F.concat(
        F.col("doc").cast("string"), F.lit(":"), F.col("poss")
    )
    idx = per_doc.groupBy("term").agg(
        F.count("*").cast("long").alias("df"),
        F.sum("tf_doc").cast("long").alias("tf"),
        F.array_join(F.sort_array(F.collect_list(entry)), ";").alias(
            "postings"
        ),
    )
    cond = F.col("df") >= min_df
    if max_df is not None:
        cond = cond & (F.col("df") <= max_df)
    return idx.filter(cond)
