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

from ..qcommon import reuse
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

    When ``max_df`` is set, it is applied COUNT-FIRST (round 10): df
    comes from a plain count over (term, doc) rows and only surviving
    terms reach the postings ``collect_list``. The old shape built the
    full postings string for EVERY term and then filtered on df — for
    a stopword-degree term that is a corpus-sized string in one
    aggregation buffer, constructed only to be discarded. (With no
    ``max_df`` the single-pass shape is kept: every built posting list
    is output, so there is no wasted work to avoid — and min_df only
    DROPS small lists, which are bounded anyway.) The pre-count and
    both aggregates hash-partition on term, so the guard reuses the
    exchange rather than adding a shuffle.
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
    if max_df is not None:
        # qcommon.reuse, not a raw localCheckpoint (r13 rotation
        # migration): executor-loss-safe with a checkpoint dir
        per_doc = reuse(per_doc)
        keep = (
            per_doc.groupBy("term")
            .agg(F.count("*").alias("_df"))
            .filter(F.col("_df") <= max_df)
            .select("term")
        )
        per_doc = per_doc.join(keep, "term")
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
    return idx.filter(F.col("df") >= min_df)


def bm25_scores(
    docs: DataFrame,
    query_terms: list[str],
    id_col: str = "doc_id",
    text_col: str = "text",
    k1_tenths: int = 12,
    b_hundredths: int = 75,
) -> DataFrame:
    """BM25 relevance of every document against a bag of query terms
    (Robertson & Spärck Jones probabilistic relevance framework; the
    Okapi BM25 form): Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1-b+b·dl/avgdl)).

    Determinism discipline: tf, df, dl are exact integers; avgdl enters
    only via the rational dl·N/Σdl (int/int in doubles); k1 and b are
    passed as integer tenths/hundredths so the constants are exact
    decimals; idf uses ln — the ONE transcendental in the repo's
    oracle-paired surface — applied to a rational argument, and the
    per-term score is cast to DECIMAL(18,9) BEFORE the Σ_t so the sum
    is order-free (float summation in shuffle order is not), then the
    decimal total rounds once at the end.

    Plan: the term filter is an isin on a literal list → the explode is
    pruned to query-term rows only; df and the doc-length table are two
    small aggregates; everything joins on term (|Q| rows broadcast) and
    doc. At 100 TB this is the scatter-gather a search engine runs
    against the inverted_index above — here expressed directly over the
    corpus so the whole scoring pass stays three keyed aggregates.
    """
    k1 = k1_tenths / 10.0
    b = b_hundredths / 100.0
    tok = docs.select(
        F.col(id_col).alias("doc"),
        F.explode(tokens_of(text_col)).alias("term"),
    ).filter(F.col("term") != "")
    dl = tok.groupBy("doc").agg(F.count("*").cast("long").alias("dl"))
    totals = dl.agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("dl").cast("long").alias("sum_dl"),
    )
    qt = tok.filter(F.col("term").isin(query_terms))
    tf = qt.groupBy("doc", "term").agg(F.count("*").cast("long").alias("tf"))
    df_ = tf.groupBy("term").agg(F.count("*").cast("long").alias("df"))
    idf = F.log(
        (F.col("n_docs") - F.col("df") + F.lit(0.5))
        / (F.col("df") + F.lit(0.5))
        + F.lit(1.0)
    )
    norm = F.col("tf") + F.lit(k1) * (
        F.lit(1.0 - b) + F.lit(b) * (F.col("dl") * F.col("n_docs")) / F.col("sum_dl")
    )
    term_score = (
        idf * (F.col("tf") * F.lit(k1 + 1.0)) / norm
    ).cast("decimal(18,9)")
    return (
        tf.join(F.broadcast(df_), "term")
        .join(dl, "doc")
        .crossJoin(F.broadcast(totals))
        .groupBy("doc")
        .agg(
            F.count("*").cast("long").alias("n_terms_matched"),
            F.sum(term_score).alias("score_dec"),
        )
    )


def boolean_search(
    docs: DataFrame,
    must: list[str],
    must_not: list[str] | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Boolean retrieval (AND over ``must``, NOT over ``must_not``) with
    per-term match counts — the query side of inverted_index, expressed
    directly over the corpus as one pruned explode + one doc-keyed
    aggregate (the isin literal filter cuts the token stream to query
    terms before any shuffle).

    Returns matching docs with tf per must-term (tf_0.. in must order).
    """
    terms = list(must) + list(must_not or [])
    tok = (
        docs.select(
            F.col(id_col).alias("doc"),
            F.explode(tokens_of(text_col)).alias("term"),
        )
        .filter(F.col("term").isin(terms))
    )
    aggs = [
        F.sum((F.col("term") == t).cast("long")).alias(f"tf_{i}")
        for i, t in enumerate(must)
    ] + [
        F.sum((F.col("term") == t).cast("long")).alias(f"not_{i}")
        for i, t in enumerate(must_not or [])
    ]
    flags = tok.groupBy("doc").agg(*aggs)
    cond = F.lit(True)
    for i in range(len(must)):
        cond = cond & (F.col(f"tf_{i}") > 0)
    for i in range(len(must_not or [])):
        cond = cond & (F.col(f"not_{i}") == 0)
    return flags.filter(cond).drop(
        *[f"not_{i}" for i in range(len(must_not or []))]
    )
