"""Document fingerprinting by winnowing (rolling k-gram hashes +
window minima) — Schleimer, Wilkerson & Aiken, "Winnowing: Local
Algorithms for Document Fingerprinting", SIGMOD 2003 (public paper).

The copy-detection primitive between SimHash (one signature per doc)
and full n-gram Jaccard (every shingle): hash every k-gram, then keep
only each w-window's MINIMUM hash. The guarantee: any shared substring
of length ≥ w+k−1 contributes at least one identical fingerprint to
both documents, while storage shrinks by ~2/(w+1). Matching documents
on fingerprint equality is then a plain equi-join.

Spark shape: the whole selection is per-row Column expressions —
``transform`` over a position ``sequence`` builds the rolling hashes,
a second ``transform`` takes window minima (``array_min`` over
``slice``), ``array_distinct`` collapses to the fingerprint set. No
UDF, no Python, NO SHUFFLE: fingerprinting 100 TB is scan-speed and
embarrassingly parallel; only the downstream join (not built here)
exchanges data. Hashes are the repo-standard md5-prefix integers
(engine-neutral, exactly replayable in SQL).

The k-gram window is computed over the first ``cap`` characters: the
fingerprint-bearing prefix bounds per-row work on pathological
documents; real pipelines fingerprint chunks (operators/text.py::
chunk_documents) rather than raising the cap.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..qcommon import reuse


def _gram_hash(t: Column, i: Column, k: int) -> Column:
    # md5-prefix integer of the k-gram at 1-based position i — the same
    # engine-neutral hash family as sampling.hash_bucket
    return F.conv(
        F.substring(F.md5(t.substr(i, F.lit(k))), 1, 8), 16, 10
    ).cast("long")


def fingerprint_set(text_col: Column | str, k: int = 8, w: int = 4, cap: int = 200) -> Column:
    """The winnowing fingerprint SET of the capped, lowercased text as an
    ``array<bigint>`` Column — the shared core of :func:`winnow_fingerprints`
    (per-doc summary) and :func:`fingerprint_match_pairs` (equi-join dedup).

    Delegates to :func:`_fingerprint_set_let` — the let-bound O(m)-md5
    form — since round 11. The round-6 ``least()``-of-w-gram-hashes
    body this function used to carry (O(w·m) md5 calls; it existed to
    dodge the O(m²) argument-subtree trap of the naive two-transform
    shape) is retired: the let binding is the strictly better third
    option (2.5× measured, bit-identical sets — pinned by the parity
    test against the retired form in tests/test_overflow_audit.py::
    test_fingerprint_set_let_bit_identical).
    """
    return _fingerprint_set_let(text_col, k=k, w=w, cap=cap)


def _fingerprint_set_let(
    text_col: Column | str, k: int = 8, w: int = 4, cap: int = 200
) -> Column:
    """Let-bound winnowing fingerprint set — bit-identical values to
    :func:`fingerprint_set`, O(m) md5 calls instead of O(w·m).

    The round-6 form above rejected the two-transform shape because a
    lambda ARGUMENT subtree re-evaluates per element (O(m²) md5). The
    missing move was a let: ``element_at(transform(array(expr), v ->
    body), 1)`` binds ``expr`` as a lambda VARIABLE — evaluated once,
    referenced freely — so the hash array is built once (m md5s) and
    window minima read ``array_min(slice(hs, j, w))`` on the bound
    array. Measured 2.5× faster at sf0.1 (0.94 → 0.37 s).

    Round 11 unified :func:`fingerprint_set` onto this implementation
    (its winnow_fingerprint host rotated into the gate head as
    pre-committed) — every fingerprint consumer now takes the O(m)
    form; the retired least() shape survives only as the reference
    implementation inside the parity test.
    """
    col = F.col(text_col) if isinstance(text_col, str) else text_col
    t0 = F.lower(F.substring(col, 1, cap))

    def body(t: Column) -> Column:
        m = F.length(t) - F.lit(k - 1)
        hashes = F.transform(
            F.sequence(F.lit(1), m), lambda i: _gram_hash(t, i, k)
        )

        def over(hs: Column) -> Column:
            sel = F.transform(
                F.sequence(F.lit(1), m - F.lit(w - 1)),
                lambda j: F.array_min(F.slice(hs, j, w)),
            )
            return F.when(m >= w, F.array_distinct(sel)).otherwise(
                F.array().cast("array<bigint>")
            )

        return F.element_at(F.transform(F.array(hashes), over), 1)

    return F.element_at(F.transform(F.array(t0), body), 1)


def winnow_fingerprints(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 8,
    w: int = 4,
    cap: int = 200,
) -> DataFrame:
    """Per-document winnowing fingerprint summary: the distinct selected
    hashes, their count, and an exact BIGINT checksum (order-free sum)
    so equality of fingerprint SETS is hash-checkable without exploding
    them.

    Documents whose capped text has fewer than w k-grams (length <
    k+w−1) legitimately have zero fingerprints — guarded CASE branches
    keep the expressions total instead of erroring on short rows.

    Both outputs come off ONE ``F.inline`` of a let-bound struct so the
    fingerprint set is built once per row: referencing ``fps`` from two
    projection columns re-evaluates the whole md5 pipeline per column
    (lambda-bearing expressions get no codegen subexpression
    elimination) — measured 2× at sf0.1 (0.64 → 0.34 s), bit-identical.
    """
    fps0 = fingerprint_set(text_col, k=k, w=w, cap=cap)

    def _summary(fps: Column) -> Column:
        return F.struct(
            F.size(fps).alias("n_fingerprints"),
            F.aggregate(
                fps, F.lit(0).cast("long"), lambda acc, x: acc + x
            ).alias("fp_checksum"),
        )

    from ..qcommon import let

    return docs.select(id_col, F.inline(F.array(let(fps0, _summary))))


def fingerprint_match_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 8,
    w: int = 4,
    cap: int = 200,
    max_df: int = 20,
    min_shared: int = 2,
) -> DataFrame:
    """Candidate near-duplicate pairs by winnowing-fingerprint equi-join —
    the downstream consumer the SIGMOD'03 scheme exists for. Returns
    ``(id_a, id_b, n_shared)`` with ``id_a < id_b``: pairs sharing at
    least ``min_shared`` selected fingerprints, where sharing ANY
    fingerprint is guaranteed for documents with a common substring of
    length ≥ w+k−1 (inside the cap). Unlike MinHash-LSH this catches
    asymmetric containment (a small doc embedded in a huge one) because
    the guarantee is per-substring, not per-similarity-ratio.

    Scale shape (100 TB): fingerprinting is per-row scan work (no
    shuffle); the explode carries ≤ ~2·cap/(w+1) rows per doc; pairs are
    generated BUCKET-SIDE per fingerprint (groupBy + in-array i<j
    combinations — one exchange, never a self-join that re-runs the
    fingerprint subtree). The two quadratic dangers are both bounded:

    - hot fingerprints (boilerplate substrings shared by thousands of
      docs) are dropped by the ``max_df`` document-frequency guard —
      stop-fingerprint removal, the exact analog of stop-word removal;
      a bucket therefore yields at most C(max_df, 2) pairs;
    - ``min_shared ≥ 2`` suppresses single-hash coincidences before the
      pair aggregate, shrinking the groupBy input.

    The ``max_df`` guard is applied COUNT-FIRST (round 10): df comes
    from a plain count aggregate (constant state per fingerprint) and
    only surviving fingerprints reach the ``collect_set``. The old
    shape collected the bucket array first and filtered on its size —
    which meant a corpus-wide hot fingerprint (every doc sharing its
    first ``cap`` chars shares its ENTIRE fingerprint set) built a
    corpus-sized array in one aggregation buffer before being thrown
    away: OOM at mass scale, for work the guard was about to discard.
    Same pattern as exact_substring_pairs' keep-join and the
    bucket_pairs star guard; both aggregations hash-partition on fp,
    so the pre-count reuses the exchange.

    The final (id_a, id_b) count aggregate is an equi-shuffle on the
    pair key, map-side combined.
    """
    fps = reuse(
        docs.select(
            F.col(id_col).alias("doc"),
            F.explode(
                _fingerprint_set_let(text_col, k=k, w=w, cap=cap)
            ).alias("fp"),
        )
    )
    # fingerprint_set is array_distinct per doc, so (doc, fp) is already
    # unique — no extra distinct pass needed before bucketing, and the
    # df count is a plain count aggregate.
    keep = (
        fps.groupBy("fp")
        .agg(F.count("*").alias("_df"))
        .filter((F.col("_df") >= 2) & (F.col("_df") <= max_df))
        .select("fp")
    )
    buckets = (
        fps.join(keep, "fp")
        .groupBy("fp")
        .agg(F.sort_array(F.collect_set("doc")).alias("ids"))
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
        .groupBy(F.col("p.id_a").alias("id_a"), F.col("p.id_b").alias("id_b"))
        .agg(F.count("*").alias("n_shared"))
        .filter(F.col("n_shared") >= min_shared)
    )


def exact_substring_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 40,
    cap: int = 200,
    max_df: int = 10,
    min_shared: int = 3,
) -> DataFrame:
    """EXACT duplicated-substring detection (the Lee et al. 2021
    "Deduplicating Training Data Makes Language Models Better" exact-
    substring family, re-expressed as a k-gram hash join instead of a
    suffix array): for every document pair, the positions in A whose
    k-character gram occurs verbatim in B — COMPLETE for any shared
    run of >= k chars (inside the cap), where winnowing
    (fingerprint_match_pairs) only samples one gram per window.

    Output per pair: ``n_shared`` (distinct matching positions in A),
    ``max_run`` (longest consecutive position run — a run of r means a
    verbatim shared substring of k + r - 1 chars), and ``dup_chars``
    (= k + max_run - 1). Pairs with n_shared >= min_shared.

    Scale: the all-positions explode is m rows per doc (vs winnowing's
    ~2m/(w+1)) — the price of completeness; the ``max_df`` document-
    frequency guard is what keeps the hash join linear (a gram shared
    by a whole template family would otherwise pair the family
    quadratically — stop-gram removal caps each gram at
    C(max_df, 2) pairs). The run-length pass is a per-pair window over
    matched positions — bounded by the match count, never corpus-sized.
    """
    t = F.lower(F.substring(F.col(text_col), 1, cap))
    m = F.length(t) - F.lit(k - 1)
    grams = F.when(
        m >= 1,
        F.transform(
            F.sequence(F.lit(1), m),
            lambda i: F.struct(
                i.cast("int").alias("pos"), _gram_hash(t, i, k).alias("h")
            ),
        ),
    ).otherwise(F.array().cast("array<struct<pos:int,h:bigint>>"))
    e = reuse(
        docs.select(F.col(id_col).alias("doc"), F.explode(grams).alias("g"))
        .select("doc", F.col("g.pos").alias("pos"), F.col("g.h").alias("h"))
    )
    keep = (
        e.groupBy("h")
        .agg(F.count_distinct("doc").alias("df"))
        .filter((F.col("df") >= 2) & (F.col("df") <= max_df))
        .select("h")
    )
    ek = e.join(keep, "h")
    a = ek.select(F.col("doc").alias("id_a"), F.col("pos").alias("pos_a"), "h")
    b = ek.select(F.col("doc").alias("id_b"), "h")
    matched = (
        a.join(b, "h")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "pos_a")
        .distinct()
    )
    w = Window.partitionBy("id_a", "id_b").orderBy("pos_a")
    runs = matched.withColumn(
        "grp", F.col("pos_a") - F.row_number().over(w)
    )
    per_run = runs.groupBy("id_a", "id_b", "grp").agg(
        F.count("*").alias("run_len")
    )
    return (
        per_run.groupBy("id_a", "id_b")
        .agg(
            F.sum("run_len").alias("n_shared"),
            F.max("run_len").alias("max_run"),
        )
        .filter(F.col("n_shared") >= min_shared)
        .select(
            "id_a",
            "id_b",
            F.col("n_shared").cast("long").alias("n_shared"),
            F.col("max_run").cast("long").alias("max_run"),
            (F.col("max_run") + F.lit(k - 1)).cast("long").alias("dup_chars"),
        )
    )
