"""Near-duplicate detection for training-data pipelines (north-star ops):
MinHash+LSH, SimHash, n-gram Jaccard — all as declarative DataFrame plans.

Design for 100 TB:
- MinHash signatures and SimHash fingerprints are per-document map-side work
  (scan-speed, no shuffle); only the LSH band-bucket join shuffles, and it
  shuffles on (band, band_key) — tiny keys, heavily reduced data (one row
  per doc per band, not per shingle).
- All hashing is md5-derived (engine-neutral, deterministic), so every
  operator here carries an exact DuckDB oracle. No row-at-a-time Python
  UDFs — shingling/minhashing run as Catalyst higher-order array functions
  inside codegen; simhash's bit-count matrix runs as one Arrow-batched
  numpy stage (hashlib.md5 == JVM md5, oracle unaffected).
- Pair explosion is bounded by LSH design (band/row trade-off), not by a
  quadratic cross join — the scale path. A brute-force n-gram Jaccard join
  is provided for verification on bounded subsets.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..qcommon import let, reuse
from .pairing import bucket_pairs
from .text import tokens_of


def shingles_of(text: Column | str, n: int = 3) -> Column:
    """Word n-gram shingles (distinct) of the lowercased text.

    Guarded: Spark's sequence(0, -k) yields a DESCENDING sequence, so a
    doc shorter than n tokens must short-circuit to an empty array.

    The token array is LET-BOUND (``element_at(transform(array(expr),
    toks -> body), 1)``) so tokenization runs once per row: a lambda
    ARGUMENT subtree re-evaluates per element — the round-6
    higher-order-function trap, re-found inside this helper by the
    round-10 duplicate-eval scan (tokens_of re-split per shingle;
    let-binding measured −40% on the shingle stage, bit-identical
    output).
    """

    def _grams(toks: Column) -> Column:
        idx = F.sequence(F.lit(0), F.size(toks) - n)
        grams = F.transform(
            idx,
            lambda i: F.concat_ws(" ", F.slice(toks, (i + 1).cast("int"), n)),
        )
        return F.when(
            F.size(toks) >= n, F.array_distinct(grams)
        ).otherwise(F.array().cast("array<string>"))

    return let(tokens_of(text), _grams)


# Affine MinHash family over the prime field p = 2^31 - 1:
#   h_s(x) = (A[s] * x + B[s]) mod p,  x = md5(shingle) truncated to [0, p).
# One md5 per shingle total; the per-seed work is two int64 ops inside
# codegen (vs. one md5 + concat per seed in the naive form — ~8× less
# hashing). A[s] in [1, p) keeps h_s a permutation; A[s]*x < 2^62 so the
# arithmetic is overflow-free in both Spark and DuckDB int64.
MINHASH_PRIME = 2_147_483_647


def minhash_coeffs(num_hashes: int) -> tuple[list[int], list[int]]:
    """Deterministic LCG-derived (A, B) coefficient lists, A[s] != 0."""
    a = [(1_103_515_245 * (s + 1) + 12_345) % MINHASH_PRIME or 1 for s in range(num_hashes)]
    b = [(69_069 * (s + 1) + 1) % MINHASH_PRIME for s in range(num_hashes)]
    return a, b


def minhash_base(item: Column | str) -> Column:
    """x = first 60 bits of md5(item) reduced mod p — the shared hash input."""
    return (
        F.conv(F.substring(F.md5(item), 1, 15), 16, 10).cast("long")
        % MINHASH_PRIME
    )


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_n: int = 3,
    num_hashes: int = 12,
    num_bands: int = 4,
    star_over: int | None = None,
    tokens_col: str | None = None,
) -> DataFrame:
    """Candidate near-duplicate pairs via MinHash+LSH banding.

    shingle → minhash(k) → band keys → self-equi-join on (band, key) with
    id_a < id_b → distinct pairs. The join is an equi-join on a hashed key:
    shuffle-bounded, skew handled by AQE; never a cross join.

    ``num_bands`` must evenly divide ``num_hashes``: bands > hashes
    would give 0-row bands whose constant key puts EVERY document in one
    bucket (the quadratic explosion this operator exists to avoid), and
    a non-divisor silently discards trailing signatures — both rejected.

    ``star_over`` passes through to pairing.bucket_pairs: banding bounds
    bucket sizes only for DISTINCT documents — byte-identical duplicate
    mass (ubiquitous at web scale) collides in every band and cliques
    quadratically. Connectivity consumers (components/keep-lists) should
    set it; pair-list consumers must leave ``None`` (see bucket_pairs).

    ``tokens_col`` (r18, guide §1.2): name of an array<string> column on
    ``df`` holding the ALREADY-COMPUTED distinct shingle set per doc —
    the explode then reads that column instead of re-running
    shingles_of(text_col), so a caller that also needs the exact
    shingle sets (lsh_recall_audit's ground-truth side) shingles the
    corpus once. Equivalence: shingles_of output is array_distinct and
    can never contain '' (each 3-gram carries two separator spaces), so
    the shared pin's filter(x != '')/sz>0 shape explodes to the
    identical row set (empty arrays produce no rows either way).
    """
    if not (1 <= num_bands <= num_hashes) or num_hashes % num_bands:
        raise ValueError(
            f"num_bands={num_bands} must evenly divide "
            f"num_hashes={num_hashes} (bands of "
            "num_hashes//num_bands rows each; a 0-row band would give "
            "every document the same bucket key)"
        )
    rows_per_band = num_hashes // num_bands
    # One shingling pass (explode), ONE md5 per shingle (the shared base
    # hash x), then per-seed affine maps — pure int64 codegen — under a
    # map-side partial min aggregation. The naive form — an array
    # expression referencing shingles_of() per seed — recomputes
    # tokenization per seed (Catalyst does not CSE higher-order
    # functions): 14× slower at sf0.1. Docs shorter than one shingle drop
    # out of the explode, which matches the oracle (their NULL minhashes
    # can never band-match).
    a, b = minhash_coeffs(num_hashes)
    shingle_src = (
        F.col(tokens_col) if tokens_col is not None
        else shingles_of(text_col, shingle_n)
    )
    exploded = df.select(
        F.col(id_col), F.explode(shingle_src).alias("shingle")
    )
    hashed = exploded.select(id_col, minhash_base("shingle").alias("x"))
    sig = hashed.groupBy(id_col).agg(
        *[
            F.min((F.lit(a[s]) * F.col("x") + F.lit(b[s])) % MINHASH_PRIME).alias(f"h{s}")
            for s in range(num_hashes)
        ]
    )
    band_cols = [
        F.md5(
            F.concat_ws(
                "|", *[F.col(f"h{b * rows_per_band + r}") for r in range(rows_per_band)]
            )
        )
        for b in range(num_bands)
    ]
    bands = sig.select(
        id_col,
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(b).alias("band"), k.alias("band_key"))
                    for b, k in enumerate(band_cols)
                ]
            )
        ).alias("bk"),
    ).select(id_col, F.col("bk.band").alias("band"), F.col("bk.band_key").alias("band_key"))
    # Bucket-side pair expansion instead of a self-join (shared shape:
    # operators/pairing.py::bucket_pairs — see its docstring for why).
    return bucket_pairs(bands, ["band", "band_key"], id_col, star_over=star_over)


def ngram_jaccard_pairs(
    left: DataFrame,
    right: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_n: int = 3,
    threshold: float = 0.0,
) -> DataFrame:
    """Exact n-gram Jaccard similarity for candidate pairs (id_a < id_b).

    Quadratic — use on LSH candidates or bounded subsets only; the scale
    path is minhash_lsh_pairs → this as the verification/refinement stage.
    """
    ls = left.select(
        F.col(id_col).alias("id_a"), shingles_of(text_col, shingle_n).alias("sh_a")
    )
    rs = right.select(
        F.col(id_col).alias("id_b"), shingles_of(text_col, shingle_n).alias("sh_b")
    )
    from ..qcommon import round6x

    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size(F.array_union("sh_a", "sh_b"))
    jac = inter / F.greatest(union, F.lit(1))
    return (
        ls.join(rs, F.col("id_a") < F.col("id_b"))
        # round6x: x/128-style ratios tie at the 7th digit, where plain
        # double rounding diverges between engines
        .select("id_a", "id_b", round6x(jac).alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
    )


def ngram_containment_pairs(
    docs: DataFrame,
    candidates: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_n: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """Asymmetric n-gram containment for SUB-document duplicates:
    ``containment_a = |A∩B| / |A|`` (and symmetrically for B) over word
    shingle sets. A short document quoted verbatim inside a long one has
    containment ≈ 1 while Jaccard ≈ |A|/|B| ≈ 0 — the case symmetric
    similarity misses entirely (the reason CC-style pipelines track
    containment alongside Jaccard).

    ``candidates`` must be a bounded (id_a, id_b) pair frame — the scale
    contract. fingerprint.fingerprint_match_pairs is the natural
    generator here: the winnowing guarantee is per-SUBSTRING, so the
    contained-doc case still produces candidates, unlike MinHash-LSH
    banding whose recall decays with the size ratio. The shingle subtree
    is lazily checkpointed because both join sides reference it
    (Catalyst reuses exchanges, not arbitrary subtrees); the joins are
    id-equi-joins, shuffle-bounded by the candidate count.
    """
    from ..qcommon import round6x

    sh = reuse(
        docs.select(
            F.col(id_col).alias("id"),
            shingles_of(text_col, shingle_n).alias("sh"),
        )
    )
    a = sh.select(F.col("id").alias("id_a"), F.col("sh").alias("sh_a"))
    b = sh.select(F.col("id").alias("id_b"), F.col("sh").alias("sh_b"))
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    cont_a = round6x(inter / F.greatest(F.size("sh_a"), F.lit(1)))
    cont_b = round6x(inter / F.greatest(F.size("sh_b"), F.lit(1)))
    return (
        candidates.select("id_a", "id_b")
        .join(a, "id_a")
        .join(b, "id_b")
        .select(
            "id_a",
            "id_b",
            cont_a.alias("containment_a"),
            cont_b.alias("containment_b"),
        )
        .filter(F.greatest("containment_a", "containment_b") >= threshold)
    )


def simhash(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    bits: int = 32,
) -> DataFrame:
    """SimHash fingerprint over distinct whitespace tokens.

    Token value = first 8 md5 hex chars as a 32-bit int; fingerprint bit
    j = majority of token bit j (ties → 1). Near-duplicates then reduce
    to fingerprint equality or small Hamming distance — a groupBy, not a
    pairwise join, at scale.

    Plan shape: tokenization stays JVM-side (split + array_distinct in
    codegen, so the token set is bit-identical to the SQL oracle's), then
    one Arrow-batched mapInPandas computes the md5 bit-count matrix per
    document in numpy. ZERO shuffle — the round-2 form (explode +
    groupBy with 32 per-bit sum aggregates) paid a full hash exchange of
    every (id, token-hash) row and 32 aggregate expressions; this is
    map-only at scan speed, the same hot-loop-to-numpy move the LSH plane
    signatures took (hashlib.md5 == JVM md5 over utf-8 bytes, so the
    oracle is unchanged and still exact).
    """
    from pyspark.sql import types as T

    # array_remove("") matters: split('', '\s+') is [''] (size 1), so
    # without it every empty/whitespace document would get the SAME
    # md5('')-derived fingerprint and report as a near-duplicate of
    # every other blank doc — token-less docs must drop out instead.
    toks = F.array_remove(F.array_distinct(tokens_of(text_col)), "")
    tdf = df.select(F.col(id_col), toks.alias("toks")).filter(F.size("toks") > 0)
    out_schema = T.StructType(
        [tdf.schema[id_col], T.StructField("simhash", T.LongType(), True)]
    )

    def fn(batches):
        import hashlib

        import numpy as np
        import pandas as pd

        shifts = np.arange(bits, dtype=np.int64)
        for pdf in batches:
            ids, fps = [], []
            for rid, tarr in zip(pdf[id_col], pdf["toks"]):
                n = 0 if tarr is None else len(tarr)
                if n == 0:
                    continue
                vals = np.fromiter(
                    (
                        int(hashlib.md5(t.encode("utf-8")).hexdigest()[:8], 16)
                        for t in tarr
                    ),
                    dtype=np.int64,
                    count=n,
                )
                counts = ((vals[:, None] >> shifts) & 1).sum(axis=0)
                fps.append(int(((counts * 2 >= n).astype(np.int64) << shifts).sum()))
                ids.append(rid)
            yield pd.DataFrame({id_col: ids, "simhash": fps})

    return tdf.mapInPandas(fn, out_schema)


def _prefix_candidates(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    num: int,
    den: int,
    tokens_expr: Column | None,
    positional_filter: bool = True,
    tokens_df: DataFrame | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Candidate-generation stage of prefix_filter_join, exposed so the
    profiling harness (and tests) can count candidates independently of
    verification. Returns ``(toks, cand)``: the checkpointed tokenized
    frame (id, toks, sz) and the candidate pair frame (id_a, id_b).
    Every filter is an exact bound — cand is a superset of the true
    result for any input (no false negatives by construction).

    ``tokens_df`` (r18, guide §1.2 — don't compute things twice): a
    caller-supplied ``(id, toks, sz)`` frame — already distinct,
    empty-filtered (sz > 0) and pinned — that REPLACES the internal
    tokenize+pin entirely (``docs``/``id_col``/``text_col``/
    ``tokens_expr`` are then ignored). Lets a consumer that needs the
    identical token sets for another operator (lsh_recall_audit's
    MinHash side) shingle the corpus once instead of once per side.
    """
    if tokens_df is not None:
        toks = tokens_df
    else:
        base_tokens = tokens_of(text_col) if tokens_expr is None else tokens_expr
        # reuse() BEFORE the size/filter projection: CollapseProject folds
        # withColumn("sz", size("toks")) and the sz>0 filter back INTO the
        # select, substituting the full tokenize/shingle/distinct expression
        # for each reference — measured 7x the materialization cost at
        # sf0.1 (3.3 s vs 0.45 s). Pinning first evaluates the expensive
        # expression exactly once; sz and the emptiness filter then read
        # the materialized array (size() of a stored array is O(1)-ish).
        toks = (
            reuse(
                docs.select(
                    F.col(id_col).alias("id"),
                    F.array_distinct(
                        F.filter(base_tokens, lambda x: x != "")
                    ).alias("toks"),
                )
            )
            .withColumn("sz", F.size("toks"))
            .filter(F.col("sz") > 0)
        )
    ex = toks.select("id", "sz", F.explode("toks").alias("tok"))
    dfreq = ex.groupBy("tok").agg(F.count("*").alias("df"))
    w = Window.partitionBy("id").orderBy("df", "tok")
    prefix_len = (
        F.col("sz")
        - F.floor((F.col("sz") * num + den - 1) / den).cast("long")
        + 1
    )
    # pref is referenced twice by the self-join below; without a
    # reuse() pin the df-agg + join + window subtree runs once per side
    # (alias-renamed exchanges defeat ReusedExchange) — measured 4x
    # wall on the sf0.1 corpus.
    pref = reuse(
        ex.join(dfreq, "tok")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= prefix_len)
        .select("id", "sz", "tok", "rn")
    )
    # Asymmetric prefixes (AllPairs/PPJoin indexing lemma): canonicalize
    # each pair by (sz, id) — a is the SMALLER record, b the larger
    # prober. The smallest shared token w of a truly-similar pair has
    # rank_b(w) <= |b| - ceil(t|b|) + 1 (probe prefix, enforced when
    # pref was built) AND rank_a(w) <= |a| - ceil(2t/(1+t)|a|) + 1 (the
    # shorter INDEX prefix): overlap >= alpha >= ceil(2t/(1+t)|a|) when
    # |b| >= |a|, and w carries at most overlap-1 shared tokens above it
    # in either record. Enforcing the index bound on a's side drops
    # join rows, never pairs.
    a, b = pref.alias("a"), pref.alias("b")
    index_len = (
        F.col("a.sz")
        - F.floor(
            (2 * num * F.col("a.sz") + num + den - 1) / (num + den)
        ).cast("long")
        + 1
    )
    cond = (
        (F.col("a.tok") == F.col("b.tok"))
        & (
            (F.col("a.sz") < F.col("b.sz"))
            | ((F.col("a.sz") == F.col("b.sz")) & (F.col("a.id") < F.col("b.id")))
        )
        & (F.col("a.sz") * den >= F.col("b.sz") * num)
        & (F.col("a.rn") <= index_len)
    )
    if positional_filter:
        # PPJoin positional filter (Xiao et al., WWW'08), per-token
        # exact form: a shared token w at 1-based global-order rank i
        # in A and j in B splits both sets around w, so
        #   overlap(A,B) <= min(i-1, j-1) + 1 + min(|A|-i, |B|-j)
        #                =  min(i, j) + min(|A|-i, |B|-j).
        # J >= t  <=>  overlap >= ceil(t/(1+t) * (|A|+|B|)) = alpha.
        # A truly-similar pair satisfies the bound at EVERY shared
        # token (bound >= true overlap >= alpha), so filtering each
        # join row independently drops no true pair. Integer-exact:
        # alpha = floor((num*(szA+szB) + num + den - 1) / (num+den));
        # operands are < 2^32 so the double division is exact.
        alpha = F.floor(
            ((F.col("a.sz") + F.col("b.sz")) * num + num + den - 1)
            / (num + den)
        ).cast("long")
        cond = cond & (
            F.least("a.rn", "b.rn")
            + F.least(
                F.col("a.sz") - F.col("a.rn"),
                F.col("b.sz") - F.col("b.rn"),
            )
            >= alpha
        )
    cand = (
        a.join(b, cond)
        .select(
            F.least("a.id", "b.id").alias("id_a"),
            F.greatest("a.id", "b.id").alias("id_b"),
        )
        .distinct()
    )
    return toks, cand


def prefix_filter_join(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold_num: int = 1,
    threshold_den: int = 2,
    tokens_expr: Column | None = None,
    positional_filter: bool = True,
    tokens_df: DataFrame | None = None,
) -> DataFrame:
    """EXACT Jaccard-threshold set-similarity self-join via prefix
    filtering (the AllPairs/PPJoin family — Bayardo et al., WWW'07;
    Xiao et al., WWW'08): returns every pair (id_a < id_b) of documents
    whose distinct-token Jaccard similarity is >= t, with NO false
    negatives — unlike MinHash-LSH (minhash_lsh_pairs), which is
    probabilistic-recall. Reference parity: the reference deduplicates
    only on exact keys (clean_historical.py:48); this is the
    similarity-threshold generalization its warehouse never had.

    The filter chain, every step a published exact bound:
    - token sets ordered by a single global total order (ascending
      document frequency, ties by token string) so prefixes concentrate
      on the rarest tokens;
    - prefix length p_x = |x| - ceil(t*|x|) + 1: if J(A,B) >= t the two
      prefixes must share a token, so the equi-join on prefix tokens
      generates a candidate superset;
    - asymmetric INDEX prefix (AllPairs/PPJoin indexing lemma): pairs
      are canonicalized by (size, id); the smaller side only needs its
      first |y| - ceil(2t/(1+t)*|y|) + 1 tokens in the join — roughly
      half the probe prefix at tight thresholds (proof in
      _prefix_candidates);
    - length bound: J(A,B) >= t implies den*min(|A|,|B|) >=
      num*max(|A|,|B|), applied inside the join condition;
    - positional filter (PPJoin): each shared prefix token's global-
      order ranks (i, j) bound the achievable overlap by
      min(i,j) + min(|A|-i, |B|-j); rows below the minoverlap
      alpha = ceil(t/(1+t)*(|A|+|B|)) are dropped pre-shuffle — exact
      per-token, see _prefix_candidates (``positional_filter=False``
      disables it, for audits);
    - exact verification: inter*den >= union*num on the full token
      arrays (integer cross-multiplication — no float ever decides
      membership; t is the rational num/den, and ceil(t*|x|) is
      computed as the integer floor((|x|*num + den - 1) / den)).

    ``tokens_expr`` overrides the default whitespace tokenization with
    any array<string> Column (e.g. shingles_of for shingle-set
    similarity) — the filter chain is tokenization-agnostic.
    ``tokens_df`` goes one step further (r18): a pre-pinned
    ``(id, toks, sz)`` frame replaces the internal tokenize+pin so a
    caller can share one materialized token-set frame with another
    operator (see _prefix_candidates).

    100 TB design: the document-frequency aggregate and the prefix
    equi-join shuffle on TOKENS (heavily reduced: one row per prefix
    token, prefixes are (1-t) of each doc); the verification join
    shuffles on ids, bounded by the candidate count. Nothing is
    all-pairs. The tokenized frame is lazily checkpointed because three
    subtrees reference it (df-agg, prefix, verification) — Catalyst
    reuses exchanges, not arbitrary subtrees.
    """
    from ..qcommon import round6x

    num, den = threshold_num, threshold_den
    toks, cand = _prefix_candidates(
        docs, id_col, text_col, num, den, tokens_expr, positional_filter,
        tokens_df=tokens_df,
    )
    ta = toks.select(F.col("id").alias("id_a"), F.col("toks").alias("ta"))
    tb = toks.select(F.col("id").alias("id_b"), F.col("toks").alias("tb"))
    # Verify-stage single evaluation (round 11): the old shape computed
    # size(array_intersect) in the threshold Filter AND re-computed it
    # per output column — Filter and Project each evaluate their own
    # copy, and predicate pushdown re-substitutes through any
    # intermediate projection (the CollapseProject trap, item 16). The
    # reuse() pin materializes one candidate-sized frame of four ints
    # per pair (the arrays are DROPPED here — the pin is tiny at any
    # scale) with exactly one intersect per candidate: measured −14%
    # on the slowest catalog query at sf0.1, identical output.
    sized = reuse(
        cand.join(ta, "id_a")
        .join(tb, "id_b")
        .select(
            "id_a",
            "id_b",
            F.size(F.array_intersect("ta", "tb")).alias("n_inter"),
            (F.size("ta") + F.size("tb")).alias("__szsum"),
        )
    )
    return (
        sized.withColumn("n_union", F.col("__szsum") - F.col("n_inter"))
        .filter(F.col("n_inter") * den >= F.col("n_union") * num)
        .select(
            "id_a",
            "id_b",
            "n_inter",
            "n_union",
            round6x(F.col("n_inter") / F.col("n_union")).alias("jaccard"),
        )
    )
