"""Text-analysis operators for large-scale training-data pipelines
(BASELINE.json north-star: language-ID, quality scoring, token counting,
document fingerprinting).

All pure Column expressions — JVM-side, whole-stage codegen, no Python in
the hot path. Each operator is deterministic and SQL-expressible, so every
one carries a DuckDB oracle in driver_queries.py. At 100 TB these are
embarrassingly parallel scans (zero shuffles).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# A BPE-ish pre-tokenization split: letter runs, digit runs, single
# non-alphanumeric marks (the GPT-2 pre-tokenizer shape, minus unicode
# categories — RE2/Java-compatible so the oracle matches byte-for-byte).
BPE_ISH_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"

DEFAULT_STOPWORDS = ("the", "a", "an", "of", "and", "to", "in", "is")


def tokens_of(text: Column | str) -> Column:
    """Whitespace tokens (lowercased)."""
    c = F.col(text) if isinstance(text, str) else text
    return F.split(F.lower(F.trim(c)), r"\s+")


def token_count(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Token counting: whitespace tokens + BPE-ish regex pieces."""
    return df.select(
        "*",
        F.size(tokens_of(text_col)).cast("bigint").alias("n_ws_tokens"),
        F.size(F.regexp_extract_all(F.col(text_col), F.lit(BPE_ISH_PATTERN), 0))
        .cast("bigint")
        .alias("n_bpe_pieces"),
    )


def quality_score(
    df: DataFrame,
    text_col: str = "text",
    stopwords: Sequence[str] = DEFAULT_STOPWORDS,
) -> DataFrame:
    """Heuristic document quality: length, mean word length, stopword ratio,
    punctuation density — the standard cheap pre-filter signals (C4/Gopher
    -style rules) as one scan.

    score = stopword_ratio * 0.4 + clamp(mean_word_len/10) * 0.3
          + (1 - punct_ratio) * 0.3        ∈ [0, 1]
    """
    toks = tokens_of(text_col)
    n_tok = F.size(toks)
    n_chars = F.length(F.col(text_col))
    stop_arr = F.array(*[F.lit(s) for s in stopwords])
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(stop_arr, t)))
    n_punct = F.size(
        F.regexp_extract_all(F.col(text_col), F.lit(r"[^A-Za-z0-9\s]"), 0)
    )
    mean_word_len = (n_chars - (n_tok - 1)) / n_tok  # chars net of separators
    stop_ratio = n_stop / n_tok
    punct_ratio = n_punct / F.greatest(n_chars, F.lit(1))
    score = (
        stop_ratio * 0.4
        + F.least(mean_word_len / 10.0, F.lit(1.0)) * 0.3
        + (1.0 - punct_ratio) * 0.3
    )
    from ..qcommon import round6x

    return df.select(
        "*",
        n_tok.cast("bigint").alias("n_tokens"),
        # round6x, not round(x, 6): small-int ratios sit on 7-dp ties
        # (x/128, composite scores with /3200 denominators) where plain
        # double rounding diverges between engines
        round6x(stop_ratio).alias("stopword_ratio"),
        round6x(punct_ratio).alias("punct_ratio"),
        round6x(score).alias("quality_score"),
    )


# Marker tokens per language for the n-gram/stopword language-ID heuristic.
# Deterministic: score = |tokens ∩ markers(lang)|; argmax with lexicographic
# tie-break. (On synthetic corpora this mostly says 'en' — the point is the
# operator shape: pure-expression language ID at scan speed.)
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "de": ("der", "die", "das", "und", "nicht", "ist"),
    "en": ("the", "a", "of", "and", "to", "is"),
    "es": ("el", "la", "de", "que", "y", "es"),
    "fr": ("le", "la", "de", "et", "que", "est"),
}


def language_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Language ID via marker-token counts, argmax with lexicographic
    tie-break (first language in sorted order wins ties).

    The token array is let-bound and both outputs come off ONE bound
    struct: the naive form referenced ``tokens_of`` in every CASE
    branch of the argmax ladder — 24 re-tokenizations per row after
    CollapseProject (round-10 duplicate-eval scan) — where this shape
    splits twice (once per emitted column), measured −26% at sf0.1
    with bit-identical output.
    """

    def _result(toks: Column) -> Column:
        def marker_count(markers):
            # NB: F.filter treats a two-arg lambda as (element, index) —
            # bind the marker array via an outer closure, never a
            # default arg.
            arr = F.array(*[F.lit(m) for m in markers])
            return F.size(F.filter(toks, lambda t: F.array_contains(arr, t)))

        scores = {
            lang: marker_count(LANG_MARKERS[lang]) for lang in sorted(LANG_MARKERS)
        }
        best = F.greatest(*scores.values())
        pick = None
        for lang in sorted(LANG_MARKERS):  # first max in sorted order wins
            cond = scores[lang] == best
            pick = F.when(cond, lang) if pick is None else pick.when(cond, lang)
        return F.struct(
            pick.alias("detected_lang"),
            best.cast("bigint").alias("lang_score"),
        )

    from ..qcommon import let

    s = let(tokens_of(text_col), _result)
    return df.select(
        "*",
        s.getField("detected_lang").alias("detected_lang"),
        s.getField("lang_score").alias("lang_score"),
    )


def fingerprint(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Document fingerprint: md5 of the whitespace-normalized, lowercased
    text — the canonical exact-dedup key for content-identical documents
    that differ only in spacing/case."""
    normalized = F.concat_ws(" ", tokens_of(text_col))
    return df.select(
        "*",
        F.md5(normalized).alias("doc_fingerprint"),
    )


def chunk_text(
    df: DataFrame,
    text_col: str = "text",
    chunk_tokens: int = 64,
    overlap: int = 16,
) -> DataFrame:
    """Context-window chunking: split each document into overlapping
    token windows (the standard LLM training-data chunker).

    Chunk i covers tokens [i·stride, i·stride + chunk_tokens) with
    stride = chunk_tokens − overlap; the final window is allowed to be
    short; a doc shorter than one window yields exactly one chunk.
    Pure higher-order array expressions — the explode multiplies rows
    map-side with no shuffle, so chunking runs at scan speed at any
    corpus size.
    """
    if overlap >= chunk_tokens:
        raise ValueError("overlap must be smaller than chunk_tokens")
    stride = chunk_tokens - overlap

    # Let-bound token array: the naive form read ``toks`` inside the
    # per-chunk lambda, and a lambda ARGUMENT subtree re-evaluates per
    # element — one full re-tokenization per chunk, O(chunks·m) work
    # that the plan-text duplicate-eval scan cannot see (the subtree
    # appears once in the plan). Binding it as a lambda variable makes
    # chunking O(m) per doc; measured −28% at sf0.1 with bit-identical
    # output, and the win grows with document length.
    def _chunks(toks: Column) -> Column:
        n = F.size(toks)
        last_idx = F.greatest(
            F.ceil((n - chunk_tokens) / F.lit(stride)), F.lit(0)
        ).cast("int")
        return F.transform(
            F.sequence(F.lit(0), last_idx),
            lambda i: F.struct(
                i.cast("int").alias("chunk_idx"),
                F.concat_ws(
                    " ", F.slice(toks, i * stride + 1, chunk_tokens)
                ).alias("chunk_text"),
            ),
        )

    from ..qcommon import let

    chunks = let(tokens_of(text_col), _chunks)
    return df.select(
        "*", F.explode(chunks).alias("__chunk")
    ).select(
        *df.columns,
        F.col("__chunk.chunk_idx").alias("chunk_idx"),
        F.col("__chunk.chunk_text").alias("chunk_text"),
    )


# PII patterns kept in the RE2/Java-compatible common subset (no
# lookaround, no backreferences) so Spark and the DuckDB oracle match
# byte-for-byte.
PII_PATTERNS = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("phone", r"\b\d{3}[-.]\d{3,4}[-.]\d{4}\b", "<PHONE>"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
)


def redact_pii(df: DataFrame, text_col: str = "text") -> DataFrame:
    """PII scrubbing for training corpora: replace emails / phone-shaped
    numbers / IPv4 literals with typed placeholders, and count what was
    redacted per category (the audit trail a curation pipeline keeps).

    Each category's count is taken on the text AFTER the previous
    categories' replacements, so counts equal the replacements actually
    made — a phone embedded in an address the email pass already consumed
    (e.g. `555-123-4567@corp.com`) is not double-reported. Order matters:
    email first so `user@host.com` never half-matches as a phone/IP. All
    regexp_replace/regexp_count — codegen, scan-speed, zero shuffle.
    """
    out = df
    stage = F.col(text_col)
    for name, pattern, token in PII_PATTERNS:
        out = out.withColumn(f"n_{name}", F.regexp_count(stage, F.lit(pattern)))
        stage = F.regexp_replace(stage, pattern, token)
    return out.withColumn("redacted_text", stage)


def repetition_signals(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Repetition-based quality signals (the Gopher-rules family): the
    filters that catch boilerplate and degenerate generations before
    training.

    - ``top_token_ratio``      — most frequent token / total tokens
    - ``distinct_token_ratio`` — distinct / total tokens
    - ``dup_bigram_ratio``     — 1 − distinct bigrams / total bigrams

    Per-token counts go through an explode + (doc, token) groupBy — the
    shuffle-bounded scale shape, never an O(n²) per-document fold. All
    ratios are integer÷integer in double (identical on both engines) +
    round6x (tie-proof engine-neutral rounding) for exact oracle parity.
    """
    from ..qcommon import round6x
    from .fuzzy_dedup import shingles_of

    ex = df.select(F.col(id_col), F.explode(tokens_of(text_col)).alias("tok"))
    per = ex.groupBy(id_col, "tok").agg(F.count("*").alias("c"))
    tok_stats = per.groupBy(id_col).agg(
        F.sum("c").alias("n_tokens"),
        F.max("c").alias("top_tok"),
        F.count("*").alias("n_distinct"),
    )
    # total tokens = sum of per-token counts (tok_stats.n_tokens), so the
    # bigram branch only needs the distinct-bigram size — no third
    # tokenization pass
    bi = df.select(
        F.col(id_col),
        F.size(shingles_of(text_col, 2)).alias("n_distinct_bi"),
    )
    return (
        tok_stats.join(bi, id_col)
        .select(
            id_col,
            "n_tokens",
            round6x(F.col("top_tok") / F.col("n_tokens")).alias(
                "top_token_ratio"
            ),
            round6x(F.col("n_distinct") / F.col("n_tokens")).alias(
                "distinct_token_ratio"
            ),
            F.when(
                F.col("n_tokens") >= 2,
                round6x(1 - F.col("n_distinct_bi") / (F.col("n_tokens") - 1)),
            )
            .otherwise(F.lit(0.0))
            .alias("dup_bigram_ratio"),
        )
    )


def bigram_lm_scores(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Corpus-statistics language-model scoring (the CCNet-style quality
    signal): train add-one-smoothed bigram probabilities ON the corpus
    itself, then score each document by its mean bigram log-probability
    — fluent, typical text scores high; gibberish and boilerplate score
    in the tails. No external model: the "LM" is two count aggregates.

    Per doc: avg over bigrams of ln((c(w1,w2)+1)/(c(w1)+V)), V = vocab
    size. Per-bigram log-probs are 6dp-rounded then decimal-summed, so
    the score is addition-order-independent and a SQL oracle replays it
    exactly (the round6x contract).

    Scale shape: ONE corpus scan. The tokenized corpus lands once in a
    materialized intermediate (``qcommon.reuse`` — localCheckpoint by
    default, reliable checkpoint / persist by deployment flavor; a
    production pipeline could equally persist it as a columnar table
    between stages — same plan shape), and every downstream subtree — bigram counting,
    the scoring join's second pairs reference, unigram counts, and the
    vocabulary size — reads the materialized tokens, never the raw
    corpus. Unigram/bigram counts are vocab-bounded aggregates
    (map-side partial); scoring is two equi-joins keyed by token plus
    a broadcast of the 1-row vocab frame — all shuffle sizes ∝
    vocabulary, not corpus. Docs with fewer than two tokens have no
    bigrams and drop out (score undefined).

    (Measured crossover, sf0.1 / local[32]: recompute-3-scans 1.9 s <
    checkpoint-token-ARRAYS 2.5 s < checkpoint-EXPLODED-pairs 3.4 s.
    At sf0.1 the corpus file is OS-cached so rescans are nearly free
    and recompute wins; at 100 TB the scan IS the cost and the ranking
    inverts — single-scan is the shape that survives, so it ships, and
    the compact pre-explode arrays are the cheapest thing to land.)
    """
    from ..qcommon import reuse, round6x

    toks = docs.select(id_col, tokens_of(text_col).alias("toks"))
    # the one corpus scan: tokenize once, materialize the token arrays
    # (reuse() pin — r14, the r10 ledger's per-seat migration)
    toks = reuse(toks)
    n = F.size("toks")
    pairs = toks.select(
        id_col,
        F.explode(
            F.arrays_zip(
                F.slice("toks", 1, n - 1), F.slice("toks", 2, n - 1)
            )
        ).alias("p"),
    ).select(id_col, F.col("p.0").alias("w1"), F.col("p.1").alias("w2"))
    unigrams = (
        toks.select(F.explode("toks").alias("w"))
        .groupBy("w")
        .agg(F.count("*").alias("cu"))
    )
    # vocab size as a broadcast 1-row frame: no separate driver action,
    # the whole score stays one lazy plan
    vsize = unigrams.agg(F.count("*").alias("vsize"))
    bigrams = pairs.groupBy("w1", "w2").agg(F.count("*").alias("cb"))
    lp = round6x(
        F.log(
            (F.col("cb") + F.lit(1)).cast("double")
            / (F.col("cu") + F.col("vsize"))
        )
    ).cast("decimal(18,6)")
    scored = (
        pairs.join(bigrams, ["w1", "w2"])
        .join(unigrams, F.col("w1") == F.col("w"))
        .crossJoin(F.broadcast(vsize))
        .select(id_col, lp.alias("lp"))
    )
    return (
        scored.groupBy(id_col)
        .agg(F.count("*").alias("n_bigrams"), F.sum("lp").alias("_s"))
        .select(
            id_col,
            "n_bigrams",
            round6x(F.col("_s").cast("double") / F.col("n_bigrams")).alias(
                "avg_logprob"
            ),
        )
    )


def boilerplate_flags(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    para_tokens: int = 16,
    max_df: int = 1,
) -> DataFrame:
    """Cross-document boilerplate removal, the CCNet/RefinedWeb shape:
    segment every document into paragraphs, hash them, and flag any
    paragraph whose DOCUMENT frequency across the corpus exceeds
    ``max_df`` — headers, footers, cookie banners, license blurbs that
    repeat verbatim on many pages. Here "paragraph" is a non-overlapping
    ``para_tokens`` token window (the corpus has no newline structure);
    swap the segmenter for ``split('\\n\\n')`` on real text.

    Scale shape: segmentation is the chunk_text map-side explode; the
    document-frequency aggregate is one equi-shuffle on the paragraph
    hash with map-side combine. The flag join deliberately joins the
    FILTERED hash set (df > max_df only) back to the paragraphs: the
    boilerplate set is at most (#paragraphs)/max_df distinct hashes and
    in practice tiny, so AQE turns the join into a broadcast — the full
    paragraph stream is never shuffled a second time.

    Returns per-paragraph rows (id, chunk_idx, para_hash, n_para_tokens,
    is_boilerplate); aggregate per doc for the audit, or filter + re-
    concat for the cleaned corpus.
    """
    paras = chunk_text(df.select(id_col, text_col), text_col, para_tokens, 0)
    hashed = paras.select(
        id_col,
        "chunk_idx",
        F.md5("chunk_text").alias("para_hash"),
        F.size(tokens_of("chunk_text")).alias("n_para_tokens"),
    )
    boiler = (
        hashed.groupBy("para_hash")
        .agg(F.count_distinct(id_col).alias("n_docs_with"))
        .filter(F.col("n_docs_with") > max_df)
        .select("para_hash", F.lit(1).alias("_b"))
    )
    return hashed.join(boiler, "para_hash", "left").select(
        id_col,
        "chunk_idx",
        "para_hash",
        "n_para_tokens",
        F.col("_b").isNotNull().alias("is_boilerplate"),
    )


def canonical_url(url: Column | str) -> Column:
    """URL canonicalization for crawl dedup (the step before
    ``url_domains``-style grouping): collapse the equivalent spellings a
    crawler actually sees — case, ``www.``, explicit default port,
    trailing slash, fragments, pure-tracking query strings — to one
    canonical form, so exact-dup detection by URL works.

    Pure chained ``regexp_replace`` with LITERAL replacements only: no
    capture-group references, because replacement syntax is the one
    place Spark ($1) and other engines (\\1) diverge — with literals the
    same patterns replay identically anywhere. Each pattern is anchored
    or unique-per-URL, so Spark's replace-all and an oracle's
    replace-first agree. Deliberately lossy where the web is sloppy
    (path case IS significant per RFC 3986, but mixed-case duplicates
    dominate real crawls; a stricter variant would lowercase only
    scheme+host).

    Scale: per-row codegen expressions — scan-speed, no shuffle.
    """
    c = F.col(url) if isinstance(url, str) else url
    u = F.lower(c)
    u = F.regexp_replace(u, r"#[^#]*$", "")  # fragment
    u = F.regexp_replace(u, r"\?utm_[^&?]*$", "")  # tracking-only query
    u = F.regexp_replace(u, r"^https://www\.", "https://")
    u = F.regexp_replace(u, r"^http://www\.", "http://")
    u = F.regexp_replace(u, r":443/", "/")  # https default port
    u = F.regexp_replace(u, r":80/", "/")  # http default port
    u = F.regexp_replace(u, r"/$", "")  # trailing slash
    return u
