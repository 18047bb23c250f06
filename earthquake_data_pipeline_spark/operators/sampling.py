"""Deterministic corpus sampling for training-data mixtures.

``df.sample()`` is seed-dependent AND partitioning-dependent — rerun the
job with different parallelism and you get a different sample, which is
unacceptable for reproducible training mixtures. Hash-based sampling
decides per ROW from a content-derived hash: the same row is kept or
dropped everywhere, forever, regardless of cluster shape. This is also
what makes held-out splits stable across reprocessing runs.

Everything is md5-derived (engine-neutral) and pure Column expressions
inside codegen — scan-speed, zero shuffle, exact DuckDB oracles.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_HASH_SPACE = 1 << 32  # first 8 md5 hex chars → uniform [0, 2^32)


def hash_bucket(key: Column | str, salt: str = "") -> Column:
    """Uniform deterministic bucket in [0, 2^32) from md5(key || salt).

    ``salt`` decorrelates independent sampling decisions over the same
    key (e.g. a 1% eval split and a 50% train sample must not nest).
    """
    key_col = F.col(key) if isinstance(key, str) else key
    salted = F.concat(key_col.cast("string"), F.lit(salt))
    return F.conv(F.substring(F.md5(salted), 1, 8), 16, 10).cast("long")


def sample_by_hash(
    df: DataFrame,
    key_col: str,
    fraction: float,
    salt: str = "",
) -> DataFrame:
    """Keep rows whose hash bucket falls below ``fraction`` of the space.

    The integer threshold floor(fraction * 2^32) makes the predicate
    exact and engine-neutral (no float comparison at the boundary).
    """
    threshold = int(fraction * _HASH_SPACE)
    return df.filter(hash_bucket(key_col, salt) < F.lit(threshold))


def stratified_sample_by_hash(
    df: DataFrame,
    key_col: str,
    strata_col: str,
    fractions: dict[str, float],
    default_fraction: float = 0.0,
    salt: str = "",
) -> DataFrame:
    """Per-stratum deterministic sampling — the training-mixture shape:
    e.g. keep 100% of low-resource languages but 10% of English.

    One CASE ladder on the stratum column picks the threshold; the row
    decision is still a pure hash of the key, so changing one stratum's
    rate never perturbs another stratum's sample.
    """
    thresh: Column = F.lit(int(default_fraction * _HASH_SPACE))
    for value, frac in sorted(fractions.items()):
        thresh = (
            F.when(F.col(strata_col) == value, F.lit(int(frac * _HASH_SPACE)))
            .otherwise(thresh)
        )
    return df.filter(hash_bucket(key_col, salt) < thresh)


def mixture_resample(
    df: DataFrame,
    domain_col: str,
    id_col: str,
    k_budget: int = 4,
    salt: str = "mix-sqrt",
) -> DataFrame:
    """Temperature-flattened domain mixture (α = 1/2): keep
    ``t_i = ⌊√(k_budget · n_i)⌋`` documents from each domain — the
    square-root reweighting multilingual/multi-source training mixtures
    use so head domains stop drowning tail domains (n_i^α sampling,
    here with α = ½ and a per-domain budget multiplier).

    Exactness notes, because α = ½ is the only temperature with an
    engine-portable exact form: IEEE-754 sqrt is correctly rounded, and
    floor(sqrt_double(x)) equals ⌊√x⌋ exactly for integer x < 2^51 (an
    error would need √x within ulp of an integer m, i.e. |x − m²| < 1 —
    impossible for distinct integers). No normalizing float SUM over
    domains is ever computed (Σ n_j^α would be summation-order-
    dependent), so the targets replay bit-identically anywhere.

    Selection is the deterministic hash order (hash_bucket, id) per
    domain with ``row_number ≤ t_i`` — exactly t_i docs, stable under
    any partitioning. The per-domain window sorts each stratum in one
    task: fine while strata fit an executor; at mega-domain scale swap
    the ranking for ``sample_by_hash(rate = t_i/n_i)`` (map-only,
    approximately t_i docs) and keep this exact form as the audit face.

    Returns the input plus ``n_docs``, ``n_target`` and ``keep``.
    """
    counts = df.groupBy(domain_col).agg(F.count("*").alias("n_docs"))
    targets = counts.withColumn(
        "n_target",
        F.floor(F.sqrt(F.col("n_docs") * F.lit(k_budget))).cast("long"),
    )
    w = Window.partitionBy(domain_col).orderBy(
        hash_bucket(id_col, salt), F.col(id_col)
    )
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .join(F.broadcast(targets), domain_col)
        .withColumn("keep", (F.col("_rn") <= F.col("n_target")).cast("int"))
        .drop("_rn")
    )


def assign_splits(
    df: DataFrame,
    key_col: str,
    splits: dict[str, float] | None = None,
    salt: str = "split",
) -> DataFrame:
    """Deterministic train/val/test assignment: each row's hash bucket
    falls into exactly one cumulative range, so the splits are DISJOINT
    and EXHAUSTIVE by construction, stable across reruns/partitioning,
    and honored by every downstream job that uses the same key+salt.

    Also the leakage-control tool: keying by a DOCUMENT id keeps all of
    a document's chunks in one split; keying by a group id (site,
    author) keeps correlated content together — pick the key at the
    granularity leakage matters.

    Adds a ``split`` column; fractions must sum to 1 (the last range is
    closed at 2^32 so float rounding cannot orphan rows).
    """
    splits = splits or {"train": 0.8, "val": 0.1, "test": 0.1}
    total = sum(splits.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"split fractions must sum to 1, got {total}")
    bucket = hash_bucket(key_col, salt)
    expr = None
    acc = 0.0
    items = list(splits.items())
    for i, (name, frac) in enumerate(items):
        # 12-dp re-round per step: float accumulation would drift the
        # cumulative threshold (0.8 + 0.1 = 0.9000000000000001 → one
        # bucket off the oracle's CAST(0.9 * 2^32)) — measure-zero but
        # free to eliminate
        acc = round(acc + frac, 12)
        hi = _HASH_SPACE if i == len(items) - 1 else int(acc * _HASH_SPACE)
        cond = bucket < F.lit(hi)
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    return df.withColumn("split", expr)


def weighted_bernoulli(
    df: DataFrame,
    key_col: str,
    weight_col: Column | str,
    max_weight: int,
    salt: str = "wb",
) -> DataFrame:
    """Deterministic weight-proportional Bernoulli sampling: keep each
    row with probability weight/max_weight, decided purely by the key's
    hash — the quality-weighted curation primitive (sample high-quality
    documents at full rate, low-quality at a fraction, reproducibly).

    The admission test is pure integer cross-multiplication,
    ``bucket * max_weight < weight * 2^32`` — no division, no float, so
    the boundary row is decided identically everywhere (same property
    split_assignment needed floor() discipline for). Weights must be
    integers in [0, max_weight]; weight 0 never admits, max_weight
    always admits. Map-only: zero shuffle at any scale.
    """
    w = F.col(weight_col) if isinstance(weight_col, str) else weight_col
    admit = (
        hash_bucket(key_col, salt) * F.lit(max_weight)
        < w.cast("long") * F.lit(_HASH_SPACE)
    )
    return df.withColumn("admitted", admit)
