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

from pyspark.sql import Column, DataFrame
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
