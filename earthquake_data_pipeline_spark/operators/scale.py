"""Scale primitives: skew-salted joins and bucketed (co-located) tables.

AQE's skew-join splitting (on by default, session.py) handles moderate
skew at runtime; these are the explicit tools for the cases AQE can't
fix:

- ``salted_join`` — a single hot key whose matching rows exceed one
  executor's memory even after AQE splits (AQE splits the skewed side's
  partitions but every split still joins against the FULL matching build
  rows). Salting spreads the hot key across ``salt_factor`` reducers by
  construction.
- ``write_bucketed`` / ``bucketed_join_ready`` — repeated large⋈large
  joins on a stable key: pay the shuffle once at write time, then every
  subsequent join is exchange-free (Spark's bucketing metadata satisfies
  the join's distribution requirement).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    how: str = "inner",
    salt_factor: int = 8,
    salt_source: str | None = None,
) -> DataFrame:
    """Equi-join with deterministic key salting for skewed left sides.

    The left (skewed, large) side gets a salt in [0, salt_factor) derived
    from ``salt_source`` (a high-cardinality left column; defaults to all
    non-key columns) — deterministic, so retried tasks salt identically
    (F.rand() would break replay/speculative execution). The right side
    is replicated once per salt value via an exploded literal array —
    rows × salt_factor, acceptable when right is the smaller side of a
    shuffle join. Join keys become (keys..., salt); result columns equal
    a plain join's.

    At 100 TB: a key holding 10% of rows caps one reducer at rows/10; the
    salt spreads it to rows/(10·salt_factor) with zero semantic change
    for equi-joins (each left row meets each matching right row exactly
    once — on one specific salt).
    """
    keys = list(on)
    if how in ("right", "rightouter", "right_outer", "full", "outer", "full_outer", "fullouter"):
        # the replicated right side would emit each unmatched right row
        # salt_factor times under right/full outer semantics
        raise ValueError(f"salted_join does not support how={how!r}")
    if salt_source is not None:
        salt_expr = F.pmod(F.xxhash64(salt_source), F.lit(salt_factor))
    else:
        non_key = [c for c in left.columns if c not in keys]
        if not non_key:
            # hashing the key itself gives every hot-key row the SAME
            # salt — zero spreading; demand an explicit source instead
            raise ValueError(
                "left side has only key columns: pass salt_source "
                "(a high-cardinality column) to get real spreading"
            )
        salt_expr = F.pmod(F.xxhash64(*non_key), F.lit(salt_factor))
    lsalted = left.withColumn("__salt", salt_expr.cast("int"))
    rsalted = right.withColumn(
        "__salt",
        F.explode(F.array(*[F.lit(i) for i in range(salt_factor)])),
    )
    return lsalted.join(rsalted, keys + ["__salt"], how).drop("__salt")


def write_bucketed(
    df: DataFrame,
    table: str,
    keys: Sequence[str],
    num_buckets: int = 32,
    sort_keys: Sequence[str] | None = None,
) -> None:
    """Persist as a bucketed (and optionally sort-bucketed) table: one
    shuffle now, exchange-free joins/aggregations on ``keys`` forever
    after. Sorted buckets additionally remove the join-time Sort."""
    writer = df.write.bucketBy(num_buckets, *keys)
    if sort_keys:
        writer = writer.sortBy(*sort_keys)
    writer.mode("overwrite").saveAsTable(table)


def bucketed_join_ready(
    spark: SparkSession, left_table: str, right_table: str, on: Sequence[str]
) -> DataFrame:
    """Join two same-bucketed tables on their bucket keys — Catalyst sees
    both sides' bucketing satisfies the required hash distribution and
    plans the join with NO Exchange (verified in tests)."""
    return spark.table(left_table).join(spark.table(right_table), list(on))


def _bloom_hash(key, j: int, m_bits: int):
    """Hash j's bit position for ``key`` — the repo-standard md5-prefix
    integer family, engine-neutral and exactly SQL-replayable."""
    c = F.col(key) if isinstance(key, str) else key
    h = F.conv(
        F.substring(F.md5(F.concat(F.lit(f"bf{j}|"), c.cast("string"))), 1, 8),
        16,
        10,
    ).cast("long")
    return F.pmod(h, F.lit(m_bits))


def bloom_filter_build(
    dim_keys: DataFrame, key_col: str, m_bits: int = 65536, k_hashes: int = 3
) -> DataFrame:
    """Build a Bloom filter of the dim keys as ONE row holding a
    word-packed bitset ``map<word → 32-bit value>`` — broadcastable at
    any m (65536 bits = ≤2048 map entries).

    Packing uses 32 bits per long word, so every value stays positive
    and the probe side needs only div/mod arithmetic (no engine-specific
    shift semantics). Distinct (word, 2^(bit%32)) pairs sum to the OR
    because each term is a distinct power of two.

    Spark ships native runtime bloom pruning
    (``spark.sql.optimizer.runtime.bloomFilter.enabled``) that injects
    this exact pattern automatically for suitable joins; this explicit
    operator exists for when the filter must be REUSED across queries,
    shipped to another system, or — as here — replayed bit-identically
    by a SQL oracle.
    """
    coords = dim_keys.select(
        F.explode(
            F.array(*[_bloom_hash(key_col, j, m_bits) for j in range(k_hashes)])
        ).alias("bit")
    ).distinct()
    words = coords.select(
        (F.col("bit") / 32).cast("long").alias("word"),
        F.pow(F.lit(2.0), F.pmod(F.col("bit"), F.lit(32))).cast("long").alias("v"),
    )
    return (
        words.groupBy("word")
        .agg(F.sum("v").alias("v"))
        .agg(
            F.map_from_entries(
                F.sort_array(F.collect_list(F.struct("word", "v")))
            ).alias("bloom_words")
        )
    )


def bloom_might_contain(
    key, words_col="bloom_words", m_bits: int = 65536, k_hashes: int = 3
):
    """Membership predicate Column against the packed bitset: for each of
    the k hashes, extract bit (word div/mod — the zorder idiom) and AND
    them. O(k) map lookups per row, pure codegen — the probe side never
    explodes, shuffles, or leaves the JVM."""
    cond = F.lit(True)
    for j in range(k_hashes):
        h = _bloom_hash(key, j, m_bits)
        word = F.coalesce(
            F.element_at(F.col(words_col), (h / 32).cast("long")), F.lit(0)
        )
        bit = (
            (word / F.pow(F.lit(2.0), F.pmod(h, F.lit(32))).cast("long"))
            .cast("long") % 2
        )
        cond = cond & (bit == 1)
    return cond


def bloom_prune(
    fact: DataFrame,
    dim_keys: DataFrame,
    fact_key: str,
    dim_key: str,
    m_bits: int = 65536,
    k_hashes: int = 3,
) -> DataFrame:
    """Pre-join pruning: drop fact rows that CANNOT match the dim —
    no false negatives by Bloom construction, false positives bounded by
    (set_bits/m)^k. The filter frame is one row (crossJoin-broadcast);
    the fact side is filtered map-only BEFORE any shuffle, which is the
    entire point at 100 TB: the exchange then moves only plausible rows.
    Follow with the exact join; semantics are unchanged.
    """
    bloom = bloom_filter_build(dim_keys, dim_key, m_bits, k_hashes)
    return (
        fact.crossJoin(F.broadcast(bloom))
        .filter(bloom_might_contain(fact_key, "bloom_words", m_bits, k_hashes))
        .drop("bloom_words")
    )
