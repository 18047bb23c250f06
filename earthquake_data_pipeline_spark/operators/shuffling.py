"""Deterministic multi-epoch training-order shuffle.

Training loaders need a different document order every epoch, but the
order must be REPRODUCIBLE (resume mid-epoch, re-run byte-identical)
and cluster-shape-independent — which rules out rand() and any
partition-order dependence. The standard fix, same family as
operators/sampling.py: order by a content-derived hash, re-salted per
epoch, so each epoch is an independent pseudo-random permutation that
replays exactly anywhere.

Design for 100 TB:
- shard = hash mod n_shards is map-only; the within-shard position is
  a row_number per (epoch, shard) cell — cells sort independently in
  parallel (n_shards × n_epochs tasks), never a global sort.
- The emitted per-cell ORDER CHECKSUM (sum of pos·(id+1)) is
  position-sensitive: two orders over the same membership produce
  different checksums, so an oracle match proves the permutation
  itself, not just the partition membership.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .sampling import hash_bucket


def epoch_shuffle(
    df: DataFrame,
    id_col: str = "doc_id",
    n_epochs: int = 3,
    n_shards: int = 8,
) -> DataFrame:
    """Per-epoch shard + order assignment, summarized per (epoch,
    shard) cell as (n_docs, order_checksum). The full assignment is the
    ``p`` subframe; the summary keeps driver-facing output bounded.

    The checksum is modular (round-10 overflow audit): the raw
    Σ pos·(id+1) form overflows int64 PER ROW once pos·id passes 2^63
    — at a 10^12-doc corpus pos ~ 10^11 and id ~ 10^12, so every
    term blows the envelope (ANSI-on: job death; ANSI-off: silent
    wrap). Each term and the running sum are reduced mod
    M = 2^31 − 1: residues are < 2^31, their product stays < 2^62
    (long-safe at ANY corpus size), and the sum accumulates in
    decimal(38,0) before the final mod — same detection power for the
    order-verification use (a swapped pair changes the residue with
    probability 1 − 1/M), replayable in any engine with 64-bit ints.
    """
    if n_epochs <= 0 or n_shards <= 0:
        # sequence(0, n_epochs-1) auto-steps BACKWARDS when the end is
        # below the start (n_epochs=0 → epochs [0, -1]: phantom epochs,
        # not an empty result), and pmod by 0 shards dies deep in
        # codegen — reject degenerate configs loudly instead (same
        # discipline as the LSH banding validation).
        raise ValueError(
            f"n_epochs={n_epochs} and n_shards={n_shards} must be >= 1"
        )
    e = df.select(
        F.col(id_col).alias("id"),
        F.explode(F.sequence(F.lit(0), F.lit(n_epochs - 1))).alias("epoch"),
    )
    key = F.concat_ws(
        "#", F.col("id").cast("string"), F.col("epoch").cast("string")
    )
    h = e.withColumn("h", hash_bucket(key, "shuf")).withColumn(
        "shard", F.pmod(F.col("h"), F.lit(n_shards))
    )
    w = Window.partitionBy("epoch", "shard").orderBy("h", "id")
    p = h.withColumn("pos", F.row_number().over(w))
    m = F.lit(2147483647)  # 2^31 - 1; residue product < 2^62, long-safe
    term = F.pmod(
        F.pmod(F.col("pos").cast("long"), m) * F.pmod(F.col("id") + 1, m), m
    )
    return (
        p.groupBy("epoch", "shard")
        .agg(
            F.count("*").alias("n_docs"),
            F.pmod(F.sum(term.cast("decimal(38,0)")), m.cast("decimal(38,0)"))
            .cast("long")
            .alias("order_checksum"),
        )
        .select(
            F.col("epoch").cast("int").alias("epoch"),
            F.col("shard").cast("int").alias("shard"),
            "n_docs",
            "order_checksum",
        )
        .orderBy("epoch", "shard")
    )
