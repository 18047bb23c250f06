"""Sequence packing + deterministic shard export for training-data prep.

Large-scale LM training wants documents packed into fixed-token-budget
bins (constant-length batches, minimal padding) and written as a
deterministic set of shards with a manifest. Both are post-curation
steps the reference's warehouse never needed, but any 100 TB
training-data engine does — they sit downstream of the dedup/quality
operators in this package.

Design for 100 TB:
- ``pack_documents`` is greedy FIRST-FIT-IN-ORDER within a shard — the
  packing decision is inherently sequential, so the parallel unit is the
  SHARD, not the row: a shard-hash exchange + partition-local sort feeds
  a streaming ``mapInPandas`` whose per-shard (bin_id, fill) state
  survives Arrow batch boundaries. Shard count is the parallelism knob;
  shards are hash-assigned so they stay balanced, and a shard LARGER
  than one task's memory streams through in O(arrow_batch) residency
  (round-11 — the round-10 hot-key audit's per-key residency fix; the
  old grouped-map form required whole-shard residency).
- Determinism everywhere: shard = hash-mod of the id, packing order =
  id order. Re-running on the same input yields byte-identical bins —
  resumable exports, reproducible training batches, and a SQL oracle
  (a recursive CTE replays the greedy fold exactly).
- ``export_shards`` writes one directory per shard via ``partitionBy``
  (one shuffle on the shard key, then scan-speed writes) and returns a
  manifest computed from the SAME frame, so manifest and files cannot
  drift.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


def with_shard(df: DataFrame, id_col: str, n_shards: int) -> DataFrame:
    """Deterministic shard assignment: md5-derived bucket of the id (the
    same engine-neutral keying hash_sample uses, so a DuckDB oracle can
    replay it) — NOT Spark's internal hash, which other engines can't
    reproduce."""
    bucket = F.conv(
        F.substring(F.md5(F.col(id_col).cast("string")), 1, 8), 16, 10
    ).cast("long")
    return df.withColumn("shard", (bucket % n_shards).cast("int"))


def greedy_pack(token_counts, budget: int):
    """The pure greedy first-fit-in-order fold: token counts (in packing
    order) → [(bin_id, running_fill_after_placement)]. The reference
    implementation the streaming mapInPandas stage must replay row for
    row — kept separate so its invariants are property-testable without
    a Spark job."""
    out = []
    bin_id, fill = 0, 0
    first = True
    for n in token_counts:
        n = int(n)
        if first:
            first, fill = False, n
        elif fill + n <= budget:
            fill += n
        else:
            bin_id += 1
            fill = n
        out.append((bin_id, fill))
    return out


def pack_documents(
    df: DataFrame,
    budget: int,
    shard_col: str = "shard",
    id_col: str = "doc_id",
    tokens_col: str = "n_tokens",
) -> DataFrame:
    """Greedy in-order packing of documents into token-budget bins.

    Within each shard, documents are taken in ``id_col`` order; a doc
    joins the current bin when it fits (``fill + n <= budget``), else it
    opens the next bin. A doc larger than the whole budget gets a bin of
    its own (callers chunk oversized docs first — see
    ``text.chunk_documents``). Output: one row per doc with its
    ``bin_id`` (dense, 0-based per shard) and the running ``bin_fill``
    after placement.

    Execution shape (hot-key safe, round-11 — the token_bucket_admit
    template): one hash exchange on the shard key, a partition-local
    (shard, id) sort, then a streaming ``mapInPandas`` stage whose
    per-shard (bin_id, fill) state survives Arrow batch boundaries.
    The old ``groupBy(shard).applyInPandas`` form required EVERY row of
    a shard resident in one task's memory at once — the per-key
    residency class from the round-10 hot-key audit; a 100 TB corpus
    over a few thousand shards breaks that contract long before the
    packing arithmetic does. This form holds O(arrow_batch +
    shards_per_partition) regardless of shard size, and the fold is
    identical (greedy_pack replays it row for row).
    """
    out_schema = T.StructType(
        [
            df.schema[shard_col],
            df.schema[id_col],
            T.StructField("n_tokens", T.LongType(), True),
            T.StructField("bin_id", T.LongType(), False),
            T.StructField("bin_fill", T.LongType(), False),
        ]
    )

    def pack_stream(batches):
        import numpy as np
        import pandas as pd

        state: dict = {}  # shard -> (bin_id, fill, started)
        for pdf in batches:
            n = len(pdf)
            if n == 0:
                continue
            sarr = pdf[shard_col].to_numpy()
            toks = pdf[tokens_col].to_numpy().astype("int64")
            bins = np.empty(n, dtype=np.int64)
            fills = np.empty(n, dtype=np.int64)
            # contiguous shard runs (the partition is sorted by shard, id)
            starts = np.flatnonzero(
                np.concatenate(([True], sarr[1:] != sarr[:-1]))
            )
            bounds = np.append(starts, n)
            for s, t in zip(bounds[:-1], bounds[1:]):
                key = sarr[s]
                key = key.item() if hasattr(key, "item") else key
                bin_id, fill, started = state.get(key, (0, 0, False))
                for i in range(s, t):
                    tok = toks[i]
                    if not started:
                        started, fill = True, tok
                    elif fill + tok <= budget:
                        fill += tok
                    else:
                        bin_id += 1
                        fill = tok
                    bins[i] = bin_id
                    fills[i] = fill
                state[key] = (bin_id, fill, started)
            yield pd.DataFrame(
                {
                    shard_col: pdf[shard_col],
                    id_col: pdf[id_col],
                    "n_tokens": toks,
                    "bin_id": bins,
                    "bin_fill": fills,
                }
            )

    return (
        df.select(shard_col, id_col, tokens_col)
        .repartition(F.col(shard_col))
        .sortWithinPartitions(shard_col, id_col)
        .mapInPandas(pack_stream, out_schema)
    )


def export_shards(
    df: DataFrame,
    path: str,
    id_col: str,
    n_shards: int,
    fmt: str = "parquet",
) -> DataFrame:
    """Write ``df`` as ``n_shards`` deterministic directories
    (``shard=K/``) and return the manifest (shard, n_rows, ids_md5).

    One exchange on the shard key (repartition matches partitionBy so
    each shard writes from one task set), then a second pass over the
    same frame builds the manifest: per-shard row count plus an
    order-insensitive content fingerprint (sum of id-md5 prefixes) a
    reader can verify after download.
    """
    sharded = with_shard(df, id_col, n_shards)
    (
        sharded.repartition(n_shards, "shard")
        .write.mode("overwrite")
        .partitionBy("shard")
        .format(fmt)
        .save(path)
    )
    fingerprint = F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 8), 16, 10)
    return (
        sharded.groupBy("shard")
        .agg(
            F.count("*").alias("n_rows"),
            F.sum(fingerprint.cast("long")).alias("ids_md5"),
        )
        .orderBy("shard")
    )


LENGTH_BUCKETS = [16, 32, 64, 128, 256, 512, 1024]


def length_batches(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_shards: int = 8,
    batch_size: int = 8,
) -> DataFrame:
    """Length-bucketed batch assignment — the padding-waste minimizer
    training loaders use: documents are grouped into power-of-two
    token-length buckets, then dealt into fixed-size batches in a
    deterministic hash order, and each batch reports its padding waste
    against the bucket boundary. Sits beside pack_documents (which
    CONCATENATES into a token budget); this keeps documents whole and
    pads, the sequence-classification / SFT shape.

    Determinism + scale share one mechanism: batches never cross
    (bucket, shard) cells, where shard = pmod(md5-hash(id), n_shards).
    The row_number that deals batches therefore runs per-cell — every
    cell sorts independently in parallel, so there is no global (or
    even per-bucket) single-task sort at 100 TB; n_shards is the
    parallelism knob and the assignment replays bit-identically under
    any partitioning (pure hash order, no rand()).

    One exchange on (bucket, shard); the batch aggregate reuses it.

    The last bucket is OPEN-ENDED: documents longer than
    ``LENGTH_BUCKETS[-1]`` land in it, and a batch containing one
    reports ``max_tokens > bucket_len`` and a negative ``pad_waste``
    (the real pad target for such a batch is its max_tokens — the
    loader pads to the longest member, not the bucket boundary).
    Truncate or chunk oversized docs upstream if fixed-length batches
    are required.
    """
    from .sampling import hash_bucket

    n_tokens = F.size(F.split(F.lower(F.trim(F.col(text_col))), r"\s+"))
    bucket = F.lit(LENGTH_BUCKETS[-1])
    for b in reversed(LENGTH_BUCKETS[:-1]):
        bucket = F.when(F.col("n_tokens") <= b, b).otherwise(bucket)
    d = docs.select(
        F.col(id_col).alias("id"),
        n_tokens.alias("n_tokens"),
        F.pmod(hash_bucket(id_col, "lenbatch"), F.lit(n_shards)).alias("shard"),
    ).withColumn("bucket_len", bucket)
    w = Window.partitionBy("bucket_len", "shard").orderBy(
        hash_bucket("id", "lenbatch"), "id"
    )
    dealt = d.withColumn(
        "batch", F.floor((F.row_number().over(w) - 1) / batch_size).cast("int")
    )
    return (
        dealt.groupBy("bucket_len", "shard", "batch")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").alias("sum_tokens"),
            F.max("n_tokens").alias("max_tokens"),
        )
        .select(
            "bucket_len",
            F.col("shard").cast("int").alias("shard"),
            "batch",
            "n_docs",
            "sum_tokens",
            "max_tokens",
            (F.col("n_docs") * F.col("bucket_len") - F.col("sum_tokens")).alias(
                "pad_waste"
            ),
        )
        .orderBy("bucket_len", "shard", "batch")
    )
