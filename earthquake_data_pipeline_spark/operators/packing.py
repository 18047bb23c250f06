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
  SHARD, not the row: ``groupBy(shard).applyInPandas`` gives each shard
  one Arrow-batched pandas pass. Shard count is the parallelism knob;
  shards are hash-assigned so they stay balanced and each must fit one
  executor's memory (docs-per-shard × row width — the same contract any
  grouped-map operator carries).
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
    order) → [(bin_id, running_fill_after_placement)]. Factored out of the
    grouped-map stage so its invariants are property-testable without a
    Spark job."""
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

    def pack(pdf):
        import pandas as pd

        pdf = pdf.sort_values(id_col, kind="mergesort")
        packed = greedy_pack(pdf[tokens_col], budget)
        bins = [b for b, _ in packed]
        fills = [f for _, f in packed]
        return pd.DataFrame(
            {
                shard_col: pdf[shard_col].values,
                id_col: pdf[id_col].values,
                "n_tokens": pdf[tokens_col].astype("int64").values,
                "bin_id": bins,
                "bin_fill": fills,
            }
        )

    return df.select(shard_col, id_col, tokens_col).groupBy(shard_col).applyInPandas(
        pack, out_schema
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
