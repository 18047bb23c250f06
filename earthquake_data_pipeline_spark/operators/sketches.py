"""Mergeable frequency sketches: Misra-Gries heavy hitters.

The 100 TB question "which keys dominate this column" cannot afford a
full groupBy when the key space is huge (URLs, user ids, n-grams): the
exact answer shuffles every distinct key. Misra-Gries answers it in one
map-only pass with k counters per partition and a trivial merge, with a
HARD guarantee (Misra & Gries 1982; Berinde et al. merge bound):

- per partition, every counter UNDERCOUNTS its item by at most
  n_p/(k+1) and never overcounts;
- summing per-partition summaries keeps the bound additive: for any
  item, true − est ≤ n/(k+1) across the whole input;
- therefore every item with true frequency > n/(k+1) has est > 0 and
  SURVIVES the sketch, under ANY partitioning of the data.

That last property is what the gate query checks: presence and error
bound are partition-proof booleans even though the raw counter values
depend on how Spark split the input — the same guarantee-not-output
oracle style as approx_stats.

Scale shape: one Arrow-batched map pass emitting ≤ k rows per
partition, one tiny groupBy over ≤ k × partitions rows. Memory is O(k)
per task regardless of input size. The per-batch inner loop runs over
``value_counts()`` output (weighted MG), not raw rows, so the Python
cost is O(distinct-per-batch), not O(rows).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def mg_partition_summaries(df: DataFrame, key_col: str, k: int = 31) -> DataFrame:
    """One Misra-Gries summary per partition: ≤ k (key, est) rows whose
    counts undercount truth by at most n_partition/(k+1)."""
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("key", T.StringType(), False),
            T.StructField("est", T.LongType(), False),
        ]
    )

    def fn(batches):
        import pandas as pd

        counters: dict[str, int] = {}
        for pdf in batches:
            # weighted MG: fold each batch's exact value_counts into the
            # counter set — equivalent guarantee, vectorized counting
            for key, c in pdf[key_col].value_counts().items():
                c = int(c)
                if key in counters:
                    counters[key] += c
                elif len(counters) < k:
                    counters[key] = c
                else:
                    # decrement ALL counters by the largest amount the
                    # incoming weight and the current minimum allow
                    dec = min(c, min(counters.values()))
                    counters = {
                        kk: vv - dec for kk, vv in counters.items() if vv > dec
                    }
                    c -= dec
                    if c > 0:
                        if key in counters:
                            counters[key] += c
                        elif len(counters) < k:
                            counters[key] = c
        yield pd.DataFrame(
            {"key": list(counters.keys()), "est": list(counters.values())}
        )

    return df.select(F.col(key_col).alias(key_col)).mapInPandas(fn, schema)


def heavy_hitters_sketch(df: DataFrame, key_col: str, k: int = 31) -> DataFrame:
    """Merged global sketch: sum the per-partition summaries. Any key
    with true count > n/(k+1) is guaranteed present with
    true − n/(k+1) ≤ est ≤ true."""
    return (
        mg_partition_summaries(df, key_col, k)
        .groupBy("key")
        .agg(F.sum("est").alias("est"))
    )
