"""Data-quality expectation checking — the dbt-tests face of the engine.

The reference ships a dbt project whose natural test surface
(not_null / unique / accepted_values / range, dbt_files/models/*/
schema.yml declares the columns) is empty; a production deployment
fills it. This operator runs a declared expectation suite in ONE
aggregation pass over the table and emits a violations report — the
shape dbt renders per test, computed engine-side.

Scale: every expectation compiles to a conditional-sum aggregate, so
the whole suite is a single scan + single (global) aggregation —
adding expectations adds columns to the agg, not passes over 100 TB.
``unique`` adds a countDistinct (one expand) — the only expectation
that costs more than a conditional sum, priced exactly like SQL
COUNT(DISTINCT).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

Expectation = tuple  # ("not_null", col) | ("unique", col) |
#                      ("accepted_values", col, values) |
#                      ("between", col, lo, hi)


def expectation_report(df: DataFrame, expectations: list[Expectation]) -> DataFrame:
    """Run the suite in one aggregation; returns one row per
    expectation: (expectation, column, n_violations, passed).

    Violation semantics (dbt-compatible):
    - ``not_null``: rows where the column IS NULL;
    - ``unique``: non-null rows minus distinct non-null values (0 when
      every non-null value appears once — NULLs never violate unique);
    - ``accepted_values``: non-null rows outside the value list;
    - ``between``: non-null rows outside [lo, hi].
    """
    aggs = []
    meta = []
    for i, e in enumerate(expectations):
        kind, col = e[0], e[1]
        c = F.col(col)
        if kind == "not_null":
            expr = F.sum(F.when(c.isNull(), 1).otherwise(0))
        elif kind == "unique":
            expr = F.sum(F.when(c.isNotNull(), 1).otherwise(0)) - F.count_distinct(c)
        elif kind == "accepted_values":
            expr = F.sum(
                F.when(c.isNotNull() & ~c.isin(list(e[2])), 1).otherwise(0)
            )
        elif kind == "between":
            lo, hi = e[2], e[3]
            expr = F.sum(
                F.when(c.isNotNull() & ((c < F.lit(lo)) | (c > F.lit(hi))), 1)
                .otherwise(0)
            )
        else:
            raise ValueError(f"unknown expectation kind {kind!r}")
        aggs.append(F.coalesce(expr, F.lit(0)).cast("long").alias(f"_v{i}"))
        meta.append((kind, col))
    wide = df.agg(*aggs)
    # one row per expectation via a single explode — NOT a unionByName of
    # N projections, which would make Catalyst evaluate the aggregation N
    # times (subtrees are not reused across union branches)
    rows = F.array(
        *[
            F.struct(
                F.lit(kind).alias("expectation"),
                F.lit(col).alias("column"),
                F.col(f"_v{i}").alias("n_violations"),
                (F.col(f"_v{i}") == 0).alias("passed"),
            )
            for i, (kind, col) in enumerate(meta)
        ]
    )
    return wide.select(F.explode(rows).alias("r")).select("r.*")
