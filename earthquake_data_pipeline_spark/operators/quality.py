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


def char_diversity(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Gibberish/degenerate-text detection via the Simpson collision
    index — the INTEGER-EXACT cousin of character entropy: over the
    doc's characters, collisions = Σ c_i·(c_i−1) and pairs = n·(n−1);
    diversity_ppm = ⌊10⁶·(1 − collisions/pairs)⌋. A one-character spam
    doc scores 0; natural text sits high. Entropy needs a log (never
    engine-exact); the collision index ranks the same degenerate tail
    with pure int64 arithmetic (n ≤ docs are KBs → no overflow), which
    is why it is the quality-signal face here (alongside the
    repetition and stopword signals in operators/text.py).

    Shape: explode to (doc, char) → two aggregates. The explode is
    m rows per doc — scan-bounded, map-side combined into per-(doc,
    char) counts before the exchange.
    """
    chars = docs.select(
        F.col(id_col).alias("id"),
        F.length(text_col).alias("n"),
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.length(text_col)),
                lambda i: F.col(text_col).substr(i, F.lit(1)),
            )
        ).alias("ch"),
    )
    per_char = chars.groupBy("id", "n", "ch").agg(F.count("*").alias("c"))
    return (
        per_char.groupBy("id", "n")
        .agg(F.sum(F.col("c") * (F.col("c") - 1)).alias("collisions"))
        .select(
            F.col("id").alias(id_col),
            F.col("n").cast("long").alias("n_chars"),
            F.col("collisions").cast("long").alias("collisions"),
            F.when(
                F.col("n") >= 2,
                F.floor(
                    1000000
                    * (
                        F.lit(1)
                        - F.col("collisions") / (F.col("n") * (F.col("n") - 1))
                    )
                ),
            )
            .otherwise(0)
            .cast("long")
            .alias("diversity_ppm"),
        )
        .orderBy(id_col)
    )


def fact_reconciliation(
    orders: DataFrame,
    lineitem: DataFrame,
) -> DataFrame:
    """Cross-table reconciliation — the warehouse audit the reference's
    dbt layer never codified: does each order's header total agree
    with the sum of its line amounts? Exact DECIMAL accumulation on
    both sides (float sums are order-dependent; decimal sums are not),
    mismatches bucketed by signed cent difference.

    One join on the order key (both sides pre-aggregated to the key,
    so the join is key-domain-sized), then a tiny census aggregate.
    The testdata generator does not derive o_totalprice from lineitem,
    so the interesting output here is the bucket HISTOGRAM shape; on a
    real warehouse the nonzero buckets are the bug report.
    """
    li = lineitem.groupBy(F.col("l_orderkey").alias("okey")).agg(
        F.sum(
            (
                F.col("l_extendedprice").cast("decimal(18,2)")
                * (F.lit(1).cast("decimal(18,2)") - F.col("l_discount").cast("decimal(18,2)"))
            ).cast("decimal(18,4)")
        ).alias("line_total"),
        F.count("*").alias("n_lines"),
    )
    o = orders.select(
        F.col("o_orderkey").alias("okey"),
        F.col("o_totalprice").cast("decimal(18,2)").alias("header_total"),
    )
    j = o.join(li, "okey", "left")
    # scale by 10^4 (the full scale of the line product), so the
    # decimal is integer-valued BEFORE the long cast — a *100 cast
    # leaves 2 live decimals, and Spark truncates where DuckDB rounds
    diff_tt = (
        (
            F.col("header_total").cast("decimal(18,4)")
            - F.coalesce(F.col("line_total"), F.lit(0).cast("decimal(18,4)"))
        )
        * 10000
    ).cast("long")
    bucket = (
        F.when(F.col("line_total").isNull(), "no_lines")
        .when(diff_tt == 0, "exact")
        .when(F.abs(diff_tt) <= 10000, "within_1")
        .when(diff_tt > 0, "header_high")
        .otherwise("header_low")
    )
    return (
        j.select(bucket.alias("bucket"), diff_tt.alias("dc"))
        .groupBy("bucket")
        .agg(
            F.count("*").alias("n_orders"),
            F.coalesce(F.sum(F.abs(F.col("dc"))), F.lit(0))
            .cast("long")
            .alias("abs_ten_thousandths"),
        )
        .orderBy("bucket")
    )


def k_anonymity_audit(
    df: DataFrame,
    quasi_cols: list[str],
    k: int = 10,
    by_col: str | None = None,
) -> DataFrame:
    """k-anonymity audit over a quasi-identifier tuple: a row is
    re-identifiable if its QI equivalence class holds fewer than ``k``
    rows. Reports, per ``by_col`` slice (or one global row), the class
    census and the suppression rate a k-anonymizer would pay —
    the privacy gate a dataset release runs next to the PII redaction
    pass (operators/text.py::redact_pii).

    Two aggregates: rows → QI classes (data-sized shuffle, the QI tuple
    is the key) → slice census (class-domain-sized). rate_ppm is exact
    integer arithmetic.
    """
    classes = df.groupBy(*quasi_cols).agg(F.count("*").alias("cls_n"))
    group = [F.col(by_col)] if by_col else [F.lit(0).alias("all_rows")]
    violating = F.col("cls_n") < k
    return classes.groupBy(*group).agg(
        F.count("*").cast("long").alias("n_classes"),
        F.sum(violating.cast("long")).cast("long").alias("n_violating"),
        F.min("cls_n").cast("long").alias("min_class"),
        F.sum("cls_n").cast("long").alias("n_rows"),
        F.sum(F.when(violating, F.col("cls_n")).otherwise(F.lit(0)))
        .cast("long")
        .alias("rows_at_risk"),
        F.expr(
            f"CAST((sum(CASE WHEN cls_n < {k} THEN cls_n ELSE 0 END)"
            " * 1000000) DIV sum(cls_n) AS BIGINT)"
        ).alias("risk_ppm"),
    )


def fk_integrity_audit(
    fact: DataFrame,
    fk_col: str,
    dim: DataFrame,
    pk_col: str,
) -> DataFrame:
    """Referential-integrity census: how many fact rows carry a foreign
    key with no parent (left anti semantics), how many are null, and
    the orphan-key domain size — the warehouse-health check every load
    (operators/merge.py's upsert path) should gate on.

    One aggregate-then-anti-join: the fact side collapses to its FK
    domain FIRST (groupBy fk → count), so the anti-join runs on
    key-domain-sized frames — at 100 TB you audit the domain, not the
    rows.
    """
    from ..qcommon import reuse

    # reuse() pin (r14 migration): referenced by totals + the anti-join
    fk_counts = reuse(
        fact.groupBy(F.col(fk_col).alias("fk")).agg(F.count("*").alias("n"))
    )
    keys = dim.select(F.col(pk_col).alias("fk")).distinct()
    orphans = fk_counts.filter(F.col("fk").isNotNull()).join(
        keys, "fk", "left_anti"
    )
    totals = fk_counts.agg(
        F.sum("n").cast("long").alias("n_rows"),
        F.sum(F.when(F.col("fk").isNull(), F.col("n")).otherwise(F.lit(0)))
        .cast("long")
        .alias("n_null_fk"),
        F.count(F.when(F.col("fk").isNotNull(), F.lit(1)))
        .cast("long")
        .alias("n_fk_values"),
    )
    osum = orphans.agg(
        F.count("*").cast("long").alias("n_orphan_keys"),
        F.coalesce(F.sum("n"), F.lit(0)).cast("long").alias("n_orphan_rows"),
    )
    return totals.crossJoin(osum).select(
        "n_rows",
        "n_null_fk",
        "n_fk_values",
        "n_orphan_keys",
        "n_orphan_rows",
        F.expr("(n_orphan_rows * 1000000) DIV n_rows")
        .cast("long")
        .alias("orphan_ppm"),
    )
