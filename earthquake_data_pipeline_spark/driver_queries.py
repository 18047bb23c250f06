"""Driver-facing query catalog: SURVEY.md §2 operators realized on the
driver's testdata star schema (FIXTURES.md F5 mapping), each paired with an
ANSI-SQL DuckDB oracle.

Contract (see __spark_entry__.py): every query is a callable
``(spark, sf_dir) -> DataFrame``; its oracle is an equivalent SQL string over
views named after the parquet files. Column names AND types are aligned on
both sides (the driver hashes values after sorting columns by name).

Determinism rules applied throughout (SURVEY §7 hard-part 5):
- keep-any dedup → compare key columns only;
- floating aggregates → round(×, 6) on both sides (ulp-order noise);
- timestamps in outputs → formatted strings (engine-neutral);
- top-k → total tiebreak order.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .functions.scalar import case_rank, decade_of
from .operators.cleaning import range_filter
from .operators.dedup import dedup_keep_any
from .operators.merge import anti_join_merge, high_water_mark_filter


from .qcommon import _fanout, _table, _utc, reuse, round6x  # noqa: F401  (re-exported)


# ---------------------------------------------------------------------------
# M0/M1 — cleaning chain, aggregates, sorts (SURVEY §2.2/2.3/2.5/2.7)
# ---------------------------------------------------------------------------


def q_clean_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P1+P4+P5+P6+W2: projection, conjunctive range filters, keyed dedup.

    The cleaning spine of the reference (pipeline/clean_historical.py:27-50)
    mapped onto `events` (value≙magnitude, ts≙earthquake_datetime). Keep-any
    dedup survivor is nondeterministic → output the key columns only.
    """
    _utc(spark)
    ev = _table(spark, sf_dir, "events")
    filtered = range_filter(
        ev.filter(F.col("value").isNotNull()), {"value": (0.0, 150.0)}
    ).filter(
        (F.col("ts") >= F.lit("2024-01-05").cast("timestamp"))
        & (F.col("ts") <= F.lit("2024-01-25").cast("timestamp"))
    )
    return dedup_keep_any(filtered, ["user_id", "event_type"]).select(
        "user_id", "event_type"
    )


SQL_CLEAN_EVENTS = """
SELECT DISTINCT user_id, event_type
FROM events
WHERE value IS NOT NULL
  AND value BETWEEN 0.0 AND 150.0
  AND ts >= TIMESTAMP '2024-01-05'
  AND ts <= TIMESTAMP '2024-01-25'
"""


def q_yearly_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1+A2+O1 (yearly_earthquake_stats.sql analog): count/avg by year.

    Averages via exact decimal sums (r13 class close — the
    severity_buckets pattern from the r12 input-split axis): a raw
    double avg is accumulation-order-sensitive, so one scan-layout
    change can flip a 7th-dp rounding tie vs the oracle. Exact decimal
    sum → one value-determined double cast → one IEEE division →
    tie-proof round. Precisions follow pricing_summary's fast-path
    rule (input p ≤ 8 keeps sum() on the DecimalAggregates
    UnscaledValue-long path — the r13 close pair measured the (18,2)
    form ~2× slower): l_quantity ≤ 50 → (6,2), accumulator (16,2)
    holds 4e12 rows/group; l_extendedprice < 1e6 → (8,2), accumulator
    (18,2) holds ~2.6e11 rows/group — both fail LOUD (decimal
    overflow) past the envelope, never wrap."""
    _utc(spark)
    from .qcommon import round6x

    li = _table(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_quantity") > 3)
        .groupBy(F.year("l_shipdate").cast("int").alias("year"))
        .agg(
            F.count("*").alias("item_count"),
            F.sum(F.col("l_quantity").cast("decimal(6,2)")).alias("__sq"),
            F.sum(F.col("l_extendedprice").cast("decimal(8,2)")).alias("__sp"),
        )
        .select(
            "year",
            "item_count",
            round6x(F.col("__sq").cast("double") / F.col("item_count")).alias("avg_qty"),
            round6x(F.col("__sp").cast("double") / F.col("item_count")).alias("avg_price"),
        )
        .orderBy("year")
    )


SQL_YEARLY_STATS = """
SELECT CAST(year(l_shipdate) AS INTEGER) AS year,
       count(*) AS item_count,
       CAST(round(CAST(CAST(sum(CAST(l_quantity AS DECIMAL(6,2))) AS DOUBLE)
            / count(*) AS DECIMAL(18,12)), 6) AS DOUBLE) AS avg_qty,
       CAST(round(CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(8,2))) AS DOUBLE)
            / count(*) AS DECIMAL(18,12)), 6) AS DOUBLE) AS avg_price
FROM lineitem
WHERE l_quantity > 3
GROUP BY 1
ORDER BY 1
"""


SEVERITY_THRESHOLDS = [
    (400000.0, "Great"),
    (300000.0, "Major"),
    (200000.0, "Strong"),
    (100000.0, "Moderate"),
    (50000.0, "Light"),
]
SEVERITY_RANKS = {"Great": 1, "Major": 2, "Strong": 3, "Moderate": 4, "Light": 5, "Minor": 6}


def q_severity_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D4+D5+A1+O3 (fact severity ladder + country_severe_earthquake_stats
    analog): CASE bucket on o_totalprice, count per bucket, rank-ordered."""
    _utc(spark)
    orders = _table(spark, sf_dir, "orders")
    sev = F.when(F.col("o_totalprice") >= 400000.0, "Great")
    for bound, label in SEVERITY_THRESHOLDS[1:]:
        sev = sev.when(F.col("o_totalprice") >= bound, label)
    sev = sev.otherwise("Minor")
    from .qcommon import round6x

    # decimal accumulation, not F.avg (r12 input-split axis — the one
    # measured divergence of the sweep): a raw double avg is
    # accumulation-order-sensitive, and the PACKED scan extreme (one
    # partition) merged in an order whose 7th-dp tie rounded away from
    # DuckDB's. Exact decimal sum → one value-determined double cast →
    # one IEEE division → tie-proof round.
    return (
        orders.groupBy(sev.alias("severity"))
        .agg(
            F.count("*").alias("frequency"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("__s"),
        )
        .select(
            "severity",
            "frequency",
            round6x(
                F.col("__s").cast("double") / F.col("frequency")
            ).alias("avg_price"),
        )
        .orderBy(case_rank("severity", SEVERITY_RANKS, 7))
    )


SQL_SEVERITY_BUCKETS = """
SELECT severity, count(*) AS frequency,
       CAST(round(CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
            / count(*) AS DECIMAL(18,12)), 6) AS DOUBLE) AS avg_price
FROM (
  SELECT o_totalprice,
         CASE WHEN o_totalprice >= 400000.0 THEN 'Great'
              WHEN o_totalprice >= 300000.0 THEN 'Major'
              WHEN o_totalprice >= 200000.0 THEN 'Strong'
              WHEN o_totalprice >= 100000.0 THEN 'Moderate'
              WHEN o_totalprice >= 50000.0  THEN 'Light'
              ELSE 'Minor' END AS severity
  FROM orders
) GROUP BY severity
ORDER BY CASE severity WHEN 'Great' THEN 1 WHEN 'Major' THEN 2 WHEN 'Strong' THEN 3
              WHEN 'Moderate' THEN 4 WHEN 'Light' THEN 5 WHEN 'Minor' THEN 6 ELSE 7 END
"""


def q_top_k_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O2+O4 (top_100_earthquake intended form): TakeOrderedAndProject, total
    tiebreak (price desc, key asc) for determinism."""
    _utc(spark)
    orders = _table(spark, sf_dir, "orders")
    return (
        orders.select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(100)
    )


SQL_TOP_K_ORDERS = """
SELECT o_orderkey, o_custkey, o_totalprice
FROM orders
ORDER BY o_totalprice DESC, o_orderkey ASC
LIMIT 100
"""


def q_region_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R1 (broadcast dim join ×2) + A2/A3: customer⋈nation⋈region rollup.

    nation (25) and region (5) are broadcast — no shuffle for the joins;
    the only exchange is the final group-by, exactly as at 100 TB.
    """
    _utc(spark)
    cust = _table(spark, sf_dir, "customer")
    nation = _table(spark, sf_dir, "nation")
    region = _table(spark, sf_dir, "region")
    return (
        cust.join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy(F.col("r_name").alias("region_name"))
        .agg(
            F.count("*").alias("customer_count"),
            # decimal accumulation, not F.avg (r13 bare-avg class close)
            F.sum(F.col("c_acctbal").cast("decimal(6,2)")).alias("__s"),
        )
        .select(
            "region_name",
            "customer_count",
            round6x(F.col("__s").cast("double") / F.col("customer_count")).alias(
                "avg_acctbal"
            ),
        )
        .orderBy("region_name")
    )


SQL_REGION_ROLLUP = """
SELECT r_name AS region_name,
       count(*) AS customer_count,
       CAST(round(CAST(CAST(sum(CAST(c_acctbal AS DECIMAL(6,2))) AS DOUBLE)
            / count(*) AS DECIMAL(18,12)), 6) AS DOUBLE) AS avg_acctbal
FROM customer
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY 1
ORDER BY 1
"""


def q_max_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4+R1 (top_countries_strongest_earthquake analog): max order value per
    nation through a two-hop join."""
    _utc(spark)
    orders = _table(spark, sf_dir, "orders")
    cust = _table(spark, sf_dir, "customer")
    nation = _table(spark, sf_dir, "nation")
    return (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy(F.col("n_name").alias("nation_name"))
        .agg(F.max("o_totalprice").alias("max_order_value"))
        .orderBy(F.desc("max_order_value"))
    )


SQL_MAX_PER_GROUP = """
SELECT n_name AS nation_name, max(o_totalprice) AS max_order_value
FROM orders
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
GROUP BY 1
ORDER BY 2 DESC
"""


def q_conditional_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5+A6+D13+D14 (tsunami_flags analog): conditional sum + ratio-of-aggs.

    percent_high_value = round(high/total*100, 6) is computed via scaled
    INTEGER arithmetic (round-half-up of high*1e8/total) and one final
    int→double conversion: a binary-double division round()ed independently
    by two engines can diverge at the last ulp, but integer div + a single
    IEEE-754 conversion is bit-identical everywhere.
    """
    _utc(spark)
    ev = _table(spark, sf_dir, "events")
    flag = F.when(F.col("value") > 100.0, 1).otherwise(0)
    return (
        ev.groupBy("event_type")
        .agg(
            F.count("*").alias("total_events"),
            F.sum(flag).alias("high_value_events"),
        )
        .withColumn(
            "percent_high_value",
            F.expr(
                "CAST((high_value_events * 200000000 + total_events)"
                " DIV (2 * total_events) AS DOUBLE) / 1000000.0"
            ),
        )
        .orderBy(F.desc("percent_high_value"), "event_type")
    )


SQL_CONDITIONAL_RATIO = """
WITH agg AS (
  SELECT event_type,
         count(*) AS total_events,
         sum(CASE WHEN value > 100.0 THEN 1 ELSE 0 END) AS high_value_events
  FROM events
  GROUP BY event_type
)
SELECT event_type, total_events,
       CAST(high_value_events AS BIGINT) AS high_value_events,
       CAST((high_value_events * 200000000 + total_events)
            // (2 * total_events) AS DOUBLE) / 1000000.0 AS percent_high_value
FROM agg
ORDER BY percent_high_value DESC, event_type
"""


ALERT_LIKE_RANKS = {"error": 1, "purchase": 2, "signup": 3, "click": 4}


def q_in_list_case_sort(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P8+D5+O3 (alert_level_frequency_stats analog): IN-list filter + CASE
    rank multi-key sort."""
    _utc(spark)
    ev = _table(spark, sf_dir, "events")
    return (
        ev.filter(F.col("event_type").isin("error", "purchase", "signup", "click"))
        .select("event_id", "event_type", "user_id", "value")
        .orderBy(
            case_rank("event_type", ALERT_LIKE_RANKS, 5), F.desc("value"), "event_id"
        )
    )


SQL_IN_LIST_CASE_SORT = """
SELECT event_id, event_type, user_id, value
FROM events
WHERE event_type IN ('error', 'purchase', 'signup', 'click')
ORDER BY CASE event_type WHEN 'error' THEN 1 WHEN 'purchase' THEN 2
              WHEN 'signup' THEN 3 WHEN 'click' THEN 4 ELSE 5 END,
         value DESC, event_id
"""


def q_scalar_derivations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D1+D2+D3: epoch-ms round-trip, year extraction, decade bucketing.

    ts → unix_millis → timestamp_millis reproduces the reference's
    epoch-ms ingestion (clean_historical.py:27) with FLOOR millisecond
    buckets. r13 ts-domain axis: Spark's unix_millis floor-divides the
    microseconds (floor-exact on pre-1970 fractions — the OPPOSITE of
    unix_timestamp, which truncates), while DuckDB's epoch_ms()
    truncates toward zero — so the ORACLE spells the floor as
    epoch_us(date_trunc('millisecond', ts)) // 1000: date_trunc is
    calendar (= floor) truncation in exact integer arithmetic, and the
    truncated value's epoch_us is a multiple of 1000, so DuckDB's
    truncating ``//`` cannot round it. (The r13 decimal route was NOT
    exact — DECIMAL/INT division lowers to DOUBLE, wrong past 2^53 us;
    r14 ADVICE fix, probe-pinned in test_functions.py.)
    Timestamps are output as formatted strings (engine-neutral hashing).
    """
    _utc(spark)
    ev = _table(spark, sf_dir, "events")
    ms = F.unix_millis(F.col("ts"))
    return ev.select(
        "event_id",
        ms.alias("ts_ms"),
        F.date_format(F.timestamp_millis(ms), "yyyy-MM-dd HH:mm:ss.SSS").alias("ts_rt"),
        F.year("ts").cast("int").alias("event_year"),
        decade_of("ts").alias("event_decade"),
    )


SQL_SCALAR_DERIVATIONS = """
SELECT event_id,
       -- exact millisecond floor (r14 ADVICE fix): date_trunc is
       -- calendar (= floor) truncation in integer arithmetic, and the
       -- truncated epoch_us is a multiple of 1000 so the truncating
       -- // cannot round it — exact over the full range, matching
       -- Spark's unix_millis floorDiv. (Neither the old decimal route
       -- nor epoch(ts)*1000 is: both pass through DOUBLE.)
       (epoch_us(date_trunc('millisecond', ts)) // 1000) AS ts_ms,
       strftime(date_trunc('millisecond', ts),
                '%Y-%m-%d %H:%M:%S.%g') AS ts_rt,
       CAST(year(ts) AS INTEGER) AS event_year,
       CAST(CAST(floor(year(ts) / 10) AS BIGINT) * 10 AS INTEGER) AS event_decade
FROM events
"""


# ---------------------------------------------------------------------------
# M2 — incremental / merge semantics (SURVEY §2.9, R4, P10, U1, W1)
# ---------------------------------------------------------------------------


def q_merge_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R4/S13 (MERGE WHEN NOT MATCHED): rows of the increment whose key is
    absent from the accumulated table → exactly the rows a MERGE inserts."""
    _utc(spark)
    ev = _table(spark, sf_dir, "events")
    existing = ev.filter(F.col("event_id") % 3 != 0)
    increment = ev.filter(F.col("ts") >= F.lit("2024-01-15").cast("timestamp"))
    return anti_join_merge(increment, existing, ["event_id"]).select(
        "event_id", "user_id", "event_type"
    )


SQL_MERGE_ANTI_JOIN = """
SELECT e.event_id, e.user_id, e.event_type
FROM events e
WHERE e.ts >= TIMESTAMP '2024-01-15'
  AND NOT EXISTS (
    SELECT 1 FROM events x
    WHERE x.event_id % 3 != 0 AND x.event_id = e.event_id
  )
"""


def q_high_water_mark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P10+A7/I1: scalar-subquery high-water mark — only rows strictly past
    max(ts) of the existing slice flow through."""
    _utc(spark)
    ev = _table(spark, sf_dir, "events")
    existing = ev.filter(F.col("ts") < F.lit("2024-01-20").cast("timestamp"))
    return high_water_mark_filter(ev, existing, "ts").select("event_id", "user_id")


SQL_HIGH_WATER_MARK = """
SELECT event_id, user_id
FROM events
-- COALESCE encodes the engine's first-run semantics: empty existing
-- slice → NULL max → take everything (ts > NULL would yield 0 rows,
-- diverging from high_water_mark_filter's `if hwm is None: return new`)
WHERE ts > COALESCE(
  (SELECT max(ts) FROM events WHERE ts < TIMESTAMP '2024-01-20'),
  TIMESTAMP '0001-01-01')
"""


def q_union_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U1+W1 (stg_earthquake first-run branch): union of two overlapping
    slices, keyed dedup, per-type census.

    Migrated r12 (pre-committed at r11 close): the keep-1 dedup is
    ``dedup_keep_first`` — a min-struct aggregate with a deterministic
    ts tiebreak that partial-aggregates map-side, so a duplicate-mass
    hot key collapses before the shuffle instead of serializing into
    one window task. The W1 window form stays the reference-parity
    face (stg_earthquake + the dedup_keep_first/dedup_row_number
    total-order parity test)."""
    _utc(spark)
    from .operators.dedup import dedup_keep_first

    ev = _table(spark, sf_dir, "events").select(
        "event_id", "event_type", "ts"
    )
    a = ev.filter(F.col("ts") < F.lit("2024-01-20").cast("timestamp"))
    b = ev.filter(F.col("ts") >= F.lit("2024-01-10").cast("timestamp"))
    return (
        dedup_keep_first(a.unionByName(b), ["event_id"], tiebreak=["ts"])
        .groupBy("event_type")
        .agg(F.count("*").alias("n_events"))
        .orderBy("event_type")
    )


SQL_UNION_DEDUP = """
SELECT event_type, count(*) AS n_events
FROM (
  SELECT DISTINCT event_id, event_type FROM (
    SELECT event_id, event_type FROM events WHERE ts < TIMESTAMP '2024-01-20'
    UNION ALL
    SELECT event_id, event_type FROM events WHERE ts >= TIMESTAMP '2024-01-10'
  )
)
GROUP BY event_type
ORDER BY event_type
"""


def q_top2_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window top-k per group (the OLAP face of W1's row_number): top-2
    events per user by value, deterministic tiebreak."""
    _utc(spark)
    from pyspark.sql import Window

    ev = _table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.desc("value"), F.asc("event_id"))
    return (
        ev.withColumn("rn", F.row_number().over(w).cast("int"))
        .filter(F.col("rn") <= 2)
        .select("user_id", "event_id", "value", "rn")
    )


SQL_TOP2_PER_USER = """
SELECT user_id, event_id, value, CAST(rn AS INTEGER) AS rn
FROM (
  SELECT user_id, event_id, value,
         row_number() OVER (PARTITION BY user_id ORDER BY value DESC, event_id ASC) AS rn
  FROM events
)
WHERE rn <= 2
"""


def q_stats_per_decade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3+D3+O2 (country_earthquake_stats_per_decade analog): 3-key groupBy
    with decade bucketing, ordered by frequency."""
    _utc(spark)
    li = _table(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_quantity") > 3)
        .groupBy(
            "l_returnflag",
            "l_linestatus",
            decade_of("l_shipdate").alias("ship_decade"),
        )
        .agg(
            F.count("*").alias("frequency"),
            # decimal accumulation, not F.avg (r13 bare-avg class close)
            F.sum(F.col("l_quantity").cast("decimal(6,2)")).alias("__sq"),
            F.sum(F.col("l_discount").cast("decimal(4,2)")).alias("__sd"),
        )
        .select(
            "l_returnflag",
            "l_linestatus",
            "ship_decade",
            "frequency",
            round6x(F.col("__sq").cast("double") / F.col("frequency")).alias("avg_qty"),
            round6x(F.col("__sd").cast("double") / F.col("frequency")).alias(
                "avg_discount"
            ),
        )
        .orderBy(F.desc("frequency"), "l_returnflag", "l_linestatus", "ship_decade")
    )


SQL_STATS_PER_DECADE = """
SELECT l_returnflag, l_linestatus,
       CAST(CAST(floor(year(l_shipdate) / 10) AS BIGINT) * 10 AS INTEGER) AS ship_decade,
       count(*) AS frequency,
       CAST(round(CAST(CAST(sum(CAST(l_quantity AS DECIMAL(6,2))) AS DOUBLE)
            / count(*) AS DECIMAL(18,12)), 6) AS DOUBLE) AS avg_qty,
       CAST(round(CAST(CAST(sum(CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE)
            / count(*) AS DECIMAL(18,12)), 6) AS DOUBLE) AS avg_discount
FROM lineitem
WHERE l_quantity > 3
GROUP BY 1, 2, 3
ORDER BY frequency DESC, l_returnflag, l_linestatus, ship_decade
"""


def q_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape (the canonical OLAP agg): 2 group keys × 8 aggregates
    over the biggest fact table — partial+final HashAggregate, one shuffle.

    All money sums run in decimal: the 2-dp inputs are exact as
    decimal(15,2), the discount/tax factors as decimal(4,2), and their
    products are exact at scale 4/6 — so every aggregate is bit-identical
    to the oracle regardless of summation order (a double sum at 1e9
    magnitude diverges past 6 dp at sf0.1+). Averages derive from the
    exact sums; round6x makes the final rounding tie-proof."""
    _utc(spark)
    from .qcommon import round6x

    li = _table(spark, sf_dir, "lineitem")
    # Precision ≤ 8 keeps sum() on the DecimalAggregates long path
    # (UnscaledValue accumulators inside codegen instead of Decimal
    # objects): l_quantity ≤ 50 by TPC-H construction → decimal(6,2);
    # l_extendedprice = quantity × retailprice < 10^6 → decimal(8,2).
    # The product sums below still need Decimal accumulators (scale-4/6
    # exactness), but the two plain column sums dominate row width.
    qty_d = F.col("l_quantity").cast("decimal(6,2)")
    price_d = F.col("l_extendedprice").cast("decimal(8,2)")
    disc_d = F.col("l_discount").cast("decimal(4,2)")
    one_m_disc = (1 - F.col("l_discount")).cast("decimal(4,2)")
    one_p_tax = (1 + F.col("l_tax")).cast("decimal(4,2)")
    n = F.count("*")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(qty_d).cast("double").alias("sum_qty"),
            F.sum(price_d).cast("double").alias("sum_base_price"),
            # scale-2 re-round before the double cast: a scale-6 sum at
            # 1e10 magnitude has a >2^53 significand, where decimal->double
            # conversion can differ by 1 ulp between engines; at scale 2
            # the significand stays exactly convertible to ~9e13. NB the
            # DuckDB twin is round(sum, 2) — its decimal->decimal CAST
            # truncates, while Spark's cast and its round() are half-up
            F.sum(price_d * one_m_disc)
            .cast("decimal(38,2)")
            .cast("double")
            .alias("sum_disc_price"),
            F.sum(price_d * one_m_disc * one_p_tax)
            .cast("decimal(38,2)")
            .cast("double")
            .alias("sum_charge"),
            round6x(F.sum(qty_d).cast("double") / n).alias("avg_qty"),
            round6x(F.sum(price_d).cast("double") / n).alias("avg_price"),
            round6x(F.sum(disc_d).cast("double") / n).alias("avg_disc"),
            n.alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


SQL_PRICING_SUMMARY = """
SELECT l_returnflag, l_linestatus,
       CAST(sum(CAST(l_quantity AS DECIMAL(15,2))) AS DOUBLE) AS sum_qty,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(15,2))) AS DOUBLE) AS sum_base_price,
       CAST(round(sum(CAST(l_extendedprice AS DECIMAL(15,2))
                * CAST(1 - l_discount AS DECIMAL(4,2))), 2)
            AS DOUBLE) AS sum_disc_price,
       CAST(round(sum(CAST(l_extendedprice AS DECIMAL(15,2))
                * CAST(1 - l_discount AS DECIMAL(4,2))
                * CAST(1 + l_tax AS DECIMAL(4,2))), 2)
            AS DOUBLE) AS sum_charge,
       CAST(round(CAST(CAST(sum(CAST(l_quantity AS DECIMAL(15,2))) AS DOUBLE)
                       / count(*) AS DECIMAL(18,12)), 6) AS DOUBLE) AS avg_qty,
       CAST(round(CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(15,2))) AS DOUBLE)
                       / count(*) AS DECIMAL(18,12)), 6) AS DOUBLE) AS avg_price,
       CAST(round(CAST(CAST(sum(CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE)
                       / count(*) AS DECIMAL(18,12)), 6) AS DOUBLE) AS avg_disc,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


def q_fact_fact_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Large fact⋈fact equi-join (orders⋈lineitem on orderkey): the
    shuffle-join path — both sides hash-exchange on the key; AQE picks
    broadcast/shuffle-hash/sort-merge by observed sizes. Revenue per
    order priority."""
    _utc(spark)
    li = _table(spark, sf_dir, "lineitem")
    orders = _table(spark, sf_dir, "orders")
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("line_count"),
            F.round(F.sum(revenue), 6).alias("total_revenue"),
        )
        .orderBy("o_orderpriority")
    )


SQL_FACT_FACT_JOIN = """
SELECT o_orderpriority,
       count(*) AS line_count,
       round(sum(l_extendedprice * (1 - l_discount)), 6) AS total_revenue
FROM orders JOIN lineitem ON o_orderkey = l_orderkey
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


def q_semi_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi + anti join census (the how='...' variants SURVEY §2.4 notes we
    get for free): customers with vs without orders, per market segment."""
    _utc(spark)
    cust = _table(spark, sf_dir, "customer")
    orders = _table(spark, sf_dir, "orders")
    with_orders = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_semi")
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("n_with_orders"))
    )
    without = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("n_without_orders"))
    )
    return (
        with_orders.join(without, "c_mktsegment", "outer")
        .na.fill({"n_with_orders": 0, "n_without_orders": 0})
        .orderBy("c_mktsegment")
    )


SQL_SEMI_ANTI_JOIN = """
WITH w AS (
  SELECT c_mktsegment, count(*) AS n_with_orders
  FROM customer WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
  GROUP BY 1
), wo AS (
  SELECT c_mktsegment, count(*) AS n_without_orders
  FROM customer WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
  GROUP BY 1
)
SELECT COALESCE(w.c_mktsegment, wo.c_mktsegment) AS c_mktsegment,
       COALESCE(n_with_orders, 0) AS n_with_orders,
       COALESCE(n_without_orders, 0) AS n_without_orders
FROM w FULL OUTER JOIN wo ON w.c_mktsegment = wo.c_mktsegment
ORDER BY c_mktsegment
"""


# ---------------------------------------------------------------------------
# M3 — enrichment: spatial join, regex fallback, coalesce-fill
# (SURVEY §2.4 R1-R3, §2.3 D9-D11)
# ---------------------------------------------------------------------------

# Synthetic "world" dim for the driver tables (FIXTURES.md F3 shape):
# rectangles + a MULTIPOLYGON, bounds on .5/.1 offsets so the derived
# point grid can never land exactly on a boundary (ray-cast edge cases
# are measure-zero by construction).
GEO_POLYGONS = [
    ("Eastland", "Asia", "POLYGON ((10.3 -20.5, 90.7 -20.5, 90.7 40.5, 10.3 40.5, 10.3 -20.5))"),
    ("Westland", "Americas", "POLYGON ((-150.7 -60.5, -30.3 -60.5, -30.3 20.5, -150.7 20.5, -150.7 -60.5))"),
    ("Northisles", "Europe",
     "MULTIPOLYGON (((-10.1 50.5, 20.9 50.5, 20.9 75.5, -10.1 75.5, -10.1 50.5)), "
     "((30.1 55.5, 60.9 55.5, 60.9 70.5, 30.1 70.5, 30.1 55.5)))"),
]

# Deterministic pseudo-coordinates derived from event columns — identical
# IEEE double arithmetic on both engines.
_LON_EXPR = "(value % 100) * 3.6 - 180"
_LAT_EXPR = "CAST((user_id % 160) - 80 AS DOUBLE)"


def _events_with_coords(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.expr(_LON_EXPR).alias("longitude"),
        F.expr(_LAT_EXPR).alias("latitude"),
    )


def q_spatial_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R2 — point-in-polygon left join (numpy ray-cast mapInPandas over a
    broadcast polygon dim). Oracle expresses the same rectangles as range
    predicates — verifying the geometry kernel against closed-form SQL."""
    _utc(spark)
    from .operators.enrichment import spatial_join

    pts = _events_with_coords(spark, sf_dir)
    return spatial_join(pts, GEO_POLYGONS).select(
        "event_id",
        F.col("country").alias("geo_country"),
        F.col("region").alias("geo_region"),
    )


SQL_SPATIAL_JOIN = f"""
SELECT event_id,
       CASE
         WHEN lon BETWEEN 10.3 AND 90.7 AND lat BETWEEN -20.5 AND 40.5 THEN 'Eastland'
         WHEN lon BETWEEN -150.7 AND -30.3 AND lat BETWEEN -60.5 AND 20.5 THEN 'Westland'
         WHEN (lon BETWEEN -10.1 AND 20.9 AND lat BETWEEN 50.5 AND 75.5)
           OR (lon BETWEEN 30.1 AND 60.9 AND lat BETWEEN 55.5 AND 70.5) THEN 'Northisles'
       END AS geo_country,
       CASE
         WHEN lon BETWEEN 10.3 AND 90.7 AND lat BETWEEN -20.5 AND 40.5 THEN 'Asia'
         WHEN lon BETWEEN -150.7 AND -30.3 AND lat BETWEEN -60.5 AND 20.5 THEN 'Americas'
         WHEN (lon BETWEEN -10.1 AND 20.9 AND lat BETWEEN 50.5 AND 75.5)
           OR (lon BETWEEN 30.1 AND 60.9 AND lat BETWEEN 55.5 AND 70.5) THEN 'Europe'
       END AS geo_region
FROM (
  SELECT event_id, {_LON_EXPR} AS lon, {_LAT_EXPR} AS lat FROM events
)
"""


REGEX_TOKENS = ["vector", "customer", "spark", "window", "stream"]


def q_regex_token_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R3/F1 — first-match-wins word-token containment join on documents
    (broadcast nested-loop crossJoin + RLIKE + priority row_number)."""
    _utc(spark)
    from .operators.enrichment import regex_token_join

    # _fanout removed (r18, guide §2.4 — an exchange added "for
    # parallelism" that cost more than it bought): A/B 1.15 s -> 0.61 s
    # at sf0.1; on a wide cluster scan the guard never fired anyway.
    docs = _table(spark, sf_dir, "documents").select("doc_id", "text")
    return regex_token_join(
        docs, "text", REGEX_TOKENS, ["doc_id"], case_insensitive=False
    ).select("doc_id", "matched_token")


SQL_REGEX_TOKEN_MATCH = r"""
SELECT doc_id,
       CASE WHEN regexp_matches(text, '\bvector\b') THEN 'vector'
            WHEN regexp_matches(text, '\bcustomer\b') THEN 'customer'
            WHEN regexp_matches(text, '\bspark\b') THEN 'spark'
            WHEN regexp_matches(text, '\bwindow\b') THEN 'window'
            WHEN regexp_matches(text, '\bstream\b') THEN 'stream'
       END AS matched_token
FROM documents
"""


def q_enrich_coalesce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D9/R5 + R1 — coalesce-fill of spatial misses from a broadcast lookup
    (the reference's index-aligned fillna restated as key-join + coalesce)."""
    _utc(spark)
    from .operators.enrichment import spatial_join

    pts = _events_with_coords(spark, sf_dir)
    geo = spatial_join(pts, GEO_POLYGONS)
    nation = _table(spark, sf_dir, "nation")
    fallback = _table(spark, sf_dir, "events").select(
        "event_id", (F.col("user_id") % 25).cast("int").alias("nk")
    )
    return (
        geo.join(fallback, "event_id")
        .join(F.broadcast(nation), F.col("nk") == nation.n_nationkey, "left")
        .select(
            "event_id",
            F.coalesce(F.col("country"), F.col("n_name")).alias("final_country"),
        )
    )


SQL_ENRICH_COALESCE = f"""
SELECT e.event_id,
       COALESCE(
         CASE
           WHEN lon BETWEEN 10.3 AND 90.7 AND lat BETWEEN -20.5 AND 40.5 THEN 'Eastland'
           WHEN lon BETWEEN -150.7 AND -30.3 AND lat BETWEEN -60.5 AND 20.5 THEN 'Westland'
           WHEN (lon BETWEEN -10.1 AND 20.9 AND lat BETWEEN 50.5 AND 75.5)
             OR (lon BETWEEN 30.1 AND 60.9 AND lat BETWEEN 55.5 AND 70.5) THEN 'Northisles'
         END,
         n.n_name
       ) AS final_country
FROM (
  SELECT event_id, user_id, {_LON_EXPR} AS lon, {_LAT_EXPR} AS lat FROM events
) e
LEFT JOIN nation n ON CAST(e.user_id % 25 AS INTEGER) = n.n_nationkey
"""


# Synthetic place strings for the full enrichment pipeline: one case per
# fallback path, including a name-only country (Midland: no polygon, like
# the reference's manual 'Alaska' row, add_region.py:36) and a two-token
# place that exercises first-match-wins priority.
_PLACE_EXPR = """CASE CAST(user_id % 6 AS INT)
  WHEN 0 THEN 'near Eastland'
  WHEN 1 THEN 'offshore Westland'
  WHEN 2 THEN 'Northisles ridge'
  WHEN 3 THEN 'Midland plateau'
  WHEN 4 THEN 'Midland near Eastland border'
  ELSE 'open ocean'
END"""

# (country, region) lookup incl. the name-only Midland row; list order is
# the regex-fallback priority order (reference: COUNTRIES list order).
GEO_COUNTRY_LOOKUP = [
    ("Eastland", "Asia"),
    ("Westland", "Americas"),
    ("Northisles", "Europe"),
    ("Midland", "Oceania"),
]


def q_enrich_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's signature pipeline end-to-end (add_region.py:17-66,
    add_region_chunks.py:18-88): point-in-polygon spatial left join →
    word-token regex fallback ONLY on spatial misses (first-match-wins in
    lookup order) → broadcast region lookup for inferred countries →
    coalesce-fill. Parts are proven separately (spatial_join,
    regex_token_match, enrich_coalesce); this proves the composition,
    using event_id as the natural join key (the no-materialization scale
    path of operators/enrichment.py::enrich_events)."""
    _utc(spark)
    from .operators.enrichment import enrich_events

    ev = _table(spark, sf_dir, "events").select(
        "event_id",
        F.expr(_LON_EXPR).alias("longitude"),
        F.expr(_LAT_EXPR).alias("latitude"),
        F.expr(_PLACE_EXPR).alias("place"),
    )
    out = enrich_events(
        ev, GEO_POLYGONS, GEO_COUNTRY_LOOKUP, id_col="event_id"
    )
    return out.select(
        "event_id",
        F.col("country").alias("final_country"),
        F.col("region").alias("final_region"),
    )


SQL_ENRICH_EVENTS = rf"""
WITH pts AS (
  SELECT event_id, {_LON_EXPR} AS lon, {_LAT_EXPR} AS lat,
         {_PLACE_EXPR} AS place
  FROM events
), geo AS (
  SELECT event_id, place,
         CASE
           WHEN lon BETWEEN 10.3 AND 90.7 AND lat BETWEEN -20.5 AND 40.5 THEN 'Eastland'
           WHEN lon BETWEEN -150.7 AND -30.3 AND lat BETWEEN -60.5 AND 20.5 THEN 'Westland'
           WHEN (lon BETWEEN -10.1 AND 20.9 AND lat BETWEEN 50.5 AND 75.5)
             OR (lon BETWEEN 30.1 AND 60.9 AND lat BETWEEN 55.5 AND 70.5) THEN 'Northisles'
         END AS geo_country,
         CASE
           WHEN lon BETWEEN 10.3 AND 90.7 AND lat BETWEEN -20.5 AND 40.5 THEN 'Asia'
           WHEN lon BETWEEN -150.7 AND -30.3 AND lat BETWEEN -60.5 AND 20.5 THEN 'Americas'
           WHEN (lon BETWEEN -10.1 AND 20.9 AND lat BETWEEN 50.5 AND 75.5)
             OR (lon BETWEEN 30.1 AND 60.9 AND lat BETWEEN 55.5 AND 70.5) THEN 'Europe'
         END AS geo_region
  FROM pts
), fb AS (
  SELECT event_id, geo_country, geo_region,
         CASE WHEN regexp_matches(place, '(?i)\bEastland\b') THEN 'Eastland'
              WHEN regexp_matches(place, '(?i)\bWestland\b') THEN 'Westland'
              WHEN regexp_matches(place, '(?i)\bNorthisles\b') THEN 'Northisles'
              WHEN regexp_matches(place, '(?i)\bMidland\b') THEN 'Midland'
         END AS fb_country
  FROM geo
)
SELECT event_id,
       COALESCE(geo_country, fb_country) AS final_country,
       COALESCE(geo_region,
                CASE fb_country WHEN 'Eastland' THEN 'Asia'
                                WHEN 'Westland' THEN 'Americas'
                                WHEN 'Northisles' THEN 'Europe'
                                WHEN 'Midland' THEN 'Oceania'
                END) AS final_region
FROM fb
"""


# ---------------------------------------------------------------------------
# M5 — LLM-data-pipeline operators (north-star): text analysis, dedup
# family, similarity search, multimodal plumbing
# ---------------------------------------------------------------------------

_TOKS_SQL = r"regexp_split_to_array(lower(trim(text)), '\s+')"


def q_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting: whitespace tokens + BPE-ish regex pieces, one scan."""
    _utc(spark)
    from .operators.text import token_count

    docs = _fanout(_table(spark, sf_dir, "documents").select("doc_id", "text"))
    return token_count(docs).select("doc_id", "n_ws_tokens", "n_bpe_pieces")


SQL_TOKEN_STATS = rf"""
SELECT doc_id,
       CAST(len({_TOKS_SQL}) AS BIGINT) AS n_ws_tokens,
       CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]'))
            AS BIGINT) AS n_bpe_pieces
FROM documents
"""


def q_text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality scoring: stopword ratio, punctuation density, composite score."""
    _utc(spark)
    from .operators.text import quality_score

    docs = _fanout(_table(spark, sf_dir, "documents").select("doc_id", "text"))
    return quality_score(docs).select(
        "doc_id", "n_tokens", "stopword_ratio", "punct_ratio", "quality_score"
    )


SQL_TEXT_QUALITY = rf"""
WITH base AS (
  SELECT doc_id,
         {_TOKS_SQL} AS toks,
         length(text) AS n_chars,
         len(regexp_extract_all(text, '[^A-Za-z0-9\s]')) AS n_punct
  FROM documents
), m AS (
  SELECT doc_id,
         len(toks) AS n_tok,
         len(list_filter(toks, t -> list_contains(
             ['the','a','an','of','and','to','in','is'], t))) AS n_stop,
         n_chars, n_punct
  FROM base
)
SELECT doc_id,
       CAST(n_tok AS BIGINT) AS n_tokens,
       CAST(round(CAST(n_stop / n_tok AS DECIMAL(18,12)), 6) AS DOUBLE) AS stopword_ratio,
       CAST(round(CAST(n_punct / greatest(n_chars, 1) AS DECIMAL(18,12)), 6) AS DOUBLE) AS punct_ratio,
       CAST(round(CAST((n_stop / n_tok) * 0.4
             + least(((n_chars - (n_tok - 1)) / n_tok) / 10.0, 1.0) * 0.3
             + (1.0 - n_punct / greatest(n_chars, 1)) * 0.3 AS DECIMAL(18,12)), 6) AS DOUBLE) AS quality_score
FROM m
"""


def q_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID heuristic: marker-token counts, argmax, lexicographic ties."""
    _utc(spark)
    from .operators.text import language_id

    docs = _fanout(_table(spark, sf_dir, "documents").select("doc_id", "text"))
    return language_id(docs).select("doc_id", "detected_lang", "lang_score")


SQL_LANG_ID = rf"""
WITH s AS (
  SELECT doc_id,
         len(list_filter({_TOKS_SQL}, t -> list_contains(
             ['der','die','das','und','nicht','ist'], t))) AS c_de,
         len(list_filter({_TOKS_SQL}, t -> list_contains(
             ['the','a','of','and','to','is'], t))) AS c_en,
         len(list_filter({_TOKS_SQL}, t -> list_contains(
             ['el','la','de','que','y','es'], t))) AS c_es,
         len(list_filter({_TOKS_SQL}, t -> list_contains(
             ['le','la','de','et','que','est'], t))) AS c_fr
  FROM documents
)
SELECT doc_id,
       CASE WHEN c_de = greatest(c_de, c_en, c_es, c_fr) THEN 'de'
            WHEN c_en = greatest(c_de, c_en, c_es, c_fr) THEN 'en'
            WHEN c_es = greatest(c_de, c_en, c_es, c_fr) THEN 'es'
            ELSE 'fr' END AS detected_lang,
       CAST(greatest(c_de, c_en, c_es, c_fr) AS BIGINT) AS lang_score
FROM s
"""


def q_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: normalized-text fingerprint → hash-groupBy keep-min-id."""
    _utc(spark)
    from .operators.dedup import exact_dedup
    from .operators.text import fingerprint

    docs = _fanout(_table(spark, sf_dir, "documents").select("doc_id", "text"))
    fp = fingerprint(docs)
    return exact_dedup(fp, ["doc_fingerprint"], "doc_id").withColumnRenamed(
        "content_hash", "dedup_hash"
    )


SQL_EXACT_DEDUP = rf"""
SELECT md5(md5(array_to_string({_TOKS_SQL}, ' '))) AS dedup_hash,
       min(doc_id) AS kept_id,
       count(*) AS dup_count
FROM documents
GROUP BY 1
"""


MINHASH_SEEDS = 12
LSH_BANDS = 4


def q_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash+LSH candidate pairs: shingle → 12 md5-minhashes → 4 band
    keys → bucket self-join (id_a < id_b)."""
    _utc(spark)
    from .operators.fuzzy_dedup import minhash_lsh_pairs

    docs = _fanout(_table(spark, sf_dir, "documents").select("doc_id", "text"))
    return minhash_lsh_pairs(
        docs, num_hashes=MINHASH_SEEDS, num_bands=LSH_BANDS
    ).select(F.col("id_a").alias("doc_a"), F.col("id_b").alias("doc_b"))


def _minhash_sql() -> str:
    from .operators.fuzzy_dedup import MINHASH_PRIME, minhash_coeffs

    a, b = minhash_coeffs(MINHASH_SEEDS)
    mins = ",\n         ".join(
        f"list_min(list_transform(xs, x -> ({a[s]} * x + {b[s]}) % {MINHASH_PRIME})) AS h{s}"
        for s in range(MINHASH_SEEDS)
    )
    rows = MINHASH_SEEDS // LSH_BANDS
    bands = "\n  UNION ALL\n".join(
        "  SELECT doc_id, {b} AS band, md5({key}) AS band_key FROM mh".format(
            b=b,
            key=" || '|' || ".join(f"h{b * rows + r}::VARCHAR" for r in range(rows)),
        )
        for b in range(LSH_BANDS)
    )
    return rf"""
WITH toks AS (
  SELECT doc_id, {_TOKS_SQL} AS t FROM documents
), sh AS (
  SELECT doc_id,
         CASE WHEN len(t) >= 3 THEN list_distinct(list_transform(
             generate_series(1, len(t) - 2),
             i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]))
              ELSE [] END AS sh
  FROM toks
), xs AS (
  SELECT doc_id,
         list_transform(sh, g ->
             ('0x' || substring(md5(g), 1, 15))::BIGINT % {MINHASH_PRIME}) AS xs
  FROM sh
), mh AS (
  SELECT doc_id,
         {mins}
  FROM xs
), bands AS (
{bands}
)
SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
FROM bands a JOIN bands b
  ON a.band = b.band AND a.band_key = b.band_key AND a.doc_id < b.doc_id
"""


SQL_MINHASH_LSH = _minhash_sql()


def q_upsert_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full MERGE semantics (WHEN MATCHED UPDATE / NOT MATCHED INSERT /
    else keep) as one full-outer join — the general upsert the
    reference's insert-only MERGE specializes (S13). Updated prices are
    derived in exact decimal (price × 1.10 at scale 4) so every value is
    bit-identical to the oracle's."""
    _utc(spark)
    from .operators.merge import upsert_merge

    orders = _table(spark, sf_dir, "orders")
    base = orders.filter(F.col("o_orderkey") < 3000).select(
        "o_orderkey", "o_totalprice", "o_orderstatus"
    )
    updates = (
        orders.filter((F.col("o_orderkey") >= 2000) & (F.col("o_orderkey") < 5000))
        .select(
            "o_orderkey",
            (
                F.col("o_totalprice").cast("decimal(15,2)")
                * F.lit("1.10").cast("decimal(3,2)")
            )
            .cast("double")
            .alias("o_totalprice"),
            F.lit("U").alias("o_orderstatus"),
        )
    )
    return upsert_merge(base, updates, ["o_orderkey"]).orderBy("o_orderkey")


SQL_UPSERT_MERGE = """
WITH base AS (
  SELECT o_orderkey, o_totalprice, o_orderstatus
  FROM orders WHERE o_orderkey < 3000
), upd AS (
  SELECT o_orderkey,
         CAST(CAST(o_totalprice AS DECIMAL(15,2))
              * CAST(1.10 AS DECIMAL(3,2)) AS DOUBLE) AS o_totalprice,
         'U' AS o_orderstatus
  FROM orders WHERE o_orderkey >= 2000 AND o_orderkey < 5000
)
SELECT COALESCE(b.o_orderkey, u.o_orderkey) AS o_orderkey,
       CASE WHEN u.o_orderkey IS NOT NULL THEN u.o_totalprice
            ELSE b.o_totalprice END AS o_totalprice,
       CASE WHEN u.o_orderkey IS NOT NULL THEN u.o_orderstatus
            ELSE b.o_orderstatus END AS o_orderstatus,
       CASE WHEN u.o_orderkey IS NOT NULL AND b.o_orderkey IS NOT NULL
            THEN 'update'
            WHEN u.o_orderkey IS NOT NULL THEN 'insert'
            ELSE 'keep' END AS action
FROM base b FULL JOIN upd u USING (o_orderkey)
ORDER BY o_orderkey
"""


def q_url_domains(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Web-corpus curation: extract the host from URLs embedded in text
    (regexp capture group — identical RE2/Java semantics) and group into
    per-domain stats with a canonical doc per domain — the URL-based
    dedup/mixing step of a crawl pipeline. URLs are seeded
    deterministically (the corpus has none)."""
    _utc(spark)
    docs = _fanout(
        _table(spark, sf_dir, "documents").select("doc_id", "text", "source")
    )
    tld = (
        F.when(F.col("doc_id") % 3 == 0, ".com")
        .when(F.col("doc_id") % 3 == 1, ".org")
        .otherwise(".net")
    )
    seeded = docs.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(" via https://"),
            F.col("source"),
            tld,
            F.lit("/doc/"),
            F.col("doc_id").cast("string"),
            F.lit(" ."),
        ).alias("text"),
    )
    domain = F.regexp_extract(F.col("text"), r"https?://([^/\s]+)", 1)
    return (
        seeded.select("doc_id", domain.alias("domain"))
        .groupBy("domain")
        .agg(
            F.count("*").alias("n_docs"),
            F.min("doc_id").alias("canonical_doc"),
        )
        .orderBy("domain")
    )


SQL_URL_DOMAINS = r"""
WITH seeded AS (
  SELECT doc_id,
         text || ' via https://' || source
              || CASE WHEN doc_id % 3 = 0 THEN '.com'
                      WHEN doc_id % 3 = 1 THEN '.org'
                      ELSE '.net' END
              || '/doc/' || doc_id::VARCHAR || ' .' AS text
  FROM documents
)
SELECT regexp_extract(text, 'https?://([^/\s]+)', 1) AS domain,
       count(*) AS n_docs,
       min(doc_id) AS canonical_doc
FROM seeded
GROUP BY 1
ORDER BY 1
"""


def q_doc_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repetition-based quality signals (Gopher-rules family): top-token /
    distinct-token / duplicate-bigram ratios per document — the filters
    that catch boilerplate and degenerate text before training. Ratios
    are integer÷integer + round(6): exact cross-engine parity."""
    _utc(spark)
    from .operators.text import repetition_signals

    # _fanout removed (r18, guide §2.4): A/B 0.90 s -> 0.67 s at sf0.1
    # — the widening repartition cost more than the per-row ratio work.
    docs = _table(spark, sf_dir, "documents").select("doc_id", "text")
    return repetition_signals(docs).orderBy("doc_id")


SQL_DOC_REPETITION = f"""
WITH toks AS (
  SELECT doc_id, unnest({_TOKS_SQL}) AS tok FROM documents
), per AS (
  SELECT doc_id, tok, count(*) AS c FROM toks GROUP BY 1, 2
), tok_stats AS (
  SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tokens, max(c) AS top_tok,
         count(*) AS n_distinct
  FROM per GROUP BY 1
), bi AS (
  SELECT doc_id,
         CASE WHEN len({_TOKS_SQL}) >= 2 THEN len(list_distinct(list_transform(
             generate_series(1, len({_TOKS_SQL}) - 1),
             i -> {_TOKS_SQL}[i] || ' ' || {_TOKS_SQL}[i+1])))
              ELSE 0 END AS n_distinct_bi
  FROM documents
)
SELECT t.doc_id, t.n_tokens,
       CAST(round(CAST(t.top_tok / t.n_tokens AS DECIMAL(18,12)), 6) AS DOUBLE) AS top_token_ratio,
       CAST(round(CAST(t.n_distinct / t.n_tokens AS DECIMAL(18,12)), 6) AS DOUBLE) AS distinct_token_ratio,
       CASE WHEN t.n_tokens >= 2
            THEN CAST(round(CAST(1 - b.n_distinct_bi / (t.n_tokens - 1) AS DECIMAL(18,12)), 6) AS DOUBLE)
            ELSE 0.0 END AS dup_bigram_ratio
FROM tok_stats t JOIN bi b USING (doc_id)
ORDER BY doc_id
"""


def q_value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equal-width histogram (width_bucket shape): o_totalprice binned at
    50k, count + decimal-exact sum + span per bin. One map-side bin
    derivation + one hash aggregate — profiling at scan speed."""
    _utc(spark)
    orders = _table(spark, sf_dir, "orders")
    bin_col = F.floor(F.col("o_totalprice") / 50000.0).cast("int")
    return (
        orders.groupBy(bin_col.alias("price_bin"))
        .agg(
            F.count("*").alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("sum_price"),
            F.min("o_totalprice").alias("min_price"),
            F.max("o_totalprice").alias("max_price"),
        )
        .orderBy("price_bin")
    )


SQL_VALUE_HISTOGRAM = """
SELECT CAST(floor(o_totalprice / 50000.0) AS INTEGER) AS price_bin,
       count(*) AS n_orders,
       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
       min(o_totalprice) AS min_price,
       max(o_totalprice) AS max_price
FROM orders
GROUP BY 1
ORDER BY 1
"""


def q_eval_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Eval-set decontamination: find training docs sharing 3-gram
    shingles with a held-out eval set (doc_id < 10) — the standard
    benchmark-contamination sweep before training. One explode per side,
    an equi-join on the shingle (shuffle-bounded by shingle hash — the
    scale shape), distinct-counted per training doc."""
    _utc(spark)
    from .operators.fuzzy_dedup import shingles_of

    docs = _fanout(_table(spark, sf_dir, "documents").select("doc_id", "text"))
    sh = docs.select(
        "doc_id", F.explode(shingles_of("text", 3)).alias("shingle")
    )
    eval_sh = sh.filter(F.col("doc_id") < 10).select(
        F.col("doc_id").alias("eval_id"), "shingle"
    )
    train_sh = sh.filter(F.col("doc_id") >= 10)
    return (
        train_sh.join(eval_sh, "shingle")
        .groupBy("doc_id")
        .agg(
            F.countDistinct("shingle").alias("n_shared_shingles"),
            F.countDistinct("eval_id").alias("n_eval_docs"),
        )
        .orderBy("doc_id")
    )


SQL_EVAL_OVERLAP = f"""
WITH toks AS (
  SELECT doc_id, {_TOKS_SQL} AS t FROM documents
), sh AS (
  SELECT doc_id, unnest(
    CASE WHEN len(t) >= 3 THEN list_distinct(list_transform(
        generate_series(1, len(t) - 2),
        i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]))
         ELSE [] END) AS shingle
  FROM toks
)
SELECT tr.doc_id AS doc_id,
       count(DISTINCT tr.shingle) AS n_shared_shingles,
       count(DISTINCT ev.doc_id) AS n_eval_docs
FROM sh tr JOIN sh ev ON tr.shingle = ev.shingle
WHERE tr.doc_id >= 10 AND ev.doc_id < 10
GROUP BY 1
ORDER BY 1
"""


def q_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyword extraction, TF-IDF style (top-3 terms per doc for
    doc_id < 20): term frequency × corpus rarity, scored in pure integer
    arithmetic (score = tf·1e6·N DIV df) so both engines agree to the
    bit. NB: the log-free rarity weight N/df is a deliberate
    substitution — it is rarity-monotone but NOT rank-equivalent to the
    classical tf·log(N/df); chosen because log() cannot be hashed
    bit-exactly across engines. Document frequency is one shuffle on the
    term; the corpus size joins in as a broadcast 1-row aggregate (the
    plan stays fully lazy); ranking is one window.
    """
    _utc(spark)
    from pyspark.sql import Window

    from .operators.text import tokens_of

    # _fanout removed (r18, guide §2.4): A/B 0.87 s -> 0.51 s at sf0.1,
    # and the 8-vs-32-core anti-scaling ratio (0.62, VERDICT r17 item 6)
    # was exactly this repartition's core-count-dependent cost.
    docs = _table(spark, sf_dir, "documents").select("doc_id", "text")
    toks = docs.select("doc_id", F.explode(tokens_of("text")).alias("term"))
    n = docs.agg(F.count("*").alias("n_docs"))
    df_counts = toks.groupBy("term").agg(
        F.countDistinct("doc_id").alias("df")
    )
    tf = (
        toks.filter(F.col("doc_id") < 20)
        .groupBy("doc_id", "term")
        .agg(F.count("*").alias("tf"))
    )
    scored = (
        tf.join(df_counts, "term")
        .crossJoin(F.broadcast(n))
        .select(
            "doc_id",
            "term",
            "tf",
            "df",
            F.expr("tf * 1000000 * n_docs DIV df").alias("score_micro"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.desc("score_micro"), F.asc("term")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= 3)
        .select("doc_id", "term", "tf", "df", "score_micro", "rank")
        .orderBy("doc_id", "rank")
    )


SQL_TFIDF_TOP_TERMS = f"""
WITH toks AS (
  SELECT doc_id, unnest({_TOKS_SQL}) AS term FROM documents
), n AS (
  SELECT count(*) AS n_docs FROM documents
), dfreq AS (
  SELECT term, count(DISTINCT doc_id) AS df FROM toks GROUP BY 1
), tf AS (
  SELECT doc_id, term, count(*) AS tf
  FROM toks WHERE doc_id < 20 GROUP BY 1, 2
), scored AS (
  SELECT tf.doc_id, tf.term, tf.tf, dfreq.df,
         tf.tf * 1000000 * (SELECT n_docs FROM n) // dfreq.df AS score_micro
  FROM tf JOIN dfreq USING (term)
), ranked AS (
  SELECT *, CAST(row_number() OVER (
      PARTITION BY doc_id ORDER BY score_micro DESC, term ASC
    ) AS INTEGER) AS rank
  FROM scored
)
SELECT doc_id, term, tf, df, score_micro, rank
FROM ranked WHERE rank <= 3
ORDER BY doc_id, rank
"""


def q_hash_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified mixture sampling: per-language keep rates
    decided by a pure md5 hash of doc_id — reproducible across cluster
    shapes and reruns (df.sample() is not), zero shuffle."""
    _utc(spark)
    from .operators.sampling import stratified_sample_by_hash

    docs = _fanout(_table(spark, sf_dir, "documents").select("doc_id", "lang"))
    return stratified_sample_by_hash(
        docs,
        "doc_id",
        "lang",
        {"en": 0.25, "de": 0.5, "fr": 0.75, "es": 1.0, "zh": 1.0},
        salt="mix1",
    ).orderBy("doc_id")


SQL_HASH_SAMPLE = """
SELECT doc_id, lang
FROM documents
WHERE ('0x' || substring(md5(doc_id::VARCHAR || 'mix1'), 1, 8))::BIGINT <
      CASE lang WHEN 'en' THEN 1073741824
                WHEN 'de' THEN 2147483648
                WHEN 'fr' THEN 3221225472
                WHEN 'es' THEN 4294967296
                WHEN 'zh' THEN 4294967296
                ELSE 0 END
ORDER BY doc_id
"""


_PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
_PII_PHONE = r"\b\d{3}[-.]\d{3,4}[-.]\d{4}\b"
_PII_IPV4 = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"


def q_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrubbing with audit counts. PII is seeded deterministically
    into the corpus (documents.text has none), then redacted; the output
    carries per-category counts and an md5 of the redacted text so the
    oracle checks the full replacement byte-for-byte."""
    _utc(spark)
    from .operators.text import redact_pii

    docs = _fanout(_table(spark, sf_dir, "documents").select("doc_id", "text"))
    seeded = docs.withColumn(
        "text",
        F.concat(
            F.col("text"),
            F.when(
                F.col("doc_id") % 3 == 0,
                F.concat(
                    F.lit(" contact user"),
                    F.col("doc_id").cast("string"),
                    F.lit("@example.com"),
                ),
            ).otherwise(F.lit("")),
            F.when(F.col("doc_id") % 5 == 0, F.lit(" call 555-123-4567")).otherwise(
                F.lit("")
            ),
            F.when(F.col("doc_id") % 7 == 0, F.lit(" from 10.0.0.1")).otherwise(
                F.lit("")
            ),
        ),
    )
    return (
        redact_pii(seeded)
        .select(
            "doc_id",
            F.col("n_email").cast("bigint").alias("n_email"),
            F.col("n_phone").cast("bigint").alias("n_phone"),
            F.col("n_ipv4").cast("bigint").alias("n_ipv4"),
            F.md5("redacted_text").alias("redacted_hash"),
        )
        .orderBy("doc_id")
    )


SQL_PII_REDACT = (
    """
WITH seeded AS (
  SELECT doc_id,
         text
         || CASE WHEN doc_id % 3 = 0
                 THEN ' contact user' || doc_id::VARCHAR || '@example.com'
                 ELSE '' END
         || CASE WHEN doc_id % 5 = 0 THEN ' call 555-123-4567' ELSE '' END
         || CASE WHEN doc_id % 7 = 0 THEN ' from 10.0.0.1' ELSE '' END AS text
  FROM documents
)
, s1 AS (
  SELECT doc_id, text,
         regexp_replace(text, '"""
    + _PII_EMAIL
    + """', '<EMAIL>', 'g') AS t1
  FROM seeded
), s2 AS (
  SELECT doc_id, text, t1,
         regexp_replace(t1, '"""
    + _PII_PHONE
    + """', '<PHONE>', 'g') AS t2
  FROM s1
)
SELECT doc_id,
       len(regexp_extract_all(text, '"""
    + _PII_EMAIL
    + """')) AS n_email,
       len(regexp_extract_all(t1, '"""
    + _PII_PHONE
    + """')) AS n_phone,
       len(regexp_extract_all(t2, '"""
    + _PII_IPV4
    + """')) AS n_ipv4,
       md5(regexp_replace(t2, '"""
    + _PII_IPV4
    + """', '<IP>', 'g')) AS redacted_hash
FROM s2
ORDER BY doc_id
"""
)


def q_dedup_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy-dedup endgame: MinHash-LSH candidate pairs → connected
    components (iterative min-label propagation) → one canonical doc per
    duplicate group. Deterministic output (component id = min doc id), so
    the oracle is the same pair SQL + a recursive CTE.

    ``star_over=2``: components consume pairs only for CONNECTIVITY, so
    hot buckets emit O(m) star edges instead of the C(m, 2) clique —
    bit-identical components (the oracle still replays the full clique,
    which is the proof), and duplicate-mass corpora (the web-scale norm)
    stop being quadratic (round-10 probe: 8k identical docs, 32.0M
    clique pairs / 100 s → linear under the star guard). Fires at both
    gate scales (max bench bucket 3 at sf0.01, 7 at sf0.1)."""
    _utc(spark)
    from .operators.dedup import connected_components
    from .operators.fuzzy_dedup import minhash_lsh_pairs

    docs = _fanout(_table(spark, sf_dir, "documents").select("doc_id", "text"))
    pairs = minhash_lsh_pairs(
        docs, num_hashes=MINHASH_SEEDS, num_bands=LSH_BANDS, star_over=2
    )
    return connected_components(pairs).orderBy("doc_id")


SQL_DEDUP_COMPONENTS = f"""
WITH RECURSIVE pairs AS (
{_minhash_sql()}
), edges AS (
  SELECT doc_a AS a, doc_b AS b FROM pairs
  UNION ALL
  SELECT doc_b AS a, doc_a AS b FROM pairs
), reach(id, r) AS (
  SELECT DISTINCT a, a FROM edges
  UNION
  SELECT e.b, reach.r FROM reach JOIN edges e ON e.a = reach.id
)
SELECT id AS doc_id,
       min(r) AS component_id,
       CAST(id = min(r) AS INTEGER) AS is_canonical
FROM reach
GROUP BY id
ORDER BY doc_id
"""


def q_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash 32-bit fingerprints over distinct tokens (md5-derived bits,
    majority vote, ties → 1)."""
    _utc(spark)
    from .operators.fuzzy_dedup import simhash

    docs = _fanout(_table(spark, sf_dir, "documents").select("doc_id", "text"))
    return simhash(docs)


SQL_SIMHASH = rf"""
WITH toks AS (
  -- the '' filter mirrors the operator: split of an empty/whitespace
  -- doc yields [''], which must not become an md5('') fingerprint
  SELECT doc_id, unnest(list_filter(list_distinct({_TOKS_SQL}), t -> t <> '')) AS tok
  FROM documents
), vals AS (
  SELECT doc_id, tok,
         CAST(sum((strpos('0123456789abcdef', substr(md5(tok), p + 1, 1)) - 1)
                  * CAST(power(16, 7 - p) AS BIGINT)) AS BIGINT) AS v
  FROM toks, (SELECT unnest(generate_series(0, 7)) AS p) ps
  GROUP BY doc_id, tok
), bits AS (
  SELECT doc_id, j,
         sum((v // CAST(power(2, j) AS BIGINT)) % 2) AS s,
         count(*) AS n
  FROM vals, (SELECT unnest(generate_series(0, 31)) AS j) js
  GROUP BY doc_id, j
)
SELECT doc_id,
       CAST(sum(CASE WHEN s * 2 >= n THEN CAST(power(2, j) AS BIGINT)
                     ELSE 0 END) AS BIGINT) AS simhash
FROM bits
GROUP BY doc_id
"""


def q_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact 3-gram Jaccard on a bounded pair set (doc_id < 40) — the
    verification stage of the LSH pipeline."""
    _utc(spark)
    from .operators.fuzzy_dedup import ngram_jaccard_pairs

    docs = (
        _table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < 40)
        .select("doc_id", "text")
    )
    return ngram_jaccard_pairs(docs, docs).filter(F.col("jaccard") > 0)


SQL_NGRAM_JACCARD = rf"""
WITH sh AS (
  SELECT doc_id,
         CASE WHEN len({_TOKS_SQL}) >= 3 THEN list_distinct(list_transform(
             generate_series(1, len({_TOKS_SQL}) - 2),
             i -> {_TOKS_SQL}[i] || ' ' || {_TOKS_SQL}[i+1] || ' ' || {_TOKS_SQL}[i+2]))
              ELSE [] END AS sh
  FROM documents WHERE doc_id < 40
)
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       CAST(round(CAST(len(list_intersect(a.sh, b.sh))
             / greatest(len(list_distinct(a.sh || b.sh)), 1) AS DECIMAL(18,12)), 6) AS DOUBLE) AS jaccard
FROM sh a JOIN sh b ON a.doc_id < b.doc_id
WHERE len(list_intersect(a.sh, b.sh)) > 0
"""


def q_lsh_jaccard_refine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The composed fuzzy-dedup scale pipeline: MinHash-LSH candidate
    pairs → exact n-gram-Jaccard refinement on candidates ONLY (never the
    quadratic all-pairs join) → confirmed near-dups at a Jaccard
    threshold. This is the documented production shape
    (fuzzy_dedup.ngram_jaccard_pairs docstring); here it is proven
    through the gate end to end."""
    _utc(spark)
    from .operators.fuzzy_dedup import minhash_lsh_pairs, shingles_of

    docs = _fanout(_table(spark, sf_dir, "documents").select("doc_id", "text"))
    # Pin the candidate pairs (r17 optimization): they feed BOTH the
    # refine join and the id semi-join below, and re-running the full
    # MinHash banding per reference would double the expensive leg.
    cand = reuse(
        minhash_lsh_pairs(docs, num_hashes=MINHASH_SEEDS, num_bands=LSH_BANDS)
    )
    # Guide §3.2 (reduce the big side before shuffling it): only docs
    # that appear in a candidate pair ever need exact shingles — at
    # sf0.1 that is 520 of 5000 docs (measured), and at 100 TB the
    # candidate set is the bounded LSH output while the corpus is not.
    # The semi-join shuffles raw (doc_id, text) once on doc_id instead
    # of shipping EVERY doc's shingle array into the a/b joins; the
    # shingle expression then runs on survivors only. Result-identical:
    # the refine join only ever reads shingles of candidate ids.
    cand_ids = (
        cand.select(F.explode(F.array("id_a", "id_b")).alias("doc_id"))
        .distinct()
    )
    # reuse() pin (r14, the r10 ledger's per-seat migration): the a/b
    # sides below reference this subtree twice and Catalyst would
    # re-run the shingling for each; the pin flavor follows the
    # deployment (localCheckpoint here, reliable/persist on a cluster)
    sh = reuse(
        docs.join(cand_ids, "doc_id", "semi")
        .select(F.col("doc_id"), shingles_of("text", 3).alias("sh"))
    )
    a = sh.select(F.col("doc_id").alias("id_a"), F.col("sh").alias("sh_a"))
    b = sh.select(F.col("doc_id").alias("id_b"), F.col("sh").alias("sh_b"))
    from .qcommon import round6x

    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size(F.array_union("sh_a", "sh_b"))
    jac = round6x(inter / F.greatest(union, F.lit(1)))
    return (
        cand.join(a, "id_a")
        .join(b, "id_b")
        .select("id_a", "id_b", jac.alias("jaccard"))
        .filter(F.col("jaccard") >= 0.2)
        .orderBy("id_a", "id_b")
    )


SQL_LSH_JACCARD_REFINE = f"""
WITH pairs AS (
{_minhash_sql()}
), shing AS (
  SELECT doc_id,
         CASE WHEN len({_TOKS_SQL}) >= 3 THEN list_distinct(list_transform(
             generate_series(1, len({_TOKS_SQL}) - 2),
             i -> {_TOKS_SQL}[i] || ' ' || {_TOKS_SQL}[i+1] || ' ' || {_TOKS_SQL}[i+2]))
              ELSE [] END AS sh
  FROM documents
)
SELECT p.doc_a AS id_a, p.doc_b AS id_b,
       CAST(round(CAST(len(list_intersect(a.sh, b.sh))
             / greatest(len(list_distinct(a.sh || b.sh)), 1) AS DECIMAL(18,12)), 6) AS DOUBLE) AS jaccard
FROM pairs p
JOIN shing a ON a.doc_id = p.doc_a
JOIN shing b ON b.doc_id = p.doc_b
WHERE CAST(round(CAST(len(list_intersect(a.sh, b.sh))
            / greatest(len(list_distinct(a.sh || b.sh)), 1) AS DECIMAL(18,12)), 6) AS DOUBLE) >= 0.2
ORDER BY 1, 2
"""


def q_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-10 for query vectors (vec_id < 10): broadcast
    queries × corpus scan, JVM fold dot products, per-query row_number."""
    _utc(spark)
    from .operators.similarity import cosine_topk

    emb = _fanout(_table(spark, sf_dir, "embeddings"))
    queries = emb.filter(F.col("vec_id") < 10)
    return cosine_topk(emb, queries, k=10)


SQL_COSINE_TOPK = """
WITH e AS (
  -- non-finite vectors excluded (r13 NaN-mirror axis): no direction,
  -- NaN cosine would top the desc ranking — mirrors finite_vectors
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
  WHERE len(list_filter(embedding, x -> x IS NULL OR isnan(x) OR isinf(x))) = 0
), q AS (
  SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 10
), scored AS (
  -- zero-norm convention mirrors the operator: a zero vector scores
  -- 0.0 against everything (never NULL/NaN)
  SELECT q.query_id, c.vec_id AS neighbor_id,
         round(CASE WHEN list_dot_product(q.qv, q.qv)
                         * list_dot_product(c.v, c.v) = 0 THEN 0.0
                    ELSE list_cosine_similarity(q.qv, c.v) END,
               6) AS cosine_sim
  FROM e c, q
  WHERE c.vec_id != q.query_id
), ranked AS (
  SELECT *, CAST(row_number() OVER (
      PARTITION BY query_id ORDER BY cosine_sim DESC, neighbor_id ASC
    ) AS INTEGER) AS rank
  FROM scored
)
SELECT query_id, neighbor_id, cosine_sim, rank FROM ranked WHERE rank <= 10
"""


def q_embedding_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (cosine ≥ 0.4, id_a < id_b)."""
    _utc(spark)
    from .operators.similarity import embedding_near_dup_pairs

    emb = _fanout(_table(spark, sf_dir, "embeddings"))
    return embedding_near_dup_pairs(emb, threshold=0.4, small_corpus=True)


SQL_EMBEDDING_NEAR_DUP = """
WITH e AS (
  -- non-finite vectors excluded (r13 NaN-mirror axis): mirrors
  -- finite_vectors in embedding_near_dup_pairs (GEMM face)
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
  WHERE len(list_filter(embedding, x -> x IS NULL OR isnan(x) OR isinf(x))) = 0
)
SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       round(list_cosine_similarity(a.v, b.v), 6) AS cosine_sim
FROM e a JOIN e b ON a.vec_id < b.vec_id
WHERE round(list_cosine_similarity(a.v, b.v), 6) >= 0.4
"""


def q_embedding_near_dup_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-dup at scale: banded hyperplane-LSH candidates +
    exact cosine re-rank on candidates only — no driver materialization
    (the 100 TB path next to the small-corpus GEMM of
    q_embedding_near_dup). Deterministic planes → full SQL oracle."""
    _utc(spark)
    from .operators.similarity import embedding_near_dup_pairs_lsh

    # _fanout removed (r18, guide §2.4): the widening repartition cost
    # more than this query's downstream vector work at sf0.1 (A/B in
    # OPTIMIZATION_r18.md); on a wide cluster scan the guard never fired.
    emb = _table(spark, sf_dir, "embeddings")
    # 28 planes / 4 bands = 7 sign bits -> 128 buckets per band: the
    # candidate set scales as n^2/128 per band (bounded re-rank; at larger
    # corpora raise planes-per-band further to keep buckets small), while
    # recall for high-similarity pairs stays high; the exact dense
    # operator is the ground truth
    return embedding_near_dup_pairs_lsh(
        emb, threshold=0.4, num_planes=28, num_bands=4, dim=64
    )


def _near_dup_lsh_oracle_sql(
    threshold: float = 0.4, num_planes: int = 28, num_bands: int = 4, dim: int = 64
) -> str:
    """DuckDB oracle for q_embedding_near_dup_lsh: identical plane
    literals, per-band sign-bit keys, UNION ALL banding, distinct
    candidate pairs via band equi-join, exact cosine re-rank."""
    from .operators.similarity import _hyperplane

    planes = [_hyperplane(p, dim) for p in range(num_planes)]
    rows_per_band = num_planes // num_bands

    def lit(vals: list[float]) -> str:
        return "[" + ",".join(repr(v) for v in vals) + "]"

    band_keys = []
    for b in range(num_bands):
        bits = "||".join(
            f"(CASE WHEN list_dot_product(v, {lit(planes[b * rows_per_band + r])})"
            " >= 0 THEN '1' ELSE '0' END)"
            for r in range(rows_per_band)
        )
        band_keys.append(f"{bits} AS k{b}")
    union = "\n  UNION ALL ".join(
        f"SELECT vec_id, {b} AS band, k{b} AS key FROM s" for b in range(num_bands)
    )
    return f"""
WITH e AS (
  -- non-finite vectors excluded (r13 NaN-mirror axis): no direction,
  -- one-bucket-clique hazard, NaN cosine — mirrors the operator
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
  WHERE len(list_filter(embedding, x -> x IS NULL OR isnan(x) OR isinf(x))) = 0
), s AS (
  SELECT vec_id, v, {", ".join(band_keys)} FROM e
), bands AS (
  {union}
), cand AS (
  SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
  FROM bands a JOIN bands b ON a.band = b.band AND a.key = b.key
  WHERE a.vec_id < b.vec_id
)
SELECT c.id_a, c.id_b,
       round(list_cosine_similarity(ea.v, eb.v), 6) AS cosine_sim
FROM cand c
JOIN e ea ON ea.vec_id = c.id_a
JOIN e eb ON eb.vec_id = c.id_b
WHERE round(list_cosine_similarity(ea.v, eb.v), 6) >= {threshold}
"""


SQL_EMBEDDING_NEAR_DUP_LSH = _near_dup_lsh_oracle_sql()


def q_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate cosine top-k via random-hyperplane LSH buckets — the
    scale path. Fully oracle-checked: the md5-derived planes are
    deterministic, so the same signature + bucket join + re-rank is
    expressed in DuckDB SQL (plane vectors inlined as literals)."""
    _utc(spark)
    from .operators.similarity import lsh_bucket_topk

    # _fanout removed (r18, guide §2.4): the widening repartition cost
    # more than this query's downstream vector work at sf0.1 (A/B in
    # OPTIMIZATION_r18.md); on a wide cluster scan the guard never fired.
    emb = _table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    return lsh_bucket_topk(emb, queries, k=10, num_planes=6)


def _ann_lsh_oracle_sql(num_planes: int = 6, dim: int = 64) -> str:
    """Generate the DuckDB oracle for q_ann_lsh: the identical md5-derived
    hyperplanes as exact double literals (u/32768-1 round-trips through
    repr), sign-bit signature via list_dot_product, bucket equi-join,
    exact cosine re-rank. Verified sign-safe: min |dot| on the test data
    is ~2.5e-4, ten orders of magnitude above ulp divergence."""
    from .operators.similarity import _hyperplane

    planes = [_hyperplane(p, dim) for p in range(num_planes)]

    def lit(vals: list[float]) -> str:
        return "[" + ",".join(repr(v) for v in vals) + "]"

    sig = "||".join(
        f"(CASE WHEN list_dot_product(v, {lit(pl)}) >= 0 THEN '1' ELSE '0' END)"
        for pl in planes
    )
    return f"""
WITH e AS (
  -- non-finite vectors excluded (r13 NaN-mirror axis): no direction,
  -- all-ones NaN signature cliques one bucket — mirrors finite_vectors
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
  WHERE len(list_filter(embedding, x -> x IS NULL OR isnan(x) OR isinf(x))) = 0
), s AS (
  SELECT vec_id, v, {sig} AS bucket FROM e
), q AS (
  SELECT vec_id AS query_id, v AS qv, bucket FROM s WHERE vec_id < 10
), scored AS (
  SELECT q.query_id, c.vec_id AS neighbor_id,
         round(CASE WHEN list_dot_product(q.qv, q.qv)
                         * list_dot_product(c.v, c.v) = 0 THEN 0.0
                    ELSE list_cosine_similarity(q.qv, c.v) END,
               6) AS cosine_sim
  FROM s c JOIN q USING (bucket)
  WHERE c.vec_id != q.query_id
), ranked AS (
  SELECT query_id, neighbor_id, cosine_sim, CAST(row_number() OVER (
      PARTITION BY query_id ORDER BY cosine_sim DESC, neighbor_id ASC
    ) AS INTEGER) AS rank
  FROM scored
)
SELECT query_id, neighbor_id, cosine_sim, rank FROM ranked WHERE rank <= 10
"""


SQL_ANN_LSH = _ann_lsh_oracle_sql()


def q_ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cosine top-k via IVF cells (sample-trained spherical k-means,
    map-only GEMM assignment, cell probing) — the second ANN scale path.
    Run with nprobe == n_centroids so every cell is probed: candidates are
    the whole corpus regardless of centroid bit-patterns, the result is
    exactly brute-force top-k, and the full IVF machinery (training, GEMM
    tagging, cell join, re-rank) is oracle-checked against brute-force
    SQL. The nprobe < n_centroids recall trade-off is property-tested in
    tests/test_llm_ops.py."""
    _utc(spark)
    from .operators.similarity import ivf_topk

    # _fanout removed (r18, guide §2.4): the widening repartition cost
    # more than this query's downstream vector work at sf0.1 (A/B in
    # OPTIMIZATION_r18.md); on a wide cluster scan the guard never fired.
    emb = _table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    return ivf_topk(emb, queries, k=10, n_centroids=16, nprobe=16)


SQL_ANN_IVF = SQL_COSINE_TOPK


def q_chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Context-window chunking (64-token windows, 16 overlap): one row per
    chunk with a content hash — the LLM chunker as a scan-speed map.
    Output hashes, not chunk text, to keep the comparison payload small."""
    _utc(spark)
    from .operators.text import chunk_text

    docs = _fanout(_table(spark, sf_dir, "documents").select("doc_id", "text"))
    chunked = chunk_text(docs, chunk_tokens=64, overlap=16)
    return chunked.select(
        "doc_id",
        "chunk_idx",
        F.md5("chunk_text").alias("chunk_hash"),
        F.size(F.split("chunk_text", r"\s+")).cast("bigint").alias("n_chunk_tokens"),
    ).orderBy("doc_id", "chunk_idx")


SQL_CHUNK_DOCUMENTS = rf"""
WITH toks AS (
  SELECT doc_id, {_TOKS_SQL} AS t FROM documents
), idx AS (
  SELECT doc_id, t,
         unnest(generate_series(0,
             greatest(CAST(ceil((len(t) - 64) / 48.0) AS BIGINT), 0))) AS i
  FROM toks
)
SELECT doc_id,
       CAST(i AS INTEGER) AS chunk_idx,
       md5(array_to_string(t[i * 48 + 1 : i * 48 + 64], ' ')) AS chunk_hash,
       CAST(len(regexp_split_to_array(
           array_to_string(t[i * 48 + 1 : i * 48 + 64], ' '), '\s+')) AS BIGINT)
           AS n_chunk_tokens
FROM idx
ORDER BY doc_id, chunk_idx
"""


def q_corpus_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The training-data pipeline end-to-end as ONE lazy plan: quality
    scoring → threshold + length filters → exact dedup (min-id survivor
    per fingerprint) → per-source corpus stats.

    Composition stays a single Catalyst plan: one scan feeds scoring and
    fingerprinting (both pure expressions); the only shuffles are the
    dedup groupBy and the final stats groupBy. The near-dup stage
    (minhash_lsh) plugs in between dedup and stats in production — kept
    out here so the oracle stays exact."""
    _utc(spark)
    from .operators.text import fingerprint, quality_score

    docs = _fanout(
        _table(spark, sf_dir, "documents").select("doc_id", "text", "source")
    )
    scored = fingerprint(quality_score(docs))
    # reuse() pin (r14, the r10 ledger's per-seat migration): kept
    # feeds BOTH the survivor groupBy and the join back, and Catalyst
    # would re-run the scoring+fingerprint chain for each
    kept = reuse(
        scored.filter((F.col("quality_score") >= 0.5) & (F.col("n_tokens") >= 5))
    )
    survivors = kept.groupBy("doc_fingerprint").agg(
        F.min("doc_id").alias("doc_id")
    )
    curated = kept.join(survivors, ["doc_fingerprint", "doc_id"])
    from .qcommon import round6x

    # avgs from exact accumulations: integer sum for tokens, decimal(18,6)
    # sum for the (6-dp) scores — a double avg() is summation-order-
    # sensitive and diverges from the oracle at the last ulp at sf>=0.1
    return (
        curated.groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            round6x(
                F.sum("n_tokens").cast("double") / F.count("*")
            ).alias("avg_tokens"),
            round6x(
                F.sum(F.col("quality_score").cast("decimal(18,6)")).cast("double")
                / F.count("*")
            ).alias("avg_quality"),
        )
        .orderBy("source")
    )


SQL_CORPUS_CURATION = rf"""
WITH scored AS (
  SELECT doc_id, source,
         len({_TOKS_SQL}) AS n_tok,
         CAST(round(CAST((len(list_filter({_TOKS_SQL}, t -> list_contains(
                   ['the','a','an','of','and','to','in','is'], t)))
                / len({_TOKS_SQL})) * 0.4
               + least(((length(text) - (len({_TOKS_SQL}) - 1))
                        / len({_TOKS_SQL})) / 10.0, 1.0) * 0.3
               + (1.0 - len(regexp_extract_all(text, '[^A-Za-z0-9\s]'))
                        / greatest(length(text), 1)) * 0.3 AS DECIMAL(18,12)), 6) AS DOUBLE) AS q,
         md5(array_to_string({_TOKS_SQL}, ' ')) AS fp
  FROM documents
), kept AS (
  SELECT * FROM scored WHERE q >= 0.5 AND n_tok >= 5
), surv AS (
  SELECT fp, min(doc_id) AS doc_id FROM kept GROUP BY 1
)
SELECT source,
       count(*) AS n_docs,
       CAST(round(CAST(CAST(sum(n_tok) AS DOUBLE) / count(*) AS DECIMAL(18,12)), 6) AS DOUBLE) AS avg_tokens,
       CAST(round(CAST(CAST(sum(CAST(q AS DECIMAL(18,6))) AS DOUBLE) / count(*) AS DECIMAL(18,12)), 6) AS DOUBLE) AS avg_quality
FROM kept JOIN surv USING (fp, doc_id)
GROUP BY 1
ORDER BY 1
"""


def q_label_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed vector mean per label (class centroids): posexplode the
    embedding array → one hash agg on (label, component). Long-form output
    (label, pos, avg_comp) — engine-neutral, no array-representation
    ambiguity in the value hash. The shuffle carries (label × dim) partial
    sums, not vectors × rows — scan-bound at any corpus size."""
    _utc(spark)
    # _fanout removed (r18, guide §2.4): the widening repartition cost
    # more than this query's downstream vector work at sf0.1 (A/B in
    # OPTIMIZATION_r18.md); on a wide cluster scan the guard never fired.
    emb = _table(spark, sf_dir, "embeddings")
    exploded = emb.select(
        "label", F.posexplode("embedding").alias("pos", "comp")
    )
    # decimal accumulation, not F.avg (r13 bare-avg class close):
    # components are arbitrary floats, so the exact-representability
    # route (money 2dp) does not apply — instead BOTH engines quantize
    # the identical double to decimal(28,12) (~1e-12 absolute, the
    # winsorize precedent) and sum exactly, making the partial-merge
    # order irrelevant; one double cast + one IEEE division follow.
    from .qcommon import nonfinite_flag

    return (
        exploded.groupBy("label", (F.col("pos") + 1).cast("long").alias("pos"))
        .agg(
            F.count(F.lit(1)).alias("__n"),
            F.sum(
                F.col("comp").cast("double").cast("decimal(28,12)")
            ).alias("__s"),
            # NaN-poisoning (r13 NaN-mirror axis): a NaN component
            # must surface as a NaN centroid coordinate, exactly as
            # the native float mean would — the decimal quantization
            # would silently drop it
            F.max(nonfinite_flag(F.col("comp").cast("double"))).alias("__nan"),
        )
        .select(
            "label",
            "pos",
            F.when(F.col("__nan"), F.lit(float("nan")))
            .otherwise(
                round6x(F.col("__s").cast("double") / F.col("__n"))
            )
            .alias("avg_comp"),
        )
        .orderBy("label", "pos")
    )


SQL_LABEL_CENTROIDS = """
SELECT label, CAST(pos AS BIGINT) AS pos,
       CASE WHEN bool_or(isnan(comp) OR isinf(comp)) THEN 'NaN'::DOUBLE
            ELSE
       CAST(round(CAST(CAST(sum(CAST(CASE WHEN isnan(comp) OR isinf(comp) THEN NULL ELSE CAST(comp AS DOUBLE) END
                                  AS DECIMAL(28,12))) AS DOUBLE)
            / count(*) AS DECIMAL(18,12)), 6) AS DOUBLE)
       END AS avg_comp
FROM (
  SELECT label, unnest(embedding) AS comp,
         generate_subscripts(embedding, 1) AS pos
  FROM embeddings
)
GROUP BY 1, 2
ORDER BY 1, 2
"""


def q_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal plumbing: text→binary payload → Arrow-batched
    mapInPandas decode-stub → (byte_len, content_hash). The oracle checks
    the binary path end-to-end (md5 over utf-8 bytes)."""
    _utc(spark)
    from .operators.multimodal import extract_features

    docs = _fanout(_table(spark, sf_dir, "documents").select("doc_id", "text"))
    media = docs.select(
        F.col("doc_id").alias("media_id"),
        F.lit("image").alias("media_type"),
        F.encode("text", "utf-8").alias("payload"),
        F.lit(None).cast("int").alias("width"),
        F.lit(None).cast("int").alias("height"),
        F.lit(None).cast("long").alias("duration_ms"),
    )
    return extract_features(media, decode="fake").select(
        F.col("media_id").alias("doc_id"), "byte_len", "content_hash"
    )


SQL_MULTIMODAL_FEATURES = """
SELECT doc_id,
       CAST(octet_length(encode(text)) AS BIGINT) AS byte_len,
       md5(text) AS content_hash
FROM documents
"""


# ---------------------------------------------------------------------------
# M4 — ingest + full-pipeline composition (rows-only: the synthetic source
# is generated, not in the oracle's parquet views)
# ---------------------------------------------------------------------------


def q_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-salted join (operators/scale.py): the hot-key mitigation whose
    output is bit-identical to the plain join — the salt is internal, so
    the oracle is the UNSALTED SQL join, proving through the gate that
    salting is semantics-free. Deterministic xxhash64 salt keeps retried
    tasks identical; right side replicated salt_factor times."""
    _utc(spark)
    from .operators.scale import salted_join

    li = _fanout(
        _table(spark, sf_dir, "lineitem").select(
            "l_partkey", "l_orderkey", "l_extendedprice"
        )
    )
    part = _table(spark, sf_dir, "part").select(
        F.col("p_partkey").alias("l_partkey"), "p_brand"
    )
    joined = salted_join(li, part, on=["l_partkey"], salt_factor=8)
    return (
        joined.groupBy("p_brand")
        .agg(
            F.count("*").alias("n_items"),
            F.sum(F.col("l_extendedprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("sum_price"),
        )
        .orderBy("p_brand")
    )


SQL_SALTED_JOIN = """
SELECT p_brand,
       count(*) AS n_items,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
FROM lineitem
JOIN part ON l_partkey = p_partkey
GROUP BY 1
ORDER BY 1
"""


def q_usgs_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end earthquake pipeline: paged-source ingest (synthetic mode,
    offline) → cleaning chain → stg (surrogate keys + window dedup) → fact
    (severity/year/decade) → yearly rollup. FULL oracle: the synthetic
    generator is pure md5 arithmetic, so DuckDB replays the whole pipeline
    — generation included — in SQL. The terminal aggregate uses
    decimal-exact sums (instead of the model's double avgs) so the value
    hash is engine-neutral; the avg form lives in
    plans.models.yearly_earthquake_stats (registry-tested)."""
    _utc(spark)
    from .operators.cleaning import clean_events
    from .plans.models import fact_earthquake_data, stg_earthquake
    from .sources.usgs import UsgsDataSource

    spark.dataSource.register(UsgsDataSource)
    raw = (
        spark.read.format("usgs_fdsn")
        .option("mode", "synthetic")
        .option("rows_per_day", "5")
        .option("start_date", "2024-01-01")
        .option("end_date", "2024-03-01")
        .load()
    )
    cleaned = (
        clean_events(raw)
        .withColumn("country", F.lit(None).cast("string"))
        .withColumn("region", F.lit(None).cast("string"))
    )
    fact = fact_earthquake_data(stg_earthquake(cleaned))
    return (
        fact.filter(F.col("magnitude") > 3)
        .groupBy(F.col("event_year").alias("year"))
        .agg(
            F.count("*").alias("earthquake_count"),
            F.sum(F.col("magnitude").cast("decimal(12,2)"))
            .cast("double")
            .alias("sum_magnitude"),
            F.sum(F.col("depth").cast("decimal(14,1)"))
            .cast("double")
            .alias("sum_depth"),
        )
        .orderBy("year")
    )


# DuckDB replay of the synthetic source (sources/usgs.py SyntheticFetcher):
# md5(day:i) digest bytes -> fields, exactly as the Python generator. The
# cleaning-range filters pass every generated row by construction and the
# (place, datetime) dedup keys are verified collision-free (300 distinct of
# 300), so the surviving pipeline semantics are the mag>3 yearly rollup.
# round() parity is safe: every generated value is a ratio with denominator
# 255 whose distance from any representable decimal-tie is >= ~1e-5 — ten
# orders above double error, so both engines round identically.
SQL_USGS_PIPELINE = """
WITH days AS (
  SELECT unnest(generate_series(DATE '2024-01-01', DATE '2024-02-29',
                                INTERVAL 1 DAY))::DATE AS d
), gen AS (
  SELECT d, unnest(generate_series(0, 4)) AS i FROM days
), h AS (
  SELECT md5(strftime(d, '%Y-%m-%d') || ':' || i::VARCHAR) AS hx, d FROM gen
), b AS (
  SELECT d,
         ('0x' || substr(hx, 1, 2))::INT AS h0,
         ('0x' || substr(hx, 7, 2))::INT AS h3,
         ('0x' || substr(hx, 17, 2))::INT AS h8
  FROM h
), raw AS (
  SELECT (epoch(CAST(d AS TIMESTAMP)) * 1000)::BIGINT
           + (h0 % 24) * 3600000 AS time_ms,
         round(h3 / 255.0 * 9 - 1, 2) AS magnitude,
         round(h8 / 255.0 * 700, 1) AS depth
  FROM b
)
SELECT CAST(year(make_timestamp(time_ms * 1000)) AS INTEGER) AS year,
       count(*) AS earthquake_count,
       CAST(sum(CAST(magnitude AS DECIMAL(12,2))) AS DOUBLE) AS sum_magnitude,
       CAST(sum(CAST(depth AS DECIMAL(14,1))) AS DOUBLE) AS sum_depth
FROM raw
WHERE magnitude > 3
GROUP BY 1
ORDER BY 1
"""


QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "clean_events": q_clean_events,
    "yearly_stats": q_yearly_stats,
    "severity_buckets": q_severity_buckets,
    "top_k_orders": q_top_k_orders,
    "region_rollup": q_region_rollup,
    "max_per_group": q_max_per_group,
    "conditional_ratio": q_conditional_ratio,
    "in_list_case_sort": q_in_list_case_sort,
    "scalar_derivations": q_scalar_derivations,
    "merge_anti_join": q_merge_anti_join,
    "high_water_mark": q_high_water_mark,
    "union_dedup": q_union_dedup,
    "top2_per_user": q_top2_per_user,
    "stats_per_decade": q_stats_per_decade,
    "pricing_summary": q_pricing_summary,
    "fact_fact_join": q_fact_fact_join,
    "semi_anti_join": q_semi_anti_join,
    "spatial_join": q_spatial_join,
    "regex_token_match": q_regex_token_match,
    "enrich_coalesce": q_enrich_coalesce,
    "enrich_events": q_enrich_events,
    "token_stats": q_token_stats,
    "text_quality": q_text_quality,
    "lang_id": q_lang_id,
    "exact_dedup": q_exact_dedup,
    "minhash_lsh": q_minhash_lsh,
    "dedup_components": q_dedup_components,
    "upsert_merge": q_upsert_merge,
    "url_domains": q_url_domains,
    "doc_repetition": q_doc_repetition,
    "value_histogram": q_value_histogram,
    "eval_overlap": q_eval_overlap,
    "tfidf_top_terms": q_tfidf_top_terms,
    "hash_sample": q_hash_sample,
    "pii_redact": q_pii_redact,
    "simhash": q_simhash,
    "ngram_jaccard": q_ngram_jaccard,
    "lsh_jaccard_refine": q_lsh_jaccard_refine,
    "cosine_topk": q_cosine_topk,
    "embedding_near_dup": q_embedding_near_dup,
    "embedding_near_dup_lsh": q_embedding_near_dup_lsh,
    "ann_lsh": q_ann_lsh,
    "ann_ivf": q_ann_ivf,
    "label_centroids": q_label_centroids,
    "corpus_curation": q_corpus_curation,
    "chunk_documents": q_chunk_documents,
    "multimodal_features": q_multimodal_features,
    "salted_join": q_salted_join,
    "usgs_pipeline": q_usgs_pipeline,
}

ORACLE: dict[str, str] = {
    "clean_events": SQL_CLEAN_EVENTS,
    "yearly_stats": SQL_YEARLY_STATS,
    "severity_buckets": SQL_SEVERITY_BUCKETS,
    "top_k_orders": SQL_TOP_K_ORDERS,
    "region_rollup": SQL_REGION_ROLLUP,
    "max_per_group": SQL_MAX_PER_GROUP,
    "conditional_ratio": SQL_CONDITIONAL_RATIO,
    "in_list_case_sort": SQL_IN_LIST_CASE_SORT,
    "scalar_derivations": SQL_SCALAR_DERIVATIONS,
    "merge_anti_join": SQL_MERGE_ANTI_JOIN,
    "high_water_mark": SQL_HIGH_WATER_MARK,
    "union_dedup": SQL_UNION_DEDUP,
    "top2_per_user": SQL_TOP2_PER_USER,
    "stats_per_decade": SQL_STATS_PER_DECADE,
    "pricing_summary": SQL_PRICING_SUMMARY,
    "fact_fact_join": SQL_FACT_FACT_JOIN,
    "semi_anti_join": SQL_SEMI_ANTI_JOIN,
    "spatial_join": SQL_SPATIAL_JOIN,
    "regex_token_match": SQL_REGEX_TOKEN_MATCH,
    "enrich_coalesce": SQL_ENRICH_COALESCE,
    "enrich_events": SQL_ENRICH_EVENTS,
    "token_stats": SQL_TOKEN_STATS,
    "text_quality": SQL_TEXT_QUALITY,
    "lang_id": SQL_LANG_ID,
    "exact_dedup": SQL_EXACT_DEDUP,
    "minhash_lsh": SQL_MINHASH_LSH,
    "dedup_components": SQL_DEDUP_COMPONENTS,
    "upsert_merge": SQL_UPSERT_MERGE,
    "url_domains": SQL_URL_DOMAINS,
    "doc_repetition": SQL_DOC_REPETITION,
    "value_histogram": SQL_VALUE_HISTOGRAM,
    "eval_overlap": SQL_EVAL_OVERLAP,
    "tfidf_top_terms": SQL_TFIDF_TOP_TERMS,
    "hash_sample": SQL_HASH_SAMPLE,
    "pii_redact": SQL_PII_REDACT,
    "simhash": SQL_SIMHASH,
    "ngram_jaccard": SQL_NGRAM_JACCARD,
    "lsh_jaccard_refine": SQL_LSH_JACCARD_REFINE,
    "cosine_topk": SQL_COSINE_TOPK,
    "embedding_near_dup": SQL_EMBEDDING_NEAR_DUP,
    "embedding_near_dup_lsh": SQL_EMBEDDING_NEAR_DUP_LSH,
    "ann_lsh": SQL_ANN_LSH,
    "ann_ivf": SQL_ANN_IVF,
    "label_centroids": SQL_LABEL_CENTROIDS,
    "corpus_curation": SQL_CORPUS_CURATION,
    "chunk_documents": SQL_CHUNK_DOCUMENTS,
    "multimodal_features": SQL_MULTIMODAL_FEATURES,
    "salted_join": SQL_SALTED_JOIN,
    "usgs_pipeline": SQL_USGS_PIPELINE,
}


from .driver_queries_ext import ORACLE_EXT, QUERIES_EXT  # noqa: E402
from .driver_queries_r6 import ORACLE_R6, QUERIES_R6  # noqa: E402
from .driver_queries_stream import ORACLE_STREAM, QUERIES_STREAM  # noqa: E402

QUERIES.update(QUERIES_EXT)
ORACLE.update(ORACLE_EXT)
QUERIES.update(QUERIES_STREAM)
ORACLE.update(ORACLE_STREAM)
QUERIES.update(QUERIES_R6)
ORACLE.update(ORACLE_R6)

from .driver_queries_r7 import ORACLE_R7, QUERIES_R7, lsh_recall_sql  # noqa: E402

QUERIES.update(QUERIES_R7)
ORACLE.update(ORACLE_R7)
ORACLE["lsh_recall_audit"] = lsh_recall_sql(_minhash_sql())

from .driver_queries_r7 import cluster_purity_sql  # noqa: E402

ORACLE["cluster_purity"] = cluster_purity_sql(ORACLE_EXT["kmeans_clusters"])

from .driver_queries_r6 import dedup_keep_list_sql  # noqa: E402

ORACLE["dedup_keep_list"] = dedup_keep_list_sql(_minhash_sql())

# Gate-window rotation: the driver verifies exactly the FIRST 50 entries
# of queries() each round. Rotation policy (formalized round 6, VERDICT
# r5 items 1-2):
#   1. every query that has NEVER had a driver CORRECTNESS row leads;
#   2. then every query whose code, oracle, or CALLED OPERATOR changed
#      this round;
#   3. shared-helper-churn rule: any round that touches qcommon.py,
#      functions/scalar.py, or tools/check.py must also seat one
#      sentinel query per table type — events / lineitem / documents /
#      embeddings — even if no query changed;
#   4. remaining slots go to the queries with the OLDEST banked row.
#
# ROUND-18 HEAD (optimization round 2): proof debt enters at 0/148;
# last-green histogram entering: r14×8, r15×45, r16×45, r17×50. Per
# the committed r18 sketch (SURVEY) and the rotation policy:
# (1) round-18 churn — every query whose code or CALLED OPERATOR
#     changed this round: the fuzzy_dedup shared-shingle params
#     (tokens_df/tokens_col — seats every minhash_lsh_pairs /
#     prefix_filter_join consumer), the _cum_value_counts one-window
#     rewrite + percentile_moments_by_counts fusion (seats every
#     by-counts consumer), the nine measured fanout removals, the
#     bloom_prune fanout addition, the embeddings-family fanout
#     removals — PLUS the two driver-side regression adjudication
#     seats VERDICT r17 item 1 requires (dedup_keep_list,
#     cluster_purity; quiet A/Bs in OPTIMIZATION_r18.md).
# (2) the r14 bank remainder (7 rows after tfidf_top_terms seats as
#     churn — retiring the r14 generation): token_bucket,
#     top2_per_user, top_k_orders, trend_fit, url_domains,
#     usgs_pipeline, value_histogram.
# (3) the r15 bank alphabetically until the window fills (17 rows,
#     array_suite..enrich_coalesce; the rest of the r15 bank rolls
#     to r19). qcommon.py, functions/scalar.py, tools/check.py are
#     untouched this round so rule-3 sentinels are not forced; events
#     (json_extract, usgs_pipeline), lineitem (percentile_stats,
#     trimmed_mean), documents (boilerplate_strip, prefix_filter_join),
#     embeddings (cluster_purity) are covered regardless.
_GATE_FIRST = [
    # (1) round-18 churn (26 — the last five are the embeddings-family
    # fanout removals landed after the first rotation cut):
    "lsh_recall_audit", "prefix_filter_join", "minhash_lsh",
    "dedup_components", "lsh_jaccard_refine", "dedup_keep_list",
    "percentile_stats", "quality_deciles", "robust_scaling",
    "trimmed_mean", "mad_outliers", "json_extract", "boilerplate_strip",
    "pmi_collocations", "bigram_lm_score", "tfidf_top_terms",
    "url_canonical", "regex_token_match", "doc_repetition",
    "bloom_prune", "cluster_purity",
    "kmeans_clusters", "label_centroids", "ann_lsh", "ann_ivf",
    "embedding_near_dup_lsh",
    # (2) the r14 bank, retired in full (7 rows):
    "token_bucket", "top2_per_user", "top_k_orders", "trend_fit",
    "url_domains", "usgs_pipeline", "value_histogram",
    # (3) the r15 bank alphabetically through enrich_coalesce (17 rows;
    # enrich_events..expectations_report roll to r19 with the rest):
    "array_suite", "bm25_topk", "boolean_search", "char_diversity",
    "chunk_documents", "clean_events", "cms_frequency", "column_profile",
    "compaction_plan", "conditional_ratio", "corr_stats",
    "correlated_subquery", "cube_agg", "datetime_suite", "distinct_agg",
    "domain_mixture", "enrich_coalesce",
]

assert len(_GATE_FIRST) == 50, len(_GATE_FIRST)


def _rotate(d: dict) -> dict:
    head = {k: d[k] for k in _GATE_FIRST if k in d}
    head.update((k, v) for k, v in d.items() if k not in head)
    return head


QUERIES = _rotate(QUERIES)
ORACLE = _rotate(ORACLE)
