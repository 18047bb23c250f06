"""Round-7 driver-facing queries: ingest-edge rate limiting, inverted
index construction, zone-map data-skipping audit, and weight-
proportional sampling.

Same contract as the earlier driver_queries modules: pin UTC, read via
qcommon._table, alias every output column identically to the DuckDB
oracle, end in a total ORDER BY. Reference parity notes live on the
operator docstrings (operators/analytics.py::rate_limit_flags,
operators/indexing.py, operators/layout.py::zone_maps/skip_audit,
operators/sampling.py::weighted_bernoulli).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .qcommon import _table, _utc, round6x

QUERIES_R7: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLE_R7: dict[str, str] = {}


def q_rate_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user rate limiting (operators/analytics.py::rate_limit_flags):
    trailing-24h sliding count + first-4-per-calendar-day fixed-window
    admission, both from one hash shuffle on user_id. The sliding flag
    is the stateless discipline (count includes throttled events); the
    sequential admission-feedback face lives in streaming/ratelimit.py.
    """
    _utc(spark)
    from .operators.analytics import rate_limit_flags

    ev = _table(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    return rate_limit_flags(
        ev, window_s=86400, max_n=4
    ).orderBy("user_id", "ts_s", "event_id")


SQL_RATE_LIMIT = """
WITH e AS (
  SELECT event_id, user_id, CAST(floor(epoch(ts)) AS BIGINT) AS ts_s
  FROM events
)
SELECT event_id, user_id, ts_s,
       COUNT(*) OVER w AS n_in_window,
       (COUNT(*) OVER w) <= 4 AS admitted_sliding,
       (row_number() OVER (
          PARTITION BY user_id, CAST(floor(ts_s / 86400) AS BIGINT)
          ORDER BY ts_s, event_id) <= 4) AS admitted_fixed
FROM e
WINDOW w AS (PARTITION BY user_id ORDER BY ts_s
             RANGE BETWEEN 86399 PRECEDING AND CURRENT ROW)
ORDER BY user_id, ts_s, event_id
"""


def q_inverted_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Positional inverted index over documents
    (operators/indexing.py::inverted_index): term -> df, tf, and the
    full posting list "doc:p1,p2;..." in lexicographic posting order —
    a deterministic, engine-neutral index image. Two keyed aggregates
    (term,doc) then (term); the explode is the only data-sized stage.
    """
    _utc(spark)
    from .operators.indexing import inverted_index

    docs = _table(spark, sf_dir, "documents").select("doc_id", "text")
    return inverted_index(docs, min_df=2).orderBy("term")


SQL_INVERTED_INDEX = r"""
WITH tok0 AS (
  SELECT doc_id AS doc, unnest(toks) AS term,
         generate_subscripts(toks, 1) AS pos
  FROM (SELECT doc_id,
               regexp_split_to_array(lower(trim(text)), '\s+') AS toks
        FROM documents)
), tok AS (SELECT * FROM tok0 WHERE term <> ''),
pd AS (
  SELECT term, doc, count(*) AS tf_doc,
         string_agg(CAST(pos AS VARCHAR), ',' ORDER BY pos) AS poss
  FROM tok GROUP BY term, doc
),
idx AS (
  SELECT term, CAST(count(*) AS BIGINT) AS df,
         CAST(sum(tf_doc) AS BIGINT) AS tf,
         string_agg(CAST(doc AS VARCHAR) || ':' || poss, ';'
                    ORDER BY CAST(doc AS VARCHAR) || ':' || poss)
           AS postings
  FROM pd GROUP BY term
)
SELECT term, df, tf, postings FROM idx WHERE df >= 2 ORDER BY term
"""


# Day-number range predicates for the skipping audit (epoch days,
# computed from the lineitem shipdate span 1995-01-02..2001-11-04):
# one week, one calendar year, one month, and one range before the
# data starts (the all-skip case).
_ZONE_PREDS = [
    (1, 9556, 9562),   # 1996-03-01..03-07
    (2, 9496, 9861),   # 1996 full year
    (3, 10378, 10407),  # 1998-06
    (4, 7305, 7669),   # 1990 — entirely before min(shipdate)
]


def q_zone_skipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zone-map skipping audit (operators/layout.py::zone_maps +
    skip_audit): the same lineitem rows laid out two ways — weekly
    shipdate-range files vs md5-hash files — and, per range predicate,
    how many files each layout's min/max stats let the scanner skip.
    The range layout prunes to the touched weeks; the hash layout scans
    every file (every file spans the full date range) — the measured
    argument for clustered layouts at 100 TB. Stats tables are
    file-count-sized; only rows_matched touches the data again.
    """
    _utc(spark)
    from .operators.layout import skip_audit, zone_maps

    li = _table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_shipdate"
    )
    d = F.datediff(F.to_date("l_shipdate"), F.lit("1970-01-01").cast("date"))
    dd = li.select(
        d.cast("long").alias("d"),
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.col("l_orderkey").cast("string"),
                        F.lit("-"),
                        F.col("l_linenumber").cast("string"),
                        F.lit("zm"),
                    )
                ),
                1,
                8,
            ),
            16,
            10,
        )
        .cast("long")
        .alias("hb"),
    )
    zm_range = zone_maps(dd, F.floor(F.col("d") / 7), F.col("d"))
    zm_hash = zone_maps(dd, F.pmod(F.col("hb"), F.lit(360)), F.col("d"))
    a_range = skip_audit(zm_range, _ZONE_PREDS).select(
        "pred_id",
        "lo",
        "hi",
        F.col("files_total").alias("files_range"),
        F.col("files_scanned").alias("scan_files_range"),
        F.col("rows_scanned").alias("scan_rows_range"),
    )
    a_hash = skip_audit(zm_hash, _ZONE_PREDS).select(
        "pred_id",
        F.col("files_total").alias("files_hash"),
        F.col("files_scanned").alias("scan_files_hash"),
        F.col("rows_scanned").alias("scan_rows_hash"),
    )
    preds = spark.createDataFrame(
        _ZONE_PREDS, "pred_id int, lo bigint, hi bigint"
    )
    matched = (
        dd.join(
            F.broadcast(preds),
            (F.col("d") >= F.col("lo")) & (F.col("d") <= F.col("hi")),
        )
        .groupBy("pred_id")
        .agg(F.count("*").cast("long").alias("rows_matched"))
    )
    return (
        a_range.join(a_hash, "pred_id")
        .join(matched, "pred_id", "left")
        .withColumn(
            "rows_matched", F.coalesce("rows_matched", F.lit(0).cast("long"))
        )
        .orderBy("pred_id")
    )


SQL_ZONE_SKIPPING = """
WITH preds(pred_id, lo, hi) AS (
  VALUES (1, 9556, 9562), (2, 9496, 9861), (3, 10378, 10407),
         (4, 7305, 7669)
), dd AS (
  SELECT CAST(CAST(l_shipdate AS DATE) - DATE '1970-01-01' AS BIGINT) AS d,
         ('0x' || substring(md5(l_orderkey::VARCHAR || '-' ||
                                l_linenumber::VARCHAR || 'zm'), 1, 8))::BIGINT
           AS hb
  FROM lineitem
), zr AS (
  SELECT CAST(floor(d / 7) AS BIGINT) AS file_id,
         min(d) AS v_min, max(d) AS v_max, count(*) AS n_rows
  FROM dd GROUP BY 1
), zh AS (
  SELECT hb % 360 AS file_id,
         min(d) AS v_min, max(d) AS v_max, count(*) AS n_rows
  FROM dd GROUP BY 1
), ar AS (
  SELECT pred_id, lo, hi,
         CAST(count(*) AS BIGINT) AS files_range,
         CAST(sum(CASE WHEN NOT (v_max < lo OR v_min > hi)
                       THEN 1 ELSE 0 END) AS BIGINT) AS scan_files_range,
         CAST(sum(CASE WHEN NOT (v_max < lo OR v_min > hi)
                       THEN n_rows ELSE 0 END) AS BIGINT) AS scan_rows_range
  FROM zr CROSS JOIN preds GROUP BY 1, 2, 3
), ah AS (
  SELECT pred_id,
         CAST(count(*) AS BIGINT) AS files_hash,
         CAST(sum(CASE WHEN NOT (v_max < lo OR v_min > hi)
                       THEN 1 ELSE 0 END) AS BIGINT) AS scan_files_hash,
         CAST(sum(CASE WHEN NOT (v_max < lo OR v_min > hi)
                       THEN n_rows ELSE 0 END) AS BIGINT) AS scan_rows_hash
  FROM zh CROSS JOIN preds GROUP BY 1
), m AS (
  SELECT pred_id, CAST(count(*) AS BIGINT) AS rows_matched
  FROM dd JOIN preds ON d >= lo AND d <= hi GROUP BY 1
)
SELECT ar.pred_id, CAST(ar.lo AS BIGINT) AS lo, CAST(ar.hi AS BIGINT) AS hi,
       ar.files_range, ar.scan_files_range, ar.scan_rows_range,
       ah.files_hash, ah.scan_files_hash, ah.scan_rows_hash,
       coalesce(m.rows_matched, 0) AS rows_matched
FROM ar JOIN ah USING (pred_id) LEFT JOIN m USING (pred_id)
ORDER BY ar.pred_id
"""


def q_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weight-proportional deterministic sampling
    (operators/sampling.py::weighted_bernoulli): documents kept with
    probability weight/256 where weight = 1 + min(n_chars//2, 255) — a
    length-as-quality stand-in spanning weights ~25..256 on this corpus. Summarized per weight class with an
    admitted-id checksum so every per-row admission decision is pinned
    by the hash compare. Map-only then one small aggregate.
    """
    _utc(spark)
    from .operators.sampling import weighted_bernoulli

    docs = _table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    wt = (
        F.lit(1)
        + F.least(F.floor(F.col("n_chars") / 2), F.lit(255))
    ).cast("long")
    flagged = weighted_bernoulli(
        docs.withColumn("wt", wt), "doc_id", "wt", 256
    )
    adm = F.col("admitted").cast("long")
    return (
        flagged.groupBy(
            F.floor((F.col("wt") - 1) / 32).cast("long").alias("wclass")
        )
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum(adm).cast("long").alias("n_admitted"),
            F.sum("wt").cast("long").alias("sum_weight"),
            F.sum(F.when(F.col("admitted"), F.col("doc_id")))
            .cast("long")
            .alias("admitted_id_sum"),
            round6x(F.sum(adm) / F.count("*")).alias("admit_rate"),
        )
        .orderBy("wclass")
    )


SQL_WEIGHTED_SAMPLE = """
WITH w AS (
  SELECT doc_id,
         CAST(1 + least(CAST(floor(n_chars / 2) AS BIGINT), 255)
              AS BIGINT) AS wt,
         ('0x' || substring(md5(doc_id::VARCHAR || 'wb'), 1, 8))::BIGINT
           AS bucket
  FROM documents
), a AS (
  SELECT doc_id, wt,
         (bucket * 256 < wt * 4294967296) AS admitted
  FROM w
)
SELECT CAST(floor((wt - 1) / 32) AS BIGINT) AS wclass,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(CASE WHEN admitted THEN 1 ELSE 0 END) AS BIGINT)
         AS n_admitted,
       CAST(sum(wt) AS BIGINT) AS sum_weight,
       CAST(sum(CASE WHEN admitted THEN doc_id END) AS BIGINT)
         AS admitted_id_sum,
       CAST(round(CAST(sum(CASE WHEN admitted THEN 1 ELSE 0 END)
                       / count(*) AS DECIMAL(18,12)), 6) AS DOUBLE)
         AS admit_rate
FROM a GROUP BY 1 ORDER BY 1
"""


QUERIES_R7["rate_limit"] = q_rate_limit
ORACLE_R7["rate_limit"] = SQL_RATE_LIMIT
QUERIES_R7["inverted_index"] = q_inverted_index
ORACLE_R7["inverted_index"] = SQL_INVERTED_INDEX
QUERIES_R7["zone_skipping"] = q_zone_skipping
ORACLE_R7["zone_skipping"] = SQL_ZONE_SKIPPING
QUERIES_R7["weighted_sample"] = q_weighted_sample
ORACLE_R7["weighted_sample"] = SQL_WEIGHTED_SAMPLE
