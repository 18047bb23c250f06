"""Column-expression helpers (SURVEY.md §2.3, D1-D15; §2.10 F3/F4).

Everything here returns a Column built from ``pyspark.sql.functions`` — pure
JVM expressions that stay inside whole-stage codegen. The reference's dbt
macros become Column-builder functions (macro ≙ function returning a Column).
"""

from __future__ import annotations

import re
from collections.abc import Sequence

from pyspark.sql import Column
from pyspark.sql import functions as F

# D1 — epoch-milliseconds → timestamp.
# The reference uses from_unixtime(time/1000) (pipeline/clean_historical.py:27),
# which TRUNCATES sub-second precision; timestamp_millis is exact. ``exact=False``
# reproduces the reference's truncation for bit-equality when needed.
def epoch_ms_to_timestamp(col: Column | str, exact: bool = True) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    if exact:
        return F.timestamp_millis(c.cast("long"))
    return F.to_timestamp(F.from_unixtime((c / 1000).cast("long")))


# D3 — decade bucketing: floor(year/10)*10 as int
# (reference: dbt_files/macros/get_decade.sql:5-9).
def decade_of(ts_col: Column | str) -> Column:
    c = F.col(ts_col) if isinstance(ts_col, str) else ts_col
    return (F.floor(F.year(c) / 10) * 10).cast("int")


# D4 — magnitude → severity CASE ladder
# (reference: dbt_files/models/core/fact_earthquake_data.sql:8-16).
def severity_of(mag_col: Column | str) -> Column:
    c = F.col(mag_col) if isinstance(mag_col, str) else mag_col
    return (
        F.when(c >= 8, "Great")
        .when(c >= 7, "Major")
        .when(c >= 6, "Strong")
        .when(c >= 5, "Moderate")
        .when(c >= 4, "Light")
        .otherwise("Minor")
    )


# D5 — CASE → custom sort rank, e.g. alert red=1..green=4 else 5
# (reference: dbt_files/models/analytics/alert_level_frequency_stats.sql:17-25,
# country_severe_earthquake_stats.sql:16-25). ``ranking`` maps value→rank;
# unmatched values get ``default`` (the reference keeps an unreachable else —
# we keep it too for fidelity).
def case_rank(col: Column | str, ranking: dict[str, int], default: int) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    expr: Column | None = None
    for value, rank in ranking.items():
        expr = F.when(c == value, rank) if expr is None else expr.when(c == value, rank)
    assert expr is not None
    return expr.otherwise(default)


# D6 — dbt_utils.generate_surrogate_key replica
# (reference: dbt_files/models/core/stg_earthquake.sql:31; dbt_utils 1.3.0).
# Exact dbt_utils semantics: md5 of the '-'-joined, null-coalesced,
# string-cast key columns — hash-equality with the reference holds.
_DBT_NULL = "_dbt_utils_surrogate_key_null_"


def surrogate_key(cols: Sequence[Column | str]) -> Column:
    parts = [
        F.coalesce((F.col(c) if isinstance(c, str) else c).cast("string"), F.lit(_DBT_NULL))
        for c in cols
    ]
    return F.md5(F.concat_ws("-", *parts))


# P4/P5 — closed-interval range predicate
# (reference: pipeline/clean_historical.py:31-47).
def in_closed_range(col: Column | str, lo, hi) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return (c >= lo) & (c <= hi)


# D11 — word-boundary token containment pattern for rlike
# (reference: pipeline/add_region.py:43-45 — re.search(r'\b'+escape(tok)+r'\b')).
# Java regex also supports \b; escape with \Q...\E for literal safety.
def token_pattern(token: str) -> str:
    return r"\b" + re.escape(token) + r"\b"
