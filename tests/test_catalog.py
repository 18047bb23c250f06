"""Catalog integrity: every driver query is registered correctly and
produces a stable, explicitly-named schema — guards future additions."""

from __future__ import annotations

import re

import __spark_entry__ as entry

# approximate/recall<1 ops that legitimately have no SQL oracle
ROWS_ONLY = {"ann_lsh", "ann_ivf", "usgs_pipeline", "approx_stats"}


def test_every_query_has_oracle_or_is_known_rows_only():
    qs, oracles = entry.queries(), entry.oracle_sql()
    missing = set(qs) - set(oracles) - ROWS_ONLY
    assert not missing, f"queries without oracle nor rows-only waiver: {missing}"
    stale = set(oracles) - set(qs)
    assert not stale, f"oracles without queries: {stale}"


def test_schemas_are_explicitly_named(spark):
    # auto-generated column names (round(x, 6), count(1), …) would break
    # the driver's name-sorted value hash; every column must be aliased
    bad = {}
    for name, fn in entry.queries().items():
        cols = fn(spark, "/root/testdata/sf0.001").columns
        ugly = [c for c in cols if re.search(r"[(),]| ", c)]
        if ugly:
            bad[name] = ugly
    assert not bad, f"unaliased output columns: {bad}"
