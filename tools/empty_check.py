"""Empty-input robustness axis (round-10): the full catalog swept
against ZERO-ROW tables with the production schemas.

Production pipelines hit empty inputs constantly — an incremental run
with no new data, a filter that eliminates a partition, a cold-start
table — and the failure modes are specific: driver-side
``.collect()``-fed constants become empty literal lists (``F.array()``
/ ``F.create_map()`` with zero args type as VOID and crash at plan
time), and aggregate outputs diverge between engines (a SQL ROLLUP
emits its grand-total row over the empty set; Spark emits nothing).

This harness generates a zero-row parquet mirror of the sf0.001
schemas, runs every catalog query against it, compares to the DuckDB
oracle, and judges the result against a pinned expectation table:

- queries in ``KNOWN_EMPTY_DIVERGENCES`` must fail with the RECORDED
  class (a divergence silently becoming a pass means the operator
  changed — re-audit it);
- every other query must MATCH the oracle on empty input.

Exit 0 = the empty axis is exactly as documented; any drift names the
query. Run: ``python tools/empty_check.py``.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from check import TABLES, normalize, value_repr  # noqa: E402

_EMPTY_DIR = "/tmp/edps-empty-sf"
_SCHEMA_SRC = "/root/testdata/sf0.001"

# The documented empty-input findings (DESIGN.md, round-10 audit;
# round 11 fixed the four crash-on-empty rows — assign_clusters and
# q_approx_stats now build typed null literals instead of zero-arg
# array()/create_map() VOID literals, so those queries match the
# oracle's empty result and any regression shows up as NEW drift).
# class "divergence": engines disagree on empty-input semantics or the
# oracle SQL synthesizes rows the operator correctly does not.
KNOWN_EMPTY_DIVERGENCES: dict[str, str] = {
    "kcenter_select": "divergence",  # oracle synthesizes k seed rows
    "rollup_agg": "divergence",  # SQL grand-total row over empty set
    "cube_agg": "divergence",  # same super-aggregate semantics
    "expectations_report": "divergence",  # spark coalesces 0/True; SQL nulls
    "bloom_prune": "divergence",  # null boolean vs NaN dtype on empty
}


def make_empty_mirror() -> str:
    import pyarrow.parquet as pq

    os.makedirs(_EMPTY_DIR, exist_ok=True)
    for t in TABLES:
        src = os.path.join(_SCHEMA_SRC, f"{t}.parquet")
        dst = os.path.join(_EMPTY_DIR, f"{t}.parquet")
        schema = pq.read_schema(src)
        pq.write_table(schema.empty_table(), dst)
    return _EMPTY_DIR


def main() -> int:
    import duckdb

    import __spark_entry__ as m
    from earthquake_data_pipeline_spark.session import get_spark

    sf_dir = make_empty_mirror()
    spark = get_spark(app_name="edps-empty-check", cpus=8, shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')"
        )

    queries, oracles = m.queries(), m.oracle_sql()
    drift: list[str] = []
    n_pass = 0
    for name, fn in queries.items():
        if name not in oracles:
            continue  # rows-only streaming checks: out of axis scope
        expected = KNOWN_EMPTY_DIVERGENCES.get(name)
        outcome = "match"
        try:
            got = normalize(fn(spark, sf_dir).toPandas())
            want = normalize(con.execute(oracles[name]).fetchdf())
            if len(got) != len(want) or value_repr(got) != value_repr(want):
                outcome = "divergence"
        except Exception:
            outcome = "spark_error"
        if expected is None and outcome != "match":
            drift.append(f"{name}: NEW empty-input {outcome}")
        elif expected is not None and outcome != expected:
            drift.append(
                f"{name}: expected {expected}, got {outcome} — "
                "operator changed, re-audit and update the table"
            )
        else:
            n_pass += 1
        print(f"{'ok' if not drift or drift[-1].split(':')[0] != name else 'DRIFT'}"
              f" {name}: {outcome}")
    print(f"\n{n_pass}/{len([q for q in queries if q in oracles])} as documented")
    for d in drift:
        print("DRIFT:", d)
    return 1 if drift else 0


if __name__ == "__main__":
    raise SystemExit(main())
