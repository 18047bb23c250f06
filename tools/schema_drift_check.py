"""Schema-drift tolerance axis (eighth adversarial axis, round 11).

At 100 TB the input lake drifts under the engine: upstream teams APPEND
columns, writers REORDER them (parquet has no canonical column order
across files), and nullability flags flip when a different writer
produces a partition. An engine that selects positionally, pattern-
matches full schemas, or assumes a column count breaks silently on the
first drifted partition.

This axis builds a drifted MIRROR of the sf0.001 tables — every table
gets (a) one appended ``__drift_extra`` int32 column, (b) its column
order REVERSED, (c) all fields forced nullable — and runs the full
catalog against its DuckDB oracle on the same mirror. Because both
engines read the same drifted files, any divergence or error is an
engine-side tolerance bug, not a data problem. Name-based projection
should make all of this invisible: the expectation table is EMPTY.

Usage: python tools/schema_drift_check.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from check import TABLES, normalize, value_repr  # noqa: E402

_DRIFT_DIR = "/tmp/edps-drift-sf"
_SCHEMA_SRC = "/root/testdata/sf0.001"

# Documented divergences on the drifted mirror. Empty by design: every
# catalog query projects by NAME, so added/reordered/renullabled
# columns must be invisible. A new entry here is a FINDING, not a fact.
KNOWN_DRIFT_DIVERGENCES: dict[str, str] = {}


def make_drift_mirror() -> str:
    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(_DRIFT_DIR, exist_ok=True)
    for t in TABLES:
        src = os.path.join(_SCHEMA_SRC, f"{t}.parquet")
        dst = os.path.join(_DRIFT_DIR, f"{t}.parquet")
        tbl = pq.read_table(src)
        # (a) appended column a reader must ignore
        extra = pa.array(range(tbl.num_rows), type=pa.int32())
        tbl = tbl.append_column("__drift_extra", extra)
        # (b) reversed column order
        tbl = tbl.select(list(reversed(tbl.column_names)))
        # (c) every field nullable
        fields = [f.with_nullable(True) for f in tbl.schema]
        tbl = tbl.cast(pa.schema(fields))
        pq.write_table(tbl, dst)
    return _DRIFT_DIR


def main() -> int:
    import duckdb

    import __spark_entry__ as m
    from earthquake_data_pipeline_spark.session import get_spark

    sf_dir = make_drift_mirror()
    spark = get_spark(app_name="edps-drift-check", cpus=8, shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * EXCLUDE (__drift_extra) FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')"
        )

    queries, oracles = m.queries(), m.oracle_sql()
    drift: list[str] = []
    n_pass = 0
    for name, fn in queries.items():
        if name not in oracles:
            continue  # rows-only streaming checks: out of axis scope
        expected = KNOWN_DRIFT_DIVERGENCES.get(name)
        outcome = "match"
        err = ""
        try:
            got = normalize(fn(spark, sf_dir).toPandas())
            want = normalize(con.execute(oracles[name]).fetchdf())
            if len(got) != len(want) or value_repr(got) != value_repr(want):
                outcome = "divergence"
        except Exception as e:  # noqa: BLE001 - axis harness records all
            outcome = "spark_error"
            err = f" [{type(e).__name__}: {str(e)[:120]}]"
        if expected is None and outcome != "match":
            drift.append(f"{name}: NEW schema-drift {outcome}{err}")
        elif expected is not None and outcome != expected:
            drift.append(
                f"{name}: expected {expected}, got {outcome}{err} — "
                "operator changed, re-audit and update the table"
            )
        else:
            n_pass += 1
        ok = "ok" if not drift or not drift[-1].startswith(name + ":") else "DRIFT"
        print(f"{ok} {name}: {outcome}{err}")
    print(f"\n{n_pass}/{len([q for q in queries if q in oracles])} as documented")
    if drift:
        print("\n".join(drift))
        return 1
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
