"""Hostile-driver sweep: run EVERY oracle-paired query on a vanilla
SparkSession with a non-UTC timezone (the driver's session is not ours)
and compare against DuckDB — the strongest local approximation of the
driver's gate.

Usage: python tools/hostile_check.py [sf_dir] [tz]
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

from check import TABLES, normalize, value_repr  # noqa: E402  (same dir)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    tz = sys.argv[2] if len(sys.argv) > 2 else "America/New_York"

    import duckdb
    from pyspark.sql import SparkSession

    # vanilla session: no engine configs beyond master + the hostile TZ
    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.session.timeZone", tz)
        .getOrCreate()
    )
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    import __spark_entry__ as entrymod

    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if name not in oracles:
            continue
        try:
            s = normalize(fn(spark, sf_dir).toPandas())
            d = normalize(con.execute(oracles[name]).df())
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: {e}")
            failures.append(name)
            continue
        if len(s) != len(d) or list(s.columns) != list(d.columns):
            print(f"FAIL {name}: shape {s.shape} vs {d.shape}")
            failures.append(name)
        elif value_repr(s) != value_repr(d):
            print(f"FAIL {name}: value mismatch")
            failures.append(name)
        else:
            print(f"PASS {name}")
    print(f"\nhostile[{tz}]: {len(qs) - len(failures)} ok, {len(failures)} failed")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
