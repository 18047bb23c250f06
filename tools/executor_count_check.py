"""Executor-count sensitivity sweep — twelfth hostile axis (round 13).

The multi-JVM axis (``multijvm_check.py``) proved the catalog across
process boundaries, but at ONE topology: ``local-cluster[2,4,2048]``.
Executor COUNT changes things partition count does not: scan splits
are assigned to different hosts (merge order of partial aggregates
follows locality), broadcast joins materialize once per executor, and
anything accidentally keyed on executor identity (partition-index
leakage, per-executor state, ``SparkFiles`` paths) diverges. This axis
is the scan/merge-order twin of the round-12 shuffle-partition-count
axis (``partition_sweep_check.py``): that one varied
``spark.sql.shuffle.partitions`` at {3, 257}; this one varies the
EXECUTOR GRID at the two extremes a 1000-node cluster brackets —

- ``local-cluster[1,8,4096]``: one fat executor (all cores co-located,
  every exchange is process-local after the first);
- ``local-cluster[8,1,1024]``: eight thin executors (maximal process
  fan-out, every shuffle crosses a process boundary, 8 broadcast
  copies).

Full catalog vs the DuckDB oracles at each topology. Expectation
table EMPTY by design; a new entry is a FINDING.

Usage: python tools/executor_count_check.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from check import TABLES, normalize, value_repr  # noqa: E402

KNOWN_TOPOLOGY_DIVERGENCES: dict[str, str] = {}

TOPOLOGIES = ["local-cluster[1,8,4096]", "local-cluster[8,1,1024]"]


def run_topology(master: str, sf_dir: str, only: set[str]) -> tuple[int, int, list[str]]:
    import duckdb
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(master)
        .appName("edps-executor-count-check")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.executorEnv.PYTHONPATH", REPO)
        .getOrCreate()
    )
    import __spark_entry__ as m

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')"
        )
    queries, oracles = m.queries(), m.oracle_sql()
    n_pass = n_fail = 0
    failures: list[str] = []
    for name, fn in queries.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            got = normalize(fn(spark, sf_dir).toPandas())
            if name in oracles:
                want = normalize(con.execute(oracles[name]).fetchdf())
                ok = len(got) == len(want) and value_repr(got) == value_repr(want)
            else:
                ok = True  # rows-only streaming checks
        except Exception as e:  # noqa: BLE001
            ok = False
            print(f"  ERROR {name}: {type(e).__name__}: {str(e)[:200]}")
        dt = time.time() - t0
        if ok:
            n_pass += 1
        else:
            n_fail += 1
            failures.append(name)
            if name in KNOWN_TOPOLOGY_DIVERGENCES:
                print(f"  KNOWN {name}: {KNOWN_TOPOLOGY_DIVERGENCES[name]}")
            else:
                print(f"  FAIL  {name} ({dt:.1f}s)")
    spark.stop()
    con.close()
    return n_pass, n_fail, failures


def main() -> int:
    args = sys.argv[1:]
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    only = set(args[1:])
    total_fail = 0
    for master in TOPOLOGIES:
        print(f"== {master} ==")
        n_pass, n_fail, failures = run_topology(master, sf_dir, only)
        print(f"{master}: {n_pass} pass / {n_fail} fail"
              + (f" ({', '.join(failures)})" if failures else ""))
        total_fail += sum(
            1 for f in failures if f not in KNOWN_TOPOLOGY_DIVERGENCES
        )
    return 1 if total_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
