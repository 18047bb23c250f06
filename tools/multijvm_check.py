"""Multi-executor (multi-JVM) oracle sweep — ninth hostile axis.

Every other sweep runs ``local[n]``: one JVM, zero serialization
boundaries between "executors". A real cluster crosses process
boundaries — closures actually pickle, Python workers import the
package by MODULE (cloudpickle serializes module-level helpers by
reference, not by value), broadcasts actually transfer, and shuffle
blocks actually move. ``local-cluster[2,4,2048]`` spawns two real
worker JVMs, so the whole catalog can be proven across process
boundaries without a cluster.

Found on first run (round 11): the mapInPandas operators that
reference module-level helpers (spatial ray-cast, country regex table,
codec kernels, USGS fetchers) died on the workers with
ModuleNotFoundError — the DEPLOYMENT contract this axis makes
explicit: the package must be importable on executors
(pip-install it into the executor image, ship a zip via
``--py-files``, or set ``spark.executorEnv.PYTHONPATH``). This harness
uses the env-var form; the engine code itself needs nothing special
(the closure-only operators ran fine either way).

Usage: python tools/multijvm_check.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from check import TABLES, normalize, value_repr  # noqa: E402


def main() -> int:
    import time

    import duckdb
    from pyspark.sql import SparkSession

    args = sys.argv[1:]
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    only = set(args[1:])

    spark = (
        SparkSession.builder.master("local-cluster[2,4,2048]")
        .appName("edps-multijvm-check")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        # the deployment contract under test: the package must be
        # importable on the executors' python workers
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
            status = "PASS" if ok else "DIVERGE"
        except Exception as e:  # noqa: BLE001 - sweep records all
            status, got = f"FAIL[{type(e).__name__}]", None
            ok = False
        n_pass += ok
        n_fail += not ok
        print(f"{status} {name} ({time.time()-t0:.1f}s)", flush=True)
    print(f"\n{n_pass} passed, {n_fail} failed")
    spark.stop()
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
