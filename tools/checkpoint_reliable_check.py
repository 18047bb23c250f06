"""Reuse-flavor end-to-end exercise — fifteenth hostile axis (round 14).

``qcommon.reuse`` pins every multiply-referenced subtree in the engine,
and its FLAVOR is a deployment property (``SPARK_GRAFT_REUSE``): the
default on a bare ``local[n]`` is ``localCheckpoint``, which every gate
sweep has exercised thousands of times — but the two flavors a real
1000-executor deployment would actually run have only ever been unit-
tested in isolation:

- ``reliable``: persist → ``Dataset.checkpoint(eager=True)`` into the
  cluster checkpoint dir → unpersist. This is the flavor the r10-r13
  ledger pre-committed the raw ``localCheckpoint`` sites toward, and
  round 14 migrates the last six sites onto it — this axis proves the
  whole catalog end to end in exactly that flavor, with real checkpoint
  FILES on disk (the sweep fails if none were written: an axis that
  silently exercised the default flavor would prove nothing).
- ``persist``: MEMORY_AND_DISK cache, lineage kept. The documented
  long-lived-driver contract is ``spark.catalog.clearCache()`` between
  jobs (qcommon.reuse docstring); the sweep replays that contract
  per query.

Full catalog vs the DuckDB oracles in each flavor. Expectation table
EMPTY by design; a new entry is a FINDING.

Usage: python tools/checkpoint_reliable_check.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from check import TABLES, normalize, value_repr  # noqa: E402

KNOWN_FLAVOR_DIVERGENCES: dict[str, str] = {}

FLAVORS = ["reliable", "persist"]


def _count_checkpoints(ckpt_dir: str) -> int:
    """Number of rdd-* checkpoint directories ever materialized.

    ContextCleaner removes them asynchronously on RDD GC (with
    cleanCheckpoints=true), so the count is a lower bound — but a
    sweep in which EVERY reuse() call took the reliable path leaves
    plenty on disk at the moment the sweep ends."""
    n = 0
    for root, dirs, _files in os.walk(ckpt_dir):
        n += sum(1 for d in dirs if d.startswith("rdd-"))
    return n


def run_flavor(flavor: str, sf_dir: str, only: set[str]) -> tuple[int, int, list[str]]:
    import duckdb

    os.environ["SPARK_GRAFT_REUSE"] = flavor
    from earthquake_data_pipeline_spark.session import get_spark

    spark = get_spark(app_name=f"edps-reuse-{flavor}", cpus=8,
                      shuffle_partitions=8)
    ckpt_dir = None
    if flavor == "reliable":
        ckpt_dir = tempfile.mkdtemp(prefix="edps-ckpt-")
        spark.sparkContext.setCheckpointDir(ckpt_dir)

    import __spark_entry__ as m

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')"
        )
    queries, oracles = m.queries(), m.oracle_sql()
    n_pass = n_fail = 0
    max_ckpt = 0  # sampled per query: end-of-sweep count is 0 whenever
    # ContextCleaner GC'd every checkpoint RDD during a slow sweep
    # (observed r15 on a ghost-contended host — 148/148 pass, real
    # rdd-* dirs written, 0 left at the end)
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
            if name in KNOWN_FLAVOR_DIVERGENCES:
                print(f"  KNOWN {name}: {KNOWN_FLAVOR_DIVERGENCES[name]}")
            else:
                print(f"  FAIL  {name} ({dt:.1f}s)")
        if flavor == "persist":
            # the documented long-lived-driver contract: drop cache
            # entries between jobs so the CacheManager never grows
            spark.catalog.clearCache()
        elif ckpt_dir is not None:
            max_ckpt = max(max_ckpt, _count_checkpoints(ckpt_dir))
    if flavor == "reliable":
        n_ckpt = max(max_ckpt, _count_checkpoints(ckpt_dir))
        print(f"  checkpoint dirs materialized (max sampled): {n_ckpt}")
        if n_ckpt == 0 and not only:
            # a full sweep that wrote no checkpoint files silently
            # exercised some other flavor — the axis proved nothing
            failures.append("__no_checkpoints_written__")
            n_fail += 1
    spark.stop()
    con.close()
    if ckpt_dir:
        shutil.rmtree(ckpt_dir, ignore_errors=True)
    os.environ.pop("SPARK_GRAFT_REUSE", None)
    return n_pass, n_fail, failures


def main() -> int:
    args = sys.argv[1:]
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    only = set(args[1:])
    total_fail = 0
    for flavor in FLAVORS:
        print(f"== SPARK_GRAFT_REUSE={flavor} ==")
        n_pass, n_fail, failures = run_flavor(flavor, sf_dir, only)
        print(f"{flavor}: {n_pass} pass / {n_fail} fail"
              + (f" ({', '.join(failures)})" if failures else ""))
        total_fail += sum(
            1 for f in failures if f not in KNOWN_FLAVOR_DIVERGENCES
        )
    return 1 if total_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
