"""Local correctness harness mimicking the driver's DuckDB-oracle gate.

Runs every ``queries()`` entry against its ``oracle_sql()`` on the same
parquet tables: compares row count, column names/types, and an
order-insensitive value hash (rows sorted, columns sorted by name).

Usage: python tools/check.py [sf_dir] [query ...]
       python tools/check.py --head [sf_dir]   # exactly the driver's gate:
                                               # the first 50 queries() only
       python tools/check.py --never-proven [sf_dir]
           # proof-debt mode: diff queries() against the union of green
           # rows across every CORRECTNESS_r*.json and run exactly the
           # catalog entries that have NEVER had a driver row — makes the
           # debt visible every round instead of judge-reconstructed
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

import duckdb
import pandas as pd

GATE_WINDOW = 50  # the driver verifies exactly the first 50 queries()

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(by=list(df.columns), ignore_index=True)


def value_repr(df: pd.DataFrame) -> list[tuple]:
    # Type-sensitive, like the driver's hasher (round-2 lesson: values were
    # bit-identical but DuckDB HUGEINT landed as float64 while Spark emitted
    # int64, and Python's int == float masked it locally for two rounds).
    # Compare per-column pandas dtype alongside the values.
    dtypes = tuple(str(t) for t in df.dtypes)
    out = [dtypes]
    for row in df.itertuples(index=False):
        vals = []
        for v in row:
            if isinstance(v, float):
                # EXACT bits (round-1 lesson: a 9-dp-rounded local gate
                # passed queries the driver failed).
                # NaN != NaN would flag aligned nulls as a mismatch.
                vals.append(None if v != v else v)
            else:
                vals.append(v)
        out.append(tuple(vals))
    return out


def driver_proven() -> dict[str, str]:
    """Latest driver round with a fully-green row, per query, from every
    CORRECTNESS_r*.json at the repo root."""
    import glob
    import json
    import os

    latest: dict[str, str] = {}
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    for path in sorted(glob.glob(os.path.join(root, "CORRECTNESS_r*.json"))):
        rnd = os.path.basename(path)[len("CORRECTNESS_"):-len(".json")]
        with open(path) as f:
            rows = json.load(f)
        for name, row in rows.items():
            if (
                row.get("rows_match")
                and row.get("schema_match")
                and row.get("hash_match")
            ):
                latest[name] = rnd
    return latest


def main() -> int:
    flags = {"--head", "--never-proven"}
    args = [a for a in sys.argv[1:] if a not in flags]
    head_only = "--head" in sys.argv[1:]
    never_proven = "--never-proven" in sys.argv[1:]
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    only = set(args[1:])

    import __spark_entry__ as entrymod
    from earthquake_data_pipeline_spark.session import get_spark

    spark = get_spark(cpus=8)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    if head_only:
        qs = dict(list(qs.items())[:GATE_WINDOW])
    if never_proven:
        proven = driver_proven()
        qs = {k: v for k, v in qs.items() if k not in proven}
        in_head = set(list(entrymod.queries())[:GATE_WINDOW])
        print(
            f"proof debt: {len(qs)}/{len(entrymod.queries())} catalog "
            f"queries have no driver CORRECTNESS row; "
            f"{len(set(qs) - in_head)} of them are OUTSIDE the current "
            f"{GATE_WINDOW}-slot gate head"
        )
        if not qs:
            print("0/0 passed")
            return 0
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            spark_pd = sdf.toPandas()
        except Exception as e:
            print(f"FAIL {name}: spark error: {e}")
            failures.append(name)
            continue
        if name not in oracles:
            print(f"ok?  {name}: rows-only check, {len(spark_pd)} rows "
                  f"({time.time()-t0:.1f}s)")
            continue
        try:
            duck_pd = con.execute(oracles[name]).df()
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {e}")
            failures.append(name)
            continue

        s, d = normalize(spark_pd), normalize(duck_pd)
        problems = []
        if len(s) != len(d):
            problems.append(f"rowcount spark={len(s)} duck={len(d)}")
        if list(s.columns) != list(d.columns):
            problems.append(f"columns spark={list(s.columns)} duck={list(d.columns)}")
        elif len(s) == len(d) and value_repr(s) != value_repr(d):
            diff = (s.compare(d) if s.shape == d.shape else None)
            problems.append(
                "value mismatch"
                + (f" first diffs:\n{diff.head(5)}" if diff is not None and not diff.empty else "")
            )
        if problems:
            print(f"FAIL {name}: {'; '.join(str(p) for p in problems)}")
            failures.append(name)
        else:
            print(f"PASS {name}: {len(s)} rows ({time.time()-t0:.1f}s)")

    n_run = len(only) if only else len(qs)
    print(f"\n{n_run - len(failures)}/{n_run} passed")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
