"""Input-split sensitivity axis (eleventh adversarial axis, round 12) —
the SCAN-side twin of the shuffle-partition axis.

`spark.sql.files.maxPartitionBytes` / `openCostInBytes` decide how file
bytes become scan partitions; a 100 TB lake is read under every
combination (small-file packing, huge-file splitting, AQE on top).
Results must be bit-identical whether a table arrives as ONE scan
partition or as dozens of row-group splits. What breaks engines here:
per-partition head/first picks, scan-order-dependent float
accumulation, partition-index leakage, and empty-split handling.

The sf testdata parquet files are single-row-group, which a byte-split
cannot actually divide — so this axis builds a MIRROR re-written with
tiny row groups (200 rows) and runs the full catalog against its
DuckDB oracle on the same mirror at two extremes:

- maxPartitionBytes=16KB + openCostInBytes=0: dozens of real splits
  per table (maximal scan fragmentation);
- maxPartitionBytes=512MB + openCostInBytes=64MB: everything packed
  into the fewest possible scan partitions.

Expectation table EMPTY by design; a new entry is a FINDING.

Usage: python tools/input_split_check.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from check import TABLES, normalize, value_repr  # noqa: E402

_MIRROR = "/tmp/edps-splits-sf"
_SRC = "/root/testdata/sf0.001"

KNOWN_SPLIT_DIVERGENCES: dict[str, str] = {}

SETTINGS = [
    ("fragmented", {"spark.sql.files.maxPartitionBytes": str(16 * 1024),
                    "spark.sql.files.openCostInBytes": "0"}),
    ("packed", {"spark.sql.files.maxPartitionBytes": str(512 * 1024 * 1024),
                "spark.sql.files.openCostInBytes": str(64 * 1024 * 1024)}),
]


def make_mirror() -> str:
    import pyarrow.parquet as pq

    os.makedirs(_MIRROR, exist_ok=True)
    for t in TABLES:
        tbl = pq.read_table(os.path.join(_SRC, f"{t}.parquet"))
        pq.write_table(
            tbl, os.path.join(_MIRROR, f"{t}.parquet"), row_group_size=200
        )
    return _MIRROR


def main() -> int:
    import duckdb

    import __spark_entry__ as m
    from earthquake_data_pipeline_spark.session import get_spark

    sf_dir = make_mirror()
    spark = get_spark(app_name="edps-split-sweep", cpus=8,
                      shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')"
        )
    queries, oracles = m.queries(), m.oracle_sql()
    findings: list[str] = []
    n_pass = n_total = 0
    for label, confs in SETTINGS:
        for key, val in confs.items():
            spark.conf.set(key, val)
        for name, fn in queries.items():
            if name not in oracles:
                continue
            n_total += 1
            expected = KNOWN_SPLIT_DIVERGENCES.get(f"{name}@{label}")
            outcome = "match"
            err = ""
            try:
                got = normalize(fn(spark, sf_dir).toPandas())
                want = normalize(con.execute(oracles[name]).fetchdf())
                if len(got) != len(want) or value_repr(got) != value_repr(
                    want
                ):
                    outcome = "divergence"
            except Exception as e:  # noqa: BLE001
                outcome = "spark_error"
                err = f" [{type(e).__name__}: {str(e)[:120]}]"
            if expected is None and outcome != "match":
                findings.append(
                    f"{name}@{label}: NEW input-split {outcome}{err}"
                )
            elif expected is not None and outcome != expected:
                findings.append(
                    f"{name}@{label}: expected {expected}, got "
                    f"{outcome}{err}"
                )
            else:
                n_pass += 1
            tag = (
                "ok"
                if not findings
                or not findings[-1].startswith(f"{name}@{label}:")
                else "SPLIT"
            )
            print(f"{tag} {name}@{label}: {outcome}{err}", flush=True)
    print(f"\n{n_pass}/{n_total} as documented")
    if findings:
        print("\n".join(findings))
        return 1
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
