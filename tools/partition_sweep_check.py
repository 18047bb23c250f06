"""Shuffle-partition-count invariance axis (tenth adversarial axis,
round 12).

`spark.sql.shuffle.partitions` is the deployment knob every cluster
sets differently (32 here, 2000+ on a real 100 TB cluster, AQE coalesce
on top) — results must be BIT-IDENTICAL at any setting. What breaks
engines here: order-dependent float accumulation (different partition
counts → different merge order), first()/head-of-partition picks,
partition-index-dependent logic (spark_partition_id, monotonically
increasing ids leaking into output), and hidden assumptions that a
frame fits one partition.

This axis runs the FULL catalog against the DuckDB oracles twice — at
shuffle.partitions=3 (fewer partitions than keys almost everywhere:
maximal per-partition merging) and 257 (prime, more partitions than
most frames have rows: maximal fragmentation, empty partitions
everywhere) — on sf0.001. The repo's decimal-accumulation discipline
should make every float path order-free; the expectation table is
EMPTY by design, and a new entry is a FINDING.

Usage: python tools/partition_sweep_check.py [n_partitions ...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from check import TABLES, normalize, value_repr  # noqa: E402

_SRC = "/root/testdata/sf0.001"

# Documented divergences per partition setting. Empty by design.
KNOWN_PARTITION_DIVERGENCES: dict[str, str] = {}


def main() -> int:
    import duckdb

    import __spark_entry__ as m
    from earthquake_data_pipeline_spark.session import get_spark

    settings = [int(a) for a in sys.argv[1:]] or [3, 257]
    spark = get_spark(app_name="edps-partition-sweep", cpus=8)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{_SRC}/{t}.parquet')"
        )
    queries, oracles = m.queries(), m.oracle_sql()
    findings: list[str] = []
    n_pass = n_total = 0
    for nparts in settings:
        spark.conf.set("spark.sql.shuffle.partitions", str(nparts))
        for name, fn in queries.items():
            if name not in oracles:
                continue
            n_total += 1
            expected = KNOWN_PARTITION_DIVERGENCES.get(f"{name}@{nparts}")
            outcome = "match"
            err = ""
            try:
                got = normalize(fn(spark, _SRC).toPandas())
                want = normalize(con.execute(oracles[name]).fetchdf())
                if len(got) != len(want) or value_repr(got) != value_repr(
                    want
                ):
                    outcome = "divergence"
            except Exception as e:  # noqa: BLE001 - axis harness records
                outcome = "spark_error"
                err = f" [{type(e).__name__}: {str(e)[:120]}]"
            if expected is None and outcome != "match":
                findings.append(
                    f"{name}@{nparts}: NEW partition-count {outcome}{err}"
                )
            elif expected is not None and outcome != expected:
                findings.append(
                    f"{name}@{nparts}: expected {expected}, got "
                    f"{outcome}{err}"
                )
            else:
                n_pass += 1
            tag = (
                "ok"
                if not findings
                or not findings[-1].startswith(f"{name}@{nparts}:")
                else "PART"
            )
            print(f"{tag} {name}@{nparts}: {outcome}{err}", flush=True)
    print(f"\n{n_pass}/{n_total} as documented")
    if findings:
        print("\n".join(findings))
        return 1
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
