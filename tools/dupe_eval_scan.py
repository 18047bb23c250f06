"""Duplicate-evaluation scan: find expensive expressions repeated
inside one optimized-plan node across every catalog query.

CollapseProject folds select → withColumn → filter chains into one
projection, SUBSTITUTING an aliased expression into every reference;
whole-stage codegen's subexpression elimination then rescues plain
expressions but NOT lambda-bearing ones (transform/filter/aggregate),
and nothing rescues a Filter + Project pair (separate operators each
evaluate their own copy). This scan flags plan lines where an
expensive fragment appears >= 3 times so a human can classify:
inherent repetition (k centroids, b bands, k bloom probes), CSE-
rescued plain expressions, or a genuine duplicate eval (the round-10
shingle-frame 7x, fixed in _prefix_candidates).

Usage: python tools/dupe_eval_scan.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

EXPENSIVE = [
    "transform(", "regexp_replace(", "regexp_extract(", "md5(", "split(",
    "aggregate(", "array_distinct(", "sha2(", "sentences(",
    "filter(lambdafunction", "array_intersect(", "arrays_zip(", "xxhash64(",
]


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"

    from earthquake_data_pipeline_spark.driver_queries import QUERIES
    from earthquake_data_pipeline_spark.session import get_spark

    spark = get_spark(app_name="edps-dupescan", cpus=8, shuffle_partitions=8)
    seen: set[tuple[str, str]] = set()
    for name, fn in QUERIES.items():
        try:
            plan = (
                fn(spark, sf_dir)
                ._jdf.queryExecution()
                .optimizedPlan()
                .toString()
            )
        except Exception as e:  # streaming queries etc.
            print(f"ERR {name}: {str(e)[:80]}")
            continue
        for line in plan.split("\n"):
            for frag in EXPENSIVE:
                c = line.count(frag)
                if c >= 3 and (name, frag) not in seen:
                    seen.add((name, frag))
                    print(f"{name}: {frag} x{c} | {line.strip()[:100]}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
