"""A/B timing for individual catalog queries, bench-methodology-identical
(warm noop + best-of-2 of fn+noop in one long-lived session).

Usage: python tools/ab_time.py name1 name2 ...  [--reps=N]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from earthquake_data_pipeline_spark.driver_queries import QUERIES
from earthquake_data_pipeline_spark.session import get_spark


def main() -> None:
    names = [a for a in sys.argv[1:] if not a.startswith("--")]
    reps = 2
    for a in sys.argv[1:]:
        if a.startswith("--reps="):
            reps = int(a.split("=")[1])
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(app_name="edps-ab", cpus=cpus, shuffle_partitions=cpus)
    total = 0.0
    for name in names:
        fn = QUERIES[name]
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()  # warm
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
        total += best
        print(f"{name}: {best:.3f}s", flush=True)
    print(f"TOTAL: {total:.3f}s")


if __name__ == "__main__":
    main()
