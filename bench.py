"""Benchmark runner — the driver's per-round perf gate.

Runs every driver query at $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1)
on local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:
{"metric": ..., "value": total_sec, "unit": "sec", "queries": {...}, "sf": ...}

Execution uses the noop sink — full plan execution (including sorts) with no
driver-side collection, so timings measure the engine, not Arrow transfer.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from earthquake_data_pipeline_spark.driver_queries import QUERIES
from earthquake_data_pipeline_spark.session import get_spark


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else -1.0

    spark = get_spark(app_name="edps-bench", cpus=cpus, shuffle_partitions=cpus)

    # --reverse: run the suite back-to-front. Comparing forward vs
    # reverse per-query times is a cheap detector for cross-query session
    # contamination (a leaked conf, a cache, a lingering state store):
    # any query whose time is strongly order-sensitive inherits state
    # from its neighbors.
    items = list(QUERIES.items())
    if "--reverse" in sys.argv[1:]:
        items.reverse()

    timings: dict[str, float] = {}
    for name, fn in items:
        df = fn(spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()  # warm (JIT/IO cache)
        # best-of-2: single timed runs swing ±20% from GC/scheduler noise
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
        timings[name] = round(best, 4)

    total = round(sum(timings.values()), 4)
    print(json.dumps({
        "metric": "total_query_wall_seconds",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "n_queries": len(timings),
        "sf": sf,
    }))


if __name__ == "__main__":
    main()
