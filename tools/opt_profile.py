"""Per-query optimization profile (round-17 optimization pass, guide §1).

For every catalog query, separates the bench's wall time into its
mechanically distinct components and counts scheduler work:

- ``t_build``  — fn(spark, sf_dir) wall: plan construction, including any
  eager actions hidden in operators (probe routes, _fanout partition
  checks, driver-side iterative loops that run at build time).
- ``t_exec``   — noop-sink wall of the built frame (best of 2, matching
  bench.py's methodology).
- ``n_jobs``   — Spark jobs submitted during ONE (build + exec) cycle:
  overhead-dominated queries at sf0.1 are the ones whose n_jobs is high
  (each job costs ~10-40 ms of scheduler latency before any task runs).

Writes JSON to the path given as argv[1] (default /tmp/opt_profile.json).
Subset selection: --only name1,name2 profiles just those queries.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from earthquake_data_pipeline_spark.driver_queries import QUERIES
from earthquake_data_pipeline_spark.session import get_spark


def main() -> None:
    out_path = "/tmp/opt_profile.json"
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    if args:
        out_path = args[0]
    only: set[str] | None = None
    for a in sys.argv[1:]:
        if a.startswith("--only="):
            only = set(a.split("=", 1)[1].split(","))

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(app_name="edps-opt-profile", cpus=cpus, shuffle_partitions=cpus)
    sc = spark.sparkContext
    jsc = sc._jsc.sc()

    def job_count() -> int:
        # Monotone job-id counter: cheapest mechanical "how many jobs did
        # that cycle submit" probe (statusTracker keeps only recent jobs).
        nid = jsc.dagScheduler().nextJobId()
        return nid if isinstance(nid, int) else nid.get()

    results: dict[str, dict[str, float]] = {}
    for name, fn in QUERIES.items():
        if only is not None and name not in only:
            continue
        sc.setJobDescription(f"profile:{name}")
        t0 = time.perf_counter()
        df = fn(spark, sf_dir)
        t_build0 = time.perf_counter() - t0
        df.write.format("noop").mode("overwrite").save()  # warm
        t_exec = float("inf")
        t_build = float("inf")
        jobs0 = job_count()
        for i in range(2):
            t0 = time.perf_counter()
            df2 = fn(spark, sf_dir)
            t_build = min(t_build, time.perf_counter() - t0)
            t0 = time.perf_counter()
            df2.write.format("noop").mode("overwrite").save()
            t_exec = min(t_exec, time.perf_counter() - t0)
        n_jobs = (job_count() - jobs0) / 2.0
        results[name] = {
            "t_build_cold": round(t_build0, 4),
            "t_build": round(t_build, 4),
            "t_exec": round(t_exec, 4),
            "t_total": round(t_build + t_exec, 4),
            "n_jobs": n_jobs,
        }
        sc.setJobDescription(None)

    totals = {
        "sum_build": round(sum(r["t_build"] for r in results.values()), 2),
        "sum_exec": round(sum(r["t_exec"] for r in results.values()), 2),
        "sum_total": round(sum(r["t_total"] for r in results.values()), 2),
        "sum_jobs": sum(r["n_jobs"] for r in results.values()),
        "n_queries": len(results),
    }
    with open(out_path, "w") as fh:
        json.dump({"totals": totals, "queries": results}, fh, indent=1, sort_keys=True)
    print(json.dumps(totals))


if __name__ == "__main__":
    main()
