"""Measured hot-key evidence for the r12 exact-rank migration.

Builds a duplicate-mass events frame IN MEMORY (N rows, 90% one
event_type, bounded integer-cents value domain — the shape the round-11
window audit reasoned about analytically) and times each migrated
operator's WINDOW face against its BY-COUNTS twin, interleaved in one
session (warmup excluded). The point of the histogram forms is
RESIDENCY — the window faces sort the hot key's rows inside one task,
the histograms bound every post-aggregate stage by the distinct-value
domain — but the wall-clock gap at a few million rows already shows
the one-task serialization.

Usage: python tools/skew_bench_by_counts.py [n_rows]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    from pyspark.sql import functions as F

    from earthquake_data_pipeline_spark.operators.analytics import (
        mad_outliers,
        mad_outliers_by_counts,
        robust_scale,
        robust_scale_by_counts,
        trimmed_mean,
        trimmed_mean_by_counts,
    )
    from earthquake_data_pipeline_spark.operators.curation import (
        quality_decile_stats,
        quality_decile_stats_by_counts,
    )
    from earthquake_data_pipeline_spark.session import get_spark

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 4_000_000
    spark = get_spark(app_name="edps-skew-bench", cpus=32)
    # 90% hot key, 1000 distinct cents values (bounded domain)
    ev = (
        spark.range(n)
        .select(
            F.col("id").alias("event_id"),
            F.when(F.col("id") % 10 < 9, "hot")
            .otherwise(F.concat(F.lit("t"), (F.col("id") % 7).cast("string")))
            .alias("event_type"),
            ((F.col("id") * 2654435761) % 1000 / 100.0).alias("value"),
        )
        .localCheckpoint()  # materialize: time operators, not the generator
    )
    docs = ev.select(
        F.col("event_id").cast("string").alias("doc_id"),
        F.col("event_type").alias("lang"),
        (F.col("value") * 100).cast("int").alias("n_chars"),
    ).localCheckpoint()

    pairs = [
        ("mad_outliers", lambda: mad_outliers(ev),
         lambda: mad_outliers_by_counts(ev)),
        ("trimmed_mean", lambda: trimmed_mean(ev),
         lambda: trimmed_mean_by_counts(ev)),
        ("robust_scale", lambda: robust_scale(ev),
         lambda: robust_scale_by_counts(ev)),
        ("quality_deciles", lambda: quality_decile_stats(docs),
         lambda: quality_decile_stats_by_counts(docs)),
    ]

    def t(build):
        t0 = time.time()
        build().write.format("noop").mode("overwrite").save()
        return time.time() - t0

    print("loadavg_pre:", open("/proc/loadavg").read().split()[:3])
    print(f"n_rows={n} (90% one key, 1000 distinct values)")
    for name, win, byc in pairs:
        t(win)  # warmup both shapes once
        t(byc)
        w = min(t(win), t(win))
        b = min(t(byc), t(byc))
        print(f"{name:18s} window={w:6.2f}s  by_counts={b:6.2f}s  "
              f"ratio={w / b:5.2f}x")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
