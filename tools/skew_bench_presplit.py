"""Measured bot-key evidence for the per-user-sequence pre-split family
(r12): N events with 90% of rows on ONE user (the 10^8-event-bot shape
the round-11 window audit flagged as the class's straggler), window
face vs pre-split twin interleaved in one session, best-of-2 after a
warmup of each shape.

The window faces serialize the bot's entire history into one
AQE-opaque task; the twins bound every row-level task by one
(user, day) cell. Timestamps spread over ~90 days so day-bucketing has
~90 cells to split the bot across.

Usage: python tools/skew_bench_presplit.py [n_rows]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    from pyspark.sql import functions as F

    from earthquake_data_pipeline_spark.operators.analytics import (
        event_debounce,
        event_debounce_presplit,
        event_transitions,
        event_transitions_presplit,
        funnel_steps,
        funnel_steps_presplit,
        merge_intervals,
        merge_intervals_adaptive,
        merge_intervals_presplit,
        session_ids,
        session_ids_presplit,
    )
    from earthquake_data_pipeline_spark.session import get_spark

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 4_000_000
    spark = get_spark(app_name="edps-skew-presplit", cpus=32)
    # 90% one user; ~90 days of timestamps; 3 event types + noise
    ev = (
        spark.range(n)
        .select(
            F.col("id").alias("event_id"),
            F.when(F.col("id") % 10 < 9, F.lit(7))
            .otherwise((F.col("id") % 1000).cast("long"))
            .alias("user_id"),
            F.element_at(
                F.array(
                    F.lit("visit"), F.lit("signup"),
                    F.lit("purchase"), F.lit("noise"),
                ),
                ((F.col("id") * 2654435761) % 4 + 1).cast("int"),
            ).alias("event_type"),
            F.timestamp_seconds(
                F.lit(1_700_000_000)
                + (F.col("id") * 7919) % (90 * 86_400)
            ).alias("ts"),
        )
        .localCheckpoint()
    )

    pairs = [
        ("session_ids", lambda: session_ids(ev),
         lambda: session_ids_presplit(ev)),
        ("merge_intervals", lambda: merge_intervals(ev),
         lambda: merge_intervals_presplit(ev)),
        ("event_debounce", lambda: event_debounce(ev),
         lambda: event_debounce_presplit(ev)),
        ("event_transitions", lambda: event_transitions(ev),
         lambda: event_transitions_presplit(ev)),
        ("funnel_steps",
         lambda: funnel_steps(ev, ["visit", "signup", "purchase"]),
         lambda: funnel_steps_presplit(ev, ["visit", "signup", "purchase"])),
    ]

    def t(build):
        t0 = time.time()
        build().write.format("noop").mode("overwrite").save()
        return time.time() - t0

    print("loadavg_pre:", open("/proc/loadavg").read().split()[:3])
    print(f"n_rows={n} (90% one user, ~90 days)")
    for name, win, pre in pairs:
        t(win)
        t(pre)
        w = min(t(win), t(win))
        p = min(t(pre), t(pre))
        print(f"{name:18s} window={w:7.2f}s  presplit={p:7.2f}s  "
              f"ratio={w / p:5.2f}x")
    # r15: the skew-ADAPTIVE dispatchers on the same 90%-skew corpus
    # must route to the pre-split twins and stay within probe-overhead
    # of them (VERDICT r14 item 5 + the family-wide rollout — the A/B
    # wins survive the dispatch)
    from earthquake_data_pipeline_spark.operators.analytics import (
        event_debounce_adaptive,
        event_transitions_adaptive,
        funnel_steps_adaptive,
        merge_intervals_adaptive,
        session_ids_adaptive,
    )

    adaptive = [
        ("session_ids_adaptive", lambda: session_ids_adaptive(ev)),
        ("merge_intervals_adaptive", lambda: merge_intervals_adaptive(ev)),
        ("event_debounce_adaptive", lambda: event_debounce_adaptive(ev)),
        ("event_transitions_adaptive",
         lambda: event_transitions_adaptive(ev)),
        ("funnel_steps_adaptive",
         lambda: funnel_steps_adaptive(ev, ["visit", "signup", "purchase"])),
    ]
    for name, mk in adaptive:
        t(mk)
        a = min(t(mk), t(mk))
        print(f"{name:28s} (skewed) = {a:7.2f}s (presplit route + probe)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
