"""Straggler / skewed-partition latency audit (mechanizing the last
round-10 playbook candidate).

A query whose wall-clock is dominated by ONE task is a straggler
factory at 1000 executors: the stage cannot finish before its slowest
task, and AQE cannot split windows or in-flight tasks. The window-skew
audit (DESIGN.md round 11) classified the PLAN shapes; this tool
MEASURES the per-task distribution for every catalog query on the real
sf0.1 data, via the Spark event log:

- each query runs under its own job group (``sc.setJobGroup``), so the
  event log's JobStart -> StageIds -> TaskEnd chain attributes every
  task to its query;
- per query it reports the heaviest stage's  ``max_task_ms``,
  ``p50_task_ms``, the straggler ratio (max/p50), and the share of the
  query's total task time spent in its single slowest task.

Flag rule (printed at the end): straggler ratio >= 8 on a stage whose
max task >= 250 ms. Small-stage jitter (a 40 ms task vs a 4 ms median)
is not a straggler — the absolute floor matters.

Usage: python tools/straggler_check.py [sf_dir] [query ...]
Writes STRAGGLER_AUDIT.json at the repo root when run over the full
catalog.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

FLAG_RATIO = 8.0
FLAG_MIN_MS = 250.0


def main() -> int:
    args = sys.argv[1:]
    sf_dir = args[0] if args else "/root/testdata/sf0.1"
    only = set(args[1:])

    from earthquake_data_pipeline_spark.driver_queries import QUERIES
    from earthquake_data_pipeline_spark.session import get_spark

    evdir = tempfile.mkdtemp(prefix="edps-evlog-")
    spark = get_spark(
        app_name="edps-straggler",
        cpus=32,
        shuffle_partitions=32,
        extra_conf={
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": f"file://{evdir}",
            # rolling logs default to zstd; plain JSON keeps the parser
            # dependency-free
            "spark.eventLog.compress": "false",
            # measurement posture: AQE's partition coalescing folds the
            # small local shuffles into 1-2 tasks, which hides the
            # per-task distribution this audit exists to measure (a
            # production cluster keeps it ON — results there are
            # per-task too, just wider)
            "spark.sql.adaptive.coalescePartitions.enabled": "false",
        },
    )
    sc = spark.sparkContext

    names = [n for n in QUERIES if not only or n in only]
    for name in names:
        sc.setJobGroup(name, name, interruptOnCancel=False)
        try:
            QUERIES[name](spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
        except Exception as e:  # noqa: BLE001 - audit records, not raises
            print(f"ERR {name}: {type(e).__name__}", file=sys.stderr)
    app_id = sc.applicationId
    spark.stop()  # flush the event log

    # ---- parse the event log (Spark 4 rolling layout:
    # eventlog_v2_<appid>/events_*_<appid>) ----
    paths: list[str] = []
    flat = os.path.join(evdir, app_id)
    rolled = os.path.join(evdir, f"eventlog_v2_{app_id}")
    if os.path.isfile(flat):
        paths = [flat]
    elif os.path.isdir(rolled):
        paths = sorted(
            os.path.join(rolled, p)
            for p in os.listdir(rolled)
            if p.startswith("events_")
        )
    assert paths, f"no event log for {app_id} under {evdir}"

    def events():
        for p in paths:
            with open(p) as fh:
                for line in fh:
                    yield json.loads(line)

    stage_to_query: dict[int, str] = {}
    stage_tasks: dict[int, list[float]] = {}
    for ev in events():
        kind = ev.get("Event")
        if kind == "SparkListenerJobStart":
            group = (ev.get("Properties") or {}).get("spark.jobGroup.id")
            if group:
                for sid in ev.get("Stage IDs", []):
                    stage_to_query[sid] = group
        elif kind == "SparkListenerTaskEnd":
            # only SUCCESSFUL tasks: killed/failed tasks report
            # truncated durations that depress p50 and fake (or mask)
            # a straggler ratio (review finding r11)
            reason = (ev.get("Task End Reason") or {}).get("Reason")
            if reason != "Success":
                continue
            sid = ev["Stage ID"]
            info = ev.get("Task Info") or {}
            dur = float(
                info.get("Finish Time", 0) - info.get("Launch Time", 0)
            )
            stage_tasks.setdefault(sid, []).append(dur)

    per_query: dict[str, dict] = {}
    for sid, durs in stage_tasks.items():
        q = stage_to_query.get(sid)
        if q is None or not durs:
            continue
        durs = sorted(durs)
        mx = durs[-1]
        p50 = durs[len(durs) // 2]
        summary = {
            "stage": sid,
            "n_tasks": len(durs),
            "max_ms": round(mx, 1),
            "p50_ms": round(p50, 1),
            "ratio": round(mx / max(p50, 1e-9), 1),
        }
        rec = per_query.setdefault(
            q,
            {
                "worst_skew_stage": None,
                "total_task_ms": 0.0,
                "max_task_ms": 0.0,
            },
        )
        rec["total_task_ms"] += sum(durs)
        rec["max_task_ms"] = max(rec["max_task_ms"], mx)
        # the skew signal needs a MULTI-task stage: a 1-task scan stage
        # has ratio 1 by construction and masks the real straggler
        if len(durs) >= 4 and (
            rec["worst_skew_stage"] is None
            or summary["ratio"] > rec["worst_skew_stage"]["ratio"]
        ):
            rec["worst_skew_stage"] = summary
    flagged = []
    for q, rec in sorted(per_query.items()):
        ws = rec["worst_skew_stage"]
        rec["max_share_of_task_time"] = round(
            rec["max_task_ms"] / max(rec["total_task_ms"], 1e-9), 3
        )
        if ws and ws["ratio"] >= FLAG_RATIO and ws["max_ms"] >= FLAG_MIN_MS:
            flagged.append(q)
        desc = (
            f"max={ws['max_ms']:8.1f}ms p50={ws['p50_ms']:7.1f}ms "
            f"ratio={ws['ratio']:6.1f} tasks={ws['n_tasks']:4d}"
            if ws
            else "no multi-task stage"
        )
        print(
            f"{q:28s} worst skew stage: {desc} "
            f"max_share={rec['max_share_of_task_time']:.2f}"
        )
    print(f"\nflagged (ratio>={FLAG_RATIO}, max>={FLAG_MIN_MS}ms): {sorted(flagged)}")
    if not only:
        out = {
            "sf_dir": sf_dir,
            "n_queries": len(per_query),
            "flag_ratio": FLAG_RATIO,
            "flag_min_ms": FLAG_MIN_MS,
            "flagged": sorted(flagged),
            "queries": {
                q: per_query[q] for q in sorted(per_query)
            },
        }
        with open(
            os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                         "STRAGGLER_AUDIT.json"),
            "w",
        ) as fh:
            json.dump(out, fh, indent=1)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
