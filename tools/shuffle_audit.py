"""Shuffle-payload audit: per-query shuffle bytes/records at a given SF.

The plan audit (PLANS.md) counts EXCHANGES; this tool weighs them.
At 100 TB the shuffle byte volume — not the exchange count — is the
cluster bottleneck, and the classic mistake is a correct plan whose
exchange carries wide payload columns (full text, embeddings) where
only keys + small values are needed. Method: run every catalog query
under its own job group with the Spark event log enabled, then sum
TaskEnd metrics (shuffle bytes/records written, input bytes read) per
job group from the log. Reported bytes/record makes wide payloads
jump out: a key+count exchange is tens of bytes/record; a row that
drags document text is hundreds to thousands.

Usage: python tools/shuffle_audit.py [sf_dir] [query ...]
Writes the full table to SHUFFLE_AUDIT.json and prints the top
shufflers by bytes.
"""

from __future__ import annotations

import json
import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_LOG_DIR = "/tmp/edps-eventlog"


def main() -> int:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    sf_dir = args[0] if args else "/root/testdata/sf0.1"
    only = set(args[1:])

    shutil.rmtree(_LOG_DIR, ignore_errors=True)
    os.makedirs(_LOG_DIR, exist_ok=True)

    from earthquake_data_pipeline_spark.driver_queries import QUERIES
    from earthquake_data_pipeline_spark.session import get_spark

    spark = get_spark(
        app_name="edps-shuffle-audit",
        cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "32")),
        shuffle_partitions=32,
        extra_conf={
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": f"file:{_LOG_DIR}",
            "spark.eventLog.compress": "false",
        },
    )
    sc = spark.sparkContext
    ran = []
    for name, fn in QUERIES.items():
        if only and name not in only:
            continue
        sc.setJobGroup(name, name)
        try:
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            ran.append(name)
        finally:
            sc.setJobGroup("", "")
    app_id = sc.applicationId
    spark.stop()  # flush the event log

    # ---- parse the log: stage -> job group, task metrics -> per group
    # Spark 4 rolls the log into eventlog_v2_<appId>/events_N_<appId>
    # part files; a plain file per app is the legacy layout.
    paths: list[str] = []
    for f in sorted(os.listdir(_LOG_DIR)):
        p = os.path.join(_LOG_DIR, f)
        if app_id not in f:
            continue
        if os.path.isdir(p):
            paths.extend(
                os.path.join(p, g)
                for g in sorted(os.listdir(p))
                if g.startswith("events_")
            )
        else:
            paths.append(p)
    assert paths, f"no event log for {app_id} in {_LOG_DIR}"

    def lines():
        for p in paths:
            with open(p) as fh:
                yield from fh

    stage_group: dict[int, str] = {}
    agg: dict[str, dict[str, int]] = {}
    if True:
        for line in lines():
            ev = json.loads(line)
            kind = ev.get("Event")
            if kind == "SparkListenerJobStart":
                grp = (ev.get("Properties") or {}).get("spark.jobGroup.id")
                if grp:
                    for sid in ev.get("Stage IDs", []):
                        stage_group[sid] = grp
            elif kind == "SparkListenerTaskEnd":
                grp = stage_group.get(ev.get("Stage ID"))
                if not grp:
                    continue
                tm = ev.get("Task Metrics") or {}
                sw = tm.get("Shuffle Write Metrics") or {}
                im = tm.get("Input Metrics") or {}
                d = agg.setdefault(
                    grp,
                    {"shuffle_bytes": 0, "shuffle_records": 0, "input_bytes": 0},
                )
                d["shuffle_bytes"] += sw.get("Shuffle Bytes Written", 0)
                d["shuffle_records"] += sw.get("Shuffle Records Written", 0)
                d["input_bytes"] += im.get("Bytes Read", 0)

    table = []
    for name in ran:
        d = agg.get(name, {"shuffle_bytes": 0, "shuffle_records": 0, "input_bytes": 0})
        bpr = d["shuffle_bytes"] / d["shuffle_records"] if d["shuffle_records"] else 0.0
        table.append(
            {
                "query": name,
                "shuffle_mb": round(d["shuffle_bytes"] / 1e6, 2),
                "shuffle_records": d["shuffle_records"],
                "bytes_per_record": round(bpr, 1),
                "input_mb": round(d["input_bytes"] / 1e6, 2),
            }
        )
    table.sort(key=lambda r: -r["shuffle_mb"])
    out = {"sf_dir": sf_dir, "n_queries": len(ran), "queries": table}
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(root, "SHUFFLE_AUDIT.json"), "w") as fh:
        json.dump(out, fh, indent=1)
    print(f"{'query':<28}{'shuf MB':>9}{'records':>12}{'B/rec':>8}{'in MB':>9}")
    for r in table[:30]:
        print(
            f"{r['query']:<28}{r['shuffle_mb']:>9}{r['shuffle_records']:>12}"
            f"{r['bytes_per_record']:>8}{r['input_mb']:>9}"
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
