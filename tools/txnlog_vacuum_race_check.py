"""Vacuum-vs-reader race on the txnlog — axis 25 (round 16, shipped
ahead of its r17 candidacy).

The txnlog's documented sharp edge (sources/txnlog.py module
docstring): a reader that listed _log/ immediately before a vacuum can
fail LOUDLY opening a manifest or data file the vacuum just deleted —
what it must NEVER do is silently read a PARTIAL snapshot (fewer rows
than the version it claims to serve) or a MISLABELED one (another
version's rows). This axis makes both interleavings deterministic with
real reader driver processes and flag files:

1. pinned-reader-loses — the reader resolves version 0's file list,
   then a vacuum truncates history to v1+ (v0's files are unreferenced
   by v1 — seeded via commit_overwrite — so they are physically
   deleted); the reader's subsequent read must be LOUD (missing files)
   or bit-exact v0 — a short count is the silent-partial failure.
2. post-vacuum-pin — read_snapshot(version=0) AFTER the vacuum must
   raise the manifest-gap FileNotFoundError naming the surviving range
   (cross-process re-proof of the unit pin).
3. latest-reader-during-vacuum — a reader loops read_snapshot(latest)
   while the parent vacuums history mid-loop; every successful read
   must be exactly the latest content (vacuum never touches the live
   set); a loud FileNotFoundError is acceptable, wrong rows are not.

Verification inside the readers uses read_snapshot itself (the public
API under test); the parent runs vacuum() in-process (pure Python — no
second SparkSession needed).

Usage: python tools/txnlog_vacuum_race_check.py
"""

from __future__ import annotations

import os
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

_PROBE = r"""
import os, sys, time
sys.path.insert(0, %(repo)r)
mode, table, flags = sys.argv[1:4]
from pyspark.sql import SparkSession
from earthquake_data_pipeline_spark.sources.txnlog import (
    commit_append, commit_overwrite, live_files, read_snapshot)

spark = (SparkSession.builder.master("local[4]")
         .appName("edps-vacuum-race-" + mode)
         .config("spark.sql.shuffle.partitions", "4")
         .config("spark.ui.enabled", "false").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")

def frame(tag, n=200):
    return spark.createDataFrame(
        [(i, tag) for i in range(n)], "k int, val string")

def touch(name):
    open(os.path.join(flags, name), "w").close()

def wait(name, timeout=180):
    p = os.path.join(flags, name)
    t0 = time.time()
    while not os.path.exists(p):
        if time.time() - t0 > timeout:
            raise SystemExit(f"flag-wait timeout on {name}")
        time.sleep(0.01)

if mode == "seed":
    commit_append(frame("v0"), table)           # v0: 200 rows val=v0
    commit_overwrite(frame("v1", 150), table)   # v1: fresh files only
    for tag in ("v2", "v3"):
        commit_overwrite(frame(tag, 150), table)
    print("SEEDED", flush=True)
elif mode == "pin_reader":
    files = live_files(table, 0)                # resolve BEFORE vacuum
    touch("pinned"); wait("go_pin")
    try:
        rows = spark.read.parquet(*files).collect()
        n = len(rows)
        vals = {r.val for r in rows}
        if n == 200 and vals == {"v0"}:
            print("EXACT v0", flush=True)
        else:
            print(f"SHORT n={n} vals={sorted(vals)}", flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"LOUD {type(e).__name__}", flush=True)
elif mode == "post_pin":
    try:
        read_snapshot(spark, table, 0).collect()
        print("SILENT post-vacuum pin served", flush=True)
    except FileNotFoundError as e:
        print(f"LOUD FileNotFoundError: {str(e)[:90]}", flush=True)
elif mode == "latest_reader":
    touch("reading")
    bad = 0; loud = 0; good = 0
    for i in range(30):
        try:
            rows = read_snapshot(spark, table).collect()
        except FileNotFoundError:
            loud += 1
            continue
        vals = {r.val for r in rows}
        if len(rows) == 150 and vals == {"v3"}:
            good += 1
        else:
            bad += 1
            print(f"WRONG read {i}: n={len(rows)} vals={sorted(vals)}",
                  flush=True)
        time.sleep(0.02)
    print(f"LATEST good={good} loud={loud} bad={bad}", flush=True)
else:
    raise SystemExit("unknown mode " + mode)
spark.stop()
""" % {"repo": REPO}


def _run(mode: str, table: str, flags: str, background: bool = False):
    args = [sys.executable, "-c", _PROBE, mode, table, flags]
    if background:
        return subprocess.Popen(args, cwd=REPO, stdout=subprocess.PIPE,
                                stderr=subprocess.PIPE, text=True)
    return subprocess.run(args, cwd=REPO, capture_output=True, text=True,
                          timeout=600)


def _wait_flag(flags: str, name: str, timeout: float = 180) -> None:
    p = os.path.join(flags, name)
    t0 = time.time()
    while not os.path.exists(p):
        if time.time() - t0 > timeout:
            raise AssertionError(f"flag-wait timeout on {name}")
        time.sleep(0.02)


def main() -> int:
    from earthquake_data_pipeline_spark.sources.txnlog import vacuum

    root = tempfile.mkdtemp(prefix="edps_vacrace_")
    table = os.path.join(root, "tbl")
    flags = os.path.join(root, "flags")
    os.makedirs(flags)
    rc = 0
    try:
        seeded = _run("seed", table, flags)
        if seeded.returncode != 0 or "SEEDED" not in seeded.stdout:
            print(f"FAIL seeding: {seeded.stderr[-300:]}")
            return 1

        # 1. pinned reader vs vacuum (deterministic interleaving)
        reader = _run("pin_reader", table, flags, background=True)
        _wait_flag(flags, "pinned")
        deleted = vacuum(table, keep_after_version=0, staging_grace_s=0)
        open(os.path.join(flags, "go_pin"), "w").close()
        out, err = reader.communicate(timeout=600)
        verdict = next((ln for ln in out.splitlines()
                        if ln.startswith(("EXACT", "SHORT", "LOUD"))), None)
        ok1 = verdict is not None and not verdict.startswith("SHORT")
        print(f"{'PASS' if ok1 else 'FAIL'} pinned-reader-loses: "
              f"{verdict!r} (vacuum deleted {len(deleted)} files)")
        rc |= 0 if ok1 else 1

        # 2. post-vacuum pinned read must raise the manifest-gap error
        post = _run("post_pin", table, flags)
        line = next((ln for ln in post.stdout.splitlines()
                     if ln.startswith(("LOUD", "SILENT"))), "no verdict")
        ok2 = line.startswith("LOUD")
        print(f"{'PASS' if ok2 else 'FAIL'} post-vacuum-pin: {line}")
        rc |= 0 if ok2 else 1

        # 3. latest reader during a concurrent vacuum (stochastic):
        #    latest content must never be wrong. Re-seed history first
        #    (v4..v7 overwrites of identical latest content so the
        #    reader's expectation stays v3-shaped... use fresh table)
        table2 = os.path.join(root, "tbl2")
        flags2 = os.path.join(root, "flags2")
        os.makedirs(flags2)
        seeded = _run("seed", table2, flags2)
        if seeded.returncode != 0:
            print(f"FAIL seeding tbl2: {seeded.stderr[-300:]}")
            return 1
        reader = _run("latest_reader", table2, flags2, background=True)
        _wait_flag(flags2, "reading")
        time.sleep(0.3)  # land mid-loop
        deleted = vacuum(table2, keep_after_version=2, staging_grace_s=0)
        out, err = reader.communicate(timeout=600)
        summary = next((ln for ln in out.splitlines()
                        if ln.startswith("LATEST")), "no summary")
        ok3 = (reader.returncode == 0 and "bad=0" in summary
               and "good=" in summary and "good=0" not in summary)
        print(f"{'PASS' if ok3 else 'FAIL'} latest-reader-during-vacuum: "
              f"{summary} (vacuum deleted {len(deleted)} files)")
        rc |= 0 if ok3 else 1
    finally:
        import shutil

        shutil.rmtree(root, ignore_errors=True)
    if rc == 0:
        print("vacuum-race: 3/3 — stale pins loud or exact, never partial; "
              "latest reads never wrong under concurrent vacuum")
    return rc


if __name__ == "__main__":
    raise SystemExit(main())
