"""Vacuum-vs-concurrent-WRITER race on the txnlog — twenty-eighth
hostile axis (round 17, VERDICT r16 item 5).

Axis 25 proved readers racing a vacuum fail loud or read exact; this
axis covers the one interleaving family left: a ``commit_append`` /
``merge_commit`` PUBLISHING while a vacuum squashes the base manifest
and sweeps data files. The contract (documented winner semantics,
sources/txnlog.py::vacuum step 3): **the commit WINS, the vacuum
defers** — a mid-publish commit's data files sit in data/ unreferenced
by any manifest (files rename in BEFORE the manifest publishes), so
they are indistinguishable from crashed-writer orphans; vacuum
age-guards orphans with the same ``staging_grace_s`` as the staging
sweep and deletes only KNOWN-DEAD files (named by a manifest it
listed). Never may the race produce a manifest chain that drops or
orphans the fresh commit's files.

Cases:

1. writer-lands-mid-vacuum (deterministic): the racing commit's first
   half (``_write_data_files`` — the real internal) stages files into
   data/, a default-grace vacuum squashes v0, then the commit's second
   half publishes. The files must survive the vacuum, the publish must
   succeed, and ``read_snapshot(latest)`` must be exact.
2. grace-zero-is-loud (deterministic control): the same interleaving
   under ``staging_grace_s=0`` (the caller EXPLICITLY asserted
   single-writer, so the orphan sweep may take the staged files) —
   the subsequent read must fail LOUD naming missing files, never
   serve a short count.
3. append-loop-vs-vacuum-loop (stochastic, real processes): a child
   driver loops ``commit_append`` (+ one ``merge_commit``) while the
   parent vacuums history repeatedly mid-loop; at the end, latest must
   contain EVERY committed row exactly once — no commit silently
   dropped, no file vanished from the live set.

Usage: python tools/txnlog_vacuum_writer_race_check.py
"""

from __future__ import annotations

import os
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

_WRITER = r"""
import os, sys, time
sys.path.insert(0, %(repo)r)
table, flags, n_appends = sys.argv[1], sys.argv[2], int(sys.argv[3])
from pyspark.sql import SparkSession
from earthquake_data_pipeline_spark.sources.txnlog import commit_append
from earthquake_data_pipeline_spark.sources.txnlog import merge_commit

spark = (SparkSession.builder.master("local[4]")
         .appName("edps-vacwriter-race")
         .config("spark.sql.shuffle.partitions", "4")
         .config("spark.ui.enabled", "false").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")

open(os.path.join(flags, "writing"), "w").close()
for i in range(n_appends):
    df = spark.createDataFrame(
        [(i * 100 + j, f"batch{i}") for j in range(50)], "k long, v string")
    commit_append(df, table)
    time.sleep(0.02)
# one merge on top: upserts 25 existing keys + 25 fresh ones
upd = spark.createDataFrame(
    [(j, "merged") for j in range(25)]
    + [(10_000 + j, "merged") for j in range(25)], "k long, v string")
merge_commit(upd, table, ["k"])
print("WRITER-DONE", flush=True)
spark.stop()
""" % {"repo": REPO}


def main() -> int:
    from pyspark.sql import SparkSession

    from earthquake_data_pipeline_spark.sources import txnlog

    spark = (SparkSession.builder.master("local[4]")
             .appName("edps-vacwriter-parent")
             .config("spark.sql.shuffle.partitions", "4")
             .config("spark.ui.enabled", "false").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    def frame(rows):
        return spark.createDataFrame(rows, "k long, v string")

    root = tempfile.mkdtemp(prefix="edps_vacwriter_")
    rc = 0

    # --- 1. writer-lands-mid-vacuum, default grace: commit wins ---
    t1 = os.path.join(root, "t1")
    txnlog.commit_append(frame([(1, "a"), (2, "b")]), t1)   # v0
    txnlog.commit_overwrite(frame([(9, "z")]), t1)          # v1
    names = txnlog._write_data_files(frame([(10, "y")]), t1)
    deleted = txnlog.vacuum(t1, keep_after_version=0)
    survived = not (set(deleted) & set(names))
    txnlog._commit(t1, names, [])
    got = sorted(r.k for r in txnlog.read_snapshot(spark, t1).collect())
    ok1 = survived and got == [9, 10] and len(deleted) > 0
    print(f"{'PASS' if ok1 else 'FAIL'} writer-lands-mid-vacuum: "
          f"staged files {'survived' if survived else 'DELETED'}, "
          f"known-dead swept={len(deleted)}, latest={got}")
    rc |= 0 if ok1 else 1

    # --- 2. grace-zero control: loss is LOUD, never short ---
    t2 = os.path.join(root, "t2")
    txnlog.commit_append(frame([(1, "a")]), t2)             # v0
    txnlog.commit_overwrite(frame([(9, "z")]), t2)          # v1
    names = txnlog._write_data_files(frame([(10, "y")]), t2)
    deleted = txnlog.vacuum(t2, keep_after_version=0, staging_grace_s=0)
    taken = set(deleted) & set(names)
    txnlog._commit(t2, names, [])
    try:
        rows = txnlog.read_snapshot(spark, t2).collect()
        verdict = f"SILENT: served {sorted(r.k for r in rows)}"
        ok2 = False
    except Exception as e:  # noqa: BLE001 — loud is the requirement
        verdict = f"loud ({type(e).__name__})"
        ok2 = bool(taken)
    print(f"{'PASS' if ok2 else 'FAIL'} grace-zero-is-loud: sweep took "
          f"{len(taken)} staged file(s); read {verdict}")
    rc |= 0 if ok2 else 1

    # --- 3. stochastic: append/merge loop vs vacuum loop ---
    t3 = os.path.join(root, "t3")
    flags = os.path.join(root, "flags")
    os.makedirs(flags)
    txnlog.commit_append(frame([(-1, "seed")]), t3)
    n_appends = 10
    p = subprocess.Popen(
        [sys.executable, "-c", _WRITER, t3, flags, str(n_appends)],
        cwd=REPO, stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True)
    t0 = time.time()
    while not os.path.exists(os.path.join(flags, "writing")):
        if time.time() - t0 > 180:
            p.kill()
            p.communicate()
            print("FAIL append-loop-vs-vacuum: writer never started")
            return 1
        time.sleep(0.02)
    n_vacuums = 0
    while p.poll() is None:
        latest = txnlog.latest_version(t3)
        if latest is not None and latest >= 2:
            txnlog.vacuum(t3, keep_after_version=latest - 1)
            n_vacuums += 1
        time.sleep(0.05)
    out, err = p.communicate()
    if p.returncode != 0 or "WRITER-DONE" not in out:
        print(f"FAIL append-loop-vs-vacuum: writer rc={p.returncode} "
              f"{err[-400:]!r}")
        return 1
    rows = txnlog.read_snapshot(spark, t3).collect()
    by_k = {r.k: r.v for r in rows}
    want_n = 1 + n_appends * 50 + 25  # seed + appends + 25 fresh merge keys
    merged_ok = all(by_k.get(j) == "merged" for j in range(25)) and all(
        by_k.get(10_000 + j) == "merged" for j in range(25))
    appends_ok = all(
        by_k.get(i * 100 + j) is not None
        for i in range(n_appends) for j in range(50))
    ok3 = (len(rows) == want_n and len(by_k) == want_n
           and merged_ok and appends_ok and n_vacuums > 0)
    print(f"{'PASS' if ok3 else 'FAIL'} append-loop-vs-vacuum: "
          f"{len(rows)} rows (want {want_n}), {n_vacuums} vacuums "
          f"interleaved, merge {'exact' if merged_ok else 'WRONG'}, "
          f"appends {'all present' if appends_ok else 'MISSING'}")
    rc |= 0 if ok3 else 1

    import shutil

    shutil.rmtree(root, ignore_errors=True)
    spark.stop()
    if rc == 0:
        print("vacuum-writer-race: 3/3 — commit wins, vacuum defers; "
              "grace-zero loss loud; no commit dropped under "
              "interleaved vacuums")
    return rc


if __name__ == "__main__":
    raise SystemExit(main())
