"""Concurrent-writer contention on the txnlog MERGE path — axis 23 (r16).

The txnlog crash matrix (tools/ + tests) proves single-writer kills at
every commit step; this axis races TWO real driver processes at the
same table (VERDICT r15 item 4). The contract under test (documented
winner semantics, sources/txnlog.py):

- **Appends serialize.** commit_append retries version minting on a
  manifest collision — appends commute, so both writers' batches must
  all land, each exactly once, under distinct contiguous versions.
- **Snapshot-based commits are optimistic, first-to-publish wins.**
  commit_overwrite / merge_commit pin the base version AT SNAPSHOT
  READ; publish is an exclusive link at base+1. An interleaved writer
  (read the same base, publish second) must raise
  ConcurrentCommitError LOUDLY — never silently drop the winner's
  committed version (the lost-update shape: removing only the files
  the stale snapshot saw while minting a fresh version number).
- **Serialized re-read wins.** A loser that re-reads the new latest
  snapshot and re-merges commits cleanly on top.

Cases (each its own table; writers are subprocesses with their own
SparkSessions, coordinated by flag files so both interleavings are
DETERMINISTIC, not stochastic):

1. append-race  — both writers append K batches concurrently from a
                  start barrier; expect 2K committed versions, final
                  live rows == the union, exactly once.
2. merge-conflict — A and B both read v0; A publishes first; B's
                  pinned-base publish must raise ConcurrentCommitError;
                  final table == A's merge only.
3. merge-serialized — B re-runs merge_commit AFTER A committed; both
                  land; final table == B's update over A's over init.
4. merge-retry-loop — both writers run merge_commit with a
                  retry-on-conflict loop; all merges eventually land;
                  final per-key value == the tag of the LAST successful
                  version that touched the key (replay of the writers'
                  COMMITTED lines in version order).

Verification reads the final live set with DuckDB over live_files()
(no parent SparkSession), so the check is independent of the engine
under test.

Usage: python tools/txnlog_race_check.py
"""

from __future__ import annotations

import os
import re
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

K_APPENDS = 4

_WRITER = r"""
import os, sys, time
sys.path.insert(0, %(repo)r)
table, tag, mode, flags = sys.argv[1:5]
from pyspark.sql import SparkSession
from earthquake_data_pipeline_spark.sources.txnlog import (
    ConcurrentCommitError, commit_append, commit_overwrite, merge_commit,
    read_snapshot, latest_version)
from earthquake_data_pipeline_spark.operators.merge import upsert_merge

spark = (SparkSession.builder.master("local[4]")
         .appName("edps-txnlog-race-" + tag)
         .config("spark.sql.shuffle.partitions", "4")
         .config("spark.ui.enabled", "false")
         .getOrCreate())
spark.sparkContext.setLogLevel("ERROR")

def frame(rows):
    return spark.createDataFrame(rows, "k int, val string")

def touch(name):
    open(os.path.join(flags, name), "w").close()

def wait(name, timeout=120):
    p = os.path.join(flags, name)
    t0 = time.time()
    while not os.path.exists(p):
        if time.time() - t0 > timeout:
            raise SystemExit(f"flag-wait timeout on {name}")
        time.sleep(0.01)

lo, hi = (0, 50) if tag == "A" else (25, 75)
update = frame([(k, tag) for k in range(lo, hi)])

if mode == "append":
    touch("ready_" + tag); wait("go")
    for i in range(%(k_appends)d):
        v = commit_append(frame([(1000 * (1 if tag == "A" else 2) + i,
                                  tag)]), table)
        print(f"COMMITTED version={v} tag={tag} batch={i}", flush=True)
elif mode == "merge_first":
    # pinned-base conflict interleaving: both writers read v_base, the
    # parent lets A publish, then releases B, whose publish MUST fail
    base = latest_version(table)
    merged = upsert_merge(read_snapshot(spark, table, base), update, ["k"])
    merged = merged.localCheckpoint()  # freeze the plan pre-publish
    touch("read_" + tag); wait("go_" + tag)
    try:
        v = commit_overwrite(merged, table, base_version=base)
        print(f"COMMITTED version={v} tag={tag}", flush=True)
    except ConcurrentCommitError as e:
        print(f"CONFLICT tag={tag} {type(e).__name__}: {e}", flush=True)
elif mode == "merge_after":
    wait("go_" + tag)
    v = merge_commit(update, table, ["k"])
    print(f"COMMITTED version={v} tag={tag}", flush=True)
elif mode == "merge_retry":
    touch("ready_" + tag); wait("go")
    for attempt in range(10):
        try:
            v = merge_commit(update, table, ["k"])
            print(f"COMMITTED version={v} tag={tag}", flush=True)
            break
        except ConcurrentCommitError:
            print(f"RETRY tag={tag} attempt={attempt}", flush=True)
            time.sleep(0.05)
    else:
        raise SystemExit("retry budget exhausted")
else:
    raise SystemExit("unknown mode " + mode)
spark.stop()
""" % {"repo": REPO, "k_appends": K_APPENDS}


def _spawn(table: str, tag: str, mode: str, flags: str):
    return subprocess.Popen(
        [sys.executable, "-c", _WRITER, table, tag, mode, flags],
        cwd=REPO, stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
    )


def _seed_table(table: str) -> None:
    """Initial version: keys 0..99 val='init', written by a throwaway
    driver so every racing writer starts from the same v0."""
    probe = (
        "import sys; sys.path.insert(0, %r)\n"
        "from pyspark.sql import SparkSession\n"
        "from earthquake_data_pipeline_spark.sources.txnlog import "
        "commit_append\n"
        "spark = (SparkSession.builder.master('local[2]')"
        ".config('spark.ui.enabled','false')"
        ".config('spark.sql.shuffle.partitions','2').getOrCreate())\n"
        "spark.sparkContext.setLogLevel('ERROR')\n"
        "df = spark.createDataFrame([(k, 'init') for k in range(100)],"
        " 'k int, val string')\n"
        "commit_append(df, %r)\n"
        "spark.stop()\n" % (REPO, table)
    )
    subprocess.run([sys.executable, "-c", probe], cwd=REPO, check=True,
                   capture_output=True, text=True, timeout=300)


def _final_rows(table: str) -> dict:
    """{k: val} of the latest snapshot, read via DuckDB over
    live_files() — engine-independent verification."""
    import duckdb

    from earthquake_data_pipeline_spark.sources.txnlog import live_files

    files = live_files(table)
    if not files:
        return {}
    con = duckdb.connect()
    rows = con.execute(
        "SELECT k, val FROM read_parquet(?)", [files]
    ).fetchall()
    out = {}
    for k, val in rows:
        if k in out:
            raise AssertionError(f"duplicate key {k} in live set")
        out[k] = val
    return out


def _drain(procs) -> list[str]:
    lines = []
    for p in procs:
        out, err = p.communicate(timeout=600)
        if p.returncode != 0:
            raise AssertionError(f"writer died rc={p.returncode}: "
                                 f"{err[-400:]}")
        lines += [ln for ln in out.splitlines()
                  if ln.startswith(("COMMITTED", "CONFLICT", "RETRY"))]
    return lines


def _wait_flag(flags: str, name: str, timeout: float = 180) -> None:
    p = os.path.join(flags, name)
    t0 = time.time()
    while not os.path.exists(p):
        if time.time() - t0 > timeout:
            raise AssertionError(f"parent flag-wait timeout on {name}")
        time.sleep(0.02)


def _touch(flags: str, name: str) -> None:
    open(os.path.join(flags, name), "w").close()


def case_append_race(root: str) -> tuple[bool, str]:
    table = os.path.join(root, "t_append")
    flags = os.path.join(root, "f_append")
    os.makedirs(flags)
    _seed_table(table)
    a = _spawn(table, "A", "append", flags)
    b = _spawn(table, "B", "append", flags)
    _wait_flag(flags, "ready_A")
    _wait_flag(flags, "ready_B")
    _touch(flags, "go")
    lines = _drain([a, b])
    committed = [ln for ln in lines if ln.startswith("COMMITTED")]
    versions = sorted(int(re.search(r"version=(\d+)", ln).group(1))
                      for ln in committed)
    rows = _final_rows(table)
    tagged = {k: v for k, v in rows.items() if k >= 1000}
    want = {1000 + i: "A" for i in range(K_APPENDS)}
    want.update({2000 + i: "B" for i in range(K_APPENDS)})
    ok = (len(committed) == 2 * K_APPENDS
          and versions == list(range(1, 2 * K_APPENDS + 1))
          and tagged == want
          and all(rows.get(k) == "init" for k in range(100)))
    return ok, (f"{len(committed)} commits, versions {versions}, "
                f"{len(tagged)}/{2 * K_APPENDS} tagged rows exact")


def case_merge_conflict(root: str) -> tuple[bool, str]:
    table = os.path.join(root, "t_conflict")
    flags = os.path.join(root, "f_conflict")
    os.makedirs(flags)
    _seed_table(table)
    a = _spawn(table, "A", "merge_first", flags)
    b = _spawn(table, "B", "merge_first", flags)
    _wait_flag(flags, "read_A")
    _wait_flag(flags, "read_B")   # both hold the SAME base snapshot
    _touch(flags, "go_A")
    # A must publish before B is released
    t0 = time.time()
    while time.time() - t0 < 180:
        if os.path.exists(os.path.join(table, "_log", f"{1:012d}.json")):
            break
        time.sleep(0.02)
    else:
        raise AssertionError("A never published v1")
    _touch(flags, "go_B")
    lines = _drain([a, b])
    a_won = any("COMMITTED version=1 tag=A" in ln for ln in lines)
    b_loud = any(ln.startswith("CONFLICT tag=B") for ln in lines)
    rows = _final_rows(table)
    want = {k: ("A" if k < 50 else "init") for k in range(100)}
    ok = a_won and b_loud and rows == want
    return ok, (f"A committed v1={a_won}, B conflict loud={b_loud}, "
                f"final == A-only merge={rows == want}")


def case_merge_serialized(root: str) -> tuple[bool, str]:
    table = os.path.join(root, "t_serial")
    flags = os.path.join(root, "f_serial")
    os.makedirs(flags)
    _seed_table(table)
    a = _spawn(table, "A", "merge_after", flags)
    _touch(flags, "go_A")
    lines = _drain([a])
    if not any("COMMITTED version=1 tag=A" in ln for ln in lines):
        return False, f"A failed to commit: {lines}"
    b = _spawn(table, "B", "merge_after", flags)
    _touch(flags, "go_B")
    lines += _drain([b])
    rows = _final_rows(table)
    want = {k: ("B" if 25 <= k < 75 else "A" if k < 25 else "init")
            for k in range(100)}
    ok = (any("COMMITTED version=2 tag=B" in ln for ln in lines)
          and rows == want)
    return ok, f"sequential merges v1,v2; final layered correctly={ok}"


def case_merge_retry(root: str) -> tuple[bool, str]:
    table = os.path.join(root, "t_retry")
    flags = os.path.join(root, "f_retry")
    os.makedirs(flags)
    _seed_table(table)
    a = _spawn(table, "A", "merge_retry", flags)
    b = _spawn(table, "B", "merge_retry", flags)
    _wait_flag(flags, "ready_A")
    _wait_flag(flags, "ready_B")
    _touch(flags, "go")
    lines = _drain([a, b])
    committed = sorted(
        ((int(re.search(r"version=(\d+)", ln).group(1)),
          re.search(r"tag=(\w)", ln).group(1))
         for ln in lines if ln.startswith("COMMITTED")),
    )
    if len(committed) != 2 or len({v for v, _ in committed}) != 2:
        return False, f"expected 2 distinct committed versions: {committed}"
    # replay winner semantics: last successful version to touch a key wins
    want = {k: "init" for k in range(100)}
    for _, tag in committed:
        lo, hi = (0, 50) if tag == "A" else (25, 75)
        for k in range(lo, hi):
            want[k] = tag
    rows = _final_rows(table)
    retries = sum(1 for ln in lines if ln.startswith("RETRY"))
    ok = rows == want
    return ok, (f"commits={committed} retries={retries} "
                f"final == version-order replay={ok}")


def main() -> int:
    root = tempfile.mkdtemp(prefix="edps_txnlog_race_")
    rc = 0
    cases = [
        ("append-race", case_append_race),
        ("merge-conflict", case_merge_conflict),
        ("merge-serialized", case_merge_serialized),
        ("merge-retry-loop", case_merge_retry),
    ]
    try:
        for name, fn in cases:
            try:
                ok, detail = fn(root)
            except AssertionError as e:
                ok, detail = False, f"harness assertion: {e}"
            print(f"{'PASS' if ok else 'FAIL'} {name}: {detail}", flush=True)
            rc |= 0 if ok else 1
    finally:
        import shutil

        shutil.rmtree(root, ignore_errors=True)
    if rc == 0:
        print("txnlog-race: 4/4 — appends serialize, stale merge loud, "
              "re-read serializes, retry loop converges")
    return rc


if __name__ == "__main__":
    raise SystemExit(main())
