"""Streaming checkpoint-recovery chaos — twentieth hostile axis (r15).

The untested half of I1/I3's exactly-once story (VERDICT r14 item 6):
the txnlog crash matrix proves the BATCH merge path across kill points,
but the Structured Streaming checkpoint path — state store + offset/
commit log + sink semantics across a driver kill — has only ever run
kill-free. This axis SIGKILLs an availableNow stream after >= K
committed micro-batches (while later batches are in flight), restarts
it from the same checkpoint directory, lets it drain, and requires the
final sink to be oracle-equal with the batch answer over the SAME
input — duplicates injected across micro-batch files so replay has
something real to get wrong.

Three stream shapes x two kill points (after commit 1 / after commit 3),
each exercising a DIFFERENT recovery mechanism:

- merge     — streaming/incremental.py::foreach_batch_merge (I3): the
              anti-join-before-append contract. The dangerous replay is
              a batch whose parquet append COMMITTED but whose
              checkpoint commit did not — re-delivery must insert zero
              duplicate keys.
- dedup     — streaming/incremental.py::streaming_dedup (I1) into the
              parquet FILE SINK: dropDuplicates state must survive the
              restart AND the file-sink _spark_metadata manifest must
              exclude any uncommitted part files a killed batch left.
              Verification reads the sink THROUGH Spark (the manifest
              is the contract; raw-globbing the directory would count
              orphans the sink's own reader never serves).
- windowagg — streaming/incremental.py::windowed_event_counts (I2) in
              complete mode via a foreachBatch overwrite: aggregation
              state must resume from the checkpoint (already-committed
              input files are NOT re-read after restart, so a lost
              state store would silently UNDERCOUNT — the silent-wrong
              shape this axis exists to catch).
- statetotals — streaming/incremental.py::running_user_totals: the
              CUSTOM stateful operator (applyInPandasWithState). Its
              (count, sum) state lives in the state store keyed by the
              group-by hash; after the kill the store must reload the
              last COMMITTED version (an uncommitted batch's update
              rolled back, then recomputed deterministically on
              replay). Sink: foreachBatch appends update rows stamped
              with the epoch id; the final per-key state is the
              max-epoch row (a replayed epoch re-appends IDENTICAL
              content — deterministic recompute from the restored
              state version — so the exact-duplicate rows are
              harmless). v = event_id % 97 keeps every sum
              integer-valued in float64, so the oracle is exact.

Input: events.parquet at the gate SF, ts-ordered, split into 16 files;
every file after the first also re-delivers the previous file's last
40 rows (same event_id, same ts — the at-least-once transport shape).
Lateness is set far past the corpus span so watermark late-drops can
never masquerade as dedup and the batch oracle stays exact.

Kill protocol: the parent polls <ckpt>/commits/ and SIGKILLs the probe
process as soon as >= K commit files exist — the kill lands while a
later micro-batch is mid-flight (maxFilesPerTrigger=1 keeps batches
small and numerous). A probe that finishes before the kill is
classified KILL-LATE (a protocol failure, rc=1, not a pass); a restart
that cannot make progress is PROBE-DEAD via timeout.

Usage: python tools/stream_chaos_check.py [sf_dir] [shape ...]
"""

from __future__ import annotations

import json
import os
import shutil
import signal
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SHAPES = ["merge", "dedup", "windowagg", "statetotals"]
KILL_AFTER_COMMITS = [1, 3]
N_FILES = 16
REDELIVER_ROWS = 40

# The probe runs in a subprocess so SIGKILL hits a real driver JVM the
# way a spot preemption would. argv: shape, input_dir, work_dir, phase
# (run|verify). "run" starts the stream availableNow and drains (or is
# killed); "verify" restarts from the same checkpoint, drains, then
# prints the sink summary through the proper reader.
_PROBE = r"""
import sys, time
shape, input_dir, work, phase = sys.argv[1:5]
sys.path.insert(0, %(repo)r)
from pyspark.sql import SparkSession, functions as F
from earthquake_data_pipeline_spark.qcommon import normalize_events_ts

spark = (SparkSession.builder.master("local[8]")
         .appName("edps-stream-chaos")
         .config("spark.sql.shuffle.partitions", "8")
         .config("spark.sql.session.timeZone", "UTC")
         .config("spark.ui.enabled", "false")
         .getOrCreate())
spark.sparkContext.setLogLevel("ERROR")

import os as _os
# schema from a pristine sidecar when present (the file-source tamper
# axis corrupts input files; batch-inferring schema over the whole
# input dir would re-read them OUTSIDE the stream under test)
_schema_ref = work + "/schema_ref.parquet"
schema = spark.read.parquet(
    _schema_ref if _os.path.exists(_schema_ref) else input_dir
).schema
raw = (spark.readStream.schema(schema)
       .option("maxFilesPerTrigger", "1")
       .parquet(input_dir))
ev = normalize_events_ts(raw)
ckpt = work + "/ckpt"
sink = work + "/sink"

if phase == "verify":
    # restart guard (r16): every resume audits the checkpoint's pending
    # pinned inputs first — the documented caller contract for shapes
    # whose writers don't construct it themselves
    from earthquake_data_pipeline_spark.streaming.incremental import (
        audit_checkpoint_inputs)
    audit_checkpoint_inputs(ckpt)

if shape == "merge":
    from earthquake_data_pipeline_spark.streaming.incremental import (
        foreach_batch_merge)
    q = (foreach_batch_merge(ev, sink, ["event_id"], ckpt)
         .trigger(availableNow=True).start())
elif shape == "dedup":
    from earthquake_data_pipeline_spark.streaming.incremental import (
        streaming_dedup)
    ded = streaming_dedup(ev, ["event_id"], "ts", lateness="4000 days")
    q = (ded.select("event_id", "user_id", "event_type")
         .writeStream.outputMode("append").format("parquet")
         .option("path", sink).option("checkpointLocation", ckpt)
         .trigger(availableNow=True).start())
elif shape == "windowagg":
    from earthquake_data_pipeline_spark.streaming.incremental import (
        windowed_event_counts)
    agg = windowed_event_counts(ev, "ts", window="1 day",
                                lateness="4000 days",
                                group_cols=("event_type",))
    def overwrite(batch, epoch_id):
        batch.write.mode("overwrite").parquet(sink)
    q = (agg.writeStream.outputMode("complete").foreachBatch(overwrite)
         .option("checkpointLocation", ckpt)
         .trigger(availableNow=True).start())
elif shape == "statetotals":
    from pyspark.sql import functions as SF
    from earthquake_data_pipeline_spark.streaming.incremental import (
        running_user_totals)
    kv = ev.select(ev.user_id.cast("string").alias("k"),
                   (ev.event_id %% 97).cast("double").alias("v"))
    tot = running_user_totals(kv, key_col="k", value_col="v")
    def stamp(batch, epoch_id):
        (batch.withColumn("epoch", SF.lit(epoch_id))
              .write.mode("append").parquet(sink))
    q = (tot.writeStream.outputMode("update").foreachBatch(stamp)
         .option("checkpointLocation", ckpt)
         .trigger(availableNow=True).start())
else:
    raise SystemExit(f"unknown shape {shape}")

q.awaitTermination()

if phase == "verify":
    # read the sink through Spark: the parquet FILE SINK's
    # _spark_metadata manifest is its exactly-once contract, and only
    # Spark's reader honors it (dedup shape); the other sinks are
    # plain directories where this read is equivalent to any other
    out = spark.read.parquet(sink)
    if shape == "statetotals":
        from pyspark.sql import Window as W
        latest = (out.withColumn(
                      "rn", F.row_number().over(
                          W.partitionBy("k").orderBy(F.desc("epoch"))))
                  .filter("rn = 1"))
        row = latest.agg(
            F.count("*").alias("nk"),
            F.sum("n_events").alias("n"),
            F.sum("total_value").cast("decimal(38,0)").alias("t"),
        ).first()
        print(f"FINAL nk={row['nk']} n={row['n']} t={int(row['t'])}",
              flush=True)
    elif shape == "windowagg":
        # epoch-SECONDS x count in decimal: epoch-us x count overflows
        # a long at ~1e20 (ANSI mode fails loud; the fix is exact width)
        ws = (F.unix_micros("window_start") / F.lit(1_000_000)).cast("long")
        row = out.agg(
            F.count("*").alias("n"),
            F.sum("n_events").alias("total"),
            F.sum(ws.cast("decimal(38,0)") * F.col("n_events"))
             .cast("decimal(38,0)").alias("wsum"),
        ).first()
        print(f"FINAL n={row['n']} total={row['total']} "
              f"wsum={int(row['wsum'])}", flush=True)
    else:
        # decimal(38,0) sums (ADVICE r15): the DuckDB oracle widens both
        # checksums to HUGEINT, but a LONG sum of event_id^2 on the
        # Spark side overflows silently at a larger sf_dir (the probe
        # session does not force ANSI) and would report a spurious
        # MISMATCH — exact width on both sides, as the windowagg shape
        # already does for wsum.
        eid = F.col("event_id").cast("decimal(38,0)")
        row = out.agg(
            F.count("*").alias("n"),
            F.count_distinct("event_id").alias("nd"),
            F.sum(eid).cast("decimal(38,0)").alias("s"),
            F.sum(eid * eid).cast("decimal(38,0)").alias("s2"),
        ).first()
        print(f"FINAL n={row['n']} nd={row['nd']} s={int(row['s'])} "
              f"s2={int(row['s2'])}", flush=True)
spark.stop()
""" % {"repo": REPO}


def _prepare_input(sf_dir: str, input_dir: str) -> None:
    """ts-ordered 16-way split with cross-file re-deliveries."""
    import duckdb

    os.makedirs(input_dir, exist_ok=True)
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE ev AS SELECT * FROM read_parquet(?) "
        "ORDER BY ts, event_id",
        [f"{sf_dir}/events.parquet"],
    )
    n = con.execute("SELECT count(*) FROM ev").fetchone()[0]
    chunk = (n + N_FILES - 1) // N_FILES
    for i in range(N_FILES):
        lo, hi = i * chunk, min((i + 1) * chunk, n)
        dup = (
            f" UNION ALL (SELECT * FROM ev LIMIT {REDELIVER_ROWS} "
            f"OFFSET {max(lo - REDELIVER_ROWS, 0)})"
            if i > 0 else ""
        )
        con.execute(
            f"COPY ((SELECT * FROM ev LIMIT {hi - lo} OFFSET {lo}){dup}) "
            f"TO '{input_dir}/part-{i:03d}.parquet' (FORMAT PARQUET)"
        )


def _oracle(shape: str, input_dir: str) -> str:
    import duckdb

    con = duckdb.connect()
    glob = f"{input_dir}/part-*.parquet"
    if shape == "statetotals":
        row = con.execute(
            "SELECT count(DISTINCT user_id), count(*),"
            " sum(event_id % 97) FROM read_parquet(?)",
            [glob],
        ).fetchone()
        return f"FINAL nk={row[0]} n={int(row[1])} t={int(row[2])}"
    if shape == "windowagg":
        row = con.execute(
            "WITH w AS (SELECT epoch_us(date_trunc('day', ts)) // 1000000"
            " AS ws, event_type FROM read_parquet(?)),"
            " g AS (SELECT ws, event_type, count(*) AS c FROM w"
            " GROUP BY 1, 2)"
            " SELECT count(*), sum(c), sum(ws * c) FROM g",
            [glob],
        ).fetchone()
        return f"FINAL n={row[0]} total={int(row[1])} wsum={int(row[2])}"
    row = con.execute(
        "WITH d AS (SELECT DISTINCT event_id FROM read_parquet(?))"
        " SELECT count(*), count(*), sum(event_id),"
        " sum(event_id * event_id) FROM d",
        [glob],
    ).fetchone()
    return f"FINAL n={row[0]} nd={row[1]} s={row[2]} s2={row[3]}"


def _spawn(shape: str, input_dir: str, work: str, phase: str):
    return subprocess.Popen(
        [sys.executable, "-c", _PROBE, shape, input_dir, work, phase],
        cwd=REPO, stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
    )


def _kill_after_commits(proc, ckpt: str, k: int, timeout_s: int = 300):
    """SIGKILL proc once >= k commit files exist; returns outcome."""
    commits = os.path.join(ckpt, "commits")
    t0 = time.time()
    while time.time() - t0 < timeout_s:
        if proc.poll() is not None:
            return "KILL-LATE"  # stream finished before the kill landed
        try:
            done = sum(1 for f in os.listdir(commits) if not f.startswith("."))
        except FileNotFoundError:
            done = 0
        if done >= k:
            proc.send_signal(signal.SIGKILL)
            proc.wait()
            return f"KILLED after {done} commits"
        time.sleep(0.02)
    proc.kill()
    proc.wait()
    return "PROBE-DEAD poll timeout"


def run_case(shape: str, kill_k: int, input_dir: str) -> tuple[bool, str]:
    work = tempfile.mkdtemp(prefix=f"edps_chaos_{shape}_{kill_k}_")
    try:
        p = _spawn(shape, input_dir, work, "run")
        outcome = _kill_after_commits(p, os.path.join(work, "ckpt"), kill_k)
        if not outcome.startswith("KILLED"):
            return False, outcome
        try:
            v = subprocess.run(
                [sys.executable, "-c", _PROBE, shape, input_dir, work,
                 "verify"],
                cwd=REPO, capture_output=True, text=True, timeout=600,
            )
        except subprocess.TimeoutExpired:
            return False, f"{outcome}; PROBE-DEAD restart timeout"
        final = next(
            (ln for ln in v.stdout.splitlines() if ln.startswith("FINAL")),
            None,
        )
        if v.returncode != 0 or final is None:
            return False, (f"{outcome}; restart rc={v.returncode} "
                           f"{v.stderr[-400:]}")
        want = _oracle(shape, input_dir)
        if final != want:
            return False, f"{outcome}; MISMATCH got {final!r} want {want!r}"
        return True, f"{outcome}; restart drained; {final}"
    finally:
        shutil.rmtree(work, ignore_errors=True)


def main() -> int:
    args = sys.argv[1:]
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    shapes = args[1:] or SHAPES
    input_dir = tempfile.mkdtemp(prefix="edps_chaos_input_")
    rc = 0
    try:
        _prepare_input(sf_dir, input_dir)
        print(f"input: {N_FILES} ts-ordered files, {REDELIVER_ROWS}-row "
              f"cross-file re-deliveries, from {sf_dir}")
        for shape in shapes:
            for k in KILL_AFTER_COMMITS:
                ok, detail = run_case(shape, k, input_dir)
                status = "PASS" if ok else "FAIL"
                print(f"{status} {shape} kill_after={k}: {detail}",
                      flush=True)
                if not ok:
                    rc = 1
    finally:
        shutil.rmtree(input_dir, ignore_errors=True)
    if rc == 0:
        print(f"stream-chaos: {len(shapes) * len(KILL_AFTER_COMMITS)}/"
              f"{len(shapes) * len(KILL_AFTER_COMMITS)} kill/restart "
              "cases oracle-equal")
    return rc


if __name__ == "__main__":
    raise SystemExit(main())
