"""Executor-loss recovery experiment (round-11; VERDICT r10 item 7).

The reuse() docstring claims a recovery-semantics contract per flavor:
reliable checkpoints survive executor loss (files), local checkpoints
fail the job loudly (blocks die with the executor), persist recomputes
through lineage. Until now that contract was documented but never
EXERCISED — ``local[n]`` cannot lose an executor. Spark's
``local-cluster[workers,cores,mem]`` master spawns real worker JVMs
(CoarseGrainedExecutorBackend processes), so the loss path can be
driven for real: pin a frame, ``kill -9`` EVERY executor mid-session
(the master relaunches fresh ones — compute returns, the old block
store does not), act on the pinned frame again, and observe which
flavors survive.

Expected verdicts (each printed as VERDICT <flavor>: ...):
- reliable  -> SURVIVES: the post-kill action re-reads checkpoint
  FILES; no recompute, no failure.
- persist   -> SURVIVES: lost cache blocks recompute through lineage
  (MEMORY_AND_DISK keeps the plan).
- local     -> FAILS LOUDLY: the checkpoint truncated lineage and the
  blocks died with the executor — the documented fatal-by-design
  trade that motivates setting a checkpoint dir on a real cluster.

Usage: python tools/executor_loss_check.py   (takes ~2-3 min; spawns
and kills real JVMs — run alone, not under a test runner)
"""

from __future__ import annotations

import os
import subprocess
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def executor_pids() -> set[int]:
    # pgrep invoked DIRECTLY (no shell wrapper): pgrep excludes its own
    # process, but a `bash -c "pgrep -f PATTERN"` wrapper's command line
    # contains the pattern and matches itself — the first version of
    # this harness "killed" one phantom pid per sweep (review finding).
    out = subprocess.run(
        ["pgrep", "-f", "CoarseGrainedExecutorBackend"],
        capture_output=True,
        text=True,
    ).stdout
    return {int(p) for p in out.split()}


def fresh_session(tag: str):
    from pyspark.sql import SparkSession

    return (
        SparkSession.builder.master("local-cluster[2,2,1024]")
        .appName(f"edps-exec-loss-{tag}")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.shuffle.partitions", "4")
        # fail fast instead of 4 retries when blocks are gone
        .config("spark.task.maxFailures", "2")
        .getOrCreate()
    )


def expensive(spark):
    from pyspark.sql import functions as F

    # wide enough that blocks land on BOTH executors
    return (
        spark.range(0, 200_000, 1, 8)
        .select(
            F.col("id"),
            F.md5(F.col("id").cast("string")).alias("h"),
        )
        .groupBy((F.col("id") % 97).alias("k"))
        .agg(F.count("*").alias("n"), F.max("h").alias("mx"))
    )


def kill_all_executors() -> list[int]:
    """kill -9 every executor JVM. Killing just one under-determines
    the experiment (with few partitions all blocks can land on the
    survivor and every flavor trivially 'survives'); killing all
    guarantees the pinned blocks are gone. The standalone master
    relaunches fresh executors within seconds, so post-kill actions
    have compute available — what they do NOT have is the old block
    store."""
    pids = sorted(executor_pids())
    assert pids, "no executor processes found to kill"
    for p in pids:
        try:
            os.kill(p, 9)
        except ProcessLookupError:
            pass
    time.sleep(8)  # let the master notice and relaunch
    return pids


def run_flavor(flavor: str) -> str:
    os.environ["SPARK_GRAFT_REUSE"] = flavor
    spark = fresh_session(flavor)
    try:
        from earthquake_data_pipeline_spark.qcommon import reuse

        if flavor == "reliable":
            ckdir = tempfile.mkdtemp(prefix="edps-exec-loss-ck-")
            spark.sparkContext.setCheckpointDir(ckdir)
        pinned = reuse(expensive(spark), eager=True)
        before = sorted((r["k"], r["n"], r["mx"]) for r in pinned.collect())
        victims = kill_all_executors()
        try:
            after = sorted((r["k"], r["n"], r["mx"]) for r in pinned.collect())
            ok = after == before
            return (
                f"SURVIVES (killed pids {victims}; post-kill action "
                f"returned {'identical' if ok else 'DIFFERENT'} results)"
                if ok
                else "SURVIVES-BUT-WRONG"
            )
        except Exception as e:  # noqa: BLE001 - the experiment records it
            return f"FAILS LOUDLY (killed pids {victims}; {type(e).__name__})"
    finally:
        try:
            spark.stop()
        except Exception:
            pass
        time.sleep(3)


def run_mid_stage_kill() -> str:
    """Live task-retry determinism: kill every executor WHILE a job is
    running (not between actions). The standalone master relaunches
    executors, Spark retries the dead tasks, and the job must complete
    with results identical to an undisturbed run — the property the
    round-10 retry-determinism audit verified by inspection, driven
    here for real. The job is a deterministic md5-heavy aggregate over
    64 partitions (~10 s undisturbed) so the kill reliably lands
    mid-stage."""
    import threading

    from pyspark.sql import functions as F

    os.environ["SPARK_GRAFT_REUSE"] = "auto"
    spark = fresh_session("midstage")
    try:
        def job():
            return (
                spark.range(0, 400_000, 1, 64)
                .select(
                    (F.col("id") % 193).alias("k"),
                    F.md5(F.md5(F.col("id").cast("string"))).alias("h"),
                )
                .groupBy("k")
                .agg(F.count("*").alias("n"), F.max("h").alias("mx"))
            )

        baseline = sorted((r["k"], r["n"], r["mx"]) for r in job().collect())
        killed: list[int] = []

        def killer():
            time.sleep(2)  # land inside the stage
            killed.extend(kill_all_executors())

        t = threading.Thread(target=killer)
        t.start()
        try:
            disturbed = sorted(
                (r["k"], r["n"], r["mx"]) for r in job().collect()
            )
        except Exception as e:  # noqa: BLE001 - the experiment records it
            t.join()
            return f"JOB FAILED under mid-stage kill ({type(e).__name__})"
        t.join()
        if not killed:
            return "INCONCLUSIVE (no executors killed — job too fast?)"
        ok = disturbed == baseline
        return (
            f"SURVIVES mid-stage kill of pids {killed}: task retries "
            f"returned {'identical' if ok else 'DIFFERENT'} results"
        )
    finally:
        try:
            spark.stop()
        except Exception:
            pass


def main() -> int:
    for flavor in ("reliable", "persist", "local"):
        verdict = run_flavor(flavor)
        print(f"VERDICT {flavor}: {verdict}", flush=True)
    print(f"VERDICT mid-stage-retry: {run_mid_stage_kill()}", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
