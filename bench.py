"""Benchmark runner — the driver's per-round perf gate.

Runs every driver query at $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1)
on local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:
{"metric": ..., "value": total_sec, "unit": "sec", "queries": {...}, "sf": ...}

Execution uses the noop sink — full plan execution (including sorts) with no
driver-side collection, so timings measure the engine, not Arrow transfer.

Artifact contract (round-6 fix for the r05 truncation): the driver records
only the LAST 2000 characters of stdout, and the full per-query dict for 90+
queries exceeds that — r05's BENCH artifact lost the first ~9 timings and
failed to parse. So the COMPLETE per-query JSON is written to BENCH_FULL.json
(repo root; the driver commits uncommitted files each round, so it is durable
and readable by the judge), and the stdout line is kept parseable inside the
capture window: its "queries" dict holds the SLOWEST queries that fit a
conservative budget (the ones that matter for the 2x perf bar), plus
"full": "BENCH_FULL.json" pointing at the complete artifact and "n_queries"
giving the true catalog size.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from earthquake_data_pipeline_spark.driver_queries import QUERIES
from earthquake_data_pipeline_spark.session import get_spark

# The driver keeps tail-2000 of stdout; leave headroom for the trailing
# newline and any stray runtime warning that might land after our line.
_STDOUT_BUDGET = 1900
_FULL_PATH = os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH_FULL.json")

# Noise-protocol threshold (VERDICT r07 item 7, DESIGN.md): co-tenant
# 1-min loadavg ABOVE this fraction of the host's CPUs, sampled BEFORE
# Spark starts (in-run load is dominated by our own executors), marks
# the sweep noisy — the r06/r07 drift false-alarms all occurred at
# pre-load 4-9 on 32 CPUs, i.e. ratios 0.125-0.28.
_NOISY_LOAD_RATIO = 0.125


def load_noisy(load1: float, cpus: int) -> bool:
    """True when the pre-sweep 1-minute loadavg says co-tenants are
    active enough to swing per-query timings past the noise protocol's
    adjudication bar (±10-15% scattered, singletons to +80%)."""
    return load1 / max(cpus, 1) > _NOISY_LOAD_RATIO


def order_fingerprint(names: list[str]) -> str:
    """12-hex fingerprint of the exact run order (VERDICT r14 item 4):
    total query wall is order-sensitive by ~±8% through JIT/warmup
    placement alone, so cross-round deltas are only admissible between
    sweeps with the SAME direction and catalog order. The fingerprint
    makes that check mechanical (tools/bench_compare.py refuses
    mismatches) instead of prose in SURVEY entry 79."""
    import hashlib

    return hashlib.sha256("\n".join(names).encode()).hexdigest()[:12]


def _compact_line(
    timings: dict[str, float], total: float, sf: float, noisy: bool = False,
    direction: str = "forward", fingerprint: str = "",
) -> str:
    """One JSON line guaranteed under the driver's stdout capture window.

    Queries are admitted slowest-first (greedy) until the serialized line
    would exceed the budget — at 90+ catalog entries roughly the fastest
    ~15% (all sub-0.2 s) drop out, exactly the ones irrelevant to the
    perf bar. The complete dict always lives in BENCH_FULL.json.
    """
    base = {
        "metric": "total_query_wall_seconds",
        "value": total,
        "unit": "sec",
        "queries": {},
        "n_queries": len(timings),
        "full": "BENCH_FULL.json",
        "sf": sf,
        "direction": direction,
        "order_fingerprint": fingerprint,
    }
    if noisy:  # flag rides the stdout line only when it matters
        base["noisy"] = True
    line = json.dumps(base, separators=(",", ":"))
    shown: dict[str, float] = {}
    for name, t in sorted(timings.items(), key=lambda kv: -kv[1]):
        cost = len(name) + len(f"{t}") + 4  # "name":t, quotes+colon+comma
        if len(line) + cost > _STDOUT_BUDGET:
            break
        shown[name] = t
        base["queries"] = shown
        line = json.dumps(base, separators=(",", ":"))
    return line


def _calibrate_ms() -> float:
    """Single-thread CPU calibration: wall time of a fixed integer spin.

    The pre-sweep loadavg gate cannot see co-tenants that ARRIVE
    mid-sweep (loadavg_pre samples before Spark starts, and in-run
    loadavg is dominated by our own executors). A fixed spin timed
    before AND after the sweep separates the cases mechanically: our
    own executors are idle at both sample points, so a post/pre ratio
    well above 1 means someone else is eating the cores — the round-10
    137.9 s ghost sweep (quiet pre-load, +18% scattered elevation)
    would have shown it.

    min-of-3 consecutive spins per sample point (ADVICE r10): a
    one-shot spin can land on a momentary scheduler hiccup (GC, page
    cache flush) and flip cal_noisy on an otherwise-quiet sweep — or a
    lucky single post-sample can miss real co-tenancy. The minimum is
    robust to transient preemption (a preempted spin only ever reads
    HIGH), so both false directions shrink.
    """

    def spin() -> float:
        t0 = time.perf_counter()
        acc = 0
        for i in range(2_000_000):
            acc += i ^ (i >> 3)
        _ = acc
        return time.perf_counter() - t0

    return round(min(spin() for _ in range(3)) * 1000, 2)


def _spin_child(_: int) -> int:
    """The serial calibration spin body, importable for multiprocessing."""
    acc = 0
    for i in range(2_000_000):
        acc += i ^ (i >> 3)
    return acc


_CAL_PAR_PROCS = 8


def _calibrate_par_ms(procs: int = _CAL_PAR_PROCS):
    """PARALLEL throughput calibration: wall-ms of ``procs`` concurrent
    copies of the serial spin in separate processes (the GIL serializes
    threads on pure-Python work, so threads would measure nothing).

    Why it exists (r17 optimization-round finding): this host's noise
    now arrives in windows that throttle MULTI-core throughput while
    the single-thread spin stays fast — identical-code back-to-back
    runs swung 1.6× with serial calibrations of 130-150 ms throughout,
    and the serial-spin era model inverted (close sweep 144 s at
    cal 143 ms vs open 149 s at cal 167 ms normalizes to +14% on a
    HEAD whose same-day job/scan counts dropped 18-24%). A parallel
    probe sees exactly what the serial one cannot: contention for the
    other cores.

    r18 (VERDICT r17 item 2): with a round of observed values banked
    (quiet-host repeats read post/pre within ±12% — see
    OPTIMIZATION_r18.md measurement notes), the probe now FEEDS the
    ``noisy`` flag via _PAR_NOISY_RATIO below, same shape as the
    serial cal gate. The pool is driven through ``map_async(...)
    .get(timeout=30)`` (ADVICE r17): the bench process hosts a live
    py4j gateway by the post-sweep sample, and fork-with-threads can
    wedge a pool worker — a hang must surface as TimeoutError (→
    advisory None), not block the bench after an otherwise-complete
    sweep.
    """
    try:
        import multiprocessing as mp

        ctx = mp.get_context("fork")
        best = float("inf")
        for _ in range(2):
            with ctx.Pool(procs) as pool:
                t0 = time.perf_counter()
                pool.map_async(_spin_child, range(procs)).get(timeout=30)
                best = min(best, time.perf_counter() - t0)
        return round(best * 1000, 2)
    except Exception:
        return None  # probe is advisory: never fail the bench over it


# Multi-core contention gate (r18, VERDICT r17 item 2): post/pre ratio
# of the 8-process spin beyond this marks the sweep noisy. Bound
# derivation: 12 back-to-back probe pairs at round-18 open (loadavg
# 2-5 decaying from our own prior runs — conservative conditions)
# read post/pre in [0.76, 1.18] with samples 129-187 ms; the r17
# close's co-tenant-hit forward sweep carried par 207/188 ms against
# the same day's quiet 172 ms level. 1.35 sits above every observed
# same-conditions ratio while staying far below the 1.6× wall swings
# the probe exists to catch; a false flag only downgrades a sweep to
# advisory, it never fails the bench.
_PAR_NOISY_RATIO = 1.35


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else -1.0

    # sample co-tenant load BEFORE Spark spins up its own threads
    loadavg_pre = [round(x, 2) for x in os.getloadavg()]
    cal_pre = _calibrate_ms()
    cal_par_pre = _calibrate_par_ms()
    noisy = load_noisy(loadavg_pre[0], os.cpu_count() or cpus)
    if noisy and "--require-quiet" in sys.argv[1:]:
        # isolation/certification runs refuse to measure on a loud host
        # instead of producing numbers the noise protocol would discard
        print(
            json.dumps(
                {
                    "error": "host_not_quiet",
                    "loadavg_pre": loadavg_pre,
                    "threshold": _NOISY_LOAD_RATIO,
                },
                separators=(",", ":"),
            )
        )
        sys.exit(2)

    spark = get_spark(app_name="edps-bench", cpus=cpus, shuffle_partitions=cpus)

    # --reverse: run the suite back-to-front. Comparing forward vs
    # reverse per-query times is a cheap detector for cross-query session
    # contamination (a leaked conf, a cache, a lingering state store):
    # any query whose time is strongly order-sensitive inherits state
    # from its neighbors.
    items = list(QUERIES.items())
    reverse = "--reverse" in sys.argv[1:]
    if reverse:
        items.reverse()
    direction = "reverse" if reverse else "forward"
    fp = order_fingerprint([name for name, _ in items])

    timings: dict[str, float] = {}
    for name, fn in items:
        df = fn(spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()  # warm (JIT/IO cache)
        # best-of-2: single timed runs swing ±20% from GC/scheduler noise
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
        timings[name] = round(best, 4)

    total = round(sum(timings.values()), 4)
    cal_post = _calibrate_ms()
    cal_par_post = _calibrate_par_ms()
    # mid-sweep co-tenant arrival: the spin slowed although our own
    # executors are idle at both sample points
    cal_noisy = cal_post > 1.5 * cal_pre
    # multi-core contention the serial spin cannot see (r18): same
    # post/pre shape on the 8-process probe; None samples (failed
    # probe) never flag — the probe stays advisory in that case
    par_noisy = bool(
        cal_par_pre and cal_par_post
        and cal_par_post > _PAR_NOISY_RATIO * cal_par_pre
    )
    # order-guard runs must not clobber the canonical forward artifact
    path = _FULL_PATH.replace(".json", "_REVERSE.json") if reverse else _FULL_PATH
    with open(path, "w") as fh:
        json.dump(
            {
                "metric": "total_query_wall_seconds",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "n_queries": len(timings),
                "cpus": cpus,
                # shared host: co-tenant spikes swing timings ±20%+; the
                # load triples let a reader separate regression from
                # noise MECHANICALLY: `noisy` applies the protocol's
                # pre-sweep threshold (load1/cpus > _NOISY_LOAD_RATIO),
                # so per-query drift in a noisy=true sweep is
                # inadmissible for regression adjudication.
                "loadavg_pre": loadavg_pre,
                "loadavg": [round(x, 2) for x in os.getloadavg()],
                # single-thread spin wall-ms before/after the sweep:
                # post >> pre = co-tenants arrived MID-sweep (the case
                # loadavg_pre cannot see); such sweeps are inadmissible
                # for drift adjudication even with noisy=false
                "calibration_ms": [cal_pre, cal_post],
                # N-process spin wall-ms before/after (None if the
                # probe failed): sees multi-core contention windows the
                # serial spin cannot (r17 optimization-round finding).
                # Wired into `noisy` since r18 (post/pre >
                # _PAR_NOISY_RATIO — see the constant's derivation).
                "calibration_par_ms": [cal_par_pre, cal_par_post],
                "calibration_par_procs": _CAL_PAR_PROCS,
                "noisy": noisy or cal_noisy or par_noisy,
                "sf": sf,
                # direction-matched protocol (VERDICT r14 item 4): the
                # run order is ±8%-level material; cross-round deltas
                # are only admissible between identical fingerprints
                "direction": direction,
                "order_fingerprint": fp,
            },
            fh,
            indent=1,
        )
        fh.write("\n")
    print(_compact_line(timings, total, sf, noisy or cal_noisy or par_noisy,
                        direction=direction, fingerprint=fp))


if __name__ == "__main__":
    main()
