"""Direction-matched, era-normalized bench comparison (VERDICT r14
item 4; era-normalization mechanized r17 per VERDICT r16 item 2).

Total query wall is order-sensitive by ~±8% through JIT/warmup placement
alone (SURVEY entry 79: the r14 catalog rotation flipped a rev-faster
pair into a rev-slower one with zero engine churn), so a cross-round
delta is only admissible between sweeps that ran the SAME direction —
and per-query deltas additionally require the SAME catalog order
(identical ``order_fingerprint``: a rotated catalog moves the warmup
tax onto different hosts).

The host's clock era moves totals too: three zero-churn r16 sweeps
tracked the single-thread calibration spin almost linearly
(cal 168.5 ms -> 126.47 s, 177.3 -> 131.69, 190.4 -> 158.87). This tool
therefore emits a CAL-NORMALIZED advisory total beside the raw delta
whenever both artifacts carry ``calibration_ms``: the new total scaled
by (era_old / era_new), where era is min(calibration_ms) — spin
contamination only ever slows, so the min is the cleanest in-session
era reading. When the eras differ by more than ERA_TOL AND the raw
delta exceeds BAND, the raw delta is REFUSED for regression
adjudication (exit 2) — the normalized advisory is the admissible
number (the r16 131.95-vs-106.92 shape, which was clock era + reorder,
not code).

This tool makes those rules mechanical instead of SURVEY prose: it
REFUSES (exit 2) to compare artifacts whose directions differ, warns
when fingerprints differ (totals still comparable like-direction;
per-query deltas are then order-confounded and are NOT printed), and
REFUSES per-query adjudication (exit 2) when either side is noisy —
including par-probe drift re-derived from ``calibration_par_ms`` on
artifacts that predate the r18 in-bench gate (VERDICT r17 item 2:
the r17 cross-round comparison manufactured 24 "regressed" rows, 20
on byte-identical plans, from exactly this pair of holes).

Usage:
  python tools/bench_compare.py OLD_BENCH.json NEW_BENCH.json [top_n]
  python tools/bench_compare.py --baseline NEW_BENCH.json
      compare NEW against the committed era-indexed baseline rows
      (tools/bench_baseline_era.json): picks the newest like-direction
      row, preferring a matching order_fingerprint, and prints the raw
      and era-normalized ratios against it.
"""

from __future__ import annotations

import json
import os
import sys

ERA_TOL = 0.06  # >6% calibration difference = different host clock era
BAND = 0.10     # raw total delta beyond ±10% is inadmissible cross-era
# par-probe post/pre beyond this = multi-core contention mid-sweep
# (bench.py._PAR_NOISY_RATIO twin — re-applied here so artifacts
# written before the r18 gate wiring are judged by the same bar)
PAR_NOISY_RATIO = 1.35


def _par_noisy(art: dict) -> bool:
    par = art.get("calibration_par_ms")
    if isinstance(par, (list, tuple)) and len(par) == 2 and all(
        isinstance(x, (int, float)) and x > 0 for x in par
    ):
        return par[1] > PAR_NOISY_RATIO * par[0]
    return False


def _era_ms(art: dict) -> float | None:
    cal = art.get("calibration_ms")
    if isinstance(cal, (list, tuple)) and cal and all(
        isinstance(x, (int, float)) and x > 0 for x in cal
    ):
        return float(min(cal))
    return None


def _era_advisory(t_old: float, t_new: float,
                  era_old: float | None, era_new: float | None) -> int:
    """Print the cal-normalized advisory; return 2 if the raw delta is
    refused (out-of-era AND beyond band), else 0."""
    raw = (t_new - t_old) / t_old
    if era_old is None or era_new is None:
        print("cal-normalization unavailable (an artifact lacks "
              "calibration_ms) — raw delta only; treat cross-era "
              "comparisons as advisory")
        return 0
    norm_new = t_new * (era_old / era_new)
    norm = (norm_new - t_old) / t_old
    out_of_era = abs(era_new / era_old - 1.0) > ERA_TOL
    print(f"host era: {era_old:.1f} ms -> {era_new:.1f} ms "
          f"({'OUT-OF-ERA' if out_of_era else 'same era'}, "
          f"tol {ERA_TOL:.0%})")
    print(f"cal-normalized advisory total: {t_old:.2f} -> "
          f"{norm_new:.2f} ({norm * 100:+.1f}%)  "
          f"[= {t_new:.2f} x {era_old:.1f}/{era_new:.1f}]")
    if out_of_era and abs(raw) > BAND:
        print(f"RAW DELTA REFUSED for regression adjudication: eras "
              f"differ >{ERA_TOL:.0%} and the raw delta {raw * 100:+.1f}% "
              f"exceeds the ±{BAND:.0%} band — use the cal-normalized "
              f"advisory above (clock era, not code, until an isolated "
              f"like-era rerun says otherwise)")
        return 2
    return 0


def _load(path: str) -> dict | None:
    art = json.load(open(path))
    if not isinstance(art, dict) or not isinstance(
        art.get("value"), (int, float)
    ):
        print(f"REFUSED: {path} has no numeric 'value' — not a BENCH "
              "artifact (pass BENCH_FULL*.json / BENCH_r*.json)")
        return None
    if not isinstance(art.get("queries"), dict) or not art["queries"]:
        print(f"REFUSED: {path} has no 'queries' dict — looks like a "
              "compact stdout line; pass the full artifact "
              "(BENCH_FULL.json)")
        return None
    return art


def _against_baseline(new_path: str) -> int:
    rows_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "bench_baseline_era.json")
    rows = json.load(open(rows_path))["rows"]
    new = _load(new_path)
    if new is None:
        return 2
    d_new = new.get("direction", "unknown")
    like = [r for r in rows if r["direction"] == d_new]
    if not like:
        print(f"REFUSED: no committed baseline row for direction "
              f"{d_new!r} in {rows_path}")
        return 2
    fp = new.get("order_fingerprint")
    matched = [r for r in like if r.get("order_fingerprint") == fp]
    row = (matched or like)[-1]  # rows are append-only: newest last
    if not matched:
        print(f"note: no baseline row matches fingerprint {fp} — "
              f"comparing like-direction against {row['id']} "
              f"(order-confounded by ±8%-class warmup placement)")
    t_old, t_new = float(row["total_sec"]), float(new["value"])
    print(f"baseline row: {row['id']} "
          f"(fp {row.get('order_fingerprint')}, {row['total_sec']} s, "
          f"era {row.get('era_ms')} ms)")
    if new.get("noisy"):
        print(f"WARNING: {new_path} is noisy=true — inadmissible for "
              "certification; numbers advisory only")
    print(f"total: {t_old} -> {t_new} "
          f"({(t_new - t_old) / t_old * 100:+.1f}%), "
          f"ratio {t_new / t_old:.3f}x")
    rc = _era_advisory(t_old, t_new, row.get("era_ms"), _era_ms(new))
    era_old, era_new = row.get("era_ms"), _era_ms(new)
    if era_old and era_new:
        print(f"era-normalized ratio: "
              f"{t_new * (era_old / era_new) / t_old:.3f}x")
    # Parallel-throughput era (r17 optimization round): the serial spin
    # cannot see multi-core contention windows; when BOTH sides carry
    # the N-process probe, print the par-normalized advisory beside the
    # serial one (min of the pre/post samples, like era_ms).
    par_new = new.get("calibration_par_ms") or []
    par_new_min = min((p for p in par_new if p), default=None)
    par_old = row.get("era_par_ms")
    if par_new_min:
        print(f"par-era (x{new.get('calibration_par_procs', '?')} "
              f"procs): new {par_new_min} ms"
              + (f", baseline {par_old} ms, par-normalized ratio "
                 f"{t_new * (par_old / par_new_min) / t_old:.3f}x"
                 if par_old else
                 " (baseline row predates the probe — serial advisory "
                 "only)"))
    return rc


def main() -> int:
    if len(sys.argv) >= 3 and sys.argv[1] == "--baseline":
        return _against_baseline(sys.argv[2])
    if len(sys.argv) < 3:
        print(__doc__)
        return 2
    old_path, new_path = sys.argv[1], sys.argv[2]
    top_n = int(sys.argv[3]) if len(sys.argv) > 3 else 15

    # Refuse malformed input up front (ADVICE r15): an artifact missing
    # "value" would TypeError in the delta arithmetic, and a compact
    # stdout line passed by mistake lacks the full "queries" dict — both
    # should produce this tool's advisory refusal, not a traceback.
    old = _load(old_path)
    new = _load(new_path)
    if old is None or new is None:
        return 2
    if not old["value"]:
        print(f"REFUSED: {old_path} total is 0 — percentage delta undefined")
        return 2

    d_old = old.get("direction", "unknown")
    d_new = new.get("direction", "unknown")
    if "unknown" not in (d_old, d_new) and d_old != d_new:
        print(f"REFUSED: cross-direction comparison ({d_old} vs {d_new}) — "
              "warmup placement differs by construction; re-run one side "
              "in the other's direction")
        return 2
    if "unknown" in (d_old, d_new):
        print(f"WARNING: direction missing on a pre-r15 artifact "
              f"({old_path}={d_old}, {new_path}={d_new}) — treat the "
              "comparison as advisory only")

    for path, art in ((old_path, old), (new_path, new)):
        if art.get("noisy"):
            print(f"WARNING: {path} is noisy=true — its numbers are "
                  "inadmissible for regression adjudication")

    t_old, t_new = old.get("value"), new.get("value")
    print(f"total: {t_old} -> {t_new} "
          f"({(t_new - t_old) / t_old * 100:+.1f}%)")
    rc = _era_advisory(t_old, t_new, _era_ms(old), _era_ms(new))

    fp_old = old.get("order_fingerprint")
    fp_new = new.get("order_fingerprint")
    if fp_old and fp_new and fp_old != fp_new:
        print(f"order_fingerprint differs ({fp_old} vs {fp_new}): catalog "
              "order changed between sweeps — per-query deltas are "
              "order-confounded and are not printed")
        return rc
    # Per-query adjudication gate (r18, VERDICT r17 item 2): a sweep
    # that is noisy (pre-load, serial-cal drift, or — on artifacts
    # that carry the probe — par-probe drift re-checked here) cannot
    # adjudicate per-query regressions: the r17 comparison produced 24
    # "regressed" rows, 20 of them on byte-identical plans, from
    # exactly this. Totals above remain printed (advisory).
    for path, art in ((old_path, old), (new_path, new)):
        if art.get("noisy") or _par_noisy(art):
            why = "par-probe drift" if _par_noisy(art) and not art.get(
                "noisy") else "noisy=true"
            print(f"PER-QUERY DELTAS REFUSED: {path} is {why} — "
                  "inadmissible for per-query regression adjudication; "
                  "re-run that side on a quiet host (--require-quiet)")
            return 2

    q_old = old.get("queries", {})
    q_new = new.get("queries", {})
    rows = []
    for name in set(q_old) & set(q_new):
        a, b = q_old[name], q_new[name]
        rows.append((b - a, name, a, b))
    rows.sort(reverse=True)
    print(f"top {top_n} per-query deltas (sec, new-old), "
          f"{len(rows)} shared queries:")
    for delta, name, a, b in rows[:top_n]:
        print(f"  {name:28s} {a:7.2f} -> {b:7.2f}  ({delta:+.2f})")
    gone = sorted(set(q_old) - set(q_new))
    added = sorted(set(q_new) - set(q_old))
    if gone:
        print("only in old:", ", ".join(gone))
    if added:
        print("only in new:", ", ".join(added))
    return rc


if __name__ == "__main__":
    raise SystemExit(main())
