"""Direction-matched bench comparison (VERDICT r14 item 4).

Total query wall is order-sensitive by ~±8% through JIT/warmup placement
alone (SURVEY entry 79: the r14 catalog rotation flipped a rev-faster
pair into a rev-slower one with zero engine churn), so a cross-round
delta is only admissible between sweeps that ran the SAME direction —
and per-query deltas additionally require the SAME catalog order
(identical ``order_fingerprint``: a rotated catalog moves the warmup
tax onto different hosts).

This tool makes that rule mechanical instead of SURVEY prose: it
REFUSES (exit 2) to compare artifacts whose directions differ, warns
when fingerprints differ (totals still comparable like-direction;
per-query deltas are then order-confounded and are NOT printed), and
flags noisy artifacts as inadmissible for regression adjudication.

Usage: python tools/bench_compare.py OLD_BENCH.json NEW_BENCH.json [top_n]
"""

from __future__ import annotations

import json
import sys


def main() -> int:
    if len(sys.argv) < 3:
        print(__doc__)
        return 2
    old_path, new_path = sys.argv[1], sys.argv[2]
    top_n = int(sys.argv[3]) if len(sys.argv) > 3 else 15
    old = json.load(open(old_path))
    new = json.load(open(new_path))

    # Refuse malformed input up front (ADVICE r15): an artifact missing
    # "value" would TypeError in the delta arithmetic, and a compact
    # stdout line passed by mistake lacks the full "queries" dict — both
    # should produce this tool's advisory refusal, not a traceback.
    for path, art in ((old_path, old), (new_path, new)):
        if not isinstance(art, dict) or not isinstance(art.get("value"), (int, float)):
            print(f"REFUSED: {path} has no numeric 'value' — not a BENCH "
                  "artifact (pass BENCH_FULL*.json / BENCH_r*.json)")
            return 2
        if not isinstance(art.get("queries"), dict) or not art["queries"]:
            print(f"REFUSED: {path} has no 'queries' dict — looks like a "
                  "compact stdout line; pass the full artifact "
                  "(BENCH_FULL.json)")
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

    fp_old = old.get("order_fingerprint")
    fp_new = new.get("order_fingerprint")
    if fp_old and fp_new and fp_old != fp_new:
        print(f"order_fingerprint differs ({fp_old} vs {fp_new}): catalog "
              "order changed between sweeps — per-query deltas are "
              "order-confounded and are not printed")
        return 0

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
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
