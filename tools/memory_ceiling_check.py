"""Memory-per-task ceiling sweep — sixteenth hostile axis (round 14).

Every prior axis varied topology, data, or configuration semantics;
none varied the RESOURCE ENVELOPE. The bench container's default heap
(8g driver = executor JVM in local mode) is roomy enough that a plan
which only works by holding a whole partition-side structure in memory
(an unspilled aggregate, an over-wide broadcast, a codec that
materializes every binary row of a split at once) would never show.
On a real cluster the per-task share is `executor.memory /
executor.cores` minus overheads — routinely under 1 GiB — so the
wide-row family (binary image/audio/video columns, embedding arrays,
packed token sequences) must DEGRADE (spill, stream, iterate) rather
than OOM when the envelope shrinks.

Mechanics: the proven oracle harness (tools/check.py) runs in a FRESH
subprocess per ceiling with ``SPARK_GRAFT_DRIVER_MEM`` constraining
the JVM heap (session.get_spark wires it into spark.driver.memory,
which IS the executor heap on local[n]) and 8 concurrent task slots —
so the per-task share at the 1g ceiling is ~128 MiB minus Spark's
reserved/unified-memory overheads. Correctness is the same
row/schema/value-hash oracle equivalence as the gate: a query that
silently drops rows under memory pressure fails exactly like one that
OOMs. Python workers (mapInPandas codecs) hold THEIR memory outside
the JVM heap — this axis constrains the JVM side; the Python side is
bounded per-batch by Arrow batch sizing, documented per operator.

Scope: the wide-row family plus the heaviest shuffle/aggregate
queries (spill candidates), not the full catalog — narrow-row scans
prove nothing new at a lower ceiling. Expectation table EMPTY by
design; a new entry is a FINDING.

Usage: python tools/memory_ceiling_check.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

KNOWN_CEILING_FAILURES: dict[str, str] = {}

CEILINGS = ["1g"]

# Wide-row + spill-prone family: binary multimodal columns, embedding
# arrays, packed sequences, and the heaviest shuffle/aggregate plans.
WIDE_ROW_QUERIES = [
    "multimodal_features", "codec_roundtrip", "mp4_probe",
    "chunk_documents", "pack_sequences", "length_batching",
    "cosine_topk", "embedding_near_dup", "embedding_near_dup_lsh",
    "ann_lsh", "ann_ivf", "kmeans_clusters", "semdedup_prune",
    "kcenter_select", "label_centroids",
    "percentile_stats", "join_explosion", "ngram_containment",
]


def run_ceiling(ceiling: str, sf_dir: str, queries: list[str]) -> tuple[bool, str]:
    env = dict(os.environ)
    env["SPARK_GRAFT_DRIVER_MEM"] = ceiling
    env["SPARK_GRAFT_CPUS"] = "8"
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "check.py"),
         sf_dir, *queries],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=1800,
    )
    tail = "\n".join(
        ln for ln in proc.stdout.splitlines()
        if ln.startswith(("PASS", "FAIL", "ERROR")) or "passed" in ln
    )
    ok = proc.returncode == 0 and f"{len(queries)}/{len(queries)} passed" in proc.stdout
    if proc.returncode != 0 and not tail:
        tail = proc.stderr[-2000:]
    return ok, tail


def main() -> int:
    args = sys.argv[1:]
    sf_dir = args[0] if args else "/root/testdata/sf0.1"
    queries = args[1:] or WIDE_ROW_QUERIES
    rc = 0
    for ceiling in CEILINGS:
        print(f"== SPARK_GRAFT_DRIVER_MEM={ceiling}, 8 task slots, {sf_dir} ==")
        ok, tail = run_ceiling(ceiling, sf_dir, queries)
        print(tail)
        failures = [
            ln.split()[1].rstrip(":") for ln in tail.splitlines()
            if ln.startswith(("FAIL", "ERROR"))
        ]
        new = [f for f in failures if f not in KNOWN_CEILING_FAILURES]
        if not ok and not failures:
            # Harness-level death (e.g. a hard driver-JVM OOM kills the
            # subprocess before any FAIL line prints): nothing parseable
            # is the axis's WORST outcome, not a pass (ADVICE r14).
            print(f"{ceiling}: (harness error) subprocess died with no "
                  "parseable FAIL lines — treating as a finding")
            rc = 1
        elif not ok and new:
            print(f"{ceiling}: NEW findings: {', '.join(new)}")
            rc = 1
        elif not ok:
            print(f"{ceiling}: known failures only")
        else:
            print(f"{ceiling}: all {len(queries)} oracle-equal under the ceiling")
    return rc


if __name__ == "__main__":
    raise SystemExit(main())
