"""Locale / collation sweep — eighteenth hostile axis (round 14).

The oracles pin exact string SORT ORDERS (ORDER BY on event types,
URLs, document text prefixes) and exact formatted timestamps
(strftime / date_format round-trips). Spark compares strings as
binary UTF8String and DuckDB defaults to binary collation, so the
engine SHOULD be locale-proof — but three seams genuinely read the
process locale and have bitten real pipelines: the Python side
(pandas string kernels, ``str.casefold``-style ops inside
mapInPandas), the JVM's ``user.language`` (picked up by any
``toUpperCase``/``format`` that forgets Locale.ROOT), and C library
``strcoll`` behavior leaking through sort utilities. A driver
launched from a cron job (LC_ALL=C) must produce bit-identical
results to one launched from a dev shell (en_US.UTF-8).

Mechanics: the proven oracle harness (tools/check.py) runs in a fresh
subprocess with LC_ALL=C / LANG=C / LANGUAGE=C (and the JVM pinned to
-Duser.language=C country-less via JAVA_TOOL_OPTIONS), full catalog vs
the DuckDB oracles. Expectation table EMPTY by design.

Usage: python tools/locale_check.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

KNOWN_LOCALE_DIVERGENCES: dict[str, str] = {}


def main() -> int:
    args = sys.argv[1:]
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    queries = args[1:]
    env = dict(os.environ)
    env.update({
        "LC_ALL": "C", "LANG": "C", "LANGUAGE": "C",
        "JAVA_TOOL_OPTIONS": (env.get("JAVA_TOOL_OPTIONS", "") +
                              " -Duser.language=C -Duser.country=").strip(),
        "SPARK_GRAFT_CPUS": "8",
    })
    print("== LC_ALL=C / LANG=C / -Duser.language=C ==")
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "check.py"),
         sf_dir, *queries],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=1800,
    )
    failures = [
        ln.split()[1].rstrip(":") for ln in proc.stdout.splitlines()
        if ln.startswith(("FAIL", "ERROR"))
    ]
    summary = [ln for ln in proc.stdout.splitlines() if "passed" in ln]
    print("\n".join(summary) or proc.stderr[-1500:])
    new = [f for f in failures if f not in KNOWN_LOCALE_DIVERGENCES]
    if proc.returncode != 0 or new:
        print("NEW locale findings: " + ", ".join(new or ["(harness error)"]))
        return 1
    print("locale-proof: all queries oracle-equal under LC_ALL=C")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
