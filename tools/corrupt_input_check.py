"""Corrupted-input loudness sweep — seventeenth hostile axis (round 14).

A 100 TB lake WILL contain a truncated object (interrupted multipart
upload) or a bit-flipped page (storage rot) eventually. The only
acceptable engine behavior is LOUD failure naming the problem — never
an empty result, never PARTIAL rows silently missing the corrupted
split (the silent-wrong shape: a daily aggregate that quietly lost one
file's worth of events). Spark's default is loud
(``spark.sql.files.ignoreCorruptFiles=false``); this axis pins that
the engine actually rides the default and that corruption is
contained PER FILE:

- ``truncated``: the last 1 KiB of events.parquet removed — kills the
  footer, so even schema resolution must fail;
- ``bitflip``: 64 bytes XOR-flipped mid-file — footer intact, page
  decode / CRC fails at EXECUTION time (the sneakier case: the plan
  builds fine);
- control: the same corrupt directory's NON-events tables stay
  readable — lineitem queries succeed, proving the blast radius is
  the corrupted file, not the directory.

Outcome classes: every events-reading probe must raise (``loud``), the
control must ``match`` its oracle. Expectation table EMPTY by design.

Usage: python tools/corrupt_input_check.py
"""

from __future__ import annotations

import os
import shutil
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from check import TABLES, normalize, value_repr  # noqa: E402

_SRC = "/root/testdata/sf0.001"
_MIRROR = "/tmp/edps-corrupt-sf"

# events-reading probes spanning the read paths: plain scan+clean,
# window, stream (availableNow), python-stage. (First draft used
# yearly_stats here and its SILENT verdict was the AXIS's bug — that
# query reads lineitem, which the mirror leaves intact; the probes
# must actually read the corrupted table.)
EVENTS_PROBES = ["clean_events", "sessionization", "stream_window_counts",
                 "token_bucket"]
# control probes that never read events
CONTROL_PROBES = ["pricing_summary", "top_k_orders"]

KNOWN_CORRUPT_BEHAVIOR: dict[str, str] = {}


def make_mirror(mode: str) -> str:
    d = f"{_MIRROR}-{mode}"
    if os.path.isdir(d):
        shutil.rmtree(d)
    os.makedirs(d)
    for t in TABLES:
        shutil.copyfile(
            os.path.join(_SRC, f"{t}.parquet"), os.path.join(d, f"{t}.parquet")
        )
    target = os.path.join(d, "events.parquet")
    size = os.path.getsize(target)
    if mode == "truncated":
        with open(target, "r+b") as f:
            f.truncate(max(size - 1024, 16))
    elif mode == "bitflip":
        with open(target, "r+b") as f:
            f.seek(size // 2)
            chunk = bytearray(f.read(64))
            f.seek(size // 2)
            f.write(bytes(b ^ 0xFF for b in chunk))
    else:  # pragma: no cover - guarded by caller
        raise ValueError(mode)
    return d


def main() -> int:
    import duckdb

    import __spark_entry__ as m
    from earthquake_data_pipeline_spark.session import get_spark

    spark = get_spark(app_name="edps-corrupt-sweep", cpus=8,
                      shuffle_partitions=8)
    queries, oracles = m.queries(), m.oracle_sql()
    findings: list[str] = []
    n_pass = n_total = 0
    for mode in ("truncated", "bitflip"):
        sf_dir = make_mirror(mode)
        print(f"== {mode} events.parquet ==")
        for name in EVENTS_PROBES:
            n_total += 1
            try:
                got = queries[name](spark, sf_dir).toPandas()
                outcome = f"SILENT ({len(got)} rows returned)"
            except Exception as e:  # noqa: BLE001
                outcome = f"loud ({type(e).__name__})"
            expected = KNOWN_CORRUPT_BEHAVIOR.get(name, "loud")
            if outcome.startswith(expected):
                n_pass += 1
                print(f"ok   {name}: {outcome}")
            else:
                findings.append(f"{mode}/{name}: expected {expected}, got {outcome}")
                print(f"BAD  {name}: {outcome}")
        # control: corruption is contained to the corrupted FILE
        con = duckdb.connect()
        for t in TABLES:
            if t == "events":
                continue  # DuckDB would also refuse the corrupt file
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM "
                f"read_parquet('{sf_dir}/{t}.parquet')"
            )
        for name in CONTROL_PROBES:
            n_total += 1
            try:
                got = normalize(queries[name](spark, sf_dir).toPandas())
                want = normalize(con.execute(oracles[name]).fetchdf())
                ok = len(got) == len(want) and value_repr(got) == value_repr(want)
                outcome = "match" if ok else "divergence"
            except Exception as e:  # noqa: BLE001
                outcome = f"loud ({type(e).__name__})"
            if outcome == "match":
                n_pass += 1
                print(f"ok   {name}: control intact")
            else:
                findings.append(f"{mode}/{name}: control expected match, got {outcome}")
                print(f"BAD  {name}: {outcome}")
        con.close()
    print(f"\n{n_pass}/{n_total} as documented")
    if findings:
        print("\n".join(findings))
        return 1
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
