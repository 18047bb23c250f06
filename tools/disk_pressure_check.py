"""Disk-pressure (ENOSPC) loudness sweep — nineteenth hostile axis (round 14).

Shuffle and sort spills land in ``spark.local.dir``. On a production
executor that volume WILL fill eventually (co-tenant spill storms,
log growth, undersized scratch). The only acceptable behavior is a
LOUD job failure naming the device state — never a silently truncated
spill file feeding a plausible-but-short result downstream.

Mechanics: a loopback ext4 filesystem of 64 MiB becomes
``spark.local.dir`` for a fresh subprocess session whose heap is
constrained to 1g, and the probe sorts ~2.5 GiB of generated payload —
the external sort MUST spill far past the tiny volume. PASS =
the job raises with a no-space/IO error in the chain. A control run of
the IDENTICAL probe with local.dir on the normal /tmp must SUCCEED,
proving the failure is the volume, not the plan. Root/loop-mount
capability is probed first; without it the axis reports SKIPPED
explicitly (an axis that silently tested nothing must say so).

Usage: python tools/disk_pressure_check.py
"""

from __future__ import annotations

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_IMG = "/tmp/edps-diskpressure.img"
_MNT = "/tmp/edps-diskpressure"

_PROBE = r"""
import sys
from pyspark.sql import SparkSession
from pyspark.sql import functions as F

local_dir = sys.argv[1]
spark = (
    SparkSession.builder.master("local[4]")
    .appName("edps-disk-pressure-probe")
    .config("spark.local.dir", local_dir)
    .config("spark.ui.enabled", "false")
    .config("spark.sql.shuffle.partitions", "8")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")
try:
    # a wide SHUFFLE, not a sort: shuffle map output is ALWAYS written
    # to spark.local.dir regardless of heap room (a first-draft
    # orderBy+count probe spilled nothing — Catalyst removes a sort
    # under an order-insensitive count), and 25M distinct sha256 keys
    # write ~2+ GiB of map output — far past the 64 MiB volume
    df = (
        spark.range(25_000_000)
        .select(F.sha2(F.col("id").cast("string"), 256).alias("payload"))
        .groupBy("payload")
        .count()
    )
    n = df.count()
    print(f"PROBE-SILENT rows={n}", flush=True)
except Exception as e:  # noqa: BLE001
    # Walk the full cause chain (ADVICE r15): a genuine ENOSPC can
    # surface wrapped in an exception whose OWN message omits the space
    # phrase (e.g. a bare IOException from DiskBlockObjectWriter whose
    # cause carries it), and scoring that disk=False is a false alarm.
    parts, seen, cur = [], set(), e
    while cur is not None and id(cur) not in seen:
        seen.add(id(cur))
        parts.append(f"{type(cur).__name__}: {cur}")
        cur = cur.__cause__ or cur.__context__
    msg = " || ".join(parts)[:16000].lower()
    # Space-specific signals ONLY (ADVICE r14): a generic IOException or
    # "failed to write" on the constrained run could be an unrelated
    # transient failure and must not be scored as a successful ENOSPC
    # detection — it reports disk=False so triage sees the real cause.
    loud_disk = ("no space left" in msg or "enospc" in msg
                 or "not enough space" in msg)
    print(f"PROBE-LOUD {type(e).__name__} disk={loud_disk}", flush=True)
finally:
    spark.stop()
"""


def _mount() -> bool:
    try:
        subprocess.run(["umount", _MNT], capture_output=True)
        subprocess.run(["truncate", "-s", "64M", _IMG], check=True,
                       capture_output=True)
        subprocess.run(["mkfs.ext4", "-q", "-F", _IMG], check=True,
                       capture_output=True)
        os.makedirs(_MNT, exist_ok=True)
        subprocess.run(["mount", "-o", "loop", _IMG, _MNT], check=True,
                       capture_output=True)
        return True
    except Exception:  # noqa: BLE001
        return False


def _cleanup() -> None:
    subprocess.run(["umount", _MNT], capture_output=True)
    for p in (_IMG,):
        try:
            os.remove(p)
        except OSError:
            pass


def _run_probe(local_dir: str) -> str:
    env = dict(os.environ)
    try:
        proc = subprocess.run(
            [sys.executable, "-c", _PROBE, local_dir],
            cwd=REPO, env=env, capture_output=True, text=True, timeout=1200,
        )
    except subprocess.TimeoutExpired:
        # A hung probe is a finding, not a tool crash (ADVICE r14); the
        # caller's finally block still unmounts the loop volume.
        return "PROBE-DEAD timeout after 1200s"
    for ln in proc.stdout.splitlines():
        if ln.startswith("PROBE-"):
            if ln.startswith("PROBE-LOUD") and "disk=False" in ln:
                # Second look before declaring a false alarm (ADVICE
                # r15): the JVM logs the real device error to stderr
                # even when the Python-side exception chain drops it.
                err = proc.stderr.lower()
                if ("no space left" in err or "enospc" in err
                        or "not enough space" in err):
                    return ln.replace("disk=False",
                                      "disk=True (via stderr ENOSPC)")
            return ln
    return f"PROBE-DEAD rc={proc.returncode} {proc.stderr[-400:]}"


def main() -> int:
    if not _mount():
        print("SKIPPED: no loop-mount capability in this environment — "
              "the axis cannot constrain a filesystem; nothing was tested")
        return 0
    try:
        print("== spark.local.dir on a 64 MiB volume (must fail LOUD) ==")
        constrained = _run_probe(_MNT)
        print(f"  {constrained}")
        print("== control: identical probe, roomy local.dir (must pass) ==")
        control = _run_probe("/tmp")
        print(f"  {control}")
        ok = (
            constrained.startswith("PROBE-LOUD")
            and "disk=True" in constrained
            and control.startswith("PROBE-SILENT")
        )
        if ok:
            print("disk-pressure: LOUD on ENOSPC, control intact")
            return 0
        print("disk-pressure FINDINGS: "
              f"constrained={constrained!r} control={control!r}")
        return 1
    finally:
        _cleanup()


if __name__ == "__main__":
    raise SystemExit(main())
