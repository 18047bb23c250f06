"""State-store / checkpoint format drift — axis 24 (round 16).

Pairs with the engine-fact drift pins (axis 21): those pin VALUE
semantics across an upgrade; this pins the CHECKPOINT FORMAT seam
(VERDICT r15 item 6). A checkpoint written by a NEWER Spark — higher
metadata-log version, higher stateful-operator format versions, a
state-store provider this build doesn't ship — must be REFUSED loudly
when this engine opens it, never half-read into silently-wrong state
(an undercounting windowed agg is the exact silent-wrong shape the r15
chaos axis exists for). We cannot install the next PySpark, so the
probe FORGES the future: it lets a stream commit real batches, kills
it with batches still pending (the r15 kill machinery), rewrites the
checkpoint the way a future writer would have, and restarts.

Tamper modes (applied to the live checkpoint between kill and restart):

- log_header    — offsets/<latest> first line "v1" -> "v99": the
                  HDFSMetadataLog version gate is the outermost seam;
                  Spark must refuse with its max-supported-version
                  error, all three stateful shapes.
- state_conf    — bump the shape's stateFormatVersion conf inside the
                  offsets-log OffsetSeqMetadata (aggregation state v99 /
                  flatMapGroupsWithState v99): the restart re-plans the
                  pending batch with the checkpoint's pinned conf and
                  the operator must refuse the unknown version.
- provider_class — point spark.sql.streaming.stateStore.providerClass
                  at a class this build does not ship (what a
                  checkpoint from a vendor fork or newer Spark does);
                  restart must fail to instantiate, loudly.

Every case requires: nonzero exit AND an error chain naming the
version/class — a restart that drains cleanly over a forged-future
checkpoint is the FAIL this axis hunts.

Usage: python tools/state_format_drift_check.py [sf_dir] [shape ...]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import stream_chaos_check as scc  # noqa: E402  (probe/kill/input reuse)

# the three checkpoint-state-bearing shapes (merge/foreachBatch holds no
# state store — its exactly-once lives in the sink and is covered by
# the r15 chaos axis)
SHAPES = ["dedup", "windowagg", "statetotals"]

_STATE_CONF_KEY = {
    "windowagg": "spark.sql.streaming.aggregation.stateFormatVersion",
    "statetotals":
        "spark.sql.streaming.flatMapGroupsWithState.stateFormatVersion",
    # streaming dropDuplicatesWithinWatermark has no dedicated
    # format-version conf in this build; the aggregation key still
    # rides the OffsetSeqMetadata and must be validated on restore
    "dedup": "spark.sql.streaming.aggregation.stateFormatVersion",
}

_LOUD_SIGNALS = {
    "log_header": ("log file was produced by a newer version",
                   "maximum supported log version", "v99",
                   "unsupportedoperation"),
    "state_conf": ("stateformatversion", "state format", "v99", "99",
                   "invalid value", "should be"),
    "provider_class": ("classnotfound", "cannot find", "could not load",
                       "futurestatestoreprovider", "failed to create",
                       "cannot be instantiated"),
}


def _latest(d: str) -> str | None:
    try:
        ids = [int(f) for f in os.listdir(d) if f.isdigit()]
    except FileNotFoundError:
        return None
    return os.path.join(d, str(max(ids))) if ids else None


def _tamper(ckpt: str, mode: str, shape: str) -> str:
    offsets = _latest(os.path.join(ckpt, "offsets"))
    if offsets is None:
        raise RuntimeError("no offsets log to tamper")
    with open(offsets) as fh:
        lines = fh.read().splitlines()
    if mode == "log_header":
        lines[0] = "v99"
        detail = f"{os.path.basename(offsets)} header -> v99"
    elif mode == "state_conf":
        meta = json.loads(lines[1])
        key = _STATE_CONF_KEY[shape]
        meta.setdefault("conf", {})[key] = "99"
        lines[1] = json.dumps(meta, separators=(",", ":"))
        detail = f"{key}=99 in OffsetSeqMetadata"
    elif mode == "provider_class":
        meta = json.loads(lines[1])
        meta.setdefault("conf", {})[
            "spark.sql.streaming.stateStore.providerClass"
        ] = "org.apache.spark.sql.future.FutureStateStoreProvider"
        lines[1] = json.dumps(meta, separators=(",", ":"))
        detail = "providerClass -> FutureStateStoreProvider"
    else:
        raise ValueError(mode)
    with open(offsets, "w") as fh:
        fh.write("\n".join(lines) + "\n")
    return detail


def run_case(shape: str, mode: str, master_input: str,
             attempts: int = 3) -> tuple[bool, str]:
    for _ in range(attempts):
        work = tempfile.mkdtemp(prefix=f"edps_fmtdrift_{shape}_{mode}_")
        input_dir = os.path.join(work, "input")
        shutil.copytree(master_input, input_dir)
        ckpt = os.path.join(work, "ckpt")
        try:
            p = scc._spawn(shape, input_dir, work, "run")
            outcome = scc._kill_after_commits(p, ckpt, 2)
            if not outcome.startswith("KILLED"):
                continue  # stream drained before the kill — retry
            try:
                detail = _tamper(ckpt, mode, shape)
            except RuntimeError as e:
                return False, f"{outcome}; {e}"
            try:
                import subprocess

                v = subprocess.run(
                    [sys.executable, "-c", scc._PROBE, shape, input_dir,
                     work, "verify"],
                    cwd=REPO, capture_output=True, text=True, timeout=600,
                )
            except subprocess.TimeoutExpired:
                return False, f"{outcome}; PROBE-DEAD restart timeout"
            if v.returncode == 0:
                final = next((ln for ln in v.stdout.splitlines()
                              if ln.startswith("FINAL")), "")
                return False, (f"{outcome}; SILENT: drained over a forged-"
                               f"future checkpoint ({detail}; {final})")
            err = (v.stderr or "").lower()
            hit = next((s for s in _LOUD_SIGNALS[mode] if s in err), None)
            if hit is None:
                return False, (f"{outcome}; LOUD but unnamed ({detail}): "
                               f"rc={v.returncode} stderr tail "
                               f"{v.stderr[-300:]!r}")
            return True, f"{outcome}; {detail}; loud ({hit!r})"
        finally:
            shutil.rmtree(work, ignore_errors=True)
    return False, f"no kill landed in {attempts} tries"


def main() -> int:
    args = sys.argv[1:]
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    shapes = args[1:] or SHAPES
    master = tempfile.mkdtemp(prefix="edps_fmtdrift_input_")
    rc, n = 0, 0
    try:
        scc._prepare_input(sf_dir, master)
        for shape in shapes:
            for mode in ("log_header", "state_conf", "provider_class"):
                ok, detail = run_case(shape, mode, master)
                n += 1
                print(f"{'PASS' if ok else 'FAIL'} {shape}+{mode}: {detail}",
                      flush=True)
                rc |= 0 if ok else 1
    finally:
        shutil.rmtree(master, ignore_errors=True)
    if rc == 0:
        print(f"state-format-drift: {n}/{n} forged-future checkpoints "
              "refused loudly")
    return rc


if __name__ == "__main__":
    raise SystemExit(main())
