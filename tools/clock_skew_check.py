"""Driver clock-skew across a streaming restart — twenty-ninth hostile
axis (round 17, VERDICT r16 item 7).

A production stream restarting after an NTP step-correction (or on a
host whose clock regressed/froze) must keep working and stay CORRECT:
event-time state and watermarks are derived from the DATA, not the wall
clock, so a skewed driver clock may never move an answer. This axis
proves that contract on the checkpoint surface where the wall clock
actually lives: each offsets-log entry's ``OffsetSeqMetadata.
batchTimestampMs`` is the processing-time stamp of its micro-batch.

Reduction (the axis-24 precedent — libfaketime is not in this
container): restarting under a clock regressed by T is byte-equivalent
to restarting over a checkpoint whose recorded batchTimestampMs values
lie T in the FUTURE of the real clock. Two skew modes per shape:

- regressed — +10 years on every recorded batchTimestampMs: the
  restart's own clock now reads 10 years BEHIND the checkpoint's
  history, so every new batch's stamp is far smaller than its
  predecessors' (the monotonicity a step-correction breaks).
- frozen — every recorded batchTimestampMs set equal to the first
  batch's: the clock never advanced across the whole pre-kill run.

Required behavior for BOTH: the restarted stream drains CLEAN and the
sink is oracle-equal with the original input — a refusal would strand
every stream on a corrected host, and silent divergence would mean
event-time semantics secretly leaned on the wall clock.
``batchWatermarkMs`` is deliberately left untouched: the watermark is
event-time-derived, and the kill/restart shapes (dedup / windowagg /
statetotals) pin that it replays from the log, not the clock.

Usage: python tools/clock_skew_check.py [sf_dir] [shape ...]
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import state_format_drift_check as sfd  # noqa: E402  (_drop_crc reuse)
import stream_chaos_check as scc  # noqa: E402  (probe + oracle reuse)

SHAPES = ["dedup", "windowagg", "statetotals"]
MODES = ["regressed", "frozen"]
TEN_YEARS_MS = 315_360_000_000


def _offsets_files(ckpt: str) -> list[str]:
    d = os.path.join(ckpt, "offsets")
    try:
        names = [f for f in os.listdir(d) if f.isdigit()]
    except FileNotFoundError:
        return []
    return [os.path.join(d, f) for f in sorted(names, key=int)]


def _skew(ckpt: str, mode: str) -> str:
    files = _offsets_files(ckpt)
    if not files:
        raise RuntimeError("no offsets log to skew")
    first_ts = None
    touched = 0
    for path in files:
        with open(path) as fh:
            lines = fh.read().splitlines()
        if len(lines) < 2 or not lines[1].startswith("{"):
            continue  # no OffsetSeqMetadata line
        meta = json.loads(lines[1])
        if "batchTimestampMs" not in meta:
            continue
        if first_ts is None:
            first_ts = meta["batchTimestampMs"]
        if mode == "regressed":
            meta["batchTimestampMs"] += TEN_YEARS_MS
        elif mode == "frozen":
            meta["batchTimestampMs"] = first_ts
        else:
            raise ValueError(mode)
        lines[1] = json.dumps(meta, separators=(",", ":"))
        with open(path, "w") as fh:
            fh.write("\n".join(lines) + "\n")
        sfd._drop_crc(path)
        touched += 1
    if not touched:
        raise RuntimeError("no batchTimestampMs found in offsets log")
    return f"{touched} offsets entr{'y' if touched == 1 else 'ies'} {mode}"


def run_case(shape: str, mode: str, master_input: str,
             attempts: int = 3) -> tuple[bool, str]:
    for _ in range(attempts):
        work = tempfile.mkdtemp(prefix=f"edps_clockskew_{shape}_{mode}_")
        input_dir = os.path.join(work, "input")
        shutil.copytree(master_input, input_dir)
        ckpt = os.path.join(work, "ckpt")
        try:
            want = scc._oracle(shape, input_dir)
            p = scc._spawn(shape, input_dir, work, "run")
            outcome = scc._kill_after_commits(p, ckpt, 2)
            if not outcome.startswith("KILLED"):
                continue  # stream drained before the kill — retry
            try:
                detail = _skew(ckpt, mode)
            except RuntimeError as e:
                return False, f"{outcome}; {e}"
            try:
                v = subprocess.run(
                    [sys.executable, "-c", scc._PROBE, shape, input_dir,
                     work, "verify"],
                    cwd=REPO, capture_output=True, text=True, timeout=600,
                )
            except subprocess.TimeoutExpired:
                return False, f"{outcome}; PROBE-DEAD restart timeout"
            if v.returncode != 0:
                return False, (f"{outcome}; {detail}; REFUSED: a clock-"
                               f"skewed restart must keep working "
                               f"(rc={v.returncode}, stderr tail "
                               f"{v.stderr[-300:]!r})")
            final = next((ln for ln in v.stdout.splitlines()
                          if ln.startswith("FINAL")), None)
            if final != want:
                return False, (f"{outcome}; {detail}; DIVERGED: got "
                               f"{final!r} want {want!r} — event-time "
                               "state leaned on the wall clock")
            return True, f"{outcome}; {detail}; drained oracle-equal"
        finally:
            shutil.rmtree(work, ignore_errors=True)
    return False, f"no kill landed in {attempts} tries"


def main() -> int:
    args = sys.argv[1:]
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    shapes = args[1:] or SHAPES
    master = tempfile.mkdtemp(prefix="edps_clockskew_input_")
    rc, n = 0, 0
    try:
        scc._prepare_input(sf_dir, master)
        print(f"input: {scc.N_FILES} ts-ordered files, "
              f"{scc.REDELIVER_ROWS}-row cross-file re-deliveries, "
              f"from {sf_dir}")
        for shape in shapes:
            for mode in MODES:
                ok, detail = run_case(shape, mode, master)
                n += 1
                print(f"{'PASS' if ok else 'FAIL'} {shape} clock-{mode}: "
                      f"{detail}", flush=True)
                rc |= 0 if ok else 1
    finally:
        shutil.rmtree(master, ignore_errors=True)
    if rc == 0:
        print(f"clock-skew: {n}/{n} — regressed/frozen driver clocks "
              "absorbed, event-time answers unchanged")
    return rc


if __name__ == "__main__":
    raise SystemExit(main())
