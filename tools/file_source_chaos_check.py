"""File-source tamper chaos — twenty-second hostile axis (round 16).

The read-side mirror of corrupted-input (VERDICT r15 item 3) and the
natural sequel to the r15 stream-chaos axis: that axis proved the
CHECKPOINT survives a kill; this one proves the INPUT FILES the
checkpoint pins are honored or mourned loudly. A killed availableNow
stream leaves a planned-but-uncommitted batch whose exact file list is
pinned in ``<ckpt>/sources/0/<b>`` — the restart re-plans batch ``b``
from that pinned list and RE-READS those files (exactly the re-plan
window where r15's duplicate-insert bug hid). If a pinned file was
deleted, truncated, or overwritten with garbage between the kill and
the restart, the only acceptable behavior is a LOUD job failure naming
the file/corruption — never an empty or truncated batch feeding a
plausible-but-short sink (``spark.sql.files.ignoreMissingFiles`` /
``ignoreCorruptFiles`` default false is the engine fact this leans on;
if an upgrade flips either, this axis names the damage).

Control cases pin the other half of the contract: tampering a file
whose batch already COMMITTED must NOT hurt — committed batches are
never re-read (their effect is in sink+state), and the file-source
seen-map is path-keyed, so a changed mtime must not re-admit the path
as a new file. The restart drains and the sink is oracle-equal with
the ORIGINAL input. A future Spark that re-keys the seen-map by
(path, mtime) would silently re-ingest the tampered content — the
control turns that drift into a loud axis failure.

Matrix: 3 stream shapes (merge / dedup / windowagg — the same probe
bodies as tools/stream_chaos_check.py, imported) × 3 tamper modes on
the pending batch (must fail loud) + 3 committed-file controls (one
tamper mode per shape; must drain oracle-equal) = 12 cases.

Usage: python tools/file_source_chaos_check.py [sf_dir] [shape ...]
"""

from __future__ import annotations

import json
import os
import shutil
import signal
import subprocess
import sys
import tempfile
import time
from urllib.parse import unquote, urlparse

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import stream_chaos_check as scc  # noqa: E402  (probe + oracle reuse)

SHAPES = ["merge", "dedup", "windowagg"]
TAMPERS = ["delete", "truncate", "garbage"]
# loud-signal phrases per tamper mode — narrow on purpose (the
# disk-pressure precedent): a generic failure must not score as a
# successful detection. Matched case-insensitively against the verify
# run's stderr chain.
_LOUD_SIGNALS = {
    # delete is caught by the r16 restart guard (incremental.py::
    # audit_checkpoint_inputs), NOT by Spark: a file missing at restart
    # drops out at PLANNING time (measured: clean exit, batch short by
    # exactly the file's rows) — ignoreMissingFiles guards task time
    # only. The guard's FileNotFoundError is the required loud failure.
    "delete": ("filenotfounderror", "no longer exist",
               "filenotfoundexception", "does not exist", "no such file"),
    "truncate": ("parquet", "footer", "corrupt", "magic",
                 "unexpected end", "eofexception"),
    "garbage": ("parquet", "footer", "corrupt", "magic", "not a parquet"),
}


def _batch_ids(d: str) -> set[int]:
    try:
        return {int(f) for f in os.listdir(d) if f.isdigit()}
    except FileNotFoundError:
        return set()


def _source_log_files(ckpt: str, b: int) -> list[str]:
    """File paths pinned for batch ``b`` in the file-source metadata log
    (``sources/0/<b>``, or the ``<n>.compact`` that swallowed it)."""
    src = os.path.join(ckpt, "sources", "0")
    cand = os.path.join(src, str(b))
    if not os.path.exists(cand):
        compacts = sorted(
            (int(f.split(".")[0]) for f in os.listdir(src)
             if f.endswith(".compact")),
            reverse=True,
        )
        take = next((c for c in compacts if c >= b), None)
        if take is None:
            return []
        cand = os.path.join(src, f"{take}.compact")
    paths = []
    with open(cand) as fh:
        for ln in fh:
            ln = ln.strip()
            if not ln.startswith("{"):
                continue  # "v1" header
            entry = json.loads(ln)
            if "batchId" in entry and entry["batchId"] != b:
                continue
            p = entry["path"]
            if p.startswith("file:"):
                p = unquote(urlparse(p).path)
            paths.append(p)
    return paths


def _pending_and_committed(ckpt: str) -> tuple[int | None, int | None]:
    """(max planned-but-uncommitted batch, max committed batch)."""
    planned = _batch_ids(os.path.join(ckpt, "sources", "0"))
    committed = _batch_ids(os.path.join(ckpt, "commits"))
    pending = planned - committed
    return (max(pending) if pending else None,
            max(committed) if committed else None)


def _kill_with_pending(proc, ckpt: str, min_commits: int,
                       timeout_s: int = 300) -> str:
    """SIGKILL once >= min_commits commits exist AND a planned batch is
    still uncommitted — the restart then MUST re-read that batch's
    pinned files, which is the window this axis tampers."""
    t0 = time.time()
    while time.time() - t0 < timeout_s:
        if proc.poll() is not None:
            return "KILL-LATE"
        pending, committed = _pending_and_committed(ckpt)
        if (committed is not None and committed + 1 >= min_commits
                and pending is not None):
            proc.send_signal(signal.SIGKILL)
            proc.wait()
            return f"KILLED commits<= {committed} pending={pending}"
        time.sleep(0.01)
    proc.kill()
    proc.wait()
    return "PROBE-DEAD poll timeout"


def _tamper(path: str, mode: str) -> None:
    if mode == "delete":
        os.remove(path)
    elif mode == "truncate":
        # keep the PAR1 header magic, destroy the footer — the
        # mid-write/partial-copy shape a real object store produces
        size = os.path.getsize(path)
        with open(path, "r+b") as fh:
            fh.truncate(max(size // 2, 8))
    elif mode == "garbage":
        with open(path, "wb") as fh:
            fh.write(b"\x00GARBAGE-NOT-PARQUET\x00" * 64)
    else:
        raise ValueError(mode)


def _put_schema_ref(master_input: str, work: str) -> None:
    """Pristine single-file schema sidecar: the probe must not batch-
    infer schema over the (tampered) input dir — that read happens
    outside the stream under test and fails on corrupt files."""
    first = sorted(f for f in os.listdir(master_input)
                   if f.endswith(".parquet"))[0]
    shutil.copy(os.path.join(master_input, first),
                os.path.join(work, "schema_ref.parquet"))


def _restart(shape: str, input_dir: str, work: str):
    try:
        return subprocess.run(
            [sys.executable, "-c", scc._PROBE, shape, input_dir, work,
             "verify"],
            cwd=REPO, capture_output=True, text=True, timeout=600,
        )
    except subprocess.TimeoutExpired:
        return None


def run_loud_case(shape: str, tamper: str, master_input: str,
                  attempts: int = 3) -> tuple[bool, str]:
    """Tamper a PENDING batch's pinned file; restart must fail loud."""
    for attempt in range(attempts):
        work = tempfile.mkdtemp(prefix=f"edps_fschaos_{shape}_{tamper}_")
        input_dir = os.path.join(work, "input")
        shutil.copytree(master_input, input_dir)
        _put_schema_ref(master_input, work)
        ckpt = os.path.join(work, "ckpt")
        try:
            p = scc._spawn(shape, input_dir, work, "run")
            outcome = _kill_with_pending(p, ckpt, min_commits=2)
            if not outcome.startswith("KILLED"):
                continue  # protocol race — retry with a fresh run
            pending, _ = _pending_and_committed(ckpt)
            files = _source_log_files(ckpt, pending) if pending is not None else []
            if not files:
                continue  # offsets raced ahead of the sources log — retry
            _tamper(files[0], tamper)
            v = _restart(shape, input_dir, work)
            if v is None:
                return False, f"{outcome}; PROBE-DEAD restart timeout"
            if v.returncode == 0:
                final = next((ln for ln in v.stdout.splitlines()
                              if ln.startswith("FINAL")), "")
                return False, (f"{outcome}; SILENT: restart drained over a "
                               f"{tamper}d pinned file ({final})")
            err = (v.stderr or "").lower()
            hit = next((s for s in _LOUD_SIGNALS[tamper] if s in err), None)
            if hit is None:
                return False, (f"{outcome}; LOUD but unnamed: rc="
                               f"{v.returncode} no {tamper} signal in "
                               f"stderr tail {v.stderr[-300:]!r}")
            return True, f"{outcome}; loud on restart ({hit!r})"
        finally:
            shutil.rmtree(work, ignore_errors=True)
    return False, f"no kill landed with a pending batch in {attempts} tries"


def run_control_case(shape: str, tamper: str, master_input: str,
                     attempts: int = 3) -> tuple[bool, str]:
    """Tamper a COMMITTED batch's file; restart must drain oracle-equal
    vs the ORIGINAL input (committed batches are never re-read and the
    path-keyed seen-map must not re-admit the changed file)."""
    for attempt in range(attempts):
        work = tempfile.mkdtemp(prefix=f"edps_fsctrl_{shape}_{tamper}_")
        input_dir = os.path.join(work, "input")
        shutil.copytree(master_input, input_dir)
        _put_schema_ref(master_input, work)
        ckpt = os.path.join(work, "ckpt")
        try:
            want = scc._oracle(shape, input_dir)  # pre-tamper truth
            p = scc._spawn(shape, input_dir, work, "run")
            outcome = scc._kill_after_commits(p, ckpt, 2)
            if not outcome.startswith("KILLED"):
                continue
            files = _source_log_files(ckpt, 0)
            if not files:
                return False, f"{outcome}; no sources log for batch 0"
            _tamper(files[0], tamper)
            v = _restart(shape, input_dir, work)
            if v is None:
                return False, f"{outcome}; PROBE-DEAD restart timeout"
            final = next((ln for ln in v.stdout.splitlines()
                          if ln.startswith("FINAL")), None)
            if v.returncode != 0 or final is None:
                return False, (f"{outcome}; control restart failed rc="
                               f"{v.returncode} {v.stderr[-300:]!r} — "
                               "committed input was re-read")
            if final != want:
                return False, (f"{outcome}; control MISMATCH got {final!r} "
                               f"want {want!r}")
            return True, f"{outcome}; committed-file tamper harmless; {final}"
        finally:
            shutil.rmtree(work, ignore_errors=True)
    return False, f"no kill landed in {attempts} tries"


def main() -> int:
    args = sys.argv[1:]
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    shapes = args[1:] or SHAPES
    master = tempfile.mkdtemp(prefix="edps_fschaos_input_")
    rc = 0
    try:
        scc._prepare_input(sf_dir, master)
        print(f"input: {scc.N_FILES} ts-ordered files, "
              f"{scc.REDELIVER_ROWS}-row cross-file re-deliveries, "
              f"from {sf_dir}")
        n = 0
        for shape in shapes:
            for tamper in TAMPERS:
                ok, detail = run_loud_case(shape, tamper, master)
                n += 1
                print(f"{'PASS' if ok else 'FAIL'} {shape} "
                      f"pending+{tamper}: {detail}", flush=True)
                rc |= 0 if ok else 1
        # one control per shape, rotating tamper modes for coverage
        for shape, tamper in zip(shapes, TAMPERS):
            ok, detail = run_control_case(shape, tamper, master)
            n += 1
            print(f"{'PASS' if ok else 'FAIL'} {shape} "
                  f"committed+{tamper} (control): {detail}", flush=True)
            rc |= 0 if ok else 1
    finally:
        shutil.rmtree(master, ignore_errors=True)
    if rc == 0:
        print(f"file-source-chaos: {n}/{n} tamper cases — pending loud, "
              "committed harmless")
    return rc


if __name__ == "__main__":
    raise SystemExit(main())
