"""Writer-side permission chaos — twenty-sixth hostile axis (round 17,
VERDICT r16 item 4).

The write-side mirror of the file-source tamper axis (entry 97): that
axis proved a restarted stream honors or mourns its INPUT files; this
one proves a stream whose SINK or CHECKPOINT directory goes read-only
MID-STREAM fails LOUDLY — never a silently-stalled query, never a
half-written commit that a later reader serves as truth. The real-world
shapes: a volume remounted read-only after an I/O error, an operator
revoking a service account's write grant, a quota daemon freezing a
directory.

Reduction: the probe runs as root in this container, so POSIX mode bits
cannot block it (root bypasses DAC) — ``chattr -R +i`` (ext4 immutable
flag) is the in-container equivalent of the volume flip: it denies
create/rename/unlink even to root, exactly the EPERM surface a
read-only remount produces.

Matrix: 3 stream shapes (merge / dedup / windowagg — probe bodies
imported from tools/stream_chaos_check.py) × 2 flip targets (sink dir,
checkpoint dir). Each case:

1. run the availableNow stream; once >= 2 micro-batches committed and
   work is still pending, flip the target immutable;
2. the probe must EXIT NONZERO with an EPERM-family signal in stderr
   ("operation not permitted" / "permission denied" / ...) — an exit-0
   drain means the flip raced the drain (protocol retry), a hung probe
   is PROBE-STALLED (FAIL: a silently-stalled stream is the failure
   mode under test);
3. RECOVERY CONTROL folded into every case: restore the flag, restart
   from the same checkpoint, drain — the sink must be oracle-equal with
   the original input (the interrupted write left no half-commit the
   sink's contract serves: parquet batch writes stage under
   _temporary/ and rename-at-commit, the streaming file sink admits
   only manifest-listed files, and the merge anti-join absorbs the
   replayed batch).

Usage: python tools/writer_permission_check.py [sf_dir] [shape ...]
"""

from __future__ import annotations

import os
import shutil
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import stream_chaos_check as scc  # noqa: E402  (probe + oracle reuse)

SHAPES = ["merge", "dedup", "windowagg"]
TARGETS = ["sink", "ckpt"]
# EPERM-family phrases only — a generic failure must not score as a
# successful loud detection (the disk-pressure axis precedent)
_LOUD_SIGNALS = (
    "operation not permitted",
    "permission denied",
    "accessdeniedexception",
    "accesscontrolexception",
    "read-only file system",
    "failed to rename",
    "unable to clear output directory",
    "could not create",
    # RawLocalFileSystem swallows the EPERM into a boolean mkdirs() —
    # the IOException it then raises names the denied path but not the
    # errno (measured: the batch-parquet sink path fails this way)
    "mkdirs failed to create",
)


def _n_commits(ckpt: str) -> int:
    try:
        return len([f for f in os.listdir(os.path.join(ckpt, "commits"))
                    if f.isdigit()])
    except FileNotFoundError:
        return 0


def _flag(path: str, on: bool) -> None:
    subprocess.run(["chattr", "-R", ("+i" if on else "-i"), path],
                   check=True, capture_output=True)


def _restore(path: str) -> None:
    if os.path.exists(path):
        subprocess.run(["chattr", "-R", "-i", path], capture_output=True)


def _flip_when_midstream(proc, ckpt: str, target_dir: str,
                         min_commits: int = 2,
                         timeout_s: int = 300) -> str:
    """Flip target_dir immutable once >= min_commits batches committed
    while the probe is still running (pending work remains by
    construction: 16 single-file triggers)."""
    t0 = time.time()
    while time.time() - t0 < timeout_s:
        if proc.poll() is not None:
            return "FLIP-LATE"  # drained before we flipped — retry
        if _n_commits(ckpt) >= min_commits and os.path.isdir(target_dir):
            try:
                _flag(target_dir, True)
            except subprocess.CalledProcessError:
                # dir mutated mid-walk (stream is live) — try again
                time.sleep(0.01)
                continue
            return f"FLIPPED at commits={_n_commits(ckpt)}"
        time.sleep(0.01)
    return "PROBE-STALLED before flip"


def run_case(shape: str, target: str, master_input: str,
             attempts: int = 4) -> tuple[bool, str]:
    for attempt in range(attempts):
        work = tempfile.mkdtemp(prefix=f"edps_wperm_{shape}_{target}_")
        input_dir = os.path.join(work, "input")
        shutil.copytree(master_input, input_dir)
        ckpt = os.path.join(work, "ckpt")
        sink = os.path.join(work, "sink")
        target_dir = sink if target == "sink" else ckpt
        try:
            want = scc._oracle(shape, input_dir)
            p = scc._spawn(shape, input_dir, work, "run")
            outcome = _flip_when_midstream(p, ckpt, target_dir)
            if outcome == "FLIP-LATE":
                p.communicate()
                continue  # protocol race — retry with a fresh run
            if not outcome.startswith("FLIPPED"):
                p.kill()
                p.communicate()
                return False, outcome
            try:
                # communicate, not wait: the probe's stderr is PIPEd and
                # Spark is chatty — wait() deadlocks on a full pipe
                _, stderr = p.communicate(timeout=300)
            except subprocess.TimeoutExpired:
                p.kill()
                p.communicate()
                return False, (f"{outcome}; PROBE-STALLED: stream neither "
                               "failed nor finished 300 s after the "
                               f"{target} went read-only — the silent "
                               "stall this axis exists to catch")
            rc = p.returncode
            stderr = stderr or ""
            if rc == 0:
                # drained clean AFTER the flip landed? Only possible if
                # every remaining write beat the flag — treat as a race
                # and retry, but never pass on it.
                continue
            err = stderr.lower()
            hit = next((s for s in _LOUD_SIGNALS if s in err), None)
            if hit is None:
                return False, (f"{outcome}; LOUD but unnamed: rc={rc}, no "
                               f"EPERM-family signal in stderr tail "
                               f"{stderr[-300:]!r}")
            # recovery control: restore write access, restart from the
            # same checkpoint, drain, compare against the oracle
            _restore(target_dir)
            v = subprocess.run(
                [sys.executable, "-c", scc._PROBE, shape, input_dir, work,
                 "verify"],
                cwd=REPO, capture_output=True, text=True, timeout=600,
            )
            if v.returncode != 0:
                return False, (f"{outcome}; loud ({hit!r}) but recovery "
                               f"restart failed rc={v.returncode} "
                               f"{v.stderr[-300:]!r}")
            final = next((ln for ln in v.stdout.splitlines()
                          if ln.startswith("FINAL")), None)
            if final != want:
                return False, (f"{outcome}; loud ({hit!r}) but recovery "
                               f"MISMATCH got {final!r} want {want!r} — "
                               "the interrupted write left a half-commit")
            return True, (f"{outcome}; loud ({hit!r}); recovery "
                          f"oracle-equal ({final})")
        except subprocess.TimeoutExpired:
            return False, "PROBE-DEAD recovery timeout"
        finally:
            _restore(target_dir)
            shutil.rmtree(work, ignore_errors=True)
    return False, f"flip raced the drain in {attempts} tries"


def main() -> int:
    args = sys.argv[1:]
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    shapes = args[1:] or SHAPES
    # refuse to run where the reduction cannot hold (non-ext4 tmp)
    probe_dir = tempfile.mkdtemp(prefix="edps_wperm_probe_")
    try:
        _flag(probe_dir, True)
        try:
            os.mkdir(os.path.join(probe_dir, "x"))
            print("REFUSED: chattr +i does not block writes on this "
                  "filesystem — the read-only reduction cannot run here")
            return 2
        except PermissionError:
            pass
    finally:
        _restore(probe_dir)
        shutil.rmtree(probe_dir, ignore_errors=True)

    master = tempfile.mkdtemp(prefix="edps_wperm_input_")
    rc = 0
    try:
        scc._prepare_input(sf_dir, master)
        print(f"input: {scc.N_FILES} ts-ordered files, "
              f"{scc.REDELIVER_ROWS}-row cross-file re-deliveries, "
              f"from {sf_dir}")
        n = 0
        for shape in shapes:
            for target in TARGETS:
                ok, detail = run_case(shape, target, master)
                n += 1
                print(f"{'PASS' if ok else 'FAIL'} {shape} {target}"
                      f"-readonly: {detail}", flush=True)
                rc |= 0 if ok else 1
    finally:
        shutil.rmtree(master, ignore_errors=True)
    if rc == 0:
        print(f"writer-permission: {n}/{n} cases — mid-stream read-only "
              "flips loud, recovery oracle-equal")
    return rc


if __name__ == "__main__":
    raise SystemExit(main())
