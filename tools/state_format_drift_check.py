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

Tamper modes (applied to the live checkpoint between kill and restart),
each pinned to the behavior MEASURED on this PySpark (4.1.2):

expected LOUD (nonzero exit + an error chain naming the seam):

- log_header        — offsets/<latest> first line "v1" -> "v99": the
                      HDFSMetadataLog version gate, the outermost seam.
- state_schema_version — the per-partition state schema file's "v2"
                      marker -> "v9": StateSchemaCompatibilityChecker's
                      versioned format.
- state_delta_forged — every state .delta file overwritten with a
                      forged future-format header: the store must
                      refuse to load, never deserialize garbage state.

expected ABSORBED (clean drain, FINAL oracle-equal) — a first run of
this axis found these forgeries are NOT refused, they are silently
ignored, so the axis PINS that semantics instead of wishing otherwise:

- conf_forged       — stateFormatVersion=99 + a nonexistent
                      stateStore.providerClass forged into the
                      offsets-log OffsetSeqMetadata. Spark restores
                      session confs from the checkpoint on a
                      best-effort basis and the forged values do not
                      reach the re-planned operator on this build; the
                      result stays correct because the on-disk state
                      files are genuine. If an upgrade starts honoring
                      (or loudly refusing) checkpoint conf, this case
                      flips and names the drift.
- state_meta_header — state/<op>/_metadata/metadata "v1" -> "v99": the
                      operator-state metadata file is ADVISORY on
                      restart in this build (written per run, read by
                      state tooling, not re-validated by the resumed
                      query) — measured clean oracle-equal drains on
                      all three shapes. Pinned absorbed; an upgrade
                      that starts gating on it flips this case.

A restart that drains cleanly over a forged-future checkpoint in a
LOUD case is the silent-wrong this axis hunts; an ABSORBED case that
fails or drains to a different answer is behavior drift.

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
    "dedup": "spark.sql.streaming.aggregation.stateFormatVersion",
}

MODES = ["log_header", "state_meta_header", "state_schema_version",
         "state_delta_forged", "conf_forged"]

_LOUD_SIGNALS = {
    "log_header": ("log file was produced by a newer version",
                   "maximum supported log version", "v99",
                   "unsupportedoperation"),
    "state_meta_header": ("log file was produced by a newer version",
                          "maximum supported log version", "v99",
                          "metadata"),
    "state_schema_version": ("schema", "version", "v9", "unexpected",
                             "invalid", "corrupt"),
    "state_delta_forged": ("delta file", "lz4", "corrupt", "eof",
                           "error reading", "stream", "snappy",
                           "cannot read"),
}


def _latest(d: str) -> str | None:
    try:
        ids = [int(f) for f in os.listdir(d) if f.isdigit()]
    except FileNotFoundError:
        return None
    return os.path.join(d, str(max(ids))) if ids else None


def _state_files(ckpt: str, suffix_or_name: str) -> list[str]:
    hits = []
    for root, _dirs, files in os.walk(os.path.join(ckpt, "state")):
        for f in files:
            if f == suffix_or_name or f.endswith(suffix_or_name):
                hits.append(os.path.join(root, f))
    return sorted(hits)


def _drop_crc(path: str) -> None:
    """Hadoop's local FS verifies .crc sidecars BEFORE content reaches
    the format reader; remove them so the tamper tests the FORMAT gate,
    not the checksum transport (a future writer would produce matching
    checksums for its future bytes)."""
    d, f = os.path.split(path)
    for crc in (os.path.join(d, f".{f}.crc"),
                os.path.join(d, f".{f}.crc.crc")):
        try:
            os.remove(crc)
        except OSError:
            pass


def _tamper(ckpt: str, mode: str, shape: str) -> str:
    if mode == "log_header":
        offsets = _latest(os.path.join(ckpt, "offsets"))
        if offsets is None:
            raise RuntimeError("no offsets log to tamper")
        with open(offsets) as fh:
            lines = fh.read().splitlines()
        lines[0] = "v99"
        with open(offsets, "w") as fh:
            fh.write("\n".join(lines) + "\n")
        return f"offsets/{os.path.basename(offsets)} header -> v99"
    if mode == "state_meta_header":
        metas = [p for p in _state_files(ckpt, "metadata")
                 if os.sep + "_metadata" + os.sep in p]
        if not metas:
            raise RuntimeError("no operator-state metadata file")
        for p in metas:
            with open(p) as fh:
                lines = fh.read().splitlines()
            lines[0] = "v99"
            with open(p, "w") as fh:
                fh.write("\n".join(lines) + "\n")
            _drop_crc(p)
        return f"{len(metas)} state _metadata/metadata header(s) -> v99"
    if mode == "state_schema_version":
        schemas = _state_files(ckpt, "schema")
        if not schemas:
            raise RuntimeError("no state schema file")
        for p in schemas:
            with open(p, "rb") as fh:
                blob = fh.read()
            if b"v2" not in blob:
                raise RuntimeError(f"no v2 marker in {p}")
            with open(p, "wb") as fh:
                fh.write(blob.replace(b"v2", b"v9", 1))
            _drop_crc(p)
        return f"{len(schemas)} state schema file(s) v2 -> v9"
    if mode == "state_delta_forged":
        deltas = _state_files(ckpt, ".delta")
        if not deltas:
            raise RuntimeError("no state delta files")
        for p in deltas:
            with open(p, "wb") as fh:
                fh.write(b"FUTURE-STATE-FORMAT-v9\x00" * 8)
            _drop_crc(p)
        return f"{len(deltas)} .delta file(s) forged future-format"
    if mode == "conf_forged":
        offsets = _latest(os.path.join(ckpt, "offsets"))
        if offsets is None:
            raise RuntimeError("no offsets log to tamper")
        with open(offsets) as fh:
            lines = fh.read().splitlines()
        meta = json.loads(lines[1])
        meta.setdefault("conf", {})[_STATE_CONF_KEY[shape]] = "99"
        meta["conf"]["spark.sql.streaming.stateStore.providerClass"] = (
            "org.apache.spark.sql.future.FutureStateStoreProvider"
        )
        lines[1] = json.dumps(meta, separators=(",", ":"))
        with open(offsets, "w") as fh:
            fh.write("\n".join(lines) + "\n")
        return "OffsetSeqMetadata conf forged (format v99 + provider)"
    raise ValueError(mode)


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
            final = next((ln for ln in v.stdout.splitlines()
                          if ln.startswith("FINAL")), "")
            if mode in ("conf_forged", "state_meta_header"):
                # pinned ABSORBED semantics: clean drain, oracle-equal
                want = scc._oracle(shape, input_dir)
                if v.returncode != 0:
                    return False, (f"{outcome}; DRIFT: {mode} forgery now "
                                   f"refused (rc={v.returncode}) — pinned "
                                   f"behavior was absorbed; stderr tail "
                                   f"{v.stderr[-200:]!r}")
                if final != want:
                    return False, (f"{outcome}; DRIFT: absorbed but answer "
                                   f"moved: got {final!r} want {want!r}")
                return True, f"{outcome}; {detail}; absorbed oracle-equal"
            if v.returncode == 0:
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
            for mode in MODES:
                ok, detail = run_case(shape, mode, master)
                n += 1
                print(f"{'PASS' if ok else 'FAIL'} {shape}+{mode}: {detail}",
                      flush=True)
                rc |= 0 if ok else 1
    finally:
        shutil.rmtree(master, ignore_errors=True)
    if rc == 0:
        print(f"state-format-drift: {n}/{n} — forged-future state refused "
              "loudly, conf forgeries pinned absorbed")
    return rc


if __name__ == "__main__":
    raise SystemExit(main())
