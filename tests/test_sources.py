"""Ingest source tests: adaptive window planning, GeoJSON flattening, the
registered Python DataSource (offline modes only), IO helpers."""

from __future__ import annotations

import json
import os
import time
from datetime import date

import pytest
from pyspark.sql import functions as F

from earthquake_data_pipeline_spark.schemas import RAW_EVENT_SCHEMA
from earthquake_data_pipeline_spark.sources.io import (
    empty_clone,
    read_csv,
    write_month_partitioned,
    write_parquet,
)
from earthquake_data_pipeline_spark.sources.usgs import (
    PAGE_CAP,
    FixtureFetcher,
    SyntheticFetcher,
    UsgsDataSource,
    fetch_to_dataframe,
    flatten_feature,
    plan_windows,
)


def test_plan_windows_respects_page_cap():
    # 2000 rows/day: 15-day probe = 30k > cap → back off to 7 days
    f = SyntheticFetcher(rows_per_day=2000)
    windows = plan_windows(f, date(2000, 1, 1), date(2000, 6, 1))
    assert len(windows) > 1
    for ws, we in windows:
        assert f.count(ws, we) <= PAGE_CAP
    # contiguity + coverage
    assert windows[0][0] == date(2000, 1, 1)
    assert windows[-1][1] == date(2000, 6, 1)
    for (_, e1), (s2, _) in zip(windows, windows[1:]):
        assert e1 == s2


def test_plan_windows_epoch_jumps():
    # sparse density: the 1500→1949→1965 era jumps emit single windows
    f = SyntheticFetcher(rows_per_day=0)
    windows = plan_windows(f, date(1500, 1, 1), date(1970, 1, 1))
    assert windows[0] == (date(1500, 1, 1), date(1949, 1, 1))
    assert windows[1] == (date(1949, 1, 1), date(1965, 1, 1))


def test_flatten_feature_contract():
    entry = {
        "properties": {"place": "x", "time": 1000, "mag": 5.0, "alert": None,
                       "tsunami": 1, "tz": None, "type": "earthquake"},
        "geometry": {"coordinates": [120.5, -30.2, 10.0]},
    }
    row = flatten_feature(entry)
    # coordinate order: GeoJSON is (lon, lat, depth) → schema (lat, lon)
    assert row[3] == -30.2 and row[4] == 120.5 and row[5] == 10.0
    assert flatten_feature({"properties": {}}) is None  # malformed → skipped


def test_datasource_synthetic_roundtrip(spark):
    spark.dataSource.register(UsgsDataSource)
    df = (
        spark.read.format("usgs_fdsn")
        .option("mode", "synthetic")
        .option("rows_per_day", "3")
        .option("start_date", "2024-01-01")
        .option("end_date", "2024-01-11")
        .load()
    )
    assert df.schema == RAW_EVENT_SCHEMA
    assert df.count() == 30  # 10 days × 3
    # deterministic: same options → same data
    again = (
        spark.read.format("usgs_fdsn")
        .option("mode", "synthetic")
        .option("rows_per_day", "3")
        .option("start_date", "2024-01-01")
        .option("end_date", "2024-01-11")
        .load()
    )
    assert sorted(df.collect()) == sorted(again.collect())


def test_fixture_fetcher_and_fallback(spark, tmp_path):
    fixture = {
        "counts": {"2024-01-01|2024-01-31": 2},
        "pages": {
            "2024-01-01|2024-01-31": {
                "features": [
                    {"properties": {"place": "a", "time": 1, "mag": 1.0,
                                    "alert": None, "tsunami": 0, "tz": None,
                                    "type": "earthquake"},
                     "geometry": {"coordinates": [1.0, 2.0, 3.0]}},
                    {"properties": {}},  # malformed, skipped
                ]
            }
        },
    }
    p = tmp_path / "fixture.json"
    p.write_text(json.dumps(fixture))
    df = fetch_to_dataframe(
        spark, FixtureFetcher(str(p)), date(2024, 1, 1), date(2024, 1, 31)
    )
    rows = df.collect()
    assert len(rows) == 1 and rows[0].place == "a"


def test_io_month_partitioned_pruning(spark, tmp_path):
    df = spark.createDataFrame(
        [(1, "2024-01-05 00:00:00"), (2, "2024-02-10 00:00:00")], ["id", "ts"]
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    out = str(tmp_path / "months")
    write_month_partitioned(df, out, "ts")
    back = spark.read.parquet(out)
    jan = back.filter(F.col("event_month") == "2024-01")
    assert [r.id for r in jan.collect()] == [1]
    # partition pruning visible in the physical plan
    plan = jan._jdf.queryExecution().executedPlan().toString()
    assert "event_month" in plan


def test_io_csv_roundtrip_and_empty_clone(spark, tmp_path):
    df = spark.createDataFrame(
        [("p", 1000, 5.0, 1.0, 2.0, 3.0, None, 0, None, "earthquake")],
        RAW_EVENT_SCHEMA,
    )
    out = str(tmp_path / "csv")
    df.write.mode("overwrite").option("header", "true").csv(out)
    back = read_csv(spark, out, RAW_EVENT_SCHEMA)
    assert back.schema == RAW_EVENT_SCHEMA and back.count() == 1
    clone = empty_clone(back)
    assert clone.count() == 0 and clone.schema == back.schema
    write_parquet(clone, str(tmp_path / "pq"), num_files=1)
    assert spark.read.parquet(str(tmp_path / "pq")).count() == 0


# --- S8: shapefile -> WKT dim loader -------------------------------------

def _write_fixture_shapefile(base, records):
    """Write a minimal Polygon .shp/.dbf pair per the public ESRI spec.

    ``records`` = list of (name, region, rings) where rings is a list of
    [(x, y), ...] rings (outer CW, holes CCW), or rings=None for a null
    shape.
    """
    import struct

    shp_records = b""
    for recno, (_, _, rings) in enumerate(records, start=1):
        if rings is None:
            content = struct.pack("<i", 0)
        else:
            pts = [p for ring in rings for p in ring]
            xs = [p[0] for p in pts]
            ys = [p[1] for p in pts]
            parts, off = [], 0
            for ring in rings:
                parts.append(off)
                off += len(ring)
            content = struct.pack(
                "<i4dii", 5, min(xs), min(ys), max(xs), max(ys),
                len(rings), len(pts),
            )
            content += struct.pack(f"<{len(parts)}i", *parts)
            content += struct.pack(f"<{2 * len(pts)}d", *[c for p in pts for c in p])
        shp_records += struct.pack(">ii", recno, len(content) // 2) + content
    total = 100 + len(shp_records)
    header = struct.pack(">i", 9994) + b"\x00" * 20 + struct.pack(">i", total // 2)
    header += struct.pack("<ii", 1000, 5) + struct.pack("<4d", 0, 0, 0, 0)
    header += b"\x00" * 32  # z/m ranges
    (base.parent / (base.name + ".shp")).write_bytes(header + shp_records)

    fields = [(b"NAME", b"C", 20), (b"REGION", b"C", 16), (b"POP", b"N", 8)]
    record_size = 1 + sum(f[2] for f in fields)
    header_size = 32 + 32 * len(fields) + 1
    dbf = struct.pack(
        "<B3BIHH", 3, 24, 1, 1, len(records), header_size, record_size
    ) + b"\x00" * 20
    for name, ftype, length in fields:
        dbf += name.ljust(11, b"\x00") + ftype + b"\x00" * 4 + bytes([length]) + b"\x00" * 15
    dbf += b"\x0d"
    for i, (name, region, _) in enumerate(records):
        row = name.encode().ljust(20)[:20] + region.encode().ljust(16)[:16]
        row += str(100 + i).rjust(8).encode()
        dbf += b" " + row
    dbf += b"\x1a"
    (base.parent / (base.name + ".dbf")).write_bytes(dbf)


def test_shapefile_loader_roundtrip(tmp_path):
    from earthquake_data_pipeline_spark.sources.shapefile import (
        load_polygon_dim,
        read_dbf,
        read_shp_polygons,
    )

    outer = [(0.0, 0.0), (0.0, 10.0), (10.0, 10.0), (10.0, 0.0), (0.0, 0.0)]
    hole = [(2.0, 2.0), (8.0, 2.0), (8.0, 8.0), (2.0, 8.0), (2.0, 2.0)]
    far = [(20.0, 20.0), (20.0, 30.0), (30.0, 30.0), (30.0, 20.0), (20.0, 20.0)]
    base = tmp_path / "world"
    _write_fixture_shapefile(
        base,
        [
            ("Northland", "North", [outer, hole]),
            ("Southland", "South", [far]),
            ("Nowhere", "None", None),
        ],
    )
    wkts = read_shp_polygons(base.with_suffix(".shp"))
    assert len(wkts) == 3 and wkts[2] is None
    assert wkts[0].startswith("POLYGON") and wkts[0].count("(") == 3  # 2 rings
    attrs = read_dbf(base.with_suffix(".dbf"))
    assert attrs[0]["NAME"] == "Northland" and attrs[0]["POP"] == 100
    dim = load_polygon_dim(base.with_suffix(".shp"), "NAME", "REGION")
    assert dim[0][:2] == ("Northland", "North") and dim[2][2] is None


def test_shapefile_dim_feeds_spatial_join(spark, tmp_path):
    from earthquake_data_pipeline_spark.operators.enrichment import spatial_join
    from earthquake_data_pipeline_spark.sources.shapefile import load_polygon_dim

    outer = [(0.0, 0.0), (0.0, 10.0), (10.0, 10.0), (10.0, 0.0), (0.0, 0.0)]
    hole = [(2.0, 2.0), (8.0, 2.0), (8.0, 8.0), (2.0, 8.0), (2.0, 2.0)]
    far = [(20.0, 20.0), (20.0, 30.0), (30.0, 30.0), (30.0, 20.0), (20.0, 20.0)]
    base = tmp_path / "world"
    _write_fixture_shapefile(
        base,
        [("Northland", "North", [outer, hole]), ("Southland", "South", [far])],
    )
    dim = load_polygon_dim(base.with_suffix(".shp"), "NAME", "REGION")
    pts = spark.createDataFrame(
        [(1, 1.0, 1.0), (2, 5.0, 5.0), (3, 25.0, 25.0), (4, 50.0, 50.0)],
        ["id", "longitude", "latitude"],
    )
    got = {r.id: (r.country, r.region) for r in spatial_join(pts, dim).collect()}
    assert got[1] == ("Northland", "North")
    assert got[2] == (None, None)  # inside the hole
    assert got[3] == ("Southland", "South")
    assert got[4] == (None, None)  # no polygon


# --- S1 hardening: retry / backoff / pacing ------------------------------

class _FlakyFetcher:
    """Fails the first ``fail_n`` calls of each method, then succeeds."""

    def __init__(self, fail_n):
        self.fail_n = fail_n
        self.calls = 0

    def count(self, start, end):
        self.calls += 1
        if self.calls <= self.fail_n:
            raise ConnectionError("transient")
        return 7

    def query(self, start, end):
        self.calls += 1
        if self.calls <= self.fail_n:
            raise ConnectionError("transient")
        return {"features": []}


class _FakeClock:
    def __init__(self):
        self.t = 0.0
        self.sleeps = []

    def monotonic(self):
        return self.t

    def sleep(self, s):
        self.sleeps.append(s)
        self.t += s


def test_retrying_fetcher_retries_with_backoff():
    from earthquake_data_pipeline_spark.sources.usgs import RetryingFetcher

    clock = _FakeClock()
    inner = _FlakyFetcher(fail_n=2)
    f = RetryingFetcher(
        inner, max_retries=3, backoff_s=1.0,
        sleep=clock.sleep, monotonic=clock.monotonic,
    )
    assert f.count(date(2024, 1, 1), date(2024, 1, 2)) == 7
    assert inner.calls == 3  # 2 failures + 1 success
    assert clock.sleeps == [1.0, 2.0]  # exponential backoff


def test_retrying_fetcher_exhausts_and_reraises():
    from earthquake_data_pipeline_spark.sources.usgs import RetryingFetcher

    clock = _FakeClock()
    f = RetryingFetcher(
        _FlakyFetcher(fail_n=99), max_retries=2,
        sleep=clock.sleep, monotonic=clock.monotonic,
    )
    with pytest.raises(ConnectionError):
        f.query(date(2024, 1, 1), date(2024, 1, 2))
    assert f.attempts == 3  # initial + 2 retries


def test_retrying_fetcher_paces_consecutive_requests():
    from earthquake_data_pipeline_spark.sources.usgs import RetryingFetcher

    clock = _FakeClock()
    f = RetryingFetcher(
        _FlakyFetcher(fail_n=0), pace_s=5.0,
        sleep=clock.sleep, monotonic=clock.monotonic,
    )
    f.count(date(2024, 1, 1), date(2024, 1, 2))
    f.count(date(2024, 1, 2), date(2024, 1, 3))
    # second request waited out the 5 s politeness interval
    assert any(abs(s - 5.0) < 1e-9 for s in clock.sleeps)


def test_make_fetcher_wraps_on_request(spark):
    from earthquake_data_pipeline_spark.sources.usgs import (
        RetryingFetcher,
        SyntheticFetcher,
        make_fetcher,
    )

    plain = make_fetcher({"mode": "synthetic"})
    assert isinstance(plain, SyntheticFetcher)
    wrapped = make_fetcher({"mode": "synthetic", "max_retries": "2"})
    assert isinstance(wrapped, RetryingFetcher)
    assert wrapped.count(date(2024, 1, 1), date(2024, 1, 3)) == 4


def test_retrying_fetcher_fails_fast_on_client_error():
    from earthquake_data_pipeline_spark.sources.usgs import RetryingFetcher

    class _Resp:
        status_code = 400

    class _ClientErr(Exception):
        def __init__(self):
            super().__init__("bad request")
            self.response = _Resp()

    class _Bad:
        def __init__(self):
            self.calls = 0

        def count(self, start, end):
            self.calls += 1
            raise _ClientErr()

    clock = _FakeClock()
    bad = _Bad()
    f = RetryingFetcher(bad, max_retries=3, sleep=clock.sleep, monotonic=clock.monotonic)
    with pytest.raises(_ClientErr):
        f.count(date(2024, 1, 1), date(2024, 1, 2))
    assert bad.calls == 1  # 4xx is permanent: no retries, no backoff
    assert clock.sleeps == []


def test_make_fetcher_wraps_on_backoff_only():
    from earthquake_data_pipeline_spark.sources.usgs import (
        RetryingFetcher,
        make_fetcher,
    )

    wrapped = make_fetcher({"mode": "synthetic", "backoff_s": "2.0"})
    assert isinstance(wrapped, RetryingFetcher) and wrapped.backoff_s == 2.0


def test_retrying_fetcher_reraises_programming_errors():
    """Only allowlisted transient types retry — a TypeError/KeyError/JSON
    bug surfaces immediately instead of burning max_retries of backoff."""
    from earthquake_data_pipeline_spark.sources.usgs import RetryingFetcher

    class _Buggy:
        def __init__(self):
            self.calls = 0

        def count(self, start, end):
            self.calls += 1
            raise TypeError("programming error, not a network failure")

    clock = _FakeClock()
    buggy = _Buggy()
    f = RetryingFetcher(buggy, max_retries=3, sleep=clock.sleep, monotonic=clock.monotonic)
    with pytest.raises(TypeError):
        f.count(date(2024, 1, 1), date(2024, 1, 2))
    assert buggy.calls == 1 and clock.sleeps == []


def test_retrying_fetcher_retries_server_errors():
    from earthquake_data_pipeline_spark.sources.usgs import RetryingFetcher

    class _Resp:
        status_code = 503

    class _ServerErr(Exception):
        def __init__(self):
            super().__init__("service unavailable")
            self.response = _Resp()

    class _Flaky503:
        def __init__(self):
            self.calls = 0

        def count(self, start, end):
            self.calls += 1
            if self.calls == 1:
                raise _ServerErr()
            return 42

    clock = _FakeClock()
    f = RetryingFetcher(_Flaky503(), max_retries=2, sleep=clock.sleep, monotonic=clock.monotonic)
    assert f.count(date(2024, 1, 1), date(2024, 1, 2)) == 42


def test_rings_to_wkt_nested_hole_goes_to_innermost_outer():
    """Island-in-lake-in-island: the pond hole's vertex is inside BOTH the
    big outer and the island outer — it must attach to the smallest-area
    containing outer, not whichever was seen first."""
    from earthquake_data_pipeline_spark.sources.shapefile import _rings_to_wkt

    big = [(0.0, 0.0), (0.0, 20.0), (20.0, 20.0), (20.0, 0.0), (0.0, 0.0)]
    lake = [(2.0, 2.0), (18.0, 2.0), (18.0, 18.0), (2.0, 18.0), (2.0, 2.0)]
    island = [(4.0, 4.0), (4.0, 16.0), (16.0, 16.0), (16.0, 4.0), (4.0, 4.0)]
    pond = [(6.0, 6.0), (14.0, 6.0), (14.0, 14.0), (6.0, 14.0), (6.0, 6.0)]
    # adversarial storage order: pond appears before the lake hole
    wkt = _rings_to_wkt([big, island, pond, lake])
    assert wkt.startswith("MULTIPOLYGON (")
    bodies = wkt[len("MULTIPOLYGON ("):-1].split(")), ((")
    assert len(bodies) == 2
    assert "2.0 2.0" in bodies[0] and "6.0 6.0" not in bodies[0]  # big + lake
    assert "6.0 6.0" in bodies[1] and "4.0 4.0" in bodies[1]      # island + pond


def test_dbf_deleted_record_keeps_shp_alignment(tmp_path):
    """A soft-deleted dbf record must hold its position (None placeholder)
    so later records still pair with their .shp shapes."""
    import struct as _struct

    from earthquake_data_pipeline_spark.sources.shapefile import (
        load_polygon_dim,
        read_dbf,
    )

    outer = [(0.0, 0.0), (0.0, 10.0), (10.0, 10.0), (10.0, 0.0), (0.0, 0.0)]
    far = [(20.0, 20.0), (20.0, 30.0), (30.0, 30.0), (30.0, 20.0), (20.0, 20.0)]
    mid = [(40.0, 40.0), (40.0, 50.0), (50.0, 50.0), (50.0, 40.0), (40.0, 40.0)]
    base = tmp_path / "world"
    _write_fixture_shapefile(
        base,
        [("Aland", "A", [outer]), ("Bland", "B", [mid]), ("Cland", "C", [far])],
    )
    # soft-delete record 1 (Bland) by flipping its deletion flag to '*'
    dbf = base.with_suffix(".dbf")
    data = bytearray(dbf.read_bytes())
    header_size, record_size = _struct.unpack("<HH", data[8:12])
    data[header_size + record_size] = ord("*")
    dbf.write_bytes(bytes(data))

    attrs = read_dbf(dbf)
    assert len(attrs) == 3 and attrs[1] is None
    assert attrs[0]["NAME"] == "Aland" and attrs[2]["NAME"] == "Cland"
    dim = load_polygon_dim(base.with_suffix(".shp"), "NAME", "REGION")
    # Bland dropped, but Cland still pairs with ITS OWN polygon
    assert [d[0] for d in dim] == ["Aland", "Cland"]
    assert "20.0 20.0" in dim[1][2]


def test_write_read_table_orc_and_jsonl_roundtrip(spark, tmp_path):
    """Format-parameterized sink/scan: ORC and JSON-lines roundtrip with
    schema fidelity (ORC self-describes; JSONL re-applies the schema)."""
    from earthquake_data_pipeline_spark.sources.io import read_table, write_table

    df = spark.createDataFrame(
        [(1, "a", 1.5), (2, "b", None), (3, None, -2.25)],
        "id long, name string, score double",
    )
    for fmt in ("orc", "json"):
        path = str(tmp_path / fmt)
        write_table(df, path, fmt=fmt)
        back = read_table(spark, path, fmt=fmt, schema=df.schema)
        assert back.schema == df.schema
        assert sorted(map(tuple, back.collect())) == sorted(map(tuple, df.collect()))


# ---------- txnlog: versioned table commit log ----------


def _tlog(spark, tmp_path, rows, cols=("k", "v")):
    return spark.createDataFrame(rows, list(cols))


def test_txnlog_append_and_time_travel(spark, tmp_path):
    from earthquake_data_pipeline_spark.sources.txnlog import (
        commit_append,
        read_snapshot,
    )

    t = str(tmp_path / "tbl")
    v0 = commit_append(_tlog(spark, tmp_path, [(1, "a"), (2, "b")]), t)
    v1 = commit_append(_tlog(spark, tmp_path, [(3, "c")]), t)
    assert (v0, v1) == (0, 1)
    assert read_snapshot(spark, t).count() == 3
    assert read_snapshot(spark, t, version=0).count() == 2
    assert {r.k for r in read_snapshot(spark, t, 1).collect()} == {1, 2, 3}


def test_txnlog_overwrite_keeps_history(spark, tmp_path):
    from earthquake_data_pipeline_spark.sources.txnlog import (
        commit_append,
        commit_overwrite,
        read_snapshot,
    )

    t = str(tmp_path / "tbl")
    commit_append(_tlog(spark, tmp_path, [(1, "a"), (2, "b")]), t)
    commit_overwrite(_tlog(spark, tmp_path, [(9, "z")]), t)
    assert {r.k for r in read_snapshot(spark, t).collect()} == {9}
    assert {r.k for r in read_snapshot(spark, t, 0).collect()} == {1, 2}


def test_txnlog_first_overwrite_race_is_loud(spark, tmp_path, monkeypatch):
    """r17 (ADVICE r16 low): commit_overwrite on an EMPTY table pins
    version=0 — the pre-r17 path published with version=None
    (mint-at-publish), so a first commit racing in between
    latest_version() and the publish was silently UNIONED into the
    'overwrite' result (removed=[] cannot remove files it never saw).
    The interloper is injected after the snapshot read, before the
    publish; the overwrite must raise ConcurrentCommitError and leave
    the interloper's commit intact."""
    from earthquake_data_pipeline_spark.sources import txnlog

    t = str(tmp_path / "tbl")
    real_write = txnlog._write_data_files
    fired = []

    def write_then_interlope(df, path):
        names = real_write(df, path)
        if not fired:
            fired.append(True)
            inames = real_write(_tlog(spark, tmp_path, [(7, "race")]), path)
            txnlog._commit(path, inames, [])  # interloper mints v0
        return names

    monkeypatch.setattr(txnlog, "_write_data_files", write_then_interlope)
    with pytest.raises(txnlog.ConcurrentCommitError):
        txnlog.commit_overwrite(_tlog(spark, tmp_path, [(9, "z")]), t)
    monkeypatch.setattr(txnlog, "_write_data_files", real_write)
    # the interloper's commit is the live set — nothing silently merged
    assert txnlog.latest_version(t) == 0
    assert {r.k for r in txnlog.read_snapshot(spark, t).collect()} == {7}
    # and a NON-racing first overwrite still commits at version 0
    t2 = str(tmp_path / "tbl2")
    assert txnlog.commit_overwrite(_tlog(spark, tmp_path, [(1, "a")]), t2) == 0
    assert {r.k for r in txnlog.read_snapshot(spark, t2).collect()} == {1}


def test_txnlog_reader_never_sees_partial_commit(spark, tmp_path):
    from earthquake_data_pipeline_spark.sources.txnlog import (
        commit_append,
        live_files,
        read_snapshot,
    )
    import os

    t = str(tmp_path / "tbl")
    commit_append(_tlog(spark, tmp_path, [(1, "a")]), t)
    # simulate a crashed writer: data file exists but no manifest
    stray = os.path.join(t, "data", "deadbeef-0.parquet")
    real = live_files(t)[0]
    import shutil

    shutil.copy(real, stray)
    assert read_snapshot(spark, t).count() == 1  # stray file invisible
    assert stray not in live_files(t)


def test_txnlog_version_collision_raises(spark, tmp_path):
    from earthquake_data_pipeline_spark.sources.txnlog import (
        _commit,
        commit_append,
    )
    import os
    import pytest as _pytest

    t = str(tmp_path / "tbl")
    commit_append(_tlog(spark, tmp_path, [(1, "a")]), t)
    # two optimistic writers both computed "next version = 1"; the
    # first lands, the second's exclusive link must refuse to clobber
    nxt = os.path.join(t, "_log", f"{1:012d}.json")
    with open(nxt, "w") as f:
        f.write('{"version": 1, "added": [], "removed": []}')
    with _pytest.raises(OSError):
        _commit(t, ["x.parquet"], [], version=1)


def test_txnlog_vacuum_drops_dead_files_keeps_live_history(spark, tmp_path):
    from earthquake_data_pipeline_spark.sources.txnlog import (
        commit_append,
        commit_overwrite,
        read_snapshot,
        vacuum,
    )

    t = str(tmp_path / "tbl")
    commit_append(_tlog(spark, tmp_path, [(1, "a"), (2, "b")]), t)  # v0
    commit_overwrite(_tlog(spark, tmp_path, [(9, "z")]), t)  # v1
    commit_append(_tlog(spark, tmp_path, [(10, "y")]), t)  # v2
    deleted = vacuum(t, keep_after_version=0)
    assert deleted  # v0's overwritten files are gone
    assert {r.k for r in read_snapshot(spark, t).collect()} == {9, 10}
    assert {r.k for r in read_snapshot(spark, t, 1).collect()} == {9}


def test_txnlog_vacuum_defers_young_orphans_deletes_known_dead(
    spark, tmp_path
):
    """r17 (vacuum-vs-writer axis): a concurrent commit renames its data
    files into data/ BEFORE publishing its manifest, so a mid-publish
    commit's files look exactly like crashed-writer orphans. vacuum
    must (a) delete KNOWN-DEAD files (named by a truncated manifest)
    immediately, (b) AGE-GUARD orphans — a young unreferenced file
    survives a default-grace vacuum so the racing commit can publish,
    (c) still collect genuinely crashed leftovers once staging_grace_s
    is waived, and the racing commit's subsequent publish+read must be
    exact."""
    import os

    from earthquake_data_pipeline_spark.sources import txnlog

    t = str(tmp_path / "tbl")
    txnlog.commit_append(_tlog(spark, tmp_path, [(1, "a"), (2, "b")]), t)
    txnlog.commit_overwrite(_tlog(spark, tmp_path, [(9, "z")]), t)  # v1
    # the racing writer's first half: data files staged into data/,
    # manifest NOT yet published
    names = txnlog._write_data_files(_tlog(spark, tmp_path, [(10, "y")]), t)
    deleted = txnlog.vacuum(t, keep_after_version=0)
    assert deleted  # (a) v0's overwritten files went immediately
    assert not set(deleted) & set(names)  # (b) young orphans deferred
    # the racing writer's second half publishes and the table is exact
    txnlog._commit(t, names, [])
    assert {r.k for r in txnlog.read_snapshot(spark, t).collect()} == {9, 10}
    # (c) a genuinely crashed orphan ages past the grace and is swept
    orphan = os.path.join(t, "data", "deadbeef-0.parquet")
    with open(orphan, "wb") as fh:
        fh.write(b"PAR1")
    os.utime(orphan, (1, 1))
    swept = txnlog.vacuum(t, keep_after_version=-1)
    assert "deadbeef-0.parquet" in swept
    assert {r.k for r in txnlog.read_snapshot(spark, t).collect()} == {9, 10}


def test_txnlog_empty_overwrite_reads_empty_with_schema(spark, tmp_path):
    from earthquake_data_pipeline_spark.sources.txnlog import (
        commit_append,
        commit_overwrite,
        read_snapshot,
    )

    t = str(tmp_path / "tbl")
    commit_append(_tlog(spark, tmp_path, [(1, "a")]), t)
    commit_overwrite(
        spark.createDataFrame([], "k long, v string"), t
    )
    snap = read_snapshot(spark, t)
    assert snap.count() == 0 and set(snap.columns) == {"k", "v"}


def test_txnlog_merge_commit_is_versioned_upsert(spark, tmp_path):
    from earthquake_data_pipeline_spark.sources.txnlog import (
        commit_append,
        merge_commit,
        read_snapshot,
    )

    t = str(tmp_path / "tbl")
    commit_append(_tlog(spark, tmp_path, [(1, "a"), (2, "b")]), t)
    v = merge_commit(_tlog(spark, tmp_path, [(2, "B"), (3, "c")]), t, ["k"])
    assert v == 1
    latest = {r.k: r.v for r in read_snapshot(spark, t).collect()}
    assert latest == {1: "a", 2: "B", 3: "c"}  # update 2, insert 3
    old = {r.k: r.v for r in read_snapshot(spark, t, 0).collect()}
    assert old == {1: "a", 2: "b"}  # time travel unaffected


def test_txnlog_merge_commit_schema_stable_across_merges(spark, tmp_path):
    """r16, caught by tools/txnlog_race_check.py's retry loop: the
    pre-r16 merge_commit persisted upsert_merge's ``action`` audit
    column into the table, silently growing the schema and breaking
    every SUBSEQUENT merge (the snapshot then carries a value column
    the updates frame lacks). Two back-to-back merges must both land
    and the table schema must stay exactly the original."""
    from earthquake_data_pipeline_spark.sources.txnlog import (
        commit_append,
        merge_commit,
        read_snapshot,
    )

    t = str(tmp_path / "tbl")
    commit_append(_tlog(spark, tmp_path, [(1, "a"), (2, "b")]), t)  # v0
    merge_commit(_tlog(spark, tmp_path, [(2, "B"), (3, "c")]), t, ["k"])
    merge_commit(_tlog(spark, tmp_path, [(3, "C"), (4, "d")]), t, ["k"])
    snap = read_snapshot(spark, t)
    assert snap.columns == ["k", "v"]  # no audit-column leak
    assert {r.k: r.v for r in snap.collect()} == {
        1: "a", 2: "B", 3: "C", 4: "d"
    }


def test_txnlog_stale_overwrite_conflicts_loud(spark, tmp_path):
    """r16 (VERDICT r15 item 4): optimistic concurrency on the
    snapshot-based commit path. commit_overwrite pins the base version
    at snapshot read and publishes at exactly base+1 — a writer whose
    base went stale (another commit landed in between) must raise
    ConcurrentCommitError LOUDLY, never mint a fresh version number
    that silently drops the interleaved commit (the lost-update shape:
    removing only the files the stale snapshot saw)."""
    from earthquake_data_pipeline_spark.sources.txnlog import (
        ConcurrentCommitError,
        commit_append,
        commit_overwrite,
        latest_version,
        read_snapshot,
    )

    t = str(tmp_path / "tbl")
    commit_append(_tlog(spark, tmp_path, [(1, "a")]), t)  # v0
    stale_base = latest_version(t)
    assert stale_base == 0
    commit_overwrite(_tlog(spark, tmp_path, [(2, "b")]), t)  # winner: v1
    with pytest.raises(ConcurrentCommitError):
        commit_overwrite(
            _tlog(spark, tmp_path, [(3, "c")]), t, base_version=stale_base
        )
    # the winner's commit is intact and no phantom version exists
    assert latest_version(t) == 1
    assert {r.k for r in read_snapshot(spark, t).collect()} == {2}
    # ConcurrentCommitError subclasses FileExistsError — the original
    # documented tripwire type keeps catching it
    assert issubclass(ConcurrentCommitError, FileExistsError)


def test_txnlog_append_retries_past_version_collision(spark, tmp_path,
                                                      monkeypatch):
    """Appends commute, so commit_append serializes through version-
    mint collisions instead of surfacing them: a stale version listing
    (simulating a concurrent writer landing between list and publish)
    must be retried with a fresh listing, and every appended batch
    lands exactly once."""
    import earthquake_data_pipeline_spark.sources.txnlog as T

    t = str(tmp_path / "tbl")
    T.commit_append(_tlog(spark, tmp_path, [(1, "a")]), t)  # v0
    T.commit_append(_tlog(spark, tmp_path, [(2, "b")]), t)  # v1

    real_versions = T._versions
    stale_served = {"n": 0}

    def stale_once(table_path):
        if stale_served["n"] == 0:
            stale_served["n"] += 1
            return [0]  # stale: misses v1 -> collides at v1
        return real_versions(table_path)

    monkeypatch.setattr(T, "_versions", stale_once)
    v = T.commit_append(_tlog(spark, tmp_path, [(3, "c")]), t)
    assert v == 2 and stale_served["n"] == 1
    assert {r.k for r in T.read_snapshot(spark, t).collect()} == {1, 2, 3}
    # no leaked tmp manifest from the refused first attempt
    leftovers = [f for f in os.listdir(t) if f.startswith(".tmp-manifest")]
    assert leftovers == []


def test_txnlog_merge_commit_reads_and_publishes_same_base(spark, tmp_path,
                                                           monkeypatch):
    """merge_commit must compute its upsert against the SAME version it
    publishes over: a commit that lands after the snapshot read but
    before the publish makes the merge a loud ConcurrentCommitError,
    not a silent overwrite of the interloper."""
    import earthquake_data_pipeline_spark.sources.txnlog as T

    t = str(tmp_path / "tbl")
    T.commit_append(_tlog(spark, tmp_path, [(1, "a")]), t)  # v0

    real_read = T.read_snapshot
    interloper = _tlog(spark, tmp_path, [(9, "z")])

    def read_then_interleave(spark_, table_path, version=None):
        snap = real_read(spark_, table_path, version)
        if not getattr(read_then_interleave, "fired", False):
            read_then_interleave.fired = True
            T.commit_append(interloper, table_path)  # lands v1 mid-merge
        return snap

    monkeypatch.setattr(T, "read_snapshot", read_then_interleave)
    with pytest.raises(T.ConcurrentCommitError):
        T.merge_commit(_tlog(spark, tmp_path, [(1, "A")]), t, ["k"])
    # interloper's append survives untouched
    assert {r.k for r in real_read(spark, t).collect()} == {1, 9}


def test_txnlog_vacuum_publish_before_delete_survives_crash(spark, tmp_path):
    """Crash-ordering contract (ADVICE r06): vacuum publishes the
    self-contained base manifest FIRST; a crash before any deletion
    leaves EVERY version fully readable, and the re-run converges."""
    from unittest import mock

    from earthquake_data_pipeline_spark.sources.txnlog import (
        commit_append,
        commit_overwrite,
        read_snapshot,
        vacuum,
    )

    t = str(tmp_path / "tbl")
    commit_append(_tlog(spark, tmp_path, [(1, "a"), (2, "b")]), t)  # v0
    commit_overwrite(_tlog(spark, tmp_path, [(9, "z")]), t)  # v1
    commit_append(_tlog(spark, tmp_path, [(10, "y")]), t)  # v2

    # crash right after the atomic publish: every unlink (manifest AND
    # data deletion) fails
    with mock.patch("os.unlink", side_effect=OSError("simulated crash")):
        with pytest.raises(OSError):
            vacuum(t, keep_after_version=0)

    # mid-crash state: the rewritten base manifest coexists with the old
    # manifests and all data files — every version must read exactly
    assert {r.k for r in read_snapshot(spark, t).collect()} == {9, 10}
    assert {r.k for r in read_snapshot(spark, t, 1).collect()} == {9}
    assert {r.k for r in read_snapshot(spark, t, 0).collect()} == {1, 2}

    # re-run converges: v0 history gone (loud failure), survivors exact
    deleted = vacuum(t, keep_after_version=0)
    assert deleted  # v0's overwritten files physically removed
    assert {r.k for r in read_snapshot(spark, t).collect()} == {9, 10}
    assert {r.k for r in read_snapshot(spark, t, 1).collect()} == {9}
    with pytest.raises(FileNotFoundError):
        read_snapshot(spark, t, 0)
    # idempotent: nothing further to delete, reads unchanged
    assert vacuum(t, keep_after_version=0) == []
    assert {r.k for r in read_snapshot(spark, t).collect()} == {9, 10}


def test_txnlog_vacuum_keeps_cut_version_exact_and_fails_older_loudly(
    spark, tmp_path
):
    """Vacuum semantics (ADVICE r06): the oldest surviving version reads
    EXACTLY (no silently-partial snapshot), vacuumed versions raise, and
    the latest version always survives an over-aggressive cut."""
    from earthquake_data_pipeline_spark.sources.txnlog import (
        commit_append,
        commit_overwrite,
        read_snapshot,
        vacuum,
    )

    t = str(tmp_path / "tbl")
    commit_append(_tlog(spark, tmp_path, [(1, "a"), (2, "b")]), t)  # v0
    commit_append(_tlog(spark, tmp_path, [(3, "c")]), t)  # v1
    commit_overwrite(_tlog(spark, tmp_path, [(9, "z")]), t)  # v2

    # cut v0: v1's live set spans BOTH commits' files even though v2
    # later removed them — the base manifest must be self-contained
    vacuum(t, keep_after_version=0)
    assert {r.k for r in read_snapshot(spark, t, 1).collect()} == {1, 2, 3}
    assert {r.k for r in read_snapshot(spark, t).collect()} == {9}
    with pytest.raises(FileNotFoundError):
        read_snapshot(spark, t, 0)

    # over-aggressive cut at (and beyond) the latest version: the
    # current state always survives
    vacuum(t, keep_after_version=99)
    assert {r.k for r in read_snapshot(spark, t).collect()} == {9}
    with pytest.raises(FileNotFoundError):
        read_snapshot(spark, t, 1)


def test_dbf_logical_field_blank_is_none(tmp_path):
    """Round-8 review: `raw in "YyTt"` is a SUBSTRING test, and the
    empty string is a substring of everything — a blank (uninitialized)
    logical field parsed as True. Blank and '?' must be None."""
    import struct as _struct

    from earthquake_data_pipeline_spark.sources.shapefile import read_dbf

    values = [b"Y", b"N", b" ", b"?", b"t", b"f"]
    fields = [(b"FLAG", b"L", 1)]
    record_size = 1 + 1
    header_size = 32 + 32 * len(fields) + 1
    dbf = _struct.pack(
        "<B3BIHH", 3, 24, 1, 1, len(values), header_size, record_size
    ) + b"\x00" * 20
    for name, ftype, length in fields:
        dbf += name.ljust(11, b"\x00") + ftype + b"\x00" * 4
        dbf += bytes([length]) + b"\x00" * 15
    dbf += b"\x0d"
    for v in values:
        dbf += b" " + v
    p = tmp_path / "flags.dbf"
    p.write_bytes(dbf)
    got = [r["FLAG"] for r in read_dbf(p)]
    assert got == [True, False, None, None, True, False]


def test_txnlog_vacuum_collects_crashed_staging_garbage(spark, tmp_path):
    """Round-8 review: a crash mid-commit leaves .tmp-manifest files /
    .stage-* dirs in the table root — invisible to readers but leaking
    disk forever. Vacuum must collect them (single-writer contract:
    nothing can be in flight) without touching live data."""
    import os

    from earthquake_data_pipeline_spark.sources.txnlog import (
        commit_append,
        read_snapshot,
        vacuum,
    )

    t = str(tmp_path / "tbl")
    commit_append(_tlog(spark, tmp_path, [(1, "a"), (2, "b")]), t)
    # simulate two crash artifacts, backdated past the default
    # staging_grace_s window (genuinely crashed leftovers are old)
    old = time.time() - 3600
    tmp_manifest = os.path.join(t, ".tmp-manifest-dead.json")
    with open(tmp_manifest, "w") as f:
        f.write("{}")
    stage = os.path.join(t, ".stage-dead")
    os.makedirs(stage)
    part = os.path.join(stage, "part-0.parquet")
    with open(part, "wb") as f:
        f.write(b"junk")
    for p in (tmp_manifest, stage, part):
        os.utime(p, (old, old))
    deleted = vacuum(t, keep_after_version=-1)
    assert ".tmp-manifest-dead.json" in deleted and ".stage-dead" in deleted
    assert not os.path.exists(stage)
    assert read_snapshot(spark, t).count() == 2  # live data untouched


def test_txnlog_vacuum_age_guard_spares_fresh_staging(spark, tmp_path):
    """The other side of the staging_grace_s contract (round-9 churn,
    previously untested in either direction): artifacts younger than
    the grace window are SKIPPED — an accidentally concurrent _commit's
    in-flight tmp manifest / staging dir survives a default vacuum."""
    import os

    from earthquake_data_pipeline_spark.sources.txnlog import (
        commit_append,
        vacuum,
    )

    t = str(tmp_path / "tbl")
    commit_append(_tlog(spark, tmp_path, [(1, "a")]), t)
    with open(os.path.join(t, ".tmp-manifest-live.json"), "w") as f:
        f.write("{}")
    stage = os.path.join(t, ".stage-live")
    os.makedirs(stage)
    with open(os.path.join(stage, "part-0.parquet"), "wb") as f:
        f.write(b"live")
    deleted = vacuum(t, keep_after_version=-1)  # default grace: 600 s
    assert ".tmp-manifest-live.json" not in deleted
    assert ".stage-live" not in deleted
    assert os.path.exists(stage)
    # with the guard explicitly disabled (single-writer externally
    # guaranteed), the same young artifacts ARE collected
    deleted = vacuum(t, keep_after_version=-1, staging_grace_s=0)
    assert ".tmp-manifest-live.json" in deleted and ".stage-live" in deleted


def test_txnlog_vacuum_age_guard_uses_inner_part_mtimes(spark, tmp_path):
    """ADVICE r09: a live writer appending to already-created part
    files never refreshes the .stage-* DIR's own mtime — the guard must
    age against the newest mtime across the dir AND its entries, so a
    commit running longer than the grace window keeps its staging dir."""
    import os

    from earthquake_data_pipeline_spark.sources.txnlog import (
        commit_append,
        vacuum,
    )

    t = str(tmp_path / "tbl")
    commit_append(_tlog(spark, tmp_path, [(1, "a")]), t)
    old = time.time() - 3600
    stage = os.path.join(t, ".stage-longrun")
    os.makedirs(stage)
    part = os.path.join(stage, "part-0.parquet")
    with open(part, "wb") as f:
        f.write(b"live")
    # dir created long ago, but the part file was just touched (live
    # writer still appending): must survive
    os.utime(stage, (old, old))
    deleted = vacuum(t, keep_after_version=-1)
    assert ".stage-longrun" not in deleted and os.path.exists(stage)
    # once the parts also age past the grace, it is collected
    os.utime(part, (old, old))
    os.utime(stage, (old, old))
    deleted = vacuum(t, keep_after_version=-1)
    assert ".stage-longrun" in deleted and not os.path.exists(stage)


# ----- crash-injection kill-point matrix (VERDICT r09 item 8) -------------
#
# Instruments every table-local file op (rename/link/unlink/rmdir) with a
# counter that raises at op #k, for EVERY k a clean run performs — a full
# matrix over _commit's and vacuum's file-op boundaries. After each
# simulated crash: every version still listed in _log/ must replay to an
# exact live set whose files all exist (readers-always-safe), the newest
# listed version must read back with the correct rows, and the re-run of
# the killed operation must complete and converge to the clean outcome.


class _KillPoint(Exception):
    pass


def _instrument_table_ops(monkeypatch, table_path, kill_at):
    """Wrap os.{rename,link,unlink,rmdir}: ops touching table_path
    count toward the kill counter; op #kill_at raises. kill_at=None
    only counts (dry run). Returns the counter dict."""
    import os

    counter = {"n": 0}
    real = {n: getattr(os, n) for n in ("rename", "link", "unlink", "rmdir")}

    def _wrap(name):
        fn = real[name]

        def inner(*a, **kw):
            if any(
                isinstance(x, (str, bytes))
                and str(x).startswith(table_path)
                for x in a
            ):
                counter["n"] += 1
                if kill_at is not None and counter["n"] == kill_at:
                    raise _KillPoint(f"op #{counter['n']}: {name}{a}")
            return fn(*a, **kw)

        return inner

    for n in real:
        monkeypatch.setattr(os, n, _wrap(n))
    return counter


def _assert_readers_safe(spark, t, expect_latest_rows=None):
    """Every listed version replays to a live set whose files all
    exist; the newest version reads back exactly."""
    import os

    from earthquake_data_pipeline_spark.sources.txnlog import (
        _versions,
        live_files,
        read_snapshot,
    )

    versions = _versions(t)
    assert versions, "log must never be emptied by a crash"
    for v in versions:
        for p in live_files(t, v):
            assert os.path.exists(p), f"v{v} references missing file {p}"
    if expect_latest_rows is not None:
        got = {
            (r.k, r.v) for r in read_snapshot(spark, t).collect()
        }
        assert got == expect_latest_rows


def test_txnlog_commit_kill_point_matrix(spark, tmp_path, monkeypatch):
    """Kill commit_append at every table-local file-op boundary: the
    prior version stays exactly readable, crash garbage is invisible
    to readers, and a retry converges to the appended state."""
    from earthquake_data_pipeline_spark.sources.txnlog import (
        _versions,
        commit_append,
        read_snapshot,
    )

    base_rows = {(1, "a"), (2, "b")}
    new_rows = {(3, "c")}

    # dry run to count the op boundaries of one append
    t0 = str(tmp_path / "dry")
    commit_append(_tlog(spark, tmp_path, sorted(base_rows)), t0)
    with monkeypatch.context() as mp:
        counter = _instrument_table_ops(mp, t0, None)
        commit_append(_tlog(spark, tmp_path, sorted(new_rows)), t0)
    total_ops = counter["n"]
    assert total_ops >= 4  # part rename, staging cleanup, link, unlink

    for k in range(1, total_ops + 1):
        t = str(tmp_path / f"kill{k}")
        commit_append(_tlog(spark, tmp_path, sorted(base_rows)), t)
        with monkeypatch.context() as mp:
            _instrument_table_ops(mp, t, k)
            with pytest.raises(_KillPoint):
                commit_append(_tlog(spark, tmp_path, sorted(new_rows)), t)
        crashed_versions = _versions(t)
        if crashed_versions == [0]:
            # manifest never published: readers see only the base
            _assert_readers_safe(spark, t, base_rows)
        else:
            # manifest linked before the kill: the commit IS durable
            assert crashed_versions == [0, 1]
            _assert_readers_safe(spark, t, base_rows | new_rows)
            continue
        # retry after the crash converges to the appended state
        commit_append(_tlog(spark, tmp_path, sorted(new_rows)), t)
        _assert_readers_safe(spark, t, base_rows | new_rows)
        assert {(r.k, r.v) for r in read_snapshot(spark, t, 0).collect()} \
            == base_rows  # time travel to v0 still exact


def test_txnlog_vacuum_kill_point_matrix(spark, tmp_path, monkeypatch):
    """Kill vacuum at every table-local file-op boundary: every
    manifest still listed replays to an existing live set, the newest
    version always reads the full pre-vacuum contents, and a re-run
    converges to the clean post-vacuum state."""
    import shutil

    from earthquake_data_pipeline_spark.sources.txnlog import (
        _versions,
        commit_append,
        commit_overwrite,
        read_snapshot,
        vacuum,
    )

    # 4-version history with real removals (overwrite at v2) so vacuum
    # has obsolete manifests AND dead data files to delete; plus aged
    # staging garbage so the collection loop has boundaries too
    proto = str(tmp_path / "proto")
    commit_append(_tlog(spark, tmp_path, [(1, "a")]), proto)
    commit_append(_tlog(spark, tmp_path, [(2, "b")]), proto)
    commit_overwrite(_tlog(spark, tmp_path, [(3, "c")]), proto)
    commit_append(_tlog(spark, tmp_path, [(4, "d")]), proto)
    import os as _os

    old = time.time() - 3600
    with open(_os.path.join(proto, ".tmp-manifest-crash.json"), "w") as f:
        f.write("{}")
    _os.utime(_os.path.join(proto, ".tmp-manifest-crash.json"), (old, old))
    final_rows = {(3, "c"), (4, "d")}

    def clone(k):
        dst = str(tmp_path / f"vkill{k}")
        shutil.copytree(proto, dst)
        return dst

    # dry run for the op count
    t0 = clone(0)
    with monkeypatch.context() as mp:
        counter = _instrument_table_ops(mp, t0, None)
        vacuum(t0, keep_after_version=2)
    total_ops = counter["n"]
    assert total_ops >= 5  # base publish, manifest unlinks, data, garbage
    clean_versions = _versions(t0)

    for k in range(1, total_ops + 1):
        t = clone(k)
        with monkeypatch.context() as mp:
            _instrument_table_ops(mp, t, k)
            with pytest.raises(_KillPoint):
                vacuum(t, keep_after_version=2)
        # readers-always-safe at the crash point: every surviving
        # manifest replays to existing files; latest reads in full
        _assert_readers_safe(spark, t, final_rows)
        # idempotent re-run converges to the clean outcome; grace=0 is
        # the documented single-writer mode (txnlog.py) so the crashed
        # vacuum's own fresh .tmp-manifest is collected too
        vacuum(t, keep_after_version=2, staging_grace_s=0)
        assert _versions(t) == clean_versions
        _assert_readers_safe(spark, t, final_rows)
        assert {
            (r.k, r.v) for r in read_snapshot(spark, t, 3).collect()
        } == final_rows
        with pytest.raises(FileNotFoundError):
            read_snapshot(spark, t, 1)  # vacuumed version fails LOUDLY
        assert not [
            f for f in _os.listdir(t) if f.startswith(".tmp-manifest-")
        ]
