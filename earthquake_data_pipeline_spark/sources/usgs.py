"""Paged HTTP GeoJSON ingestion as a PySpark Python Data Source
(SURVEY.md §2.1 S1/S2; reference: pipeline/extract_historical.py:24-120).

The reference pulls the USGS FDSN API serially: adaptive date windows kept
under the 20k-rows-per-request cap (count query + recursive doubling/halving),
then per-row flattening of ``features[].properties/geometry`` into 10 columns.

Spark-first restatement:

- **Planning** (driver-side, `plan_windows`): the same adaptive sizing —
  count probe, double until >cap, back off to the last good half — plus the
  reference's hard-coded sparse-era jumps (1500→1949→1965). Output: a list
  of [start, end) windows, each guaranteed ≤ cap rows.
- **Execution**: each window is an `InputPartition` of a PySpark 4
  `DataSource` — windows are embarrassingly parallel, so a 500-year
  backfill fans out across the cluster instead of sleeping 5 s per page in
  one process. Flattening happens partition-side, straight to the RAW
  schema (no pandas round-trip).
- **Offline testability**: the fetcher is pluggable via options —
  ``mode=http`` (real API), ``mode=fixture`` (recorded-responses JSON file),
  ``mode=synthetic`` (deterministic generated quakes). CI never touches the
  network.

Usage:
    spark.dataSource.register(UsgsDataSource)
    df = (spark.read.format("usgs_fdsn")
          .option("mode", "synthetic").option("rows_per_day", "3")
          .option("start_date", "2024-01-01").option("end_date", "2024-03-01")
          .load())
"""

from __future__ import annotations

import hashlib
import json
from dataclasses import dataclass
from datetime import date, timedelta

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

from ..schemas import RAW_EVENT_SCHEMA

PAGE_CAP = 20000  # USGS FDSN hard limit (reference: extract_historical.py:43)
# Sparse-era jumps: counts before these dates are far below the cap
# (reference: extract_historical.py:58-62).
EPOCH_JUMPS = (date(1949, 1, 1), date(1965, 1, 1))


# --------------------------------------------------------------------------
# Fetchers — the single seam between the engine and the outside world
# --------------------------------------------------------------------------


class HttpFetcher:
    """Real USGS FDSN API (reference: COUNT_URL/QUERY_URL)."""

    COUNT_URL = "https://earthquake.usgs.gov/fdsnws/event/1/count?"
    QUERY_URL = "https://earthquake.usgs.gov/fdsnws/event/1/query?format=geojson&"

    def count(self, start: date, end: date) -> int:
        import requests  # gated: only the http mode needs it

        r = requests.get(f"{self.COUNT_URL}starttime={start}&endtime={end}", timeout=60)
        r.raise_for_status()
        return int(r.text)

    def query(self, start: date, end: date) -> dict:
        import requests

        r = requests.get(f"{self.QUERY_URL}starttime={start}&endtime={end}", timeout=120)
        r.raise_for_status()
        return r.json()


class FixtureFetcher:
    """Recorded responses from a JSON file:
    {"counts": {"YYYY-MM-DD|YYYY-MM-DD": int},
     "pages":  {"YYYY-MM-DD|YYYY-MM-DD": <geojson dict>}}"""

    def __init__(self, path: str):
        with open(path) as f:
            self._data = json.load(f)

    def count(self, start: date, end: date) -> int:
        return int(self._data["counts"].get(f"{start}|{end}", 0))

    def query(self, start: date, end: date) -> dict:
        return self._data["pages"].get(f"{start}|{end}", {"features": []})


class SyntheticFetcher:
    """Deterministic generated quakes: ``rows_per_day`` events per day,
    attributes derived from md5(day, i) — no I/O, reproducible anywhere."""

    def __init__(self, rows_per_day: int = 2):
        self.rows_per_day = rows_per_day

    def count(self, start: date, end: date) -> int:
        return max((end - start).days, 0) * self.rows_per_day

    def query(self, start: date, end: date) -> dict:
        feats = []
        d = start
        while d < end:
            for i in range(self.rows_per_day):
                h = hashlib.md5(f"{d}:{i}".encode()).digest()
                ms = int(
                    (d - date(1970, 1, 1)).total_seconds() * 1000
                    + (h[0] % 24) * 3600_000
                )
                feats.append(
                    {
                        "properties": {
                            "place": f"{h[1] % 300} km E of Synthville {h[2]}",
                            "time": ms,
                            "mag": round(h[3] / 255 * 9 - 1, 2),
                            "alert": [None, "green", "yellow", "orange", "red"][h[4] % 5],
                            "tsunami": h[5] % 2,
                            "tz": None,
                            "type": "earthquake",
                        },
                        "geometry": {
                            "coordinates": [
                                round(h[6] / 255 * 360 - 180, 3),
                                round(h[7] / 255 * 180 - 90, 3),
                                round(h[8] / 255 * 700, 1),
                            ]
                        },
                    }
                )
            d += timedelta(days=1)
        return {"features": feats}


class RetryingFetcher:
    """Politeness + resilience wrapper around any fetcher.

    The reference paces itself (5 s sleep between pages) and logs failed
    windows rather than dying (extract_historical.py:113-120). In Spark
    the windows fan out across partitions, so each task carries its own
    pacing/retry state:

    - **Pacing**: at least ``pace_s`` seconds between consecutive requests
      from this fetcher instance (per-partition — the aggregate request
      rate is bounded by pace_s × parallelism, so keep pace_s at the
      reference's 5 s for real API backfills).
    - **Retry**: transient failures retry up to ``max_retries`` times with
      exponential backoff (``backoff_s``, doubling per attempt); the last
      failure re-raises so the task (and its window) is retried by Spark's
      own task-retry machinery rather than silently dropped.

    Only TRANSIENT failures retry — an allowlist of network/timeout error
    types plus 5xx/429 HTTP statuses. Everything else (4xx client errors,
    and programming errors like TypeError/KeyError/JSON decode bugs)
    re-raises immediately: retrying cannot fix those, and burying a bug
    under ``max_retries`` rounds of backoff only hides it.

    ``sleep``/``monotonic`` are injectable for deterministic tests.
    """

    @staticmethod
    def _is_transient(err: Exception) -> bool:
        code = getattr(getattr(err, "response", None), "status_code", None)
        if code is not None:
            # any response-carrying error: retry only 5xx and 429
            return code >= 500 or code == 429
        if isinstance(err, (ConnectionError, TimeoutError, OSError)):
            return True  # stdlib network/socket failures (URLError is OSError)
        try:  # requests is gated — only the http fetcher imports it
            import requests.exceptions as rex
        except ImportError:
            return False
        return isinstance(
            err, (rex.ConnectionError, rex.Timeout, rex.ChunkedEncodingError)
        )

    def __init__(
        self,
        inner,
        max_retries: int = 3,
        backoff_s: float = 1.0,
        pace_s: float = 0.0,
        sleep=None,
        monotonic=None,
    ):
        import time

        self.inner = inner
        self.max_retries = max_retries
        self.backoff_s = backoff_s
        self.pace_s = pace_s
        self._sleep = sleep if sleep is not None else time.sleep
        self._monotonic = monotonic if monotonic is not None else time.monotonic
        self._last_request = None
        self.attempts = 0  # total request attempts, for tests/telemetry

    def _call(self, fn, *args):
        if self.pace_s > 0 and self._last_request is not None:
            wait = self.pace_s - (self._monotonic() - self._last_request)
            if wait > 0:
                self._sleep(wait)
        err = None
        for attempt in range(self.max_retries + 1):
            if attempt > 0:
                self._sleep(self.backoff_s * 2 ** (attempt - 1))
            self.attempts += 1
            self._last_request = self._monotonic()
            try:
                return fn(*args)
            except Exception as e:  # noqa: BLE001 — filtered below
                err = e
                if not self._is_transient(e):
                    raise
        raise err

    def count(self, start: date, end: date) -> int:
        return self._call(self.inner.count, start, end)

    def query(self, start: date, end: date) -> dict:
        return self._call(self.inner.query, start, end)


def make_fetcher(options: dict):
    mode = options.get("mode", "http")
    if mode == "http":
        # real-API politeness defaults: the reference's 5 s page pacing +
        # bounded retry; overridable via reader options
        return RetryingFetcher(
            HttpFetcher(),
            max_retries=int(options.get("max_retries", "3")),
            backoff_s=float(options.get("backoff_s", "1.0")),
            pace_s=float(options.get("pace_s", "5.0")),
        )
    if mode == "fixture":
        inner = FixtureFetcher(options["fixture_path"])
    elif mode == "synthetic":
        inner = SyntheticFetcher(int(options.get("rows_per_day", "2")))
    else:
        raise ValueError(f"unknown usgs_fdsn mode: {mode!r}")
    if {"max_retries", "pace_s", "backoff_s"} & options.keys():
        return RetryingFetcher(
            inner,
            max_retries=int(options.get("max_retries", "3")),
            backoff_s=float(options.get("backoff_s", "1.0")),
            pace_s=float(options.get("pace_s", "0.0")),
        )
    return inner


# --------------------------------------------------------------------------
# Planning: adaptive window sizing (S2)
# --------------------------------------------------------------------------


def _grow_window(fetcher, start: date, end_cap: date, days: int = 15) -> int:
    """Recursive doubling until count > cap, then back off to the last good
    half (reference: generate_timedelta, extract_historical.py:24-46).

    Unlike the reference, the backed-off half is PROBED too: when even the
    initial window exceeds the cap (dense aftershock sequences), halving
    continues until the count fits or the window is a single day —
    otherwise the ≤-cap guarantee of plan_windows would be false for
    windows that were never count-checked.
    """
    while True:
        end = min(start + timedelta(days=days), end_cap)
        if fetcher.count(start, end) > PAGE_CAP:
            days = max(days // 2, 1)
            while days > 1:
                end = min(start + timedelta(days=days), end_cap)
                if fetcher.count(start, end) <= PAGE_CAP:
                    break
                days = max(days // 2, 1)
            return days
        if end >= end_cap:
            return (end_cap - start).days
        days *= 2


def plan_windows(fetcher, start: date, end: date) -> list[tuple[date, date]]:
    """The full window plan: epoch jumps for sparse eras + adaptive sizing.

    Each returned [w_start, w_end) holds ≤ PAGE_CAP rows (by the count
    probe), so execution never hits the API limit. This is driver-side
    planning — the probes are cheap count queries.
    """
    windows: list[tuple[date, date]] = []
    pointer = start
    while pointer < end:
        jumped = False
        for jump in EPOCH_JUMPS:
            if pointer < jump:
                w_end = min(jump, end)
                if fetcher.count(pointer, w_end) <= PAGE_CAP:
                    windows.append((pointer, w_end))
                    pointer = w_end
                    jumped = True
                break
        if jumped:
            continue
        if (end - pointer) < timedelta(days=30) and fetcher.count(pointer, end) <= PAGE_CAP:
            # tail shortcut (reference: extract_historical.py:63-64) — but
            # only when the count probe confirms the cap holds; the
            # reference skips the probe and can overflow its own limit here
            windows.append((pointer, end))
            break
        days = _grow_window(fetcher, pointer, end)
        w_end = min(pointer + timedelta(days=days), end)
        windows.append((pointer, w_end))
        pointer = w_end
    return windows


# --------------------------------------------------------------------------
# Flattening (the from_json-shaped part of S1)
# --------------------------------------------------------------------------


def flatten_feature(entry: dict) -> tuple | None:
    """GeoJSON feature → RAW_EVENT_SCHEMA tuple
    (reference: extract_historical.py:88-108; coordinate order lon,lat,depth)."""
    try:
        props = entry["properties"]
        coords = entry["geometry"]["coordinates"]
        tsunami = props.get("tsunami")
        tz = props.get("tz")
        mag = props.get("mag")
        return (
            props.get("place"),
            int(props["time"]) if props.get("time") is not None else None,
            float(mag) if mag is not None else None,
            float(coords[1]) if coords[1] is not None else None,
            float(coords[0]) if coords[0] is not None else None,
            float(coords[2]) if coords[2] is not None else None,
            props.get("alert"),
            int(tsunami) if tsunami is not None else None,
            int(tz) if tz is not None else None,
            props.get("type"),
        )
    except (KeyError, IndexError, TypeError, ValueError):
        return None  # reference logs-and-skips malformed entries (:101-108)


# --------------------------------------------------------------------------
# The DataSource
# --------------------------------------------------------------------------


@dataclass
class _Window(InputPartition):
    start_iso: str
    end_iso: str


class UsgsReader(DataSourceReader):
    def __init__(self, options: dict):
        self.options = dict(options)

    def partitions(self):
        fetcher = make_fetcher(self.options)
        start = date.fromisoformat(self.options.get("start_date", "1500-01-01"))
        end = date.fromisoformat(self.options.get("end_date", "2025-06-30"))
        windows = plan_windows(fetcher, start, end)
        if not windows:
            # empty plan (e.g. inverted range): PySpark requires ≥1
            # partition — emit one empty sentinel window
            return [_Window(str(start), str(start))]
        return [_Window(str(ws), str(we)) for ws, we in windows]

    def read(self, partition: _Window):
        if partition is None:  # defensive: single-partition fallback path
            return
        start = date.fromisoformat(partition.start_iso)
        end = date.fromisoformat(partition.end_iso)
        if start >= end:
            return
        fetcher = make_fetcher(self.options)
        page = fetcher.query(start, end)
        for entry in page.get("features", []):
            row = flatten_feature(entry)
            if row is not None:
                yield row


class UsgsDataSource(DataSource):
    """spark.read.format("usgs_fdsn") — see module docstring."""

    @classmethod
    def name(cls) -> str:
        return "usgs_fdsn"

    def schema(self):
        return RAW_EVENT_SCHEMA

    def reader(self, schema) -> UsgsReader:
        return UsgsReader(self.options)


def fetch_to_dataframe(
    spark: SparkSession, fetcher, start: date, end: date
) -> DataFrame:
    """Driver-side fallback (no DataSource registration): plan windows,
    fetch serially, build one DataFrame. Use only for small backfills."""
    rows = []
    for ws, we in plan_windows(fetcher, start, end):
        for entry in fetcher.query(ws, we).get("features", []):
            row = flatten_feature(entry)
            if row is not None:
                rows.append(row)
    return spark.createDataFrame(rows, RAW_EVENT_SCHEMA)


# --------------------------------------------------------------------------
# Distributed flattening: the idiomatic F.from_json form of S1
# (SURVEY §2.3 tail — the only place nested types appear in the engine)
# --------------------------------------------------------------------------

GEOJSON_FEATURE_SCHEMA = T.StructType(
    [
        T.StructField(
            "properties",
            T.StructType(
                [
                    T.StructField("place", T.StringType()),
                    T.StructField("time", T.LongType()),
                    T.StructField("mag", T.DoubleType()),
                    T.StructField("alert", T.StringType()),
                    T.StructField("tsunami", T.IntegerType()),
                    T.StructField("tz", T.IntegerType()),
                    T.StructField("type", T.StringType()),
                ]
            ),
        ),
        T.StructField(
            "geometry",
            T.StructType(
                [T.StructField("coordinates", T.ArrayType(T.DoubleType()))]
            ),
        ),
    ]
)


def flatten_geojson(df: DataFrame, json_col: str = "feature_json") -> DataFrame:
    """Distributed GeoJSON flattening: a column of raw feature JSON strings
    → RAW_EVENT_SCHEMA columns, entirely via F.from_json + struct field
    access (JVM-side, codegen) — the idiomatic Spark restatement of the
    reference's per-row dict walking (extract_historical.py:88-108).

    Malformed JSON → from_json yields null struct → all-null row, the
    declarative analog of the reference's log-and-skip. Use this when
    features arrive as text (files/Kafka); the DataSource reader flattens
    driver-side because it already holds parsed dicts at the HTTP boundary.
    """
    f = F.from_json(F.col(json_col), GEOJSON_FEATURE_SCHEMA)
    coords = f["geometry"]["coordinates"]
    return df.select(
        f["properties"]["place"].alias("place"),
        f["properties"]["time"].alias("time"),
        f["properties"]["mag"].alias("magnitude"),
        coords[1].alias("latitude"),
        coords[0].alias("longitude"),
        coords[2].alias("depth"),
        f["properties"]["alert"].alias("alert"),
        f["properties"]["tsunami"].alias("tsunami"),
        f["properties"]["tz"].alias("tz"),
        f["properties"]["type"].alias("type"),
    )
