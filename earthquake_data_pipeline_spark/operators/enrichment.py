"""Geospatial / fallback enrichment operators (SURVEY.md §2.4 R1-R3, §2.3 D9-D11).

The reference enriches events with country/region via three mechanisms
(pipeline/add_region.py:17-66, add_region_chunks.py:18-88):

1. point-in-polygon spatial left join (gpd.sjoin 'within', R-tree) — R2;
2. regex place-name fallback for null-country rows (first matching country
   token in list order wins) — R3/F1;
3. index-aligned fillna of the spatial result from the fallback — D9/R5.

Spark-first restatement, one lazy plan instead of a 100k-row chunk loop:

- ``spatial_join``       — mapInPandas over the points with the (KB-sized)
  polygon dim broadcast; numpy ray-casting with bbox prefilter per polygon
  (functions/geo.py). Embarrassingly parallel, no shuffle, scales linearly.
- ``regex_token_join``   — broadcast nested-loop join: crossJoin the token
  dim + RLIKE filter + row_number over token priority → first-match-wins,
  entirely JVM-side (whole-stage codegen keeps the regex in Java).
- ``enrich_events``      — the composition, with the subset-before-UDF plan
  structure the reference hand-codes (fallback applied only where the
  spatial join missed) and a coalesce instead of pandas index alignment.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions.geo import parse_wkt_polygon, points_in_polygon, ring_bbox
from ..functions.scalar import token_pattern
from ..qcommon import reuse

# Linear per-batch polygon scan is fine to ~16× the reference's 259-row
# world dim; past this the operator switches to the bbox-grid index
# (same mapInPandas plumbing, still map-only) — see _build_bbox_grid.
_MAX_LINEAR_POLYGONS = 4096


def _build_bbox_grid(parsed):
    """Uniform driver-side grid over the dim's bbox extent: cell id →
    ASCENDING list of polygon indices whose bbox overlaps the cell.

    Ascending order preserves the linear path's first-polygon-wins
    priority: every polygon containing a point overlaps the point's
    cell (point ∈ polygon ⊆ polygon bbox ⊇ the cell holding the
    point), so testing a cell's candidates in index order visits the
    same polygons in the same order as the full scan, minus the
    non-overlapping ones. ~sqrt(P) cells per axis targets O(1)
    candidates per cell for evenly-spread dims; the whole structure is
    KB-per-thousand-polygons and ships in the same broadcast.
    """
    import math

    gminx = min(b[0] for *_, b in parsed)
    gminy = min(b[1] for *_, b in parsed)
    gmaxx = max(b[2] for *_, b in parsed)
    gmaxy = max(b[3] for *_, b in parsed)
    n_axis = min(1024, max(1, int(math.ceil(math.sqrt(len(parsed))))))
    cw = max((gmaxx - gminx) / n_axis, 1e-12)
    ch = max((gmaxy - gminy) / n_axis, 1e-12)
    cells: dict[int, list[int]] = {}
    for pi, (_, _, _, (minx, miny, maxx, maxy)) in enumerate(parsed):
        i0 = min(max(int((minx - gminx) / cw), 0), n_axis - 1)
        i1 = min(max(int((maxx - gminx) / cw), 0), n_axis - 1)
        j0 = min(max(int((miny - gminy) / ch), 0), n_axis - 1)
        j1 = min(max(int((maxy - gminy) / ch), 0), n_axis - 1)
        for j in range(j0, j1 + 1):
            for i in range(i0, i1 + 1):
                cells.setdefault(j * n_axis + i, []).append(pi)
    return (gminx, gminy, gmaxx, gmaxy, cw, ch, n_axis, cells)


class PolygonDim:
    """Pre-parsed polygon dim (VERDICT r07 item 6): rings as numpy
    arrays + bboxes, parsed ONCE from WKT, with the bbox grid and the
    per-SparkContext broadcast cached on the instance. At 131k polygons
    the one-time driver-side WKT float parse dominated BOTH spatial
    strategies (DESIGN.md round-7 crossover table); repeated
    spatial_join / enrich_events calls in one session now pay it once.

    Build explicitly via ``parse_polygon_dim(polygons)`` and pass the
    instance anywhere a (country, region, wkt) sequence is accepted —
    or keep passing raw tuples: an internal content-keyed memo gives
    repeated raw-tuple calls the same amortization.
    """

    __slots__ = ("parsed", "_grid", "_bcs")

    def __init__(
        self, polygons: Sequence[tuple[str, str | None, str | None]]
    ) -> None:
        self.parsed = []
        for country, region, wkt in polygons:
            if wkt is None:
                continue
            polys = parse_wkt_polygon(wkt)
            self.parsed.append((country, region, polys, ring_bbox(polys)))
        self._grid = None
        self._bcs: dict = {}

    def grid(self):
        """Bbox grid over the parsed dim, built lazily exactly once."""
        if self._grid is None and self.parsed:
            self._grid = _build_bbox_grid(self.parsed)
        return self._grid

    def broadcast_for(self, sc, with_grid: bool):
        """Cached (parsed, grid|None) Broadcast per (SparkContext, grid
        flag). Keys hold a strong ref to the context and re-check
        identity, so a NEW context after a restart re-broadcasts
        instead of reusing a handle from a stopped JVM.

        Entries whose context has since STOPPED are evicted (and their
        Broadcast destroyed) on every call — without this, a long-lived
        driver that restarts sessions pins every dead context and its
        executor-side broadcast blocks forever (ADVICE r08)."""
        for k in [k for k, (c, _) in self._bcs.items() if _sc_stopped(c)]:
            _, dead = self._bcs.pop(k)
            try:
                dead.destroy(blocking=False)
            except Exception:
                pass  # the JVM behind the handle is already gone
        key = (id(sc), bool(with_grid))
        hit = self._bcs.get(key)
        if hit is not None and hit[0] is sc:
            return hit[1]
        bc = sc.broadcast((self.parsed, self.grid() if with_grid else None))
        self._bcs[key] = (sc, bc)
        return bc


def _sc_stopped(sc) -> bool:
    """True once SparkContext.stop() has run (PySpark nulls _jsc)."""
    return getattr(sc, "_jsc", None) is None


# Content-keyed memo for raw-tuple callers: the tuple key is O(P) string
# hashing per call — ~1000x cheaper than re-parsing WKT floats — and dict
# equality on the full key makes collisions impossible, not just unlikely.
# LRU: insertion order IS recency order (hits re-insert); at capacity the
# single oldest entry is evicted — not a wholesale clear(), which threw
# away 7 warm dims to admit 1 (ADVICE r08).
_DIM_CACHE: dict[tuple, PolygonDim] = {}
_DIM_CACHE_MAX = 8


def parse_polygon_dim(
    polygons: "Sequence[tuple[str, str | None, str | None]] | PolygonDim",
) -> PolygonDim:
    """Parse (country, region, wkt) tuples into a reusable PolygonDim;
    idempotent on an already-parsed dim, memoized on raw content."""
    if isinstance(polygons, PolygonDim):
        return polygons
    key = tuple((c, r, w) for c, r, w in polygons)
    dim = _DIM_CACHE.pop(key, None)
    if dim is None:
        if len(_DIM_CACHE) >= _DIM_CACHE_MAX:
            evicted = _DIM_CACHE.pop(next(iter(_DIM_CACHE)))
            # Eviction drops the driver's last strong ref to the dim,
            # but its Broadcasts on still-LIVE contexts would keep
            # executor-side blocks pinned until GC (ADVICE r09 — same
            # leak class as the stopped-context path in broadcast_for).
            # Live contexts get unpersist, NOT destroy (ADVICE r10):
            # parse_polygon_dim returns dims to callers, so a lazy
            # DataFrame built earlier can still hold the Broadcast
            # handle in its closure — destroy() would fail that job at
            # action time ("Attempted to use Broadcast after it was
            # destroyed"), while unpersist() frees the executor blocks
            # and lets any late action re-fetch from the driver.
            # destroy() is reserved for STOPPED contexts, where no
            # action can ever run again.
            for ctx, bc in evicted._bcs.values():
                try:
                    if _sc_stopped(ctx):
                        bc.destroy(blocking=False)
                    else:
                        bc.unpersist(blocking=False)
                except Exception:
                    pass  # JVM already gone or handle already destroyed
            evicted._bcs.clear()
        dim = PolygonDim(polygons)
    _DIM_CACHE[key] = dim
    return dim


def spatial_join(
    points: DataFrame,
    polygons: "Sequence[tuple[str, str | None, str]] | PolygonDim",
    lon_col: str = "longitude",
    lat_col: str = "latitude",
    country_col: str = "country",
    region_col: str = "region",
    grid_index: bool | None = None,
) -> DataFrame:
    """R2 — point-in-polygon left join, first matching polygon wins.

    ``polygons`` is the driver-side dim: (country, region, wkt) tuples
    or a pre-parsed ``PolygonDim`` — world polygons are KB-MB scale (258
    rows in the reference), so a Spark broadcast variable ships them once
    per executor; the WKT parse, grid build and broadcast are all
    amortized across calls (PolygonDim). Rows matching no polygon get
    NULL country/region (left-join semantics). Name-only dim rows
    (wkt=None, e.g. the reference's manual 'Alaska' row) are skipped
    here — they participate in the regex fallback instead
    (pipeline/add_region.py:36).

    Cost model: two strategies, both MAP-ONLY (no shuffle, pinned by
    tests/test_plans.py::test_spatial_join_is_map_only):

    - linear per-batch scan over all polygons with a vectorized bbox
      prefilter — the right shape for the reference's 259-row dim,
      where the O(P) bbox tests are cheaper than grouping overhead;
    - bbox-grid index (``grid_index=True``; auto past
      ``_MAX_LINEAR_POLYGONS``) — points are bucketed into a driver-
      built ~sqrt(P)×sqrt(P) grid over the dim extent and only each
      cell's overlapping polygons are tested, in index order, so
      first-polygon-wins priority is preserved exactly. This removes
      the O(points × P) bbox-test wall for dims of many thousands of
      polygons (admin-level-2 boundaries etc.); measured crossover in
      DESIGN.md.
    """
    import pandas as pd

    dim = parse_polygon_dim(polygons)
    if grid_index is None:
        grid_index = len(dim.parsed) > _MAX_LINEAR_POLYGONS

    spark = points.sparkSession
    bc = dim.broadcast_for(
        spark.sparkContext, bool(grid_index and dim.parsed)
    )

    # NB: StructType.add mutates in place — never call it on df.schema
    # (it corrupts the DataFrame's cached Python-side schema).
    out_schema = T.StructType(
        list(points.schema.fields)
        + [
            T.StructField(country_col, T.StringType(), True),
            T.StructField(region_col, T.StringType(), True),
        ]
    )

    def fn(batches):
        import numpy as np

        polys, grd = bc.value

        def assign_linear(lon, lat, open_mask, country, region):
            for c, r, rings, (minx, miny, maxx, maxy) in polys:
                if not open_mask.any():
                    break
                cand = open_mask & (lon >= minx) & (lon <= maxx) & (lat >= miny) & (lat <= maxy)
                idx = np.nonzero(cand)[0]
                if idx.size == 0:
                    continue
                inside = points_in_polygon(lon[idx], lat[idx], rings)
                hit = idx[inside]
                country[hit] = c
                region[hit] = r
                open_mask[hit] = False

        def assign_grid(lon, lat, open_mask, country, region):
            gminx, gminy, gmaxx, gmaxy, cw, ch, n_axis, cells = grd
            # validity is judged on the INCLUSIVE extent box (bboxes
            # include their max edge), with NaNs mapped outside before
            # the int cast (a NaN→int64 cast warns); the index clamp
            # mirrors the registration-side clamp so a point exactly on
            # the max edge lands in the last cell instead of falling
            # off the grid.
            valid = (
                open_mask
                & (np.nan_to_num(lon, nan=gminx - 1.0) >= gminx)
                & (np.nan_to_num(lon, nan=gmaxx + 1.0) <= gmaxx)
                & (np.nan_to_num(lat, nan=gminy - 1.0) >= gminy)
                & (np.nan_to_num(lat, nan=gmaxy + 1.0) <= gmaxy)
            )
            ix = np.clip(
                np.floor((np.nan_to_num(lon, nan=gminx) - gminx) / cw),
                0, n_axis - 1,
            ).astype(np.int64)
            iy = np.clip(
                np.floor((np.nan_to_num(lat, nan=gminy) - gminy) / ch),
                0, n_axis - 1,
            ).astype(np.int64)
            vidx = np.nonzero(valid)[0]
            if vidx.size == 0:
                return
            cell = iy[vidx] * n_axis + ix[vidx]
            order = np.argsort(cell, kind="stable")
            vidx, cell = vidx[order], cell[order]
            splits = np.nonzero(np.diff(cell))[0] + 1
            starts = np.concatenate(([0], splits))
            for s, members in zip(starts, np.split(vidx, splits)):
                cand = cells.get(int(cell[s]))
                if cand is None:
                    continue
                for pi in cand:
                    if members.size == 0:
                        break
                    c, r, rings, (minx, miny, maxx, maxy) = polys[pi]
                    inb = (
                        (lon[members] >= minx) & (lon[members] <= maxx)
                        & (lat[members] >= miny) & (lat[members] <= maxy)
                    )
                    sub = members[inb]
                    if sub.size == 0:
                        continue
                    inside = points_in_polygon(lon[sub], lat[sub], rings)
                    hit = sub[inside]
                    if hit.size:
                        country[hit] = c
                        region[hit] = r
                        open_mask[hit] = False
                        members = members[open_mask[members]]

        for pdf in batches:
            n = len(pdf)
            lon = pdf[lon_col].to_numpy(dtype=np.float64, na_value=np.nan)
            lat = pdf[lat_col].to_numpy(dtype=np.float64, na_value=np.nan)
            country = np.full(n, None, dtype=object)
            region = np.full(n, None, dtype=object)
            open_mask = ~(np.isnan(lon) | np.isnan(lat))
            if grd is not None:
                assign_grid(lon, lat, open_mask, country, region)
            else:
                assign_linear(lon, lat, open_mask, country, region)
            out = pdf.copy()
            out[country_col] = pd.Series(country, index=pdf.index, dtype=object)
            out[region_col] = pd.Series(region, index=pdf.index, dtype=object)
            yield out

    return points.mapInPandas(fn, out_schema)


def regex_token_join(
    df: DataFrame,
    text_col: str,
    tokens: Sequence[str],
    key_cols: Sequence[str],
    out_col: str = "matched_token",
    case_insensitive: bool = True,
) -> DataFrame:
    """R3/F1 — first-match-wins token containment join, JVM-side.

    The reference loops countries per row with early return
    (pipeline/add_region.py:40-46): the FIRST country (in list order) whose
    name appears as a word token in ``text_col`` wins. Restated as a
    broadcast nested-loop join: crossJoin a tiny (idx, token, pattern) dim,
    keep RLIKE hits, row_number over idx per key → rn=1. The ordering is
    preserved under parallelism because the priority index travels with the
    data (SURVEY §7 hard-part 2).
    """
    spark = df.sparkSession
    flag = "(?i)" if case_insensitive else ""
    tok_rows = [(i, t, flag + token_pattern(t)) for i, t in enumerate(tokens)]
    toks = F.broadcast(
        spark.createDataFrame(tok_rows, ["tok_idx__", "token__", "pattern__"])
    )
    hits = (
        df.select(*key_cols, text_col)
        .crossJoin(toks)
        .filter(F.expr(f"`{text_col}` rlike pattern__"))
    )
    w = Window.partitionBy(*[F.col(k) for k in key_cols]).orderBy("tok_idx__")
    first = (
        hits.withColumn("rn__", F.row_number().over(w))
        .filter(F.col("rn__") == 1)
        .select(*key_cols, F.col("token__").alias(out_col))
    )
    return df.join(first, on=list(key_cols), how="left")


def coalesce_fill(
    base: DataFrame,
    patch: DataFrame,
    key_cols: Sequence[str],
    fill_cols: Sequence[tuple[str, str]],
) -> DataFrame:
    """D9/R5 — fill nulls of ``base`` columns from ``patch`` via key join.

    The reference does this with pandas index alignment
    (add_region.py:56-61); Spark has no row identity, so the caller
    supplies explicit keys (materialize monotonically_increasing_id BEFORE
    splitting if no natural key exists). ``fill_cols`` maps
    (base_col, patch_col).
    """
    patch_cols = [F.col(p).alias(f"__patch_{b}") for b, p in fill_cols]
    joined = base.join(
        patch.select(*key_cols, *patch_cols), on=list(key_cols), how="left"
    )
    for b, _ in fill_cols:
        joined = joined.withColumn(b, F.coalesce(F.col(b), F.col(f"__patch_{b}")))
    return joined.drop(*[f"__patch_{b}" for b, _ in fill_cols])


def enrich_events(
    events: DataFrame,
    polygons: Sequence[tuple[str, str | None, str]],
    country_lookup: Sequence[tuple[str, str | None]],
    place_col: str = "place",
    lon_col: str = "longitude",
    lat_col: str = "latitude",
    id_col: str | None = None,
    case_insensitive: bool = True,
) -> DataFrame:
    """The full enrichment composition (reference: add_region.py:17-66).

    spatial join → regex fallback ONLY on spatial misses (subset-before-
    expensive-op plan structure, SURVEY §4) → broadcast lookup of region for
    inferred countries → coalesce-fill. ``country_lookup`` is the
    (country, region) dim including name-only rows like 'Alaska'.

    ``case_insensitive`` (default True) governs the place-text fallback
    match, matching the reference, which lowercases both place and country
    before the containment test (add_region.py:40-44). Oracles must encode
    the same choice (``(?i)`` in RE2) — ADVICE r07.
    """
    spark = events.sparkSession
    if id_col is None:
        # monotonically_increasing_id is nondeterministic across plan
        # re-evaluations (the base side and the miss subset below both
        # reference this subtree): pin the ids with a lineage barrier so
        # every branch sees the same assignment. Pass a natural id_col
        # at scale to skip the materialization.
        events = reuse(
            events.withColumn("__row_id", F.monotonically_increasing_id())
        )
        id_col = "__row_id"

    # The spatial result is referenced by BOTH branches below (the miss
    # subset and the coalesce base): without a lineage barrier Catalyst
    # re-evaluates the ray-cast Python stage once per reference (the
    # plan showed py=3/scan=3). Materialize it once — the Python stage
    # is the expensive part; at scale prefer paying one events-sized
    # cache over three polygon sweeps.
    spatial = reuse(spatial_join(events, polygons, lon_col, lat_col))

    misses = spatial.filter(F.col("country").isNull()).select(id_col, place_col)
    tokens = [c for c, _ in country_lookup]
    inferred = regex_token_join(
        misses,
        place_col,
        tokens,
        [id_col],
        out_col="inferred_country",
        case_insensitive=case_insensitive,
    )
    lookup = F.broadcast(
        spark.createDataFrame(list(country_lookup), ["lk_country", "lk_region"])
    )
    inferred = inferred.join(
        lookup, inferred.inferred_country == lookup.lk_country, "left"
    ).select(id_col, "inferred_country", F.col("lk_region").alias("inferred_region"))

    out = coalesce_fill(
        spatial,
        inferred,
        [id_col],
        [("country", "inferred_country"), ("region", "inferred_region")],
    )
    return out.drop("__row_id") if id_col == "__row_id" else out
