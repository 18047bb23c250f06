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

# Linear per-batch polygon scan is fine to ~16× the reference's 259-row
# world dim; beyond that the broadcast dim needs a bbox-grid index (see
# spatial_join docstring).
_MAX_LINEAR_POLYGONS = 4096


def spatial_join(
    points: DataFrame,
    polygons: Sequence[tuple[str, str | None, str]],
    lon_col: str = "longitude",
    lat_col: str = "latitude",
    country_col: str = "country",
    region_col: str = "region",
) -> DataFrame:
    """R2 — point-in-polygon left join, first matching polygon wins.

    ``polygons`` is the driver-side dim: (country, region, wkt) tuples —
    world polygons are KB-MB scale (258 rows in the reference), so a Spark
    broadcast variable ships them once per executor. Rows matching no
    polygon get NULL country/region (left-join semantics). Name-only dim
    rows (wkt=None, e.g. the reference's manual 'Alaska' row) are skipped
    here — they participate in the regex fallback instead
    (pipeline/add_region.py:36).

    Cost model: the per-batch loop is O(polygons) with a vectorized bbox
    prefilter — the right shape for the reference's 259-row dim (and the
    operator stays MAP-ONLY: no shuffle, pinned by
    tests/test_plans.py::test_spatial_join_is_map_only). It is NOT the
    right shape for a dim of many thousands of polygons, where the bbox
    tests themselves dominate; past ``_MAX_LINEAR_POLYGONS`` this raises
    rather than silently degrading — the fix at that scale is an
    STRtree/bbox-grid index over the broadcast dim inside the same
    mapInPandas (plumbing unchanged, still map-only).
    """
    import pandas as pd

    parsed = []
    for country, region, wkt in polygons:
        if wkt is None:
            continue
        polys = parse_wkt_polygon(wkt)
        parsed.append((country, region, polys, ring_bbox(polys)))
    if len(parsed) > _MAX_LINEAR_POLYGONS:
        raise ValueError(
            f"spatial_join's linear polygon scan is sized for dims ≤ "
            f"{_MAX_LINEAR_POLYGONS} polygons (got {len(parsed)}); add a "
            "bbox-grid/STRtree index to the broadcast dim before raising "
            "the limit"
        )

    spark = points.sparkSession
    bc = spark.sparkContext.broadcast(parsed)

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

        polys = bc.value
        for pdf in batches:
            n = len(pdf)
            lon = pdf[lon_col].to_numpy(dtype=np.float64, na_value=np.nan)
            lat = pdf[lat_col].to_numpy(dtype=np.float64, na_value=np.nan)
            country = np.full(n, None, dtype=object)
            region = np.full(n, None, dtype=object)
            open_mask = ~(np.isnan(lon) | np.isnan(lat))
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
) -> DataFrame:
    """The full enrichment composition (reference: add_region.py:17-66).

    spatial join → regex fallback ONLY on spatial misses (subset-before-
    expensive-op plan structure, SURVEY §4) → broadcast lookup of region for
    inferred countries → coalesce-fill. ``country_lookup`` is the
    (country, region) dim including name-only rows like 'Alaska'.
    """
    spark = events.sparkSession
    if id_col is None:
        # monotonically_increasing_id is nondeterministic across plan
        # re-evaluations (the base side and the miss subset below both
        # reference this subtree): pin the ids with a lineage barrier so
        # every branch sees the same assignment. Pass a natural id_col
        # at scale to skip the materialization.
        events = events.withColumn(
            "__row_id", F.monotonically_increasing_id()
        ).localCheckpoint(eager=False)
        id_col = "__row_id"

    spatial = spatial_join(events, polygons, lon_col, lat_col)

    misses = spatial.filter(F.col("country").isNull()).select(id_col, place_col)
    tokens = [c for c, _ in country_lookup]
    inferred = regex_token_join(
        misses, place_col, tokens, [id_col], out_col="inferred_country"
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
