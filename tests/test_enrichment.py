"""Spatial sanity set + regex fallback + coalesce-fill (SURVEY.md §5.4;
FIXTURES.md F3 semantics: polygon hit / ocean+token fallback / neither)."""

from __future__ import annotations

import numpy as np

from earthquake_data_pipeline_spark.functions.geo import (
    parse_wkt_polygon,
    points_in_polygon,
)
from earthquake_data_pipeline_spark.operators.enrichment import (
    enrich_events,
    regex_token_join,
    spatial_join,
)

# Rectangles (non-overlapping) + one MULTIPOLYGON + a polygon with a hole.
POLYGONS = [
    ("Japonia", "Asia", "POLYGON ((130 30, 146 30, 146 46, 130 46, 130 30))"),
    ("Chilea", "Americas", "POLYGON ((-76 -56, -66 -56, -66 -17, -76 -17, -76 -56))"),
    ("Twin Isles", "Oceania",
     "MULTIPOLYGON (((160 -50, 175 -50, 175 -30, 160 -30, 160 -50)), ((178 -45, 179 -45, 179 -40, 178 -40, 178 -45)))"),
    ("Donutland", "Europe",
     "POLYGON ((0 40, 20 40, 20 60, 0 60, 0 40), (8 48, 12 48, 12 52, 8 52, 8 48))"),
]
LOOKUP = [(c, r) for c, r, _ in POLYGONS] + [("Alaska", "Americas")]


def test_wkt_parser_shapes():
    polys = parse_wkt_polygon(POLYGONS[2][2])
    assert len(polys) == 2 and len(polys[0]) == 1
    holed = parse_wkt_polygon(POLYGONS[3][2])
    assert len(holed) == 1 and len(holed[0]) == 2  # exterior + hole


def test_ray_casting_with_hole():
    polys = parse_wkt_polygon(POLYGONS[3][2])
    x = np.array([10.0, 5.0, 25.0])   # hole center, solid part, outside
    y = np.array([50.0, 50.0, 50.0])
    assert points_in_polygon(x, y, polys).tolist() == [False, True, False]


def test_spatial_join_sanity_set(spark):
    rows = [
        # (id, place, lon, lat) — polygon hit / multipoly part 2 / ocean+token / neither
        (1, "near Tokyo", 140.0, 35.0),
        (2, "small isle", 178.5, -42.0),
        (3, "off the coast of Japonia", -150.0, 10.0),
        (4, "middle of nowhere", -150.0, -10.0),
        (5, "hole dweller", 10.0, 50.0),
    ]
    df = spark.createDataFrame(rows, ["id", "place", "longitude", "latitude"])
    out = {r.id: (r.country, r.region) for r in spatial_join(df, POLYGONS).collect()}
    assert out[1] == ("Japonia", "Asia")
    assert out[2] == ("Twin Isles", "Oceania")
    assert out[3] == (None, None)
    assert out[4] == (None, None)
    assert out[5] == (None, None)  # inside the hole → not within


def test_regex_token_join_first_match_wins(spark):
    df = spark.createDataFrame(
        [(1, "Chilea quake near Japonia"), (2, "japonia lowercase"), (3, "no match")],
        ["id", "place"],
    )
    out = {
        r.id: r.matched_token
        for r in regex_token_join(
            df, "place", ["Japonia", "Chilea"], ["id"]
        ).collect()
    }
    # list order wins, not text order: Japonia before Chilea
    assert out == {1: "Japonia", 2: "Japonia", 3: None}


def test_enrich_events_composition(spark):
    rows = [
        (1, "near Tokyo", 140.0, 35.0),           # spatial hit
        (2, "off the coast of Chilea", 0.0, -80.0),  # miss → regex fallback
        (3, "Alaska pipeline", -30.0, 80.0),      # miss → name-only dim row
        (4, "nothing here", -150.0, -10.0),       # stays null
    ]
    df = spark.createDataFrame(rows, ["id", "place", "longitude", "latitude"])
    out = {r.id: (r.country, r.region) for r in
           enrich_events(df, POLYGONS, LOOKUP, id_col="id").collect()}
    assert out[1] == ("Japonia", "Asia")
    assert out[2] == ("Chilea", "Americas")
    assert out[3] == ("Alaska", "Americas")
    assert out[4] == (None, None)
    # null-census invariant (SURVEY §5): enrichment only ADDS countries
    assert sum(1 for c, _ in out.values() if c is not None) == 3


def test_enrich_events_fallback_is_case_insensitive(spark):
    """The reference lowercases both place and country before the
    containment test (add_region.py:40-44); enrich_events must match a
    lowercase place name by default, and case_insensitive=False must not
    (ADVICE r07 — the oracle carries (?i) for the same contract)."""
    rows = [(1, "off the coast of chilea", 0.0, -80.0)]
    df = spark.createDataFrame(rows, ["id", "place", "longitude", "latitude"])
    out = enrich_events(df, POLYGONS, LOOKUP, id_col="id").collect()[0]
    assert (out.country, out.region) == ("Chilea", "Americas")
    strict = enrich_events(
        df, POLYGONS, LOOKUP, id_col="id", case_insensitive=False
    ).collect()[0]
    assert (strict.country, strict.region) == (None, None)


def test_polygon_dim_parse_amortized(spark):
    """VERDICT r07 item 6: repeated spatial_join calls with the same raw
    tuples must reuse ONE PolygonDim (one WKT parse, one broadcast per
    context+strategy), and an explicitly pre-parsed dim must behave
    identically to raw tuples."""
    from earthquake_data_pipeline_spark.operators.enrichment import (
        PolygonDim,
        parse_polygon_dim,
    )

    d1 = parse_polygon_dim(POLYGONS)
    d2 = parse_polygon_dim(list(POLYGONS))  # same content, new list
    assert d1 is d2  # content-keyed memo hit
    assert parse_polygon_dim(d1) is d1  # idempotent on parsed dims

    sc = spark.sparkContext
    b1 = d1.broadcast_for(sc, False)
    b2 = d1.broadcast_for(sc, False)
    assert b1 is b2  # broadcast cached per (context, grid flag)
    assert d1.broadcast_for(sc, True) is not b1  # grid variant distinct

    rows = [(1, 140.0, 35.0), (2, -150.0, -10.0)]
    df = spark.createDataFrame(rows, ["id", "longitude", "latitude"])
    via_raw = {r.id: r.country for r in spatial_join(df, POLYGONS).collect()}
    explicit = PolygonDim(POLYGONS)
    via_dim = {r.id: r.country for r in spatial_join(df, explicit).collect()}
    assert via_raw == via_dim == {1: "Japonia", 2: None}


def test_spatial_join_grid_index_matches_linear(spark):
    """The bbox-grid strategy (the >_MAX_LINEAR_POLYGONS successor,
    VERDICT r06 item 7) must reproduce the linear scan exactly on the
    sanity dim — including hole and MULTIPOLYGON semantics."""
    rows = [
        (1, 140.0, 35.0), (2, 178.5, -42.0), (3, -150.0, 10.0),
        (4, -150.0, -10.0), (5, 10.0, 50.0), (6, 5.0, 50.0),
        (7, -70.0, -30.0), (8, 165.0, -40.0),
    ]
    df = spark.createDataFrame(rows, ["id", "longitude", "latitude"])
    linear = {
        r.id: (r.country, r.region)
        for r in spatial_join(df, POLYGONS, grid_index=False).collect()
    }
    grid = {
        r.id: (r.country, r.region)
        for r in spatial_join(df, POLYGONS, grid_index=True).collect()
    }
    assert grid == linear
    assert grid[6] == ("Donutland", "Europe")  # solid part of holed poly


def test_spatial_join_grid_preserves_first_polygon_priority(spark):
    """Overlapping polygons: the FIRST polygon in dim order wins on both
    strategies (the grid's per-cell candidate lists are index-ordered)."""
    overlapping = [
        ("First", "A", "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))"),
        ("Second", "B", "POLYGON ((5 5, 15 5, 15 15, 5 15, 5 5))"),
    ]
    df = spark.createDataFrame(
        [(1, 7.0, 7.0), (2, 12.0, 12.0), (3, 2.0, 2.0)],
        ["id", "longitude", "latitude"],
    )
    for flag in (False, True):
        out = {
            r.id: r.country
            for r in spatial_join(df, overlapping, grid_index=flag).collect()
        }
        assert out == {1: "First", 2: "Second", 3: "First"}, flag


def test_spatial_join_auto_grid_past_linear_cap(spark):
    """A dim beyond _MAX_LINEAR_POLYGONS no longer raises: the grid path
    engages automatically and classifies correctly."""
    from earthquake_data_pipeline_spark.operators.enrichment import (
        _MAX_LINEAR_POLYGONS,
    )

    # (2*cap) 1x1-degree tiles laid out on a row-major lattice
    n = _MAX_LINEAR_POLYGONS * 2
    per_row = 100
    dim = []
    for k in range(n):
        x0, y0 = (k % per_row), (k // per_row)
        dim.append(
            (
                f"tile_{k}",
                None,
                f"POLYGON (({x0} {y0}, {x0 + 1} {y0}, {x0 + 1} {y0 + 1}, "
                f"{x0} {y0 + 1}, {x0} {y0}))",
            )
        )
    pts = [
        (0, 0.5, 0.5),        # tile_0
        (1, 55.5, 3.5),       # tile_355
        (2, 91.5, 81.5),      # tile_8191 (last tile: 81*100 + 91)
        (3, 150.0, 150.0),    # outside every tile
    ]
    df = spark.createDataFrame(pts, ["id", "longitude", "latitude"])
    out = {
        r.id: r.country
        for r in spatial_join(df, [(c, r_, w) for c, r_, w in dim]).collect()
    }
    assert out[0] == "tile_0"
    assert out[1] == f"tile_{3 * per_row + 55}"
    assert out[2] == f"tile_{81 * per_row + 91}"
    assert out[3] is None


def test_spatial_join_grid_handles_extent_max_edge_and_nulls(spark):
    """Points exactly ON the dim extent's max edge must route through
    the SAME polygon tests as the linear scan (the grid clamps them
    into the last cell instead of silently dropping them — exact
    containment there is undefined ray-cast boundary semantics, but the
    strategies must agree); near-edge interior points classify; null
    coordinates stay null with no NaN-cast fallout."""
    edge_dim = [
        ("Low", "A", "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))"),
        ("High", "B", "POLYGON ((10 10, 20 10, 20 20, 10 20, 10 10))"),
    ]
    rows = [
        (1, 20.0, 20.0),      # exact extent max corner (boundary: undefined
        (2, 0.0, 20.0),       # but must MATCH linear, not be dropped)
        (3, 20.0, 0.0),
        (4, 19.999, 19.999),  # interior point in the extent-max cell
        (5, None, 5.0),       # null lon
        (6, 5.0, None),       # null lat
    ]
    df = spark.createDataFrame(
        rows, "id int, longitude double, latitude double"
    )
    linear = {
        r.id: r.country
        for r in spatial_join(df, edge_dim, grid_index=False).collect()
    }
    grid = {
        r.id: r.country
        for r in spatial_join(df, edge_dim, grid_index=True).collect()
    }
    assert grid == linear
    assert grid[4] == "High" and grid[5] is None and grid[6] is None


class _FakeBroadcast:
    """Records destroy()/unpersist() calls; stands in for a pyspark
    Broadcast."""

    def __init__(self):
        self.destroyed = False
        self.unpersisted = False

    def destroy(self, blocking=False):
        self.destroyed = True

    def unpersist(self, blocking=False):
        self.unpersisted = True


class _FakeStoppedContext:
    """Looks stopped to _sc_stopped (no _jsc attribute set)."""

    _jsc = None


def test_polygon_dim_evicts_dead_context_broadcasts(spark):
    """ADVICE r08 / VERDICT r09 item 2b: broadcast_for must evict
    cache entries whose SparkContext has stopped — and destroy their
    Broadcast handles — instead of pinning every dead context forever
    in a long-lived driver that restarts sessions."""
    from earthquake_data_pipeline_spark.operators.enrichment import (
        PolygonDim,
    )

    dim = PolygonDim(POLYGONS)
    dead_sc, dead_bc = _FakeStoppedContext(), _FakeBroadcast()
    dim._bcs[(id(dead_sc), False)] = (dead_sc, dead_bc)

    sc = spark.sparkContext
    live = dim.broadcast_for(sc, False)  # any call sweeps dead entries
    assert (id(dead_sc), False) not in dim._bcs  # dead entry evicted
    assert dead_bc.destroyed
    assert dim._bcs[(id(sc), False)][1] is live  # live entry intact


def test_dim_cache_lru_order_and_eviction_releases_broadcasts(spark):
    """VERDICT r09 item 2c + ADVICE r09/r10: the _DIM_CACHE LRU must
    evict the LEAST-recently-used dim (a re-parse touch refreshes
    recency), and eviction must release the evicted dim's Broadcasts —
    unpersist() for LIVE contexts (a caller-held lazy DataFrame may
    still reference the handle; executors re-fetch from the driver on
    its next action), destroy() only for STOPPED ones."""
    from earthquake_data_pipeline_spark.operators import enrichment as E

    saved = dict(E._DIM_CACHE)
    E._DIM_CACHE.clear()
    try:
        def dim_tuples(i):
            return [(f"C{i}", "R", "POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0))")]

        dims = [E.parse_polygon_dim(dim_tuples(i))
                for i in range(E._DIM_CACHE_MAX)]  # fill to capacity
        # give the would-be victim a live fake broadcast to observe
        bc0 = _FakeBroadcast()
        dims[0]._bcs[("fake", False)] = (spark.sparkContext, bc0)
        # touch the oldest → dims[1] becomes least-recently-used
        assert E.parse_polygon_dim(dim_tuples(0)) is dims[0]
        bc1 = _FakeBroadcast()
        dims[1]._bcs[("fake", False)] = (spark.sparkContext, bc1)
        bc1_dead = _FakeBroadcast()
        dims[1]._bcs[("fake-dead", False)] = (_FakeStoppedContext(), bc1_dead)
        E.parse_polygon_dim(dim_tuples(E._DIM_CACHE_MAX))  # 9th insert
        # the touched dim survives; the LRU one (dims[1]) was evicted
        assert E.parse_polygon_dim(dim_tuples(0)) is dims[0]
        assert E.parse_polygon_dim(dim_tuples(1)) is not dims[1]
        # live-context handle released with unpersist, NEVER destroy
        assert bc1.unpersisted and not bc1.destroyed
        # stopped-context handle destroyed outright
        assert bc1_dead.destroyed and not bc1_dead.unpersisted
        assert not bc0.unpersisted and not bc0.destroyed
        assert not dims[1]._bcs  # evicted dim's broadcast map cleared
    finally:
        E._DIM_CACHE.clear()
        E._DIM_CACHE.update(saved)


def test_dim_cache_eviction_keeps_caller_held_dataframes_alive(spark):
    """ADVICE r10 regression: a lazy DataFrame built from a dim BEFORE
    the dim is evicted must still execute AFTER eviction — destroy()
    here used to fail the late action with 'Attempted to use Broadcast
    after it was destroyed'; unpersist() lets executors re-fetch."""
    from earthquake_data_pipeline_spark.operators import enrichment as E

    saved = dict(E._DIM_CACHE)
    E._DIM_CACHE.clear()
    try:
        victim = E.parse_polygon_dim(
            [("Box", "R", "POLYGON ((0 0, 2 0, 2 2, 0 2, 0 0))")]
        )
        pts = spark.createDataFrame(
            [(1, 1.0, 1.0), (2, 5.0, 5.0)], ["id", "latitude", "longitude"]
        )
        lazy = E.spatial_join(pts, victim)  # builds + caches a Broadcast
        lazy.count()  # materialize the broadcast on the live context
        for i in range(E._DIM_CACHE_MAX + 1):  # force victim's eviction
            E.parse_polygon_dim(
                [(f"C{i}", "R", "POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0))")]
            )
        got = {r.id: r.country for r in lazy.collect()}  # late action
        assert got == {1: "Box", 2: None}
    finally:
        E._DIM_CACHE.clear()
        E._DIM_CACHE.update(saved)
