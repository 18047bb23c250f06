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
