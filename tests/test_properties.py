"""Hypothesis property tests for driver-side pure logic (no Spark jobs):
window planning invariants, shapefile geometry round-trips, LSH plane
determinism. These guard the logic the distributed operators assume."""

from __future__ import annotations

from datetime import date, timedelta

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from earthquake_data_pipeline_spark.functions.geo import parse_wkt_polygon
from earthquake_data_pipeline_spark.operators.similarity import _hyperplane
from earthquake_data_pipeline_spark.sources.shapefile import (
    _rings_to_wkt,
    _signed_area,
)
from earthquake_data_pipeline_spark.sources.usgs import (
    PAGE_CAP,
    SyntheticFetcher,
    plan_windows,
)


@settings(max_examples=30, deadline=None)
@given(
    rows_per_day=st.integers(min_value=1, max_value=50_000),
    span_days=st.integers(min_value=1, max_value=400),
)
def test_plan_windows_invariants(rows_per_day, span_days):
    f = SyntheticFetcher(rows_per_day=rows_per_day)
    start = date(2020, 1, 1)
    end = start + timedelta(days=span_days)
    windows = plan_windows(f, start, end)
    # coverage: contiguous [start, end) with no gaps or overlaps
    assert windows[0][0] == start and windows[-1][1] == end
    for (_, e1), (s2, _) in zip(windows, windows[1:]):
        assert e1 == s2
    # the cap guarantee every partition relies on
    for ws, we in windows:
        assert ws < we
        assert f.count(ws, we) <= PAGE_CAP or (we - ws).days == 1


@st.composite
def closed_ring(draw, clockwise: bool):
    """A closed convex-ish ring around a random center (≥ 4 points)."""
    cx = draw(st.floats(-170, 170))
    cy = draw(st.floats(-80, 80))
    rad = draw(st.floats(0.1, 9.0))
    n = draw(st.integers(min_value=3, max_value=12))
    # strictly increasing angles → simple polygon; CCW by construction
    pts = [
        (
            round(cx + rad * np.cos(2 * np.pi * i / n), 6),
            round(cy + rad * np.sin(2 * np.pi * i / n), 6),
        )
        for i in range(n)
    ]
    if clockwise:
        pts = pts[::-1]
    return pts + [pts[0]]


@settings(max_examples=30, deadline=None)
@given(st.data())
def test_shapefile_wkt_roundtrip(data):
    outers = data.draw(st.integers(min_value=1, max_value=3))
    rings = []
    for _ in range(outers):
        rings.append(data.draw(closed_ring(clockwise=True)))
    wkt = _rings_to_wkt(rings)
    assert wkt is not None
    polys = parse_wkt_polygon(wkt)
    assert len(polys) == outers
    # coordinates survive exactly (repr round-trip)
    flat_in = [p for r in rings for p in r]
    flat_out = [tuple(p) for poly in polys for ring in poly for p in ring]
    assert flat_out == flat_in


@settings(max_examples=30, deadline=None)
@given(st.data())
def test_shapefile_winding_orders(data):
    outer = data.draw(closed_ring(clockwise=True))
    assert _signed_area(outer) < 0  # CW = shapefile outer
    # build a CCW hole strictly inside the outer (shrunk toward centroid)
    cx = sum(p[0] for p in outer[:-1]) / (len(outer) - 1)
    cy = sum(p[1] for p in outer[:-1]) / (len(outer) - 1)
    hole = [
        (cx + (x - cx) * 0.3, cy + (y - cy) * 0.3) for x, y in outer
    ][::-1]
    assert _signed_area(hole) > 0
    # storage order with an unrelated outer BETWEEN them: containment,
    # not adjacency, must decide the hole's parent
    far = [(x + 1000.0, y + 1000.0) for x, y in outer]
    wkt = _rings_to_wkt([outer, far, hole])
    polys = parse_wkt_polygon(wkt)
    assert len(polys) == 2
    by_rings = sorted(polys, key=len, reverse=True)
    assert len(by_rings[0]) == 2 and len(by_rings[1]) == 1
    # the hole landed in the polygon whose outer contains it
    assert tuple(by_rings[0][0][0]) == outer[0]


@settings(max_examples=20, deadline=None)
@given(
    plane_idx=st.integers(min_value=0, max_value=64),
    dim=st.integers(min_value=1, max_value=256),
)
def test_hyperplane_deterministic_and_bounded(plane_idx, dim):
    a = _hyperplane(plane_idx, dim)
    b = _hyperplane(plane_idx, dim)
    assert a == b and len(a) == dim
    assert all(-1.0 <= v < 1.0 for v in a)
    # distinct planes differ (md5 keyed by plane index)
    assert a != _hyperplane(plane_idx + 1, dim)


@settings(max_examples=60, deadline=None)
@given(
    ns=st.lists(st.integers(min_value=0, max_value=400), min_size=1, max_size=80),
    budget=st.integers(min_value=1, max_value=300),
)
def test_greedy_pack_invariants(ns, budget):
    from earthquake_data_pipeline_spark.operators.packing import greedy_pack

    packed = greedy_pack(ns, budget)
    assert len(packed) == len(ns)
    bins = [b for b, _ in packed]
    # bins are dense, 0-based, nondecreasing (in-order packing)
    assert bins[0] == 0
    assert all(b2 - b1 in (0, 1) for b1, b2 in zip(bins, bins[1:]))
    # per-bin totals: within budget unless the bin is a single oversized doc
    import collections

    totals = collections.defaultdict(list)
    for (b, _), n in zip(packed, ns):
        totals[b].append(n)
    for docs in totals.values():
        assert sum(docs) <= budget or len(docs) == 1
    # running fill is the cumulative sum within each bin
    seen = collections.defaultdict(int)
    for (b, fill), n in zip(packed, ns):
        seen[b] += n
        assert fill == seen[b]
    # greedy is maximal: a doc never opens a new bin it could have avoided
    for ((b1, f1), (b2, _)), n in zip(zip(packed, packed[1:]), ns[1:]):
        if b2 == b1 + 1:
            assert f1 + n > budget


@settings(max_examples=25, deadline=None)
@given(
    data=st.data(),
    w=st.integers(min_value=1, max_value=12),
    h=st.integers(min_value=1, max_value=12),
    filter_type=st.integers(min_value=0, max_value=4),
)
def test_png_codec_roundtrip_property(data, w, h, filter_type):
    from earthquake_data_pipeline_spark.operators.codecs import (
        decode_png,
        encode_png,
    )

    seed = data.draw(st.integers(min_value=0, max_value=2**31 - 1))
    rng = np.random.default_rng(seed)
    rgb = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    assert np.array_equal(decode_png(encode_png(rgb, filter_type=filter_type)), rgb)


@settings(max_examples=25, deadline=None)
@given(
    data=st.data(),
    tw=st.integers(min_value=1, max_value=4),
    th=st.integers(min_value=1, max_value=4),
)
def test_jpeg_block_constant_roundtrip_property(data, tw, th):
    """ANY block-constant gray image roundtrips bit-exactly at q=100 —
    the invariant the codec_roundtrip oracle depends on."""
    from earthquake_data_pipeline_spark.operators.codecs import (
        decode_jpeg,
        encode_jpeg,
    )

    tiles = np.array(
        [
            [data.draw(st.integers(0, 255)) for _ in range(tw)]
            for _ in range(th)
        ],
        dtype=np.uint8,
    )
    img = np.repeat(np.repeat(tiles, 8, axis=0), 8, axis=1)
    dec = decode_jpeg(encode_jpeg(img, quality=100))
    assert np.array_equal(dec, np.repeat(img[:, :, None], 3, axis=2))


@settings(max_examples=15, deadline=None)
@given(data=st.data(), w=st.integers(1, 20), h=st.integers(1, 20))
def test_jpeg_q100_gray_error_bound_property(data, w, h):
    """Arbitrary gray content (any dims, incl. non-multiple-of-8) stays
    within 2 LSB through the q=100 encode→decode path."""
    from earthquake_data_pipeline_spark.operators.codecs import (
        decode_jpeg,
        encode_jpeg,
    )

    img = np.array(
        [[data.draw(st.integers(0, 255)) for _ in range(w)] for _ in range(h)],
        dtype=np.uint8,
    )
    dec = decode_jpeg(encode_jpeg(img, quality=100))
    assert dec.shape == (h, w, 3)
    assert np.abs(dec.astype(int) - img[:, :, None].astype(int)).max() <= 2


@settings(max_examples=25, deadline=None)
@given(data=st.data(), n=st.integers(1, 12))
def test_mp4_roundtrip_property(data, n):
    """Any sample list (sizes 1..64, arbitrary bytes) survives
    build→parse→extract byte-exactly with consistent offsets/times."""
    from earthquake_data_pipeline_spark.operators import mp4

    samples = [
        bytes(
            data.draw(
                st.lists(st.integers(0, 255), min_size=1, max_size=64)
            )
        )
        for _ in range(n)
    ]
    delta = data.draw(st.integers(1, 3000))
    raw = mp4.build_mp4(samples, timescale=1000, sample_delta=delta)
    tr = mp4.parse_mp4(raw)
    assert tr.n_samples == n
    assert mp4.extract_samples(raw, tr) == samples
    assert tr.sample_times_ms() == [i * delta for i in range(n)]
    # offsets are strictly increasing by the previous sample's size
    for i in range(1, n):
        assert tr.sample_offsets[i] == tr.sample_offsets[i - 1] + len(
            samples[i - 1]
        )


@settings(max_examples=20, deadline=None)
@given(cut=st.integers(20, 200))
def test_jpeg_truncated_input_raises_cleanly(cut):
    """Truncating a valid stream anywhere must raise ValueError, never an
    uncontrolled IndexError — the contract mapInPandas error paths rely
    on."""
    import pytest as _pytest

    from earthquake_data_pipeline_spark.operators.codecs import (
        decode_jpeg,
        encode_jpeg,
    )

    img = (np.add.outer(np.arange(16) * 7, np.arange(16) * 3) % 256).astype(
        np.uint8
    )
    raw = encode_jpeg(img, quality=90)
    cut = min(cut, len(raw) - 1)
    with _pytest.raises(ValueError):
        decode_jpeg(raw[:cut])


# ---- round-6 operator math (pure-Python models of the Column exprs) ----


def _winnow_model(text: str, k: int = 8, w: int = 4, cap: int = 200):
    """Python twin of operators/fingerprint.winnow_fingerprints: same
    lower/substring/md5-prefix hash family, same least-of-w selection."""
    import hashlib

    t = text.lower()[:cap]
    m = len(t) - k + 1
    if m < w:
        return set()
    hashes = [
        int(hashlib.md5(t[i : i + k].encode()).hexdigest()[:8], 16)
        for i in range(m)
    ]
    return {min(hashes[j : j + w]) for j in range(m - w + 1)}


@settings(max_examples=40, deadline=None)
@given(
    prefix=st.text(st.characters(min_codepoint=ord("a"), max_codepoint=ord("z")), max_size=40),
    suffix=st.text(st.characters(min_codepoint=ord("a"), max_codepoint=ord("z")), max_size=40),
    shared=st.text(st.characters(min_codepoint=ord("a"), max_codepoint=ord("z")), min_size=11, max_size=30),
)
def test_winnowing_guarantee_property(prefix, suffix, shared):
    """Schleimer et al.: documents sharing a substring of length >=
    w+k-1 (= 11 for k=8, w=4) always share at least one fingerprint —
    for ANY surrounding text. Also the density bound: never more
    fingerprints than k-gram windows."""
    a = prefix + shared + suffix
    b = suffix + shared + prefix
    fa, fb = _winnow_model(a), _winnow_model(b)
    # guarantee applies while the shared run survives the 200-char cap
    if a.find(shared) + len(shared) <= 200 and b.find(shared) + len(shared) <= 200:
        assert fa & fb
    for s, f in ((a, fa), (b, fb)):
        m = len(s[:200]) - 8 + 1
        assert len(f) <= max(m - 4 + 1, 0)


@settings(max_examples=60, deadline=None)
@given(
    cents=st.lists(st.integers(min_value=0, max_value=10_000), min_size=2, max_size=80),
)
def test_zscore_integer_predicate_matches_float_zscore(cents):
    """The division-free outlier predicate (n*v - S)^2 > T^2*(n*SS - S^2)
    is algebraically z^2 > T^2 with population variance — check against
    the float computation away from the boundary."""
    import math

    n = len(cents)
    S = sum(cents)
    SS = sum(c * c for c in cents)
    var_pop = (n * SS - S * S) / (n * n)
    for v in cents:
        integer_says = (n * v - S) ** 2 > 4 * (n * SS - S * S)
        if var_pop == 0:
            assert not integer_says  # zero variance -> nothing flags
            continue
        z2 = (v - S / n) ** 2 / var_pop
        if abs(z2 - 4.0) > 1e-9:  # away from the exact boundary
            assert integer_says == (z2 > 4.0)


@settings(max_examples=60, deadline=None)
@given(y=st.integers(1, 9999), m=st.integers(1, 12))
def test_cohort_month_index_roundtrip(y, m):
    """cohort_retention's integer month index y*12 + m - 1 decodes back
    to exactly (y, m) via (idx // 12, idx % 12 + 1)."""
    idx = y * 12 + m - 1
    assert (idx // 12, idx % 12 + 1) == (y, m)


# ---------- continuation-window operator math ----------


def _pareto_brute(points):
    out = set()
    for i, (idx, x, y) in enumerate(points):
        dominated = any(
            (x2 >= x and y2 >= y and (x2 > x or y2 > y))
            for j, (_, x2, y2) in enumerate(points)
            if j != i
        )
        if not dominated:
            out.add(idx)
    return out


def _pareto_sortfilter(points):
    """Pure-python mirror of operators/analytics.py::pareto_frontier_2d:
    per-distinct-x max y, running max over strictly larger x, filter."""
    gx = {}
    for _, x, y in points:
        gx[x] = max(gx.get(x, y), y)
    my = {}
    best = None
    for x in sorted(gx, reverse=True):
        my[x] = best
        best = gx[x] if best is None else max(best, gx[x])
    return {
        idx
        for idx, x, y in points
        if y == gx[x] and (my[x] is None or y > my[x])
    }


@settings(max_examples=200, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(-50, 50), st.integers(-50, 50)),
        min_size=1,
        max_size=40,
    )
)
def test_pareto_sortfilter_equals_brute_force(xy):
    points = [(i, x, y) for i, (x, y) in enumerate(xy)]
    assert _pareto_sortfilter(points) == _pareto_brute(points)


def _bucket_replay(ts_list, burst, num, den):
    cap = burst * den
    units, prev, out = cap, None, []
    for t in ts_list:
        if prev is not None:
            units = min(cap, units + (t - prev) * num)
        prev = t
        ok = units >= den
        out.append(ok)
        if ok:
            units -= den
        assert 0 <= units <= cap  # invariant: never negative, never over
    return out


@settings(max_examples=150, deadline=None)
@given(
    st.lists(st.integers(0, 5000), min_size=1, max_size=120),
    st.integers(1, 5),
    st.integers(1, 60),
)
def test_token_bucket_rate_bound(ts, burst, den):
    """Admissions in ANY span [a, b] never exceed burst + refill + 1 —
    the guarantee a rate limiter exists to provide (refill_num=1)."""
    ts = sorted(ts)
    admitted = _bucket_replay(ts, burst, 1, den)
    adm_ts = [t for t, ok in zip(ts, admitted) if ok]
    for i, a in enumerate(adm_ts):
        for j in range(i, len(adm_ts)):
            b = adm_ts[j]
            window_admits = j - i + 1
            assert window_admits <= burst + (b - a) // den + 1


@settings(max_examples=150, deadline=None)
@given(
    st.lists(st.tuples(st.integers(0, 5), st.integers(0, 9)), max_size=60),
    st.lists(st.tuples(st.integers(0, 5), st.integers(0, 9)), max_size=60),
    st.integers(0, 7),
)
def test_ivm_delta_identity(a_rows, b_rows, split_seed):
    """Δ(A⋈B) = ΔA⋈B ∪ A⋈ΔB ∪ ΔA⋈ΔB: the union of the four split
    joins aggregates to exactly the full join's (count, sum) per key —
    the algebra operators/merge.py::incremental_join_agg relies on."""
    import collections

    def view(a, b):
        out = collections.defaultdict(lambda: [0, 0])
        bk = collections.defaultdict(list)
        for k, v in b:
            bk[k].append(v)
        for k, _ in a:
            for v in bk.get(k, []):
                out[k][0] += 1
                out[k][1] += v
        return out

    def split(rows, bit):
        base = [r for i, r in enumerate(rows) if (i + split_seed) % 3 != bit]
        delta = [r for i, r in enumerate(rows) if (i + split_seed) % 3 == bit]
        return base, delta

    ab, ad = split(a_rows, 0)
    bb, bd = split(b_rows, 1)
    import itertools

    merged = collections.defaultdict(lambda: [0, 0])
    for part in (view(ab, bb), view(ad, bb), view(ab, bd), view(ad, bd)):
        for k, (n, s) in part.items():
            merged[k][0] += n
            merged[k][1] += s
    full = view(a_rows, b_rows)
    assert {k: tuple(v) for k, v in merged.items()} == {
        k: tuple(v) for k, v in full.items()
    }


@settings(max_examples=150, deadline=None)
@given(st.lists(st.integers(0, 30), min_size=1, max_size=200), st.integers(2, 9))
def test_equidepth_bucket_bounds(vals, k):
    """Replay of operators/profiling.py::equidepth_histogram's bucket
    rule: buckets partition the rows; a bucket exceeds n/k only by
    tie-mass (a single heavy value), never by construction error."""
    import collections

    n = len(vals)
    cnt = collections.Counter(vals)
    cum = 0
    sizes = collections.defaultdict(int)
    maxmult = max(cnt.values())
    for v in sorted(cnt):
        cum += cnt[v]
        b = ((cum - 1) * k) // n
        assert 0 <= b < k
        sizes[b] += cnt[v]
    assert sum(sizes.values()) == n
    for b, s in sizes.items():
        assert s <= n // k + 1 + maxmult  # slack only from tie mass


@settings(max_examples=100, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 6), st.integers(0, 6), st.integers(1, 9)),
        min_size=1,
        max_size=40,
    )
)
def test_pagerank_ppm_mass_and_bounds(edges):
    """Pure-python replay of operators/graph.py::pagerank_ppm: ranks
    stay in [base, PPM] and total mass never exceeds PPM + n (floor
    losses only shrink mass; the +n covers per-node base rounding)."""
    import collections

    nodes = sorted({s for s, _, _ in edges} | {d for _, d, _ in edges})
    n = len(nodes)
    wout = collections.defaultdict(int)
    for s, _, w in edges:
        wout[s] += w
    base = 150000 // n
    rank = {v: 1000000 // n for v in nodes}
    for _ in range(3):
        in_sum = collections.defaultdict(int)
        for s, d, w in edges:
            in_sum[d] += (rank[s] * w) // wout[s]
        rank = {
            v: base + (850000 * in_sum.get(v, 0)) // 1000000 for v in nodes
        }
        assert all(base <= r <= 1000000 for r in rank.values())
        assert sum(rank.values()) <= 1000000 + n


@settings(max_examples=200, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 7), st.integers(-50, 50), st.integers(-50, 50)),
        min_size=1,
        max_size=80,
    ),
    st.integers(-60, 60),
    st.integers(-60, 60),
    st.integers(-60, 60),
    st.integers(-60, 60),
)
def test_zone_map_skipping_never_loses_a_match(rows, plo, phi, slo, shi):
    """Soundness of the skip rule (layout.py::skip_audit and the 2-D
    zorder_skipping variant): a file pruned by min/max stats contains
    ZERO rows matching the predicate — skipping is always lossless."""
    import collections

    files = collections.defaultdict(list)
    for f, x, y in rows:
        files[f].append((x, y))
    for f, pts in files.items():
        xmin = min(p[0] for p in pts); xmax = max(p[0] for p in pts)
        ymin = min(p[1] for p in pts); ymax = max(p[1] for p in pts)
        skipped = (xmax < plo or xmin > phi) or (ymax < slo or ymin > shi)
        if skipped:
            assert not any(
                plo <= x <= phi and slo <= y <= shi for x, y in pts
            )


@settings(max_examples=200, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 300), st.sampled_from("tc")),
        min_size=1,
        max_size=60,
    ),
    st.integers(1, 100),
)
def test_attribution_carry_forward_reference(events, lookback):
    """Pure-python mirror of last_touch_attribution's carry-forward:
    the credited touch is exactly the latest strictly-prior touch in
    (ts, id) order, within the lookback — checked against a brute-force
    scan over all prior events."""
    evs = sorted(
        [(ts, i, k) for i, (ts, k) in enumerate(events)],
        key=lambda e: (e[0], e[1]),
    )
    last_touch = None
    for ts, i, kind in evs:
        if kind == "c":  # conversion: brute-force the expected credit
            prior = [e for e in evs if (e[0], e[1]) < (ts, i) and e[2] == "t"]
            expect = max(prior, key=lambda e: (e[0], e[1])) if prior else None
            got = last_touch
            assert got == expect
            if expect is not None:
                channel = "t" if ts - expect[0] <= lookback else "none"
                assert channel in ("t", "none")
        else:
            last_touch = (ts, i, kind)


@settings(max_examples=40, deadline=None)
@given(data=st.data())
def test_bbox_grid_candidate_lists_are_sound_and_ordered(data):
    """Grid-index soundness (the invariant spatial_join's grid strategy
    rests on): for ANY point, every polygon whose bbox contains the
    point appears in the candidate list of the point's grid cell — so
    bucketing can never lose a hit; and candidate lists are ascending,
    which is what preserves first-polygon-wins priority."""
    from earthquake_data_pipeline_spark.operators.enrichment import (
        _build_bbox_grid,
    )

    n_polys = data.draw(st.integers(min_value=1, max_value=40))
    parsed = []
    for i in range(n_polys):
        x0 = data.draw(st.floats(-180, 179, allow_nan=False))
        y0 = data.draw(st.floats(-90, 89, allow_nan=False))
        w = data.draw(st.floats(0, 30, allow_nan=False))
        h = data.draw(st.floats(0, 30, allow_nan=False))
        parsed.append((f"c{i}", None, None, (x0, y0, x0 + w, y0 + h)))
    gminx, gminy, gmaxx, gmaxy, cw, ch, n_axis, cells = _build_bbox_grid(
        parsed
    )

    for cand in cells.values():
        assert cand == sorted(cand)  # priority order preserved

    # random probes PLUS the exact extent corners — a point ON the max
    # edge must land in the last cell (the clamp), not fall off the grid
    probes = [(gmaxx, gmaxy), (gminx, gmaxy), (gmaxx, gminy)]
    for _ in range(20):
        probes.append(
            (
                data.draw(st.floats(-181, 211, allow_nan=False)),
                data.draw(st.floats(-91, 121, allow_nan=False)),
            )
        )
    for px, py in probes:
        in_grid = gminx <= px <= gmaxx and gminy <= py <= gmaxy
        ix = min(max(int(np.floor((px - gminx) / cw)), 0), n_axis - 1)
        iy = min(max(int(np.floor((py - gminy) / ch)), 0), n_axis - 1)
        cand = set(cells.get(iy * n_axis + ix, [])) if in_grid else set()
        for pi, (_, _, _, (minx, miny, maxx, maxy)) in enumerate(parsed):
            if minx <= px <= maxx and miny <= py <= maxy:
                # bbox-containing polygon MUST be findable via the grid
                assert in_grid and pi in cand


@settings(max_examples=25, deadline=None)
@given(data=st.data())
def test_txnlog_vacuum_preserves_surviving_versions(data, tmp_path_factory):
    """Stateful vacuum property (no Spark — the log is plain files):
    for a RANDOM history of appends/overwrites and a RANDOM cut,
    vacuum keeps every surviving version's live set EXACTLY equal to a
    pure-Python model's, deletes only unreachable data files, raises on
    vacuumed reads (via live_files' version floor), and re-runs
    idempotently."""
    import os

    from earthquake_data_pipeline_spark.sources.txnlog import (
        _commit,
        _versions,
        live_files,
        vacuum,
    )

    t = str(tmp_path_factory.mktemp("tlog"))
    data_dir = os.path.join(t, "data")
    os.makedirs(data_dir)

    model: list[set[str]] = []  # live set per version
    live: set[str] = set()
    n_commits = data.draw(st.integers(min_value=1, max_value=8))
    fcount = 0
    for v in range(n_commits):
        n_add = data.draw(st.integers(min_value=0, max_value=3))
        added = []
        for _ in range(n_add):
            name = f"f{fcount}.parquet"
            fcount += 1
            open(os.path.join(data_dir, name), "w").close()
            added.append(name)
        overwrite = data.draw(st.booleans())
        removed = sorted(live) if overwrite else []
        _commit(t, added, removed, version=v)
        live = (set() if overwrite else set(live)) | set(added)
        model.append(set(live))

    cut = data.draw(st.integers(min_value=-1, max_value=n_commits))
    vacuum(t, keep_after_version=cut)

    surviving = _versions(t)
    assert surviving, "latest version must always survive"
    expect_surviving = [v for v in range(n_commits) if v > cut] or [
        n_commits - 1
    ]
    assert surviving == expect_surviving
    for v in surviving:
        got = {os.path.basename(p) for p in live_files(t, v)}
        assert got == model[v], f"version {v} live set drifted"
    on_disk = {f for f in os.listdir(data_dir) if f.endswith(".parquet")}
    assert on_disk == set().union(*(model[v] for v in surviving))

    # idempotent re-run: nothing further deleted, same live sets
    assert vacuum(t, keep_after_version=cut) == []
    for v in surviving:
        got = {os.path.basename(p) for p in live_files(t, v)}
        assert got == model[v]


@given(
    st.floats(
        min_value=0.0,
        max_value=4.5e9,  # x*1e6 < 2^52: the true round-equivalence envelope
        allow_nan=False,
        allow_infinity=False,
    )
)
@settings(max_examples=300, deadline=None)
def test_round6u_matches_duckdb_round(x):
    """qcommon.round6u's claim: floor(x*1e6+0.5)/1e6 in float64 equals
    DuckDB's round(double, 6) for every non-negative double while
    x·1e6 < 2^52 — including exact 7-dp ties where HALF_EVEN modes
    diverge. (Round 10: Hypothesis falsified the old 9e12 envelope at
    x=4503599628.078125 — past 2^52 micro-units the +0.5 is an exact
    tie at integer spacing and rounds half-even; see the twin test
    below for what still holds there.)"""
    import math

    import duckdb

    py = math.floor(x * 1e6 + 0.5) / 1e6
    duck = duckdb.connect().execute(
        "select round(?::double, 6)", [x]
    ).fetchone()[0]
    assert py == duck


def test_round6u_twin_identity_beyond_2pow52():
    """Past the 2^52 micro-unit boundary round6u may diverge from
    round(x, 6) by one micro-unit (half-even tie on an odd integer
    N = x*1e6) — but the property the ORACLES rely on is that both
    engines evaluate the identical micro-unit expression bit-for-bit.
    Pin the Hypothesis counterexample plus a grid straddling the
    boundary: python float64 == DuckDB floor(x*1e6+0.5)/1e6 exactly,
    and the documented divergence really is confined to odd N."""
    import math

    import duckdb

    con = duckdb.connect()
    xs = [
        4503599628.078125,  # the falsifying example (odd N: diverges)
        4503599627.0,       # just under the boundary
        4503599628.078126,
        9.2e12,             # near the BIGINT-exactness envelope end
        5e10, 7.1e11,
    ]
    for x in xs:
        py = math.floor(x * 1e6 + 0.5) / 1e6
        duck_twin = con.execute(
            "select floor(?::double * 1e6 + 0.5) / 1e6", [x]
        ).fetchone()[0]
        assert py == duck_twin, x  # the bit-identical twin: always
        n = x * 1e6
        if n >= 2**52 and float(n).is_integer() and int(n) % 2 == 0:
            # even N: half-even tie keeps N, so round-equivalence holds
            duck_round = con.execute(
                "select round(?::double, 6)", [x]
            ).fetchone()[0]
            assert py == duck_round, x


@given(st.integers(0, 10**13))
@settings(max_examples=200, deadline=None)
def test_round6u_tie_grid(n):
    """Every value on the exact half-micro grid (n + 0.5 micro-units)
    rounds UP in both the python replay and DuckDB — the tie family
    np.round breaks."""
    import math

    import duckdb

    x = (2 * n + 1) / 2e6  # exactly representable? not always — but the
    # comparison is on the SAME double both sides, which is the contract
    py = math.floor(x * 1e6 + 0.5) / 1e6
    duck = duckdb.connect().execute(
        "select round(?::double, 6)", [x]
    ).fetchone()[0]
    assert py == duck
