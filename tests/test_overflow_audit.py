"""Round-10 numeric-envelope (overflow) audit regression tests.

Each test constructs an input whose intermediate arithmetic exceeds
2^63 under the PRE-audit int64 formulation — small frames with large
values, not large frames — and asserts the decimal/modular form
returns the exactly-correct result. The old code either wrapped
silently (ANSI off) or died with ARITHMETIC_OVERFLOW (ANSI on, the
default session); either way these inputs are the first hot key of a
100 TB corpus, not an edge case.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

LONG_MAX = (1 << 63) - 1


def test_cms_join_size_survives_big_bucket_counts(spark):
    # bucket counts ~3e9 (a 10^12-row table over 512 buckets is ~2e9
    # per bucket): a single na*nb product is ~9e18 > 2^63. Bypass the
    # sketch build and feed the (j, bucket, n) grid directly.
    from earthquake_data_pipeline_spark.operators.sketches import (
        cms_join_size,
    )

    na = 3_000_000_000
    rows = [(j, b, na) for j in range(2) for b in range(4)]
    ska = spark.createDataFrame(rows, "j int, bucket int, n long")
    skb = spark.createDataFrame(rows, "j int, bucket int, n long")
    out = cms_join_size(ska, skb).collect()
    expected = float(4 * na * na)  # 3.6e19, exceeds 2^63
    assert expected > LONG_MAX
    for r in out:
        assert r["row_est"] == expected
        assert r["join_size_est"] == expected


def test_zscore_survives_hot_key_big_cents(spark):
    # cents = 5e7 per row -> cents^2 = 2.5e15 per row; 72 rows put the
    # old int64 n*SS product (~1.3e19) past 2^63 on a tiny frame. One
    # planted outlier must still be flagged exactly. (Values stay
    # under round6x's documented decimal(18,12) mean envelope, which
    # the oracle shares.)
    from earthquake_data_pipeline_spark.operators.analytics import (
        zscore_outlier_stats,
    )

    base = 500_000.0  # cents = 5e7
    rows = [("k", base + i) for i in range(-35, 36)] + [("k", 3 * base)]
    n = len(rows)
    cents = [int(v * 100) for _, v in rows]
    s, ss = sum(cents), sum(c * c for c in cents)
    assert n * ss > LONG_MAX  # the old formulation overflowed here
    df = spark.createDataFrame(rows, "event_type string, value double")
    out = zscore_outlier_stats(df, key_col="event_type").collect()
    assert len(out) == 1
    exp_outliers = sum(
        1
        for c in cents
        if (n * c - s) ** 2 > 4 * (n * ss - s * s)
    )
    assert out[0]["n_outliers"] == exp_outliers == 1
    assert out[0]["n_events"] == n


def test_hourly_profile_survives_hot_hour(spark):
    # one event_type with 700k rows in a single hour: 1e6*24*c^2
    # ~ 1.2e19 > 2^63 in the old int64 conc arithmetic; a one-hour
    # spike must report exactly conc_ppm = 1e6.
    from earthquake_data_pipeline_spark.operators.analytics import (
        hourly_profile,
    )

    c = 700_000
    assert 1_000_000 * 24 * c * c > LONG_MAX
    ev = spark.range(c).select(
        F.lit("hot").alias("event_type"),
        F.to_timestamp(F.lit("2024-01-01 05:30:00")).alias("ts"),
    )
    out = hourly_profile(ev).collect()
    assert len(out) == 1
    assert out[0]["n"] == c
    assert out[0]["peak_hour"] == 5
    assert out[0]["conc_ppm"] == 1_000_000


def test_trend_fit_survives_hot_key_cross_products(spark):
    # 2M rows on one key at y = 9e5 milli: syy ~ 1.6e18 still fits a
    # long, but the n*syy cross-product (~3.2e24) overflowed the old
    # int64 formulation. A constant series must still fit exactly:
    # slope 0, intercept y, r2 null (deny == 0 exactly).
    from earthquake_data_pipeline_spark.operators.analytics import (
        trend_fit,
    )

    n, y = 2_000_000, 900_000
    assert n * (n * y * y) > LONG_MAX  # old n*syy cross-product
    ev = spark.range(n).select(
        F.lit("u").alias("user_id"),
        F.timestamp_seconds(F.lit(1704067200) + F.col("id")).alias("ts"),
        F.lit(y / 1000.0).alias("value"),
    )
    out = trend_fit(ev).collect()
    assert len(out) == 1
    assert out[0]["n_events"] == n
    assert out[0]["slope_milli_per_hr"] == pytest.approx(0.0, abs=1e-9)
    assert out[0]["intercept_milli"] == pytest.approx(y, abs=1e-6)
    assert out[0]["r2"] is None


def test_epoch_shuffle_checksum_is_modular_and_replayable(spark):
    # the checksum must equal the pure-Python modular replay and stay
    # below 2^31 regardless of id magnitude — ids near 2^62 overflow
    # the old pos*(id+1) form by the second row of every shard.
    import hashlib

    from earthquake_data_pipeline_spark.operators.shuffling import (
        epoch_shuffle,
    )

    big = 1 << 62
    ids = [big + i for i in range(64)]
    docs = spark.createDataFrame([(i,) for i in ids], "doc_id long")
    out = epoch_shuffle(docs, n_epochs=1, n_shards=4).collect()

    M = 2147483647
    by_shard: dict = {}
    for i in ids:
        h = int(hashlib.md5(f"{i}#0shuf".encode()).hexdigest()[:8], 16)
        by_shard.setdefault(h % 4, []).append((h, i))
    for r in out:
        members = sorted(by_shard[r["shard"]])
        exp = (
            sum(
                ((pos + 1) % M) * ((i + 1) % M) % M
                for pos, (_, i) in enumerate(members)
            )
            % M
        )
        assert r["order_checksum"] == exp
        assert 0 <= r["order_checksum"] < M
        assert r["n_docs"] == len(members)


def test_fingerprint_set_let_bit_identical(spark):
    # the let-bound O(m)-md5 form (now THE fingerprint_set, round-11
    # unification) must select EXACTLY the same fingerprints as the
    # retired round-6 O(w*m) least()-based form — reconstructed here as
    # the reference implementation — for every shape: short-of-w docs,
    # exact boundaries, longer-than-cap docs
    from pyspark.sql import functions as F

    from earthquake_data_pipeline_spark.operators.fingerprint import (
        _gram_hash,
        fingerprint_set,
    )

    def least_form(text_col, k, w, cap):
        t = F.lower(F.substring(F.col(text_col), 1, cap))
        m = F.length(t) - F.lit(k - 1)
        selected = F.transform(
            F.sequence(F.lit(1), m - F.lit(w - 1)),
            lambda j: F.least(*[_gram_hash(t, j + o, k) for o in range(w)]),
        )
        return F.when(m >= w, F.array_distinct(selected)).otherwise(
            F.array().cast("array<bigint>")
        )

    texts = [
        "", "ab", "abcdefgh", "abcdefghijk",
        "the quick brown fox jumps over the lazy dog " * 3,
        "x" * 500,  # beyond cap
        "aaaaaaaaaaaaaaaaaaaaaaaa",  # degenerate repeats
    ]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], ["i", "t"])
    for k, w, cap in ((8, 4, 200), (12, 6, 200), (3, 2, 16)):
        out = df.select(
            "i",
            fingerprint_set("t", k=k, w=w, cap=cap).alias("a"),
            least_form("t", k=k, w=w, cap=cap).alias("b"),
        ).collect()
        for r in out:
            assert r["a"] == r["b"], (k, w, cap, r["i"])


def test_zscore_overflow_tripwire_fails_loud_in_permissive_session(spark):
    """ADVICE r10: in a permissive (ANSI-off) session a breached decimal
    envelope nulls is_outlier and F.sum would silently skip it. The
    assert_true tripwire must turn that into a loud failure instead of
    an undercounted n_outliers."""
    import pytest
    from pyspark.sql import functions as F

    from earthquake_data_pipeline_spark.operators.analytics import (
        zscore_outlier_stats,
    )

    prev = spark.conf.get("spark.sql.ansi.enabled")
    spark.conf.set("spark.sql.ansi.enabled", "false")
    try:
        # 1e17 overflows the decimal(18,2) cents cast -> null cents ->
        # null comparison -> null is_outlier (permissive semantics)
        ev = spark.createDataFrame(
            [("a", 1.0), ("a", 2.0), ("a", 1e17)], ["event_type", "value"]
        )
        with pytest.raises(Exception, match="envelope breached"):
            zscore_outlier_stats(ev).collect()
        # in-envelope inputs still pass through the tripwire untouched
        ok = spark.createDataFrame(
            [("a", 1.0), ("a", 2.0), ("a", 3.0)], ["event_type", "value"]
        )
        rows = zscore_outlier_stats(ok).collect()
        assert rows[0]["n_outliers"] == 0
        # a legitimately-NULL input value is SKIPPED (pre-guard and
        # oracle semantics), never misreported as an envelope breach
        withnull = spark.createDataFrame(
            [("a", 1.0), ("a", 2.0), ("a", None)], ["event_type", "value"]
        )
        rows = zscore_outlier_stats(withnull).collect()
        assert rows[0]["n_events"] == 3 and rows[0]["n_outliers"] == 0
    finally:
        spark.conf.set("spark.sql.ansi.enabled", prev)
