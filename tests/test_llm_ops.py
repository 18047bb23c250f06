"""Tests for the LLM-data-pipeline operators: text analysis, fuzzy dedup,
similarity search, multimodal plumbing (north-star coverage)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from earthquake_data_pipeline_spark.operators.fuzzy_dedup import (
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    shingles_of,
    simhash,
)
from earthquake_data_pipeline_spark.operators.multimodal import (
    attach_binary_payload,
    extract_features,
    frame_sample,
    resize_images,
)
from earthquake_data_pipeline_spark.operators.similarity import (
    cosine_topk,
    embedding_near_dup_pairs,
    embedding_near_dup_pairs_lsh,
    ivf_topk,
    lsh_bucket_topk,
)
from earthquake_data_pipeline_spark.operators.text import (
    fingerprint,
    language_id,
    quality_score,
    token_count,
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "the quick brown fox jumps over the lazy cat"),  # near-dup of 1
        (3, "completely different content about spark engines"),
        (4, "The  Quick   Brown Fox jumps over the lazy dog"),  # case/space variant of 1
        (5, "hi"),  # shorter than one shingle
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_token_count(spark, docs):
    out = {r.doc_id: (r.n_ws_tokens, r.n_bpe_pieces) for r in token_count(docs).collect()}
    assert out[1] == (9, 9)
    assert out[5] == (1, 1)


def test_quality_score_bounds(spark, docs):
    rows = quality_score(docs).collect()
    for r in rows:
        assert 0.0 <= r.quality_score <= 1.0
        assert 0.0 <= r.stopword_ratio <= 1.0
    by_id = {r.doc_id: r for r in rows}
    assert by_id[1].stopword_ratio == round(2 / 9, 6)  # 'the' twice


def test_language_id_deterministic_tiebreak(spark):
    df = spark.createDataFrame(
        [(1, "der the nicht of"), (2, "xyzzy blob")], ["doc_id", "text"]
    )
    out = {r.doc_id: r.detected_lang for r in language_id(df).collect()}
    assert out[1] == "de"   # 2-2 tie de/en → lexicographic first
    assert out[2] == "de"   # all-zero tie → lexicographic first


def test_fingerprint_normalizes_case_and_space(spark, docs):
    out = {r.doc_id: r.doc_fingerprint for r in fingerprint(docs).collect()}
    assert out[1] == out[4]
    assert out[1] != out[2]


def test_shingles_short_doc_empty(spark, docs):
    out = {
        r.doc_id: r.sh
        for r in docs.select("doc_id", shingles_of("text").alias("sh")).collect()
    }
    assert out[5] == []
    assert "the quick brown" in out[1]


def test_minhash_lsh_finds_near_dups(spark, docs):
    pairs = {(r.id_a, r.id_b) for r in minhash_lsh_pairs(docs).collect()}
    assert (1, 4) in pairs  # identical after normalization → all bands agree
    assert (1, 3) not in pairs and (3, 4) not in pairs


def test_bucket_pairs_star_guard_component_exact(spark):
    """Round-10 hot-bucket guard: star_over caps a duplicate-mass bucket
    at O(m) star edges. For connectivity consumers the result must be
    BIT-IDENTICAL to the clique — same components, same canonical ids,
    same component sizes — on a corpus mixing one identical-doc mass,
    a genuine near-dup pair, and unique docs."""
    from pyspark.sql import functions as F

    from earthquake_data_pipeline_spark.operators.dedup import (
        connected_components,
    )
    from earthquake_data_pipeline_spark.operators.fuzzy_dedup import (
        minhash_lsh_pairs,
    )

    n_dup = 40
    rows = [(i, "the same boilerplate body repeated everywhere") for i in range(n_dup)]
    rows += [
        (100, "a quick brown fox jumps over the lazy dog today"),
        (101, "a quick brown fox jumps over the lazy dog tonight"),
        (200, "completely unrelated text about earthquake magnitudes"),
        (201, "another unrelated body mentioning nothing shared at all"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    clique = minhash_lsh_pairs(docs)
    star = minhash_lsh_pairs(docs, star_over=2)

    # the guard actually fires and is linear in the mass
    n_clique = clique.count()
    n_star = star.count()
    assert n_clique >= n_dup * (n_dup - 1) // 2  # quadratic clique
    assert n_star < 2 * n_dup + 10  # ~one star edge per mass member
    # star pairs keep the (id_a < id_b) contract
    assert star.filter(F.col("id_a") >= F.col("id_b")).count() == 0
    # connectivity consumers see identical results
    cc_clique = sorted(map(tuple, connected_components(clique).collect()))
    cc_star = sorted(map(tuple, connected_components(star).collect()))
    assert cc_clique == cc_star


def test_bucket_pairs_star_guard_randomized_component_exact(spark):
    """Star-vs-clique component equality on randomized corpora: mixed
    duplicate families of varying sizes (deterministic seed via md5 —
    no RNG), all bucket sizes straddle the star_over threshold."""
    import hashlib

    from earthquake_data_pipeline_spark.operators.dedup import (
        connected_components,
    )
    from earthquake_data_pipeline_spark.operators.fuzzy_dedup import (
        minhash_lsh_pairs,
    )

    for seed in ("a", "b"):
        rows = []
        i = 0
        for fam in range(12):
            # family sizes 1..6, deterministic from the seed
            size = int(hashlib.md5(f"{seed}|{fam}".encode()).hexdigest()[:4], 16) % 6 + 1
            body = f"family {seed} {fam} shared body of words " * 3
            for _ in range(size):
                rows.append((i, body))
                i += 1
        docs = spark.createDataFrame(rows, "doc_id long, text string")
        for so in (2, 3):
            cc_clique = sorted(
                map(tuple, connected_components(minhash_lsh_pairs(docs)).collect())
            )
            cc_star = sorted(
                map(
                    tuple,
                    connected_components(
                        minhash_lsh_pairs(docs, star_over=so)
                    ).collect(),
                )
            )
            assert cc_clique == cc_star, (seed, so)


def test_ngram_jaccard_values(spark, docs):
    out = {
        (r.id_a, r.id_b): r.jaccard
        for r in ngram_jaccard_pairs(docs, docs).collect()
    }
    assert out[(1, 4)] == 1.0
    # docs 1,2: 9 tokens → 7 shingles each, 6 shared → 6/8
    assert out[(1, 2)] == 0.75
    assert out.get((1, 3), 0.0) == 0.0 or (1, 3) not in out


def test_simhash_identical_for_same_token_set(spark, docs):
    out = {r.doc_id: r.simhash for r in simhash(docs).collect()}
    assert out[1] == out[4]
    assert 0 <= out[1] < 2**32


def test_cosine_topk_exact(spark):
    rows = [
        (0, [1.0, 0.0]), (1, [1.0, 0.1]), (2, [0.0, 1.0]), (3, [-1.0, 0.0]),
    ]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"]).withColumn(
        "embedding", F.col("embedding").cast("array<float>")
    )
    q = df.filter(F.col("vec_id") == 0)
    got = cosine_topk(df, q, k=3).orderBy("rank").collect()
    assert [r.neighbor_id for r in got] == [1, 2, 3]
    assert got[0].cosine_sim == pytest.approx(0.995037, abs=1e-6)
    assert got[1].cosine_sim == 0.0 and got[2].cosine_sim == -1.0


def test_finite_vectors_excluded_family_wide(spark):
    """r13 NaN-mirror axis: a vector with any NaN/±Inf component is not
    a similarity candidate — on EITHER side of every ANN/near-dup face
    (finite_vectors, the embedding_near_dup_pairs_lsh convention
    generalized). A NaN cosine would top a desc ranking (NaN sorts
    greatest in Spark) while meaning nothing."""
    from earthquake_data_pipeline_spark.operators.similarity import (
        embedding_near_dup_pairs,
        finite_vectors,
        ivf_topk,
    )

    nan, inf = float("nan"), float("inf")
    rows = [
        (0, [1.0, 0.0]), (1, [1.0, 0.1]), (2, [0.0, 1.0]),
        (3, [nan, 1.0]), (4, [1.0, inf]), (5, [1.0, -inf]),
        # NULL component and whole-NULL vector: excluded by the same
        # no-direction policy, via a NULL-SAFE per-element predicate —
        # a bare isnan lambda would return NULL on the element, making
        # Spark drop the row where DuckDB's list_filter keeps it (the
        # r13 self-review engine-split finding)
        (6, [1.0, None]), (7, None),
    ]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"]).withColumn(
        "embedding", F.col("embedding").cast("array<double>")
    )
    assert sorted(
        r.vec_id for r in finite_vectors(df).collect()
    ) == [0, 1, 2]

    # poisoned corpus rows never appear as neighbors; a poisoned query
    # emits no group at all
    q = df.filter(F.col("vec_id").isin(0, 3))
    got = cosine_topk(df, q, k=10).collect()
    assert {r.query_id for r in got} == {0}
    assert {r.neighbor_id for r in got} == {1, 2}

    lsh = lsh_bucket_topk(df, q, k=10, num_planes=2).collect()
    assert all(r.query_id == 0 and r.neighbor_id in (1, 2) for r in lsh)

    ivf = ivf_topk(df, q, k=10, n_centroids=2, nprobe=2).collect()
    assert {r.query_id for r in ivf} == {0}
    assert {r.neighbor_id for r in ivf} == {1, 2}
    # full-probe IVF on the finite subset == brute force on it
    assert {(r.query_id, r.neighbor_id, r.cosine_sim) for r in ivf} == {
        (r.query_id, r.neighbor_id, r.cosine_sim) for r in got
    }

    pairs = embedding_near_dup_pairs(
        df, threshold=-2.0, small_corpus=True
    ).collect()
    assert {(r.id_a, r.id_b) for r in pairs} == {(0, 1), (0, 2), (1, 2)}


def test_lsh_topk_subset_of_exact(spark):
    import random

    rng = random.Random(7)
    rows = [(i, [rng.uniform(-1, 1) for _ in range(16)]) for i in range(50)]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"]).withColumn(
        "embedding", F.col("embedding").cast("array<float>")
    )
    q = df.filter(F.col("vec_id") < 3)
    exact = {
        (r.query_id, r.neighbor_id, r.cosine_sim)
        for r in cosine_topk(df, q, k=50).collect()
    }
    approx = lsh_bucket_topk(df, q, k=10, num_planes=4).collect()
    assert len(approx) > 0
    for r in approx:  # every approx hit is a true pair with the same score
        assert (r.query_id, r.neighbor_id, r.cosine_sim) in exact


def test_embedding_lsh_star_guard_identical_vector_mass(spark):
    """Round-10: identical embeddings share every band signature at ANY
    banding (auto-sizing can't separate them), so the unguarded
    candidate clique is C(m,2). star_over must cap the mass at m−1
    hub pairs, every one verified at cosine 1, and the mass must stay
    one connected component downstream."""
    from earthquake_data_pipeline_spark.operators.dedup import (
        connected_components,
    )
    from earthquake_data_pipeline_spark.operators.similarity import (
        embedding_near_dup_pairs_lsh,
    )

    m = 30
    rows = [(i, [1.0, 2.0, 3.0, 4.0]) for i in range(m)]
    rows += [(100, [4.0, -3.0, 2.0, -1.0]), (101, [-1.0, 2.0, -3.0, 4.0])]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"]).withColumn(
        "embedding", F.col("embedding").cast("array<float>")
    )
    clique = embedding_near_dup_pairs_lsh(
        df, threshold=0.95, num_planes=12, num_bands=3, dim=4
    )
    star = embedding_near_dup_pairs_lsh(
        df, threshold=0.95, num_planes=12, num_bands=3, dim=4, star_over=2
    )
    assert clique.count() == m * (m - 1) // 2
    got = star.collect()
    assert len(got) == m - 1  # exactly the hub star over the mass
    assert all(r.id_a == 0 and r.cosine_sim == 1.0 for r in got)
    # connectivity downstream is identical to the clique's
    cc_c = sorted(map(tuple, connected_components(clique).collect()))
    cc_s = sorted(map(tuple, connected_components(star).collect()))
    assert cc_c == cc_s


def test_embedding_near_dup_threshold(spark):
    rows = [(0, [1.0, 0.0]), (1, [1.0, 0.01]), (2, [0.0, 1.0])]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"]).withColumn(
        "embedding", F.col("embedding").cast("array<float>")
    )
    pairs = {
        (r.id_a, r.id_b)
        for r in embedding_near_dup_pairs(
            df, threshold=0.95, small_corpus=True
        ).collect()
    }
    assert pairs == {(0, 1)}


def test_round6_half_away_matches_duckdb_on_ties():
    """DEFERRED r07(b): the dense GEMM path must round half-away-from-
    zero like DuckDB round() and Spark F.round — NOT numpy's HALF_EVEN,
    which flips exact 7-dp ties downward (0.1234565 → 0.123456)."""
    import duckdb
    import numpy as np

    from earthquake_data_pipeline_spark.operators.similarity import (
        _round6_half_away,
    )

    ties = np.array([0.1234565, -0.1234565, 0.9999995, 2.5e-7, 0.1234575])
    got = _round6_half_away(ties)
    con = duckdb.connect()
    want = np.array(
        [con.execute("select round(?::double, 6)", [float(v)]).fetchone()[0]
         for v in ties]
    )
    assert got.tolist() == want.tolist()
    # and np.round genuinely diverges on the canonical tie (the bug)
    assert float(np.round(0.1234565, 6)) != got[0]


def test_near_dup_dense_requires_opt_in(spark):
    rows = [(0, [1.0, 0.0]), (1, [1.0, 0.01])]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"]).withColumn(
        "embedding", F.col("embedding").cast("array<float>")
    )
    with pytest.raises(ValueError, match="small_corpus"):
        embedding_near_dup_pairs(df, threshold=0.95)


def test_near_dup_lsh_subset_of_dense_and_exact_dups_found(spark):
    import random

    rng = random.Random(11)
    base = [[rng.uniform(-1, 1) for _ in range(16)] for _ in range(30)]
    rows = [(i, v) for i, v in enumerate(base)]
    rows += [(100 + i, base[i]) for i in range(5)]  # exact duplicates
    df = spark.createDataFrame(rows, ["vec_id", "embedding"]).withColumn(
        "embedding", F.col("embedding").cast("array<float>")
    )
    dense = {
        (r.id_a, r.id_b): r.cosine_sim
        for r in embedding_near_dup_pairs(
            df, threshold=0.8, small_corpus=True
        ).collect()
    }
    lsh = {
        (r.id_a, r.id_b): r.cosine_sim
        for r in embedding_near_dup_pairs_lsh(
            df, threshold=0.8, num_planes=12, num_bands=3, dim=16
        ).collect()
    }
    # every LSH pair is a true dense pair with the identical score
    for pair, sim in lsh.items():
        assert pair in dense and dense[pair] == sim
    # identical vectors share every band key -> always recovered
    for i in range(5):
        assert (i, 100 + i) in lsh
        assert lsh[(i, 100 + i)] == 1.0


def test_near_dup_lsh_auto_banding_scales_with_corpus(spark):
    """Round-8 scaling study: fixed banding goes quadratic once bucket
    occupancy ~ n/2^bits grows (181 s at 32k vectors with 7 bits/band);
    num_planes=None must size bits-per-band as max(4, ceil(log2(n)))."""
    from earthquake_data_pipeline_spark.operators import similarity

    captured = {}
    orig = similarity._plane_signatures

    def spy(df, id_col, vec_col, planes, num_bands, carry_vec=False):
        captured["planes"] = len(planes)
        captured["bands"] = num_bands
        return orig(df, id_col, vec_col, planes, num_bands, carry_vec)

    rows = [(i, [float(i % 7), 1.0]) for i in range(300)]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"]).withColumn(
        "embedding", F.col("embedding").cast("array<float>")
    )
    similarity._plane_signatures = spy
    try:
        similarity.embedding_near_dup_pairs_lsh(df, threshold=0.99, dim=2)
    finally:
        similarity._plane_signatures = orig
    # n=300 -> ceil(log2(300)) = 9 bits/band x 3 bands = 27 planes
    assert captured == {"planes": 27, "bands": 3}


def test_near_dup_lsh_no_driver_materialization(spark):
    import inspect

    from earthquake_data_pipeline_spark.operators import similarity

    # the scale path must never collect the corpus on the driver (the
    # dense operator's documented failure mode) ...
    src = inspect.getsource(similarity.embedding_near_dup_pairs_lsh)
    src += inspect.getsource(similarity._plane_signatures)
    assert "toPandas" not in src and ".collect()" not in src
    rows = [(i, [float(i), 1.0]) for i in range(4)]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"]).withColumn(
        "embedding", F.col("embedding").cast("array<float>")
    )
    plan = (
        embedding_near_dup_pairs_lsh(df, threshold=0.5, dim=2)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # ... and never fall back to row-at-a-time Python UDFs: the only
    # Python stage allowed is the Arrow-batched signature GEMM
    assert "BatchEvalPython" not in plan
    assert plan.count("MapInPandas") <= 1


def test_multimodal_pipeline(spark, docs):
    media = attach_binary_payload(docs, "text", media_type="image")
    assert media.schema["payload"].dataType.simpleString() == "binary"
    feats = extract_features(media, decode="fake").collect()
    assert len(feats) == 5
    for r in feats:
        assert r.byte_len > 0 and len(r.content_hash) == 32
        assert len(r.feature) == 8 and all(-1.0 <= v < 1.0 for v in r.feature)
    # deterministic: same payload → same feature vector
    again = extract_features(media, decode="fake").collect()
    assert {r.media_id: list(r.feature) for r in feats} == {
        r.media_id: list(r.feature) for r in again
    }


def test_multimodal_real_decode_raises(spark, docs):
    media = attach_binary_payload(docs, "text")
    with pytest.raises(Exception, match="NotImplementedError|media decode"):
        extract_features(media, decode="real").collect()


def test_frame_sample_rows(spark, docs):
    media = attach_binary_payload(docs.limit(1), "text", media_type="video")
    media = media.withColumn("duration_ms", F.lit(2500).cast("long"))
    frames = frame_sample(media, every_ms=1000).collect()
    assert [r.frame_ts_ms for r in frames] == [0, 1000, 2000]
    assert all(len(bytes(r.frame_bytes)) == 16 for r in frames)


def test_ivf_topk_subset_and_full_probe_exact(spark):
    import random

    rng = random.Random(11)
    rows = [(i, [rng.uniform(-1, 1) for _ in range(16)]) for i in range(60)]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"]).withColumn(
        "embedding", F.col("embedding").cast("array<float>")
    )
    q = df.filter(F.col("vec_id") < 3)
    exact_full = {
        (r.query_id, r.neighbor_id, r.cosine_sim)
        for r in cosine_topk(df, q, k=60).collect()
    }
    # nprobe < n_centroids: every hit is a true pair with the exact score
    approx = ivf_topk(df, q, k=10, n_centroids=8, nprobe=2).collect()
    assert len(approx) > 0
    for r in approx:
        assert (r.query_id, r.neighbor_id, r.cosine_sim) in exact_full
    # nprobe == n_centroids degrades to exact brute force
    exact_top = {
        (r.query_id, r.neighbor_id, r.cosine_sim, r.rank)
        for r in cosine_topk(df, q, k=10).collect()
    }
    full = {
        (r.query_id, r.neighbor_id, r.cosine_sim, r.rank)
        for r in ivf_topk(df, q, k=10, n_centroids=8, nprobe=8).collect()
    }
    assert full == exact_top


def test_resize_images_stub(spark):
    from earthquake_data_pipeline_spark.operators.multimodal import resize_images

    docs = spark.createDataFrame([(1, "hello"), (2, None)], ["doc_id", "text"])
    media = attach_binary_payload(docs, "text")
    out = resize_images(media, target_w=64, target_h=32).collect()
    assert len(out) == 2
    with_payload = [r for r in out if r.payload is not None]
    assert len(with_payload) == 1
    r = with_payload[0]
    assert (r.width, r.height) == (64, 32)
    # deterministic: same input + geometry → same bytes
    again = resize_images(media, target_w=64, target_h=32).collect()
    assert sorted(bytes(x.payload) for x in again if x.payload) == sorted(
        bytes(x.payload) for x in with_payload
    )


def test_lsh_topk_empty_queries(spark):
    df = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.0, 1.0])], ["vec_id", "embedding"]
    ).withColumn("embedding", F.col("embedding").cast("array<float>"))
    empty_q = df.filter(F.col("vec_id") < 0)
    assert lsh_bucket_topk(df, empty_q, k=5).count() == 0


def test_chunk_text_windows_and_short_docs(spark):
    from earthquake_data_pipeline_spark.operators.text import chunk_text

    long_text = " ".join(f"w{i}" for i in range(10))  # 10 tokens
    df = spark.createDataFrame(
        [(1, long_text), (2, "just three tokens")], ["doc_id", "text"]
    )
    rows = chunk_text(df, chunk_tokens=4, overlap=2).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append((r.chunk_idx, r.chunk_text))
    # stride 2: chunks at offsets 0,2,4,6 (ceil((10-4)/2)=3 → idx 0..3)
    assert [c for _, c in sorted(by_doc[1])] == [
        "w0 w1 w2 w3", "w2 w3 w4 w5", "w4 w5 w6 w7", "w6 w7 w8 w9",
    ]
    # consecutive chunks overlap by exactly 2 tokens
    assert by_doc[1][0][1].split()[-2:] == by_doc[1][1][1].split()[:2]
    # doc shorter than one window → exactly one (possibly short) chunk
    assert by_doc[2] == [(0, "just three tokens")]


def test_connected_components_path_and_islands(spark):
    from earthquake_data_pipeline_spark.operators.dedup import connected_components

    # path 1-2-3-4 (diameter 3, needs >1 iteration) + island 10-11 + 20-21
    edges = spark.createDataFrame(
        [(2, 1), (2, 3), (3, 4), (10, 11), (21, 20)], ["id_a", "id_b"]
    )
    got = {
        r.doc_id: (r.component_id, r.is_canonical)
        for r in connected_components(edges).collect()
    }
    assert got == {
        1: (1, 1), 2: (1, 0), 3: (1, 0), 4: (1, 0),
        10: (10, 1), 11: (10, 0),
        20: (20, 1), 21: (20, 0),
    }


def test_hash_sampling_deterministic_and_stratified(spark):
    from earthquake_data_pipeline_spark.operators.sampling import (
        sample_by_hash,
        stratified_sample_by_hash,
    )

    df = spark.createDataFrame(
        [(i, "en" if i % 2 == 0 else "zh") for i in range(400)], ["id", "lang"]
    )
    s1 = {r.id for r in sample_by_hash(df, "id", 0.5, salt="s").collect()}
    s2 = {r.id for r in sample_by_hash(df, "id", 0.5, salt="s").collect()}
    assert s1 == s2  # deterministic
    assert 100 < len(s1) < 300  # roughly half
    # a smaller fraction with the same salt nests inside the larger one
    s_small = {r.id for r in sample_by_hash(df, "id", 0.2, salt="s").collect()}
    assert s_small <= s1
    # stratified: zh kept fully, en dropped fully
    strat = stratified_sample_by_hash(
        df, "id", "lang", {"zh": 1.0, "en": 0.0}
    ).collect()
    assert {r.lang for r in strat} == {"zh"} and len(strat) == 200


def test_redact_pii_counts_and_replacements(spark):
    from earthquake_data_pipeline_spark.operators.text import redact_pii

    df = spark.createDataFrame(
        [
            (1, "mail bob@example.com and alice@test.org today"),
            (2, "call 555-123-4567 or ping 10.0.0.1 now"),
            (3, "nothing sensitive here"),
        ],
        ["doc_id", "text"],
    )
    out = {r.doc_id: r for r in redact_pii(df).collect()}
    assert (out[1].n_email, out[1].n_phone, out[1].n_ipv4) == (2, 0, 0)
    assert out[1].redacted_text == "mail <EMAIL> and <EMAIL> today"
    assert (out[2].n_email, out[2].n_phone, out[2].n_ipv4) == (0, 1, 1)
    assert out[2].redacted_text == "call <PHONE> or ping <IP> now"
    assert out[3].redacted_text == "nothing sensitive here"


def test_redact_pii_counts_match_actual_replacements(spark):
    from earthquake_data_pipeline_spark.operators.text import redact_pii

    # the email pass consumes the phone-shaped prefix: no phantom phone count
    df = spark.createDataFrame(
        [(1, "reach 555-123-4567@corp.com now")], ["doc_id", "text"]
    )
    r = redact_pii(df).collect()[0]
    assert r.redacted_text == "reach <EMAIL> now"
    assert (r.n_email, r.n_phone, r.n_ipv4) == (1, 0, 0)


def test_repetition_signals_values(spark):
    from earthquake_data_pipeline_spark.operators.text import repetition_signals

    df = spark.createDataFrame(
        [
            (1, "a a a a"),          # one token repeated: max repetition
            (2, "w x y z"),          # all distinct: no repetition
            (3, "a b a b a b"),      # alternating: distinct bigrams = 2 of 5
        ],
        ["doc_id", "text"],
    )
    out = {r.doc_id: r for r in repetition_signals(df).collect()}
    assert out[1].top_token_ratio == 1.0
    assert out[1].distinct_token_ratio == 0.25
    assert out[1].dup_bigram_ratio == round(1 - 1 / 3, 6)
    assert out[2].top_token_ratio == 0.25
    assert out[2].distinct_token_ratio == 1.0
    assert out[2].dup_bigram_ratio == 0.0
    assert out[3].dup_bigram_ratio == 0.6  # 2 distinct of 5 bigrams


def _bmp_bytes(w=8, h=6):
    import numpy as np

    from earthquake_data_pipeline_spark.operators.codecs import encode_bmp

    rgb = np.zeros((h, w, 3), dtype=np.uint8)
    rgb[:, :, 0] = np.arange(w, dtype=np.uint8) * 30        # R gradient
    rgb[:, :, 1] = np.arange(h, dtype=np.uint8)[:, None] * 40  # G gradient
    return rgb, encode_bmp(rgb)


def _wav_bytes(rate=8000, freq=440, ms=250):
    import io
    import wave

    import numpy as np

    t = np.arange(int(rate * ms / 1000)) / rate
    samples = (np.sin(2 * np.pi * freq * t) * 20000).astype("<i2")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(2)
        wf.setframerate(rate)
        wf.writeframes(samples.tobytes())
    return buf.getvalue()


def test_codec_bmp_roundtrip_and_resize():
    import numpy as np

    from earthquake_data_pipeline_spark.operators.codecs import (
        decode_bmp,
        encode_bmp,
        resize_nearest,
        sniff_format,
    )

    rgb, raw = _bmp_bytes(5, 3)  # odd width exercises row padding
    assert sniff_format(raw) == "bmp"
    assert np.array_equal(decode_bmp(raw), rgb)
    small = resize_nearest(rgb, 2, 2)
    assert small.shape == (2, 2, 3)
    assert np.array_equal(decode_bmp(encode_bmp(small)), small)


def test_codec_wav_decode():
    from earthquake_data_pipeline_spark.operators.codecs import (
        decode_wav,
        sniff_format,
    )

    raw = _wav_bytes()
    assert sniff_format(raw) == "wav"
    rate, channels, samples = decode_wav(raw)
    assert (rate, channels) == (8000, 1)
    assert len(samples) == 2000 and abs(samples).max() <= 1.0


def test_multimodal_real_decode_bmp_and_wav(spark):
    rgb, bmp = _bmp_bytes()
    wav = _wav_bytes()
    rows = [(1, "image", bmp, None, None, None), (2, "audio", wav, None, None, None)]
    from earthquake_data_pipeline_spark.operators.multimodal import MEDIA_SCHEMA

    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    feats = {r.media_id: r for r in extract_features(media, decode="real").collect()}
    assert feats[1].feature[0] == 8.0 and feats[1].feature[1] == 6.0  # w, h
    assert feats[2].feature[0] == 8.0 and feats[2].feature[1] == 1.0  # kHz, ch
    assert abs(feats[2].feature[3] - 0.43) < 0.05  # sine rms ~ 0.61*0.707
    resized = {
        r.media_id: r
        for r in resize_images(
            media.filter(F.col("media_id") == 1), 4, 4, decode="real"
        ).collect()
    }
    from earthquake_data_pipeline_spark.operators.codecs import decode_bmp

    out = decode_bmp(bytes(resized[1].payload))
    assert out.shape == (4, 4, 3)


def test_codec_png_roundtrip_all_filters():
    """encode(filter f) → decode must recover pixels for every scanline
    filter the decoder claims to reverse (None/Sub/Up/Average/Paeth)."""
    import numpy as np

    from earthquake_data_pipeline_spark.operators.codecs import (
        decode_png,
        encode_png,
        sniff_format,
    )

    rng = np.random.default_rng(7)
    rgb = rng.integers(0, 256, size=(11, 7, 3), dtype=np.uint8)  # odd dims
    for f in range(5):
        raw = encode_png(rgb, filter_type=f)
        assert sniff_format(raw) == "png"
        assert np.array_equal(decode_png(raw), rgb), f"filter {f} broke roundtrip"


def test_codec_png_gray_and_alpha_forms():
    """Hand-built gray (type 0) and RGBA (type 6) PNGs decode to RGB."""
    import struct
    import zlib

    import numpy as np

    from earthquake_data_pipeline_spark.operators.codecs import (
        _PNG_SIG,
        _png_chunk,
        decode_png,
    )

    def build(color_type, channels, pixels):
        h, w = pixels.shape[:2]
        lines = bytearray()
        for y in range(h):
            lines.append(0)
            lines += pixels[y].tobytes()
        ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
        return (
            _PNG_SIG
            + _png_chunk(b"IHDR", ihdr)
            + _png_chunk(b"IDAT", zlib.compress(bytes(lines)))
            + _png_chunk(b"IEND", b"")
        )

    gray = np.arange(12, dtype=np.uint8).reshape(3, 4, 1)
    out = decode_png(build(0, 1, gray))
    assert out.shape == (3, 4, 3)
    assert np.array_equal(out[:, :, 0], gray[:, :, 0])
    assert np.array_equal(out[:, :, 1], gray[:, :, 0])

    rgba = np.zeros((2, 2, 4), dtype=np.uint8)
    rgba[..., 0], rgba[..., 3] = 200, 255
    out = decode_png(build(6, 4, rgba))
    assert out.shape == (2, 2, 3) and out[0, 0, 0] == 200 and out[0, 0, 2] == 0


def test_codec_jpeg_block_constant_exact():
    """Block-constant gray at quality=100 (all-ones quant) roundtrips
    BIT-EXACTLY: each 8×8 tile is a lone DC coefficient that survives
    rounding — the property the codec_roundtrip oracle replays in SQL."""
    import numpy as np

    from earthquake_data_pipeline_spark.operators.codecs import (
        decode_jpeg,
        encode_jpeg,
        sniff_format,
    )

    tiles = ((np.arange(20).reshape(4, 5) * 37 + 11) % 256).astype(np.uint8)
    img = np.repeat(np.repeat(tiles, 8, axis=0), 8, axis=1)
    raw = encode_jpeg(img, quality=100)
    assert sniff_format(raw) == "jpeg"
    dec = decode_jpeg(raw)
    assert dec.shape == (32, 40, 3)
    assert np.array_equal(dec, np.repeat(img[:, :, None], 3, axis=2))


def test_codec_jpeg_q100_near_lossless_and_odd_dims():
    """Arbitrary gray content at q=100: DCT round-trip error ≤ ~2 LSB;
    non-multiple-of-8 dims exercise edge-replication padding + crop."""
    import numpy as np

    from earthquake_data_pipeline_spark.operators.codecs import (
        decode_jpeg,
        encode_jpeg,
    )

    g = ((np.add.outer(np.arange(11) * 3, np.arange(7) * 5)) % 256).astype(np.uint8)
    dec = decode_jpeg(encode_jpeg(g, quality=100))
    assert dec.shape == (11, 7, 3)
    assert np.abs(dec.astype(int) - g[:, :, None].astype(int)).max() <= 2


def test_codec_jpeg_color_roundtrip_close():
    """Smooth RGB content through the 3-component 4:4:4 path: YCbCr
    transform + DCT quantization at q=95 stays within a few LSB."""
    import numpy as np

    from earthquake_data_pipeline_spark.operators.codecs import (
        decode_jpeg,
        encode_jpeg,
    )

    rgb = np.zeros((16, 24, 3), dtype=np.uint8)
    rgb[:, :, 0] = np.linspace(20, 220, 24).astype(np.uint8)[None, :]
    rgb[:, :, 1] = np.linspace(200, 40, 16).astype(np.uint8)[:, None]
    rgb[:, :, 2] = 90
    dec = decode_jpeg(encode_jpeg(rgb, quality=95))
    assert np.abs(dec.astype(int) - rgb.astype(int)).max() <= 6


def test_codec_jpeg_decodes_420_subsampling():
    """The decoder is sampling-general: a hand-built 4:2:0 file (2×2 Y
    sampling, DC-only blocks — the layout our 4:4:4 encoder never emits)
    decodes to the expected constant."""
    import struct

    import numpy as np

    from earthquake_data_pipeline_spark.operators.codecs import (
        _AC_LUM_BITS,
        _AC_LUM_VALS,
        _DC_LUM_BITS,
        _DC_LUM_VALS,
        _BitWriter,
        _huff_encode_table,
        decode_jpeg,
    )

    dc = _huff_encode_table(_DC_LUM_BITS, _DC_LUM_VALS)
    ac = _huff_encode_table(_AC_LUM_BITS, _AC_LUM_VALS)
    bw = _BitWriter()

    def write_dc_only(diff):
        s = abs(diff).bit_length()
        code, ln = dc[s]
        bw.write(code, ln)
        if s:
            bw.write(diff if diff >= 0 else diff + (1 << s) - 1, s)
        code, ln = ac[0x00]  # EOB right away: AC all zero
        bw.write(code, ln)

    # one MCU (16×16): 4 Y blocks then Cb, Cr. Y constant 180 → DC
    # diff 8*(180-128)=416 on the first block, 0 after; chroma neutral.
    write_dc_only(416)
    for _ in range(3):
        write_dc_only(0)
    write_dc_only(0)  # Cb: DC 0 → value 128 after level shift
    write_dc_only(0)  # Cr
    bw.flush()

    out = bytearray(b"\xff\xd8")
    out += b"\xff\xdb" + struct.pack(">H", 67) + b"\x00" + bytes([1] * 64)
    sof = struct.pack(">BHHB", 8, 16, 16, 3)
    sof += struct.pack(">BBB", 1, 0x22, 0)  # Y: 2×2 sampling
    sof += struct.pack(">BBB", 2, 0x11, 0)  # Cb
    sof += struct.pack(">BBB", 3, 0x11, 0)  # Cr
    out += b"\xff\xc0" + struct.pack(">H", 2 + len(sof)) + sof
    for cls, bits, vals in (
        (0, _DC_LUM_BITS, _DC_LUM_VALS),
        (1, _AC_LUM_BITS, _AC_LUM_VALS),
    ):
        payload = bytes([cls << 4]) + bytes(bits) + bytes(vals)
        out += b"\xff\xc4" + struct.pack(">H", 2 + len(payload)) + payload
    sos = b"\x03" + bytes([1, 0x00, 2, 0x00, 3, 0x00]) + b"\x00\x3f\x00"
    out += b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos
    out += bw.out + b"\xff\xd9"

    dec = decode_jpeg(bytes(out))
    assert dec.shape == (16, 16, 3)
    assert np.array_equal(dec, np.full((16, 16, 3), 180, np.uint8))


def test_codec_jpeg_rejects_unsupported_forms():
    import struct

    import numpy as np
    import pytest as _pytest

    from earthquake_data_pipeline_spark.operators.codecs import (
        decode_jpeg,
        encode_jpeg,
    )

    with _pytest.raises(ValueError, match="not a JPEG"):
        decode_jpeg(b"BM123456")
    # flip SOF0 to SOF2 (progressive) in a real stream
    raw = bytearray(encode_jpeg(np.zeros((8, 8), np.uint8)))
    raw[raw.index(b"\xff\xc0") + 1] = 0xC2
    with _pytest.raises(ValueError, match="not supported"):
        decode_jpeg(bytes(raw))
    # nonzero restart interval
    raw = bytearray(encode_jpeg(np.zeros((8, 8), np.uint8)))
    sos_at = raw.index(b"\xff\xda")
    dri = b"\xff\xdd" + struct.pack(">HH", 4, 2)
    with _pytest.raises(ValueError, match="restart"):
        decode_jpeg(bytes(raw[:sos_at] + dri + raw[sos_at:]))


def test_mp4_container_roundtrip():
    """build_mp4 → parse_mp4 → extract_samples recovers every sample
    byte-exactly, with correct metadata and timestamps."""
    from earthquake_data_pipeline_spark.operators import mp4

    samples = [bytes([i] * (5 + 3 * i)) for i in range(8)]
    raw = mp4.build_mp4(samples, timescale=600, sample_delta=24, width=320, height=240)
    assert mp4.sniff_mp4(raw)
    tr = mp4.parse_mp4(raw)
    assert (tr.handler, tr.codec) == (b"vide", "mp4v")
    assert (tr.width, tr.height, tr.timescale) == (320, 240, 600)
    assert tr.n_samples == 8
    assert tr.sample_times_ms() == [i * 40 for i in range(8)]
    assert mp4.extract_samples(raw, tr) == samples


def test_mp4_multi_chunk_sample_resolution():
    """stsc runs over several chunks resolve to correct absolute offsets
    (the general chunk→sample mapping, not the single-chunk fast case)."""
    import struct

    from earthquake_data_pipeline_spark.operators import mp4
    from earthquake_data_pipeline_spark.operators.mp4 import _box, _full

    samples = [b"A" * 4, b"BB" * 3, b"C" * 5, b"DD" * 4, b"E" * 7]
    ftyp = _box(b"ftyp", b"isom" + struct.pack(">I", 512) + b"isom")
    # two chunks: first holds 2 samples, second holds 3, with junk between
    chunk1, chunk2 = b"".join(samples[:2]), b"".join(samples[2:])
    mdat_payload = chunk1 + b"\xee\xee\xee" + chunk2
    mdat = _box(b"mdat", mdat_payload)
    c1_off = len(ftyp) + 8
    c2_off = c1_off + len(chunk1) + 3
    stsd = _full(
        b"stsd", 0, 0,
        struct.pack(">I", 1)
        + struct.pack(">I", 86) + b"mp4v" + b"\x00" * 6 + struct.pack(">H", 1)
        + b"\x00" * 16 + struct.pack(">HH", 16, 16)
        + struct.pack(">II", 0x00480000, 0x00480000) + struct.pack(">I", 0)
        + struct.pack(">H", 1) + b"\x00" * 32 + struct.pack(">Hh", 24, -1),
    )
    stts = _full(b"stts", 0, 0, struct.pack(">III", 1, 5, 100))
    stsc = _full(
        b"stsc", 0, 0,
        struct.pack(">I", 2)
        + struct.pack(">III", 1, 2, 1)
        + struct.pack(">III", 2, 3, 1),
    )
    stsz = _full(
        b"stsz", 0, 0,
        struct.pack(">II", 0, 5)
        + b"".join(struct.pack(">I", len(s)) for s in samples),
    )
    stco = _full(b"stco", 0, 0, struct.pack(">III", 2, c1_off, c2_off))
    stbl = _box(b"stbl", stsd + stts + stsc + stsz + stco)
    vmhd = _full(b"vmhd", 0, 1, struct.pack(">HHHH", 0, 0, 0, 0))
    minf = _box(b"minf", vmhd + stbl)
    hdlr = _full(b"hdlr", 0, 0, struct.pack(">I", 0) + b"vide" + b"\x00" * 13)
    mdhd = _full(b"mdhd", 0, 0, struct.pack(">IIII", 0, 0, 1000, 500) + struct.pack(">HH", 0x55C4, 0))
    mdia = _box(b"mdia", mdhd + hdlr + minf)
    tkhd = _full(
        b"tkhd", 0, 7,
        struct.pack(">IIIII", 0, 0, 1, 0, 500) + b"\x00" * 8
        + struct.pack(">HHHH", 0, 0, 0, 0)
        + struct.pack(">9i", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
        + struct.pack(">II", 16 << 16, 16 << 16),
    )
    moov = _box(b"moov", _box(b"trak", tkhd + mdia))
    raw = ftyp + mdat + moov

    tr = mp4.parse_mp4(raw)
    assert tr.n_samples == 5
    assert mp4.extract_samples(raw, tr) == samples


def test_frame_sample_real_mp4(spark):
    """frame_sample(decode='real') pulls actual access units out of the
    container at the sampling cadence."""
    from earthquake_data_pipeline_spark.operators import mp4
    from earthquake_data_pipeline_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        frame_sample,
    )

    samples = [bytes([i]) * 10 for i in range(10)]  # 10 frames @ 40 ms
    raw = mp4.build_mp4(samples, timescale=1000, sample_delta=40)
    media = spark.createDataFrame(
        [(7, "video", raw, None, None, 400)], MEDIA_SCHEMA
    )
    rows = frame_sample(media, every_ms=100, decode="real").collect()
    got = {r["frame_ts_ms"]: bytes(r["frame_bytes"]) for r in rows}
    # t=0 → sample 0, t=100 → sample 2 (80ms), t=200 → sample 5 (200ms),
    # t=300 → sample 7 (280ms), t=400 → sample 9 (wait: 400ms > last 360)
    assert got[0] == samples[0]
    assert got[100] == samples[2]
    assert got[200] == samples[5]
    assert got[300] == samples[7]
    assert len(rows) == len(got)


def test_mp4_truncated_and_malformed_raise_valueerror():
    """The codecs.py error contract applies to the container layer too:
    truncated or internally-inconsistent MP4s surface as ValueError,
    never bare struct.error/IndexError (which the mapInPandas error
    paths don't catch)."""
    import struct

    import pytest as _pytest

    from earthquake_data_pipeline_spark.operators import mp4
    from earthquake_data_pipeline_spark.operators.mp4 import _box, _full

    good = mp4.build_mp4([b"x" * 10, b"y" * 10])
    # truncation at every 16th byte inside moov must raise ValueError
    moov_at = good.find(b"moov") - 4
    for cut in range(moov_at + 8, len(good), 16):
        with _pytest.raises(ValueError):
            mp4.parse_mp4(good[:cut])
    # a trak whose tkhd body is too short for its fixed fields →
    # struct.error inside _parse_trak, surfaced as ValueError
    ftyp = _box(b"ftyp", b"isom" + struct.pack(">I", 512) + b"isom")
    short_tkhd = _full(b"tkhd", 0, 7, b"\x00" * 4)
    moov = _box(b"moov", _box(b"trak", short_tkhd))
    with _pytest.raises(ValueError):
        mp4.parse_mp4(ftyp + moov)
    # stsc claiming more samples than the chunk table can hold resolves
    # only a prefix of the sample offsets; reading past that prefix is a
    # ValueError from extract_samples (IndexError pre-round-6), never a
    # silent wrong byte range
    mdat = _box(b"mdat", b"A" * 30)
    stsd = _full(b"stsd", 0, 0, struct.pack(">I", 0))
    stts = _full(b"stts", 0, 0, struct.pack(">III", 1, 9, 10))
    stsc = _full(b"stsc", 0, 0, struct.pack(">IIII", 1, 1, 3, 1))
    stsz = _full(
        b"stsz", 0, 0,
        struct.pack(">II", 0, 9) + struct.pack(">9I", *([3] * 9)),
    )
    stco = _full(b"stco", 0, 0, struct.pack(">II", 1, len(ftyp) + 8))
    stbl = _box(b"stbl", stsd + stts + stsc + stsz + stco)
    minf = _box(b"minf", stbl)
    hdlr = _full(b"hdlr", 0, 0, struct.pack(">I", 0) + b"vide" + b"\x00" * 13)
    mdhd = _full(
        b"mdhd", 0, 0,
        struct.pack(">IIII", 0, 0, 1000, 90) + struct.pack(">HH", 0x55C4, 0),
    )
    mdia = _box(b"mdia", mdhd + hdlr + minf)
    tkhd = _full(
        b"tkhd", 0, 7,
        struct.pack(">IIIII", 0, 0, 1, 0, 90)
        + b"\x00" * 8
        + struct.pack(">HHHH", 0, 0, 0, 0)
        + struct.pack(">9i", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
        + struct.pack(">II", 16 << 16, 16 << 16),
    )
    moov2 = _box(b"moov", _box(b"trak", tkhd + mdia))
    track = mp4.parse_mp4(ftyp + mdat + moov2)
    assert track.n_samples == 9 and len(track.sample_offsets) == 3
    with _pytest.raises(ValueError, match="out of range"):
        mp4.extract_samples(ftyp + mdat + moov2, track, [5])


def test_frame_sample_real_surfaces_valueerror_for_truncated_mp4(spark):
    """End-to-end: a sniff-passing but truncated payload fed through
    frame_sample(decode='real') fails the Spark job with the ValueError
    message visible — not an opaque struct.error."""
    import pytest as _pytest

    from earthquake_data_pipeline_spark.operators import mp4
    from earthquake_data_pipeline_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        frame_sample,
    )

    raw = mp4.build_mp4([b"x" * 10])[:40]  # keeps ftyp, loses moov
    media = spark.createDataFrame(
        [(1, "video", raw, None, None, 1000)],
        MEDIA_SCHEMA,
    )
    with _pytest.raises(Exception, match="ValueError|malformed|no tracks"):
        frame_sample(media, every_ms=100, decode="real").collect()


def test_codec_png_rejects_bad_input():
    import pytest as _pytest

    from earthquake_data_pipeline_spark.operators.codecs import decode_png

    with _pytest.raises(ValueError, match="not a PNG"):
        decode_png(b"BM123456")


def test_multimodal_real_decode_and_resize_png(spark):
    """The real-decode path handles PNG end-to-end: features from decoded
    pixels, resize re-encodes PNG, and the resized payload re-decodes."""
    import numpy as np

    from earthquake_data_pipeline_spark.operators.codecs import (
        decode_png,
        encode_png,
        resize_nearest,
    )
    from earthquake_data_pipeline_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        resize_images,
    )

    rgb, _ = _bmp_bytes(6, 4)
    png = encode_png(rgb)
    media = spark.createDataFrame([(1, "image", png, None, None, None)], MEDIA_SCHEMA)
    feats = extract_features(media, decode="real").collect()[0]
    assert feats.feature[0] == 6.0 and feats.feature[1] == 4.0  # w, h from pixels
    out = resize_images(media, 3, 2, decode="real").collect()[0]
    decoded = decode_png(bytes(out.payload))
    assert decoded.shape == (2, 3, 3)
    assert np.array_equal(decoded, resize_nearest(rgb, 3, 2))


def test_multimodal_real_decode_and_resize_jpeg(spark):
    """The real-decode path handles JPEG end-to-end: features come from
    decoded pixels, resize re-encodes JPEG, the resized payload
    re-decodes (lossy by format — shape + approximate pixels)."""
    import numpy as np

    from earthquake_data_pipeline_spark.operators.codecs import (
        decode_jpeg,
        encode_jpeg,
        sniff_format,
    )
    from earthquake_data_pipeline_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        resize_images,
    )

    tiles = np.array([[40, 90], [140, 200]], dtype=np.uint8)
    gray = np.repeat(np.repeat(tiles, 8, axis=0), 8, axis=1)  # 16×16
    jpg = encode_jpeg(gray, quality=100)
    media = spark.createDataFrame([(1, "image", jpg, None, None, None)], MEDIA_SCHEMA)
    feats = extract_features(media, decode="real").collect()[0]
    assert feats.feature[0] == 16.0 and feats.feature[1] == 16.0
    assert abs(feats.feature[2] - gray.mean()) < 1e-3  # mean R == gray mean
    out = resize_images(media, 8, 8, decode="real").collect()[0]
    assert sniff_format(bytes(out.payload)) == "jpeg"
    decoded = decode_jpeg(bytes(out.payload))
    assert decoded.shape == (8, 8, 3)
    # 8×8 nearest of the 16×16 tile image is block-constant 4×4 tiles;
    # re-encode at q=85 is lossy — assert within JPEG tolerance
    expect = np.repeat(np.repeat(tiles, 4, axis=0), 4, axis=1)
    assert np.abs(decoded.astype(int) - expect[:, :, None].astype(int)).max() <= 12


def test_bigram_lm_scores_hand_corpus(spark):
    """Add-one bigram log-probs on a corpus small enough to verify by
    hand: counts, smoothing denominator, and the 6dp-round-then-sum
    determinism contract."""
    import math

    from earthquake_data_pipeline_spark.operators.text import bigram_lm_scores

    docs = spark.createDataFrame(
        [(1, "a b a b"), (2, "a b"), (3, "solo")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in bigram_lm_scores(docs).collect()}
    # vocab = {a, b, solo} → V=3; c(a)=3, c(b)=3; c(a,b)=3, c(b,a)=1
    r6 = lambda x: round(x, 6)
    lp_ab = r6(math.log((3 + 1) / (3 + 3)))
    lp_ba = r6(math.log((1 + 1) / (3 + 3)))
    assert out[1]["n_bigrams"] == 3
    assert abs(out[1]["avg_logprob"] - r6((2 * lp_ab + lp_ba) / 3)) < 2e-6
    assert out[2]["n_bigrams"] == 1
    assert abs(out[2]["avg_logprob"] - lp_ab) < 2e-6
    assert 3 not in out  # <2 tokens → no bigrams → no row


def test_misra_gries_guarantee_under_any_partitioning(spark):
    """The MG theorems the heavy_hitters oracle relies on: every key
    above the n/(k+1) threshold survives the merged sketch with
    true - n/(k+1) <= est <= true, for ADVERSARIAL partitionings."""
    from earthquake_data_pipeline_spark.operators.sketches import (
        heavy_hitters_sketch,
    )

    # 1000 rows: 'a' 300, 'b' 250, 100 distinct cold keys ~4.5 each
    rows = (
        [("a",)] * 300 + [("b",)] * 250 + [(f"c{i % 100}",) for i in range(450)]
    )
    n, k = len(rows), 7
    for parts in (1, 3, 16):
        df = spark.createDataFrame(rows, "key string").repartition(parts)
        est = {r["key"]: r["est"] for r in heavy_hitters_sketch(df, "key", k).collect()}
        for key, true in (("a", 300), ("b", 250)):
            assert true * (k + 1) > n  # genuinely heavy at this k
            assert key in est, f"heavy key {key} lost at parts={parts}"
            assert est[key] <= true
            assert (true - est[key]) * (k + 1) <= n
        # sketch never exceeds k keys per partition summary pre-merge
        assert len(est) <= k * parts


def test_misra_gries_bounded_summary_size(spark):
    from earthquake_data_pipeline_spark.operators.sketches import (
        mg_partition_summaries,
    )

    df = spark.createDataFrame(
        [(f"k{i}",) for i in range(5000)], "key string"
    ).coalesce(1)
    out = mg_partition_summaries(df, "key", k=10).collect()
    assert len(out) <= 10  # O(k) memory regardless of distinct count


def test_assign_splits_disjoint_exhaustive_stable(spark):
    from earthquake_data_pipeline_spark.operators.sampling import assign_splits

    df = spark.range(0, 2000).selectExpr("id AS doc_id")
    out = assign_splits(df, "doc_id", {"train": 0.8, "val": 0.1, "test": 0.1})
    counts = {r["split"]: r["n"] for r in out.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert sum(counts.values()) == 2000          # exhaustive
    assert set(counts) == {"train", "val", "test"}
    assert 1400 < counts["train"] < 1800          # ~80% within hash noise
    # stability: same assignment under different partitioning
    a = {r["doc_id"]: r["split"] for r in out.collect()}
    b = {
        r["doc_id"]: r["split"]
        for r in assign_splits(
            df.repartition(13), "doc_id", {"train": 0.8, "val": 0.1, "test": 0.1}
        ).collect()
    }
    assert a == b
    with pytest.raises(ValueError, match="sum to 1"):
        assign_splits(df, "doc_id", {"train": 0.5})


def test_simhash_drops_tokenless_documents(spark):
    """Empty/whitespace documents have NO tokens: they must drop out of
    the fingerprint set rather than all sharing an md5('')-derived
    fingerprint (which would report every blank doc as a near-dup of
    every other blank doc)."""
    from earthquake_data_pipeline_spark.operators.fuzzy_dedup import simhash

    df = spark.createDataFrame(
        [(1, ""), (2, "   "), (3, "hello world")], ["doc_id", "text"]
    )
    out = {r.doc_id: r.simhash for r in simhash(df).collect()}
    assert set(out) == {3}


def test_minhash_lsh_rejects_invalid_banding(spark):
    """num_bands > num_hashes gives 0-row bands whose constant key puts
    every doc in ONE bucket (quadratic explosion); a non-divisor
    silently discards signatures. Both must raise, not degrade."""
    import pytest as _pytest

    from earthquake_data_pipeline_spark.operators.fuzzy_dedup import (
        minhash_lsh_pairs,
    )
    from earthquake_data_pipeline_spark.operators.similarity import (
        _plane_signatures,
    )

    df = spark.createDataFrame([(1, "a b c"), (2, "a b d")], ["doc_id", "text"])
    with _pytest.raises(ValueError, match="evenly divide"):
        minhash_lsh_pairs(df, num_hashes=8, num_bands=16)
    with _pytest.raises(ValueError, match="evenly divide"):
        minhash_lsh_pairs(df, num_hashes=12, num_bands=5)
    vecs = spark.createDataFrame([(1, [1.0, 0.0])], ["vec_id", "embedding"])
    with _pytest.raises(ValueError, match="evenly divide"):
        _plane_signatures(vecs, "vec_id", "embedding", [[1.0, 0.0]] * 4, 8)


def test_ivf_topk_empty_corpus_returns_empty(spark):
    """An empty corpus must yield an empty top-k frame with the contract
    schema, not a numpy AxisError from training on zero rows."""
    from earthquake_data_pipeline_spark.operators.similarity import ivf_topk

    corpus = spark.createDataFrame([], "vec_id long, embedding array<double>")
    queries = spark.createDataFrame([(1, [1.0, 0.0])], ["vec_id", "embedding"])
    out = ivf_topk(corpus, queries, k=3)
    assert out.count() == 0
    assert out.columns == ["query_id", "neighbor_id", "cosine_sim", "rank"]


def test_ivf_auto_nlist_sqrt_with_clamps():
    """n_centroids=None sizes nlist as ceil(sqrt(n)), clamped to
    [16, sample_size // 32] — the IVF face of the LSH banding fix."""
    from earthquake_data_pipeline_spark.operators.similarity import (
        _ivf_auto_nlist,
    )

    assert _ivf_auto_nlist(0, 2048) == 16  # empty/small: floor clamp
    assert _ivf_auto_nlist(100, 2048) == 16
    assert _ivf_auto_nlist(300, 2048) == 18  # ceil(sqrt(300))
    assert _ivf_auto_nlist(2500, 2048) == 50
    assert _ivf_auto_nlist(10**6, 2048) == 64  # sample ceiling clamp
    assert _ivf_auto_nlist(10**6, 65536) == 1000  # bigger sample, real sqrt


def test_cosine_zero_norm_scores_zero_not_null(spark):
    """Zero-norm vectors (no direction) score 0.0 against everything:
    a bare division emitted NULL, which leaked into top-k output rows
    whenever a query had fewer than k non-null candidates and silently
    dropped pairs from thresholded joins."""
    from earthquake_data_pipeline_spark.operators.similarity import (
        cosine_topk,
    )

    corpus = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.0, 0.0]), (3, [0.0, 1.0])],
        ["vec_id", "embedding"],
    )
    queries = spark.createDataFrame(
        [(10, [1.0, 0.0]), (11, [0.0, 0.0])], ["vec_id", "embedding"]
    )
    out = cosine_topk(corpus, queries, k=3)
    rows = out.collect()
    assert all(r.cosine_sim is not None for r in rows)
    sims = {(r.query_id, r.neighbor_id): r.cosine_sim for r in rows}
    assert sims[(10, 2)] == 0.0  # zero corpus vector
    assert sims[(11, 1)] == 0.0  # zero query vector
    assert sims[(10, 1)] == 1.0  # identical direction unaffected


def test_ivf_auto_nlist_degenerate_sample_clamps_to_one():
    """ADVICE r09 / round-9 fix: sample_size < 512 must degrade to
    nlist >= 1 (single cell = exact within-corpus brute force), never
    auto-size to 0 and train an empty centroid matrix."""
    from earthquake_data_pipeline_spark.operators.similarity import (
        _ivf_auto_nlist,
    )

    assert _ivf_auto_nlist(10**6, 16) == 1   # the ADVICE repro
    assert _ivf_auto_nlist(100, 31) == 1     # floor of the // 32 clamp
    assert _ivf_auto_nlist(100, 64) == 2
    assert _ivf_auto_nlist(0, 0) == 1        # fully degenerate


def test_ivf_topk_tiny_sample_auto_nlist_exact(spark):
    """End-to-end over the degenerate path: n_centroids=None with
    sample_size=16 trains nlist=1 — one cell means every query probes
    the whole corpus, so results must EQUAL brute-force cosine top-k
    (and must not crash in numpy argmax as pre-fix)."""
    import random as _random

    from earthquake_data_pipeline_spark.operators.similarity import (
        cosine_topk,
        ivf_topk,
    )

    rng = _random.Random(7)
    rows = [(i, [rng.uniform(-1, 1) for _ in range(8)]) for i in range(60)]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    q = df.limit(4)
    approx = {
        (r.query_id, r.rank): r.neighbor_id
        for r in ivf_topk(df, q, k=5, n_centroids=None,
                          sample_size=16).collect()
    }
    exact = {
        (r.query_id, r.rank): r.neighbor_id
        for r in cosine_topk(df, q, k=5).collect()
    }
    assert approx == exact
