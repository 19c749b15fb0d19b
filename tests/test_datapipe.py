"""Datapipe tests: dedup (exact/minhash/simhash/jaccard), similarity search,
text stats, multimodal plumbing — with small exact oracles in pure Python."""

import math

import pytest
from pyspark.sql import functions as F

DOCS = [
    (0, "the quick brown fox jumps over the lazy dog"),
    (1, "the quick brown fox jumps over the lazy cat"),
    (2, "the quick brown fox jumps over the lazy dog"),   # exact dup of 0
    (3, "completely different text about spark engines and shuffles"),
    (4, "der hund und die katze sind nicht das problem"),
    (5, "le chat est dans la maison et les jardins"),
    (6, ""),
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, "doc_id LONG, text STRING")


def _tokens(s):
    import re

    return [t for t in re.sub(r"[^a-z0-9\s]", " ", s.lower()).split() if t]


def _shingles(s, n=3):
    toks = _tokens(s)
    if len(toks) >= n:
        return {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}
    return {" ".join(toks)}


def test_exact_dedup(docs):
    from prase_spark.datapipe.dedup import exact_dedup

    got = {r["doc_id"]: r["dup_count"] for r in exact_dedup(docs).collect()}
    assert got[0] == 2 and 2 not in got and got[1] == 1
    # plan hygiene: the MAIN aggregation shuffles on the 8-byte hash (the
    # residual text-keyed exchange sits below the collision left-semi and
    # only ever sees rows of colliding hash groups — ~0 in practice)
    plan = exact_dedup(docs)._jdf.queryExecution().executedPlan().toString()
    assert "hashpartitioning(__h" in plan


def test_exact_dedup_collision_safe(spark):
    """A deliberately colliding hash (text length) must still dedup
    byte-exactly: colliding groups are re-grouped on the full text."""
    from prase_spark.datapipe.dedup import exact_dedup

    rows = [(1, "aaaa"), (2, "bbbb"), (3, "aaaa"), (4, "cc"), (5, "cc")]
    df = spark.createDataFrame(rows, "doc_id LONG, text STRING")
    out = {
        r["doc_id"]: (r["text"], r["dup_count"])
        for r in exact_dedup(df, hash_fn=F.length).collect()
    }
    assert out == {1: ("aaaa", 2), 2: ("bbbb", 1), 4: ("cc", 2)}


def test_ngram_jaccard_pairs(docs):
    from prase_spark.datapipe.dedup import ngram_jaccard_pairs

    got = {
        (r["key_a"], r["key_b"]): r["jaccard"]
        for r in ngram_jaccard_pairs(docs, threshold=0.0).collect()
    }
    # independent oracle
    for (a, b), j in got.items():
        sa, sb = _shingles(DOCS[a][1]), _shingles(DOCS[b][1])
        expect = len(sa & sb) / len(sa | sb)
        assert abs(j - expect) < 1e-9, (a, b)
    assert got[(0, 2)] == 1.0
    assert 0.5 < got[(0, 1)] < 1.0


def test_minhash_lsh_finds_near_dups(docs):
    from prase_spark.datapipe.dedup import minhash_dedup, minhash_lsh_pairs

    pairs = {
        (r["key_a"], r["key_b"]) for r in minhash_lsh_pairs(docs).collect()
    }
    assert (0, 2) in pairs  # identical docs always collide
    clusters = minhash_dedup(docs, threshold=0.8)
    rows = {r["doc_id"]: (r["cluster_id"], r["keep"]) for r in clusters.collect()}
    assert rows[0][0] == rows[2][0]          # near-dups share a cluster
    assert rows[0][1] and not rows[2][1]     # min id kept
    assert rows[3][1]                        # unique doc kept


def test_keep_best_prefers_quality_then_min_id(spark, docs):
    """dedup.keep_best re-picks cluster representatives by score: the
    highest-quality member wins even with a higher id; exact ties (equal
    scores) fall back to the lowest id; singleton clusters keep their only
    member."""
    from pyspark.sql import functions as F

    from prase_spark.datapipe.dedup import keep_best, minhash_dedup

    clusters = minhash_dedup(docs, threshold=0.8)
    cluster_of = {r["doc_id"]: r["cluster_id"] for r in clusters.collect()}
    assert cluster_of[0] == cluster_of[2]  # fixture near-dups
    # doc 2 (higher id) gets the better score -> it must be kept over doc 0
    scores = docs.select(
        "doc_id", (F.col("doc_id") == 2).cast("double").alias("quality")
    )
    kept = {r["doc_id"]: r["keep"] for r in keep_best(clusters, scores).collect()}
    assert kept[2] and not kept[0]
    assert kept[3]  # singleton keeps itself
    # all-equal scores degrade to the min-id rule (minhash_dedup's keep)
    flat = docs.select("doc_id", F.lit(1.0).alias("quality"))
    kept_flat = {r["doc_id"]: r["keep"] for r in keep_best(clusters, flat).collect()}
    base = {r["doc_id"]: r["keep"] for r in clusters.collect()}
    assert kept_flat == base


def test_simhash_pairs(docs):
    from prase_spark.datapipe.dedup import simhash_pairs

    got = {(r["key_a"], r["key_b"]): r["hamming"] for r in simhash_pairs(docs).collect()}
    assert got[(0, 2)] == 0  # identical text -> identical simhash


def test_textstats(docs):
    from prase_spark.datapipe.textstats import (
        add_fingerprint,
        language_id,
        quality_score,
        token_count,
    )

    out = docs.select(
        "doc_id",
        token_count("text").alias("n"),
        language_id("text").alias("lang"),
        quality_score("text").alias("q"),
    ).collect()
    by_id = {r["doc_id"]: r for r in out}
    assert by_id[0]["n"] == len(_tokens(DOCS[0][1]))
    assert by_id[0]["lang"] == "en"
    assert by_id[4]["lang"] == "de"
    assert by_id[5]["lang"] == "fr"
    assert by_id[6]["lang"] == "und"
    assert 0.0 <= by_id[3]["q"] <= 1.0 and by_id[6]["q"] == 0.0

    fp = {r["doc_id"]: r["fingerprint"] for r in add_fingerprint(docs).collect()}
    assert fp[0] == fp[2] and fp[0] != fp[1]


def test_cosine_topk_exact(spark):
    from prase_spark.datapipe.simsearch import cosine_topk

    vecs = [
        (0, [1.0, 0.0]),
        (1, [0.9, 0.1]),
        (2, [0.0, 1.0]),
        (3, [0.5, 0.5]),
    ]
    corpus = spark.createDataFrame(vecs, "vec_id LONG, embedding ARRAY<DOUBLE>")
    queries = corpus.filter("vec_id = 0").select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    got = [
        (r["vec_id"], r["rank"])
        for r in cosine_topk(corpus, queries, k=3).orderBy("rank").collect()
    ]
    assert got == [(0, 1), (1, 2), (3, 3)]


def test_lsh_topk_recall(spark):
    """LSH-blocked top-1 should recover the exact top-1 for most queries."""
    import numpy as np

    from prase_spark.datapipe.simsearch import cosine_topk, lsh_topk

    rng = np.random.default_rng(7)
    mat = rng.normal(size=(200, 16))
    mat /= np.linalg.norm(mat, axis=1, keepdims=True)
    rows = [(i, [float(x) for x in mat[i]]) for i in range(200)]
    corpus = spark.createDataFrame(rows, "vec_id LONG, embedding ARRAY<DOUBLE>")
    queries = corpus.filter("vec_id < 20").select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    exact = {
        r["query_id"]: r["vec_id"]
        for r in cosine_topk(corpus, queries, k=1).collect()
    }
    approx = {
        r["query_id"]: r["vec_id"]
        # production-width default band keys (128/8 = 16-bit)
        for r in lsh_topk(corpus, queries, dim=16, k=1).collect()
    }
    hits = sum(1 for q, v in exact.items() if approx.get(q) == v)
    assert hits >= 18  # self-match always collides in every band


def test_lsh_topk_multi_probe_recall(spark):
    """Query-side 1-bit-flip probing must substantially lift recall at
    production-width (16-bit) band keys on near-dup-grade (cos≈0.9)
    neighbors, without touching the corpus side."""
    import numpy as np

    from prase_spark.datapipe.simsearch import lsh_topk

    rng = np.random.default_rng(9)
    mat = rng.normal(size=(300, 16))
    mat /= np.linalg.norm(mat, axis=1, keepdims=True)
    noisy = mat + rng.normal(size=mat.shape) * 0.121  # cos ≈ 0.9 to the original
    corpus = spark.createDataFrame(
        [(i, [float(x) for x in mat[i]]) for i in range(300)],
        "vec_id LONG, embedding ARRAY<DOUBLE>",
    )
    queries = spark.createDataFrame(
        [(i, [float(x) for x in noisy[i]]) for i in range(100)],
        "query_id LONG, embedding ARRAY<DOUBLE>",
    )

    def recall(mp):
        got = {
            r["query_id"]: r["vec_id"]
            for r in lsh_topk(corpus, queries, dim=16, k=1, multi_probe=mp).collect()
        }
        return sum(1 for q in range(100) if got.get(q) == q)

    r0, r1 = recall(0), recall(1)
    assert r1 >= r0 + 20, (r0, r1)  # theory: ~0.50 -> ~0.94 band recall
    assert r1 >= 75, (r0, r1)


def test_ivf_topk(spark):
    import numpy as np

    from prase_spark.datapipe.simsearch import cosine_topk, ivf_topk

    rng = np.random.default_rng(11)
    mat = rng.normal(size=(120, 8))
    rows = [(i, [float(x) for x in mat[i]]) for i in range(120)]
    corpus = spark.createDataFrame(rows, "vec_id LONG, embedding ARRAY<DOUBLE>")
    queries = corpus.filter("vec_id < 10").select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    exact = {r["query_id"]: r["vec_id"] for r in cosine_topk(corpus, queries, k=1).collect()}
    approx = {
        r["query_id"]: r["vec_id"]
        for r in ivf_topk(corpus, queries, k=1, n_cells=8, n_probe=4).collect()
    }
    hits = sum(1 for q, v in exact.items() if approx.get(q) == v)
    assert hits >= 7


def test_ivf_trained_centroids(spark):
    """Lloyd-refined IVF: on well-separated blobs, 2 training rounds give
    exact recall@1 at n_probe=1 and must not lose to the sample-only
    quantizer at equal probe budget."""
    import numpy as np

    from prase_spark.datapipe.simsearch import cosine_topk, ivf_topk, train_ivf_centroids

    rng = np.random.default_rng(3)
    centers = np.eye(4)  # 4 orthogonal blob directions in dim 4
    mat = np.vstack([c + rng.normal(size=(40, 4)) * 0.05 for c in centers])
    rows = [(i, [float(x) for x in mat[i]]) for i in range(160)]
    corpus = spark.createDataFrame(rows, "vec_id LONG, embedding ARRAY<DOUBLE>")
    queries = corpus.filter("vec_id % 40 = 7").select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    exact = {r["query_id"]: r["vec_id"] for r in cosine_topk(corpus, queries, k=1).collect()}

    def recall(train_iters):
        got = {
            r["query_id"]: r["vec_id"]
            for r in ivf_topk(
                corpus, queries, k=1, n_cells=4, n_probe=1, train_iters=train_iters
            ).collect()
        }
        return sum(1 for q, v in exact.items() if got.get(q) == v)

    r_trained = recall(2)
    assert r_trained == len(exact)  # blobs are separable -> exact at n_probe=1
    assert r_trained >= recall(0)
    # trained centroids align with the blob directions (cos > 0.95 each)
    cents = train_ivf_centroids(corpus, n_cells=4, iters=2)
    best = [max(abs(float(np.dot(c, e))) for c in cents) for e in centers]
    assert all(b > 0.95 for b in best), best


def test_multimodal_features(spark):
    from prase_spark.datapipe.multimodal import (
        MEDIA,
        extract_media_features,
        frame_sample_plan,
    )

    rows = [
        (0, "image", bytearray(b"imgbytes-0"), "image/png", 64, 64, None),
        (1, "image", bytearray(b"imgbytes-0"), "image/png", 64, 64, None),
        (2, "video", bytearray(b"vid"), "video/mp4", 640, 480, 3500),
    ]
    media = spark.createDataFrame(rows, MEDIA)
    feats = {r["media_id"]: r for r in extract_media_features(media).collect()}
    assert feats[0]["features"] == feats[1]["features"]  # deterministic
    assert feats[0]["digest"] == feats[1]["digest"] != feats[2]["digest"]
    assert len(feats[0]["features"]) == 8
    frames = frame_sample_plan(media, every_ms=1000).collect()
    assert [r["frame_ts_ms"] for r in frames] == [0, 1000, 2000, 3000]
    # parallelism invariance of the stubbed decode
    f1 = sorted(map(tuple, extract_media_features(media.coalesce(1)).collect()))
    f8 = sorted(map(tuple, extract_media_features(media.repartition(3)).collect()))
    assert f1 == f8


def test_jaccard_verify_no_shingle_shuffle(spark):
    """Hot-shingle guard: a boilerplate shingle present in EVERY doc must not
    create a shingle-keyed shuffle in the verify path (df² blowup), and the
    stop-shingle cap must restrict candidate generation while verification
    stays exact over the complete sets."""
    from prase_spark.datapipe.dedup import (
        exact_jaccard,
        ngram_jaccard_pairs,
        shingle_table,
    )

    boiler = "all rights reserved by the operator of this site"
    rows = [
        (
            i,
            f"unique document body number {i} says "
            + ("alpha beta gamma words" if i % 2 else "delta epsilon zeta words")
            + " " + boiler,
        )
        for i in range(20)
    ]
    docs = spark.createDataFrame(rows, "doc_id LONG, text STRING")

    # 1) verify plan hygiene: no exchange keyed on the shingle column
    sh = shingle_table(docs)
    pairs = spark.createDataFrame([(0, 2), (1, 3)], "key_a LONG, key_b LONG")
    verified = exact_jaccard(sh, pairs)
    plan = verified._jdf.queryExecution().executedPlan().toString()
    assert "hashpartitioning(shingle" not in plan

    # 2) verification is exact (python set oracle) even with the boilerplate
    got = {(r["key_a"], r["key_b"]): r["jaccard"] for r in verified.collect()}
    for (a, b), j in got.items():
        sa, sb = _shingles(rows[a][1]), _shingles(rows[b][1])
        assert abs(j - len(sa & sb) / len(sa | sb)) < 1e-9, (a, b)

    # 3) stop-shingle cap: boiler shingles (df=20) are dropped from candidate
    # generation at max_df=10; cross-parity pairs (only boiler in common plus
    # df<=10 boundary shingles) shrink, same-parity pairs survive, and every
    # emitted jaccard still matches the exact python oracle.
    capped = {
        (r["key_a"], r["key_b"]): r["jaccard"]
        for r in ngram_jaccard_pairs(docs, threshold=0.0, max_shingle_df=10).collect()
    }
    uncapped = {
        (r["key_a"], r["key_b"]): r["jaccard"]
        for r in ngram_jaccard_pairs(docs, threshold=0.0).collect()
    }
    assert set(capped) <= set(uncapped)
    assert (0, 2) in capped and (1, 3) in capped
    for (a, b), j in capped.items():
        sa, sb = _shingles(rows[a][1]), _shingles(rows[b][1])
        assert abs(j - len(sa & sb) / len(sa | sb)) < 1e-9, (a, b)


def test_minhash_dedup_no_shingle_shuffle(spark):
    """The full near-dup pipeline (LSH candidates + array verify) must never
    shuffle keyed on the raw shingle column."""
    from prase_spark.datapipe.dedup import minhash_dedup

    rows = [(i, f"some shared boilerplate across docs plus token {i // 2}") for i in range(12)]
    docs = spark.createDataFrame(rows, "doc_id LONG, text STRING")
    out = minhash_dedup(docs, threshold=0.8)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "hashpartitioning(shingle" not in plan
    rows_out = {r["doc_id"]: (r["cluster_id"], r["keep"]) for r in out.collect()}
    # doc pairs (2k, 2k+1) are exact dups -> same cluster, min kept
    assert rows_out[0][0] == rows_out[1][0]
    assert rows_out[0][1] and not rows_out[1][1]


def _mk_png(w, h):
    import struct
    import zlib

    ihdr = struct.pack(">II", w, h) + b"\x08\x02\x00\x00\x00"
    chunk = b"IHDR" + ihdr
    return (
        b"\x89PNG\r\n\x1a\n"
        + struct.pack(">I", len(ihdr))
        + chunk
        + struct.pack(">I", zlib.crc32(chunk) & 0xFFFFFFFF)
    )


def _mk_jpeg(w, h):
    import struct

    app0 = b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x02\x00" + b"\x00" * 6
    sof0 = b"\xff\xc0" + struct.pack(">HBHH", 11, 8, h, w) + b"\x03"
    return b"\xff\xd8" + app0 + sof0 + b"\xff\xd9"


def _mk_gif(w, h):
    import struct

    return b"GIF89a" + struct.pack("<HH", w, h) + b"\x00" * 4


def test_probe_media_headers(spark):
    """Real container-header parsing: PNG IHDR, JPEG SOF0 (behind an APP0
    segment), GIF descriptor — true dimensions, no codec libs, stable at
    any parallelism."""
    from prase_spark.datapipe.multimodal import (
        MEDIA,
        probe_image_header,
        probe_media_metadata,
    )

    assert probe_image_header(_mk_png(640, 480)) == ("png", 640, 480)
    assert probe_image_header(_mk_jpeg(123, 77)) == ("jpeg", 123, 77)
    assert probe_image_header(_mk_gif(12, 34)) == ("gif", 12, 34)
    assert probe_image_header(b"RIFF\x00\x00\x00\x00WAVEfmt ") == ("wav", None, None)
    assert probe_image_header(b"garbage") == (None, None, None)
    assert probe_image_header(None) == (None, None, None)

    rows = [
        (0, "image", bytearray(_mk_png(640, 480)), "image/png", None, None, None),
        (1, "image", bytearray(_mk_jpeg(123, 77)), "image/jpeg", None, None, None),
        (2, "image", bytearray(_mk_gif(12, 34)), "image/gif", None, None, None),
        (3, "image", bytearray(b"not an image"), "application/octet-stream", None, None, None),
    ]
    media = spark.createDataFrame(rows, MEDIA)
    got = {r["media_id"]: (r["fmt"], r["width"], r["height"])
           for r in probe_media_metadata(media).collect()}
    assert got[0] == ("png", 640, 480)
    assert got[1] == ("jpeg", 123, 77)
    assert got[2] == ("gif", 12, 34)
    assert got[3] == (None, None, None)
    p1 = sorted(map(tuple, probe_media_metadata(media.coalesce(1)).collect()))
    p3 = sorted(map(tuple, probe_media_metadata(media.repartition(3)).collect()))
    assert p1 == p3


def test_simhash_signature_table_matches_column_expr(spark, docs):
    """The exploded-aggregate signature path is value-identical to the
    simhash64 column expression."""
    from prase_spark.datapipe.dedup import simhash64, simhash_signature_table

    via_table = {
        r["key"]: r["sig"] for r in simhash_signature_table(docs).collect()
    }
    via_expr = {
        r["doc_id"]: r["sig"]
        for r in docs.select("doc_id", simhash64("text").alias("sig")).collect()
    }
    assert via_table == via_expr


def test_minhash_wide_matches_long_signatures(spark, docs):
    """The wide (64-min-aggregate) signature path inside minhash_lsh_pairs
    produces band keys identical to the long-format minhash_signatures."""
    from pyspark.sql import functions as F

    from prase_spark.datapipe.dedup import minhash_signatures, shingle_table

    sigs = minhash_signatures(shingle_table(docs), 64, 42)
    long_bands = (
        sigs.withColumn("band", (F.col("h") / 4).cast("int"))
        .groupBy("key", "band")
        .agg(F.concat_ws(",", F.sort_array(F.collect_list(F.concat_ws(":", "h", "minhash")))).alias("band_key"))
    )
    a = long_bands.select(F.col("key").alias("key_a"), "band", "band_key")
    b = long_bands.select(F.col("key").alias("key_b"), "band", "band_key")
    expected = {
        (r["key_a"], r["key_b"])
        for r in a.join(b, ["band", "band_key"]).filter("key_a < key_b").distinct().collect()
    }
    from prase_spark.datapipe.dedup import minhash_lsh_pairs

    got = {(r["key_a"], r["key_b"]) for r in minhash_lsh_pairs(docs).collect()}
    assert got == expected


def test_embedding_neardup_clusters(spark):
    """LSH-blocked embedding near-dup: exact copies cluster with their
    original (min id kept); unrelated random vectors stay singletons."""
    import numpy as np

    from prase_spark.datapipe.simsearch import embedding_neardup

    rng = np.random.default_rng(5)
    mat = rng.normal(size=(100, 16))
    rows = [(i, [float(x) for x in mat[i]]) for i in range(100)]
    rows += [(1000 + i, [float(x) for x in mat[i]]) for i in range(10)]  # copies
    corpus = spark.createDataFrame(rows, "vec_id LONG, embedding ARRAY<DOUBLE>")
    out = {r["vec_id"]: (r["cluster_id"], r["keep"]) for r in
           embedding_neardup(corpus, dim=16, threshold=0.99).collect()}
    assert len(out) == 110
    for i in range(10):
        assert out[1000 + i][0] == out[i][0] == i   # copy joins original's cluster
        assert out[i][1] and not out[1000 + i][1]   # min id kept
    singles = [v for k, (v, _) in out.items() if 10 <= k < 100]
    assert len(set(singles)) == 90                  # randoms stay singletons
    plan = embedding_neardup(corpus, dim=16)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan


def test_poly_hash61_property(spark):
    """poly_hash61 equals the independent pure-Python fold over random
    ASCII strings (hypothesis)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from prase_spark.datapipe.hashing import POLY_INIT, POLY_MULT, POLY_P, poly_hash61

    def py_poly(s: str) -> int:
        acc = POLY_INIT
        for ch in s:
            acc = (acc * POLY_MULT + ord(ch)) % POLY_P
        return acc

    samples = []

    @settings(max_examples=60, deadline=None)
    @given(st.text(alphabet=st.characters(min_codepoint=32, max_codepoint=126), max_size=40))
    def gen(s):
        samples.append(s)

    gen()
    rows = [(i, s) for i, s in enumerate(samples)]
    df = spark.createDataFrame(rows, "i LONG, s STRING")
    got = {r["i"]: r["h"] for r in df.select("i", poly_hash61("s").alias("h")).collect()}
    for i, s in rows:
        assert got[i] == py_poly(s), repr(s)


def test_minhash_remainder_slots_banded(spark, docs):
    """num_hashes not divisible by bands: remainder slots form a final
    partial band (never silently dropped from candidate generation)."""
    from prase_spark.datapipe.dedup import minhash_lsh_pairs

    pairs = {
        (r["key_a"], r["key_b"])
        for r in minhash_lsh_pairs(docs, num_hashes=60, bands=16).collect()
    }
    assert (0, 2) in pairs  # identical docs collide in every band incl. the partial one


def test_bpe_token_count_and_repetition(spark):
    from prase_spark.datapipe.textstats import (
        corpus_stats,
        repetition_ratio,
        token_count_bpe,
    )

    rows = [
        (0, "It's the fox's den."),
        (1, "word word word word"),
        (2, "all distinct tokens here"),
        (3, ""),
    ]
    df = spark.createDataFrame(rows, "doc_id LONG, text STRING")
    got = {
        r["doc_id"]: (r["bpe"], r["rep"])
        for r in df.select(
            "doc_id",
            token_count_bpe("text").alias("bpe"),
            F.round(repetition_ratio("text"), 6).alias("rep"),
        ).collect()
    }
    # "It's the fox's den." -> It|'s| the| fox|'s| den|.|  -> spans incl. ws
    assert got[0][0] > 4
    assert got[3] == (0, 0.0)
    assert got[1][1] == 0.25 and got[2][1] == 1.0
    stats = corpus_stats(df.filter("doc_id < 3")).collect()
    assert sum(r["docs"] for r in stats) == 3


def test_chunk_documents_coverage_and_overlap(spark):
    """Every token covered in order; consecutive chunks share exactly
    `overlap` tokens; short and empty docs keep one chunk; bad params
    raise."""
    import pytest
    from prase_spark.datapipe.chunking import chunk_documents

    long_text = " ".join(f"w{i}" for i in range(25))
    df = spark.createDataFrame(
        [(0, long_text), (1, "just three tokens"), (2, ""), (3, "   ")],
        "doc_id LONG, text STRING",
    )
    rows = sorted(
        chunk_documents(df, chunk_tokens=10, overlap=3).collect(),
        key=lambda r: (r["doc_id"], r["chunk_id"]),
    )
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    # doc 0: 25 tokens, chunk 10, step 7 -> 1 + ceil(15/7) = 4 chunks
    chunks0 = [r["chunk_text"].split(" ") for r in by_doc[0]]
    assert len(chunks0) == 4
    for i, c in enumerate(chunks0[:-1]):
        assert len(c) == 10
        assert c == [f"w{j}" for j in range(i * 7, i * 7 + 10)]
        assert c[-3:] == chunks0[i + 1][:3]  # exact overlap
    assert chunks0[-1] == [f"w{j}" for j in range(21, 25)]  # tail covered
    # short doc: one chunk, all tokens
    assert [r["chunk_text"] for r in by_doc[1]] == ["just three tokens"]
    # empty / whitespace docs: exactly one empty chunk each (not dropped)
    for d in (2, 3):
        assert len(by_doc[d]) == 1
        assert by_doc[d][0]["chunk_text"] == ""
        assert by_doc[d][0]["n_chunk_tokens"] == 0
    with pytest.raises(ValueError, match="overlap"):
        chunk_documents(df, chunk_tokens=10, overlap=10)


def test_pack_chunks_matches_global_cumsum(spark):
    """pack_chunks's two-phase distributed prefix sum must equal the
    textbook single-window definition exactly, across many partitions,
    and nothing may be split or dropped."""
    from prase_spark.datapipe.chunking import chunk_documents, pack_chunks

    rows = [(i, " ".join(f"t{i}_{j}" for j in range(5 + (i * 7) % 40)))
            for i in range(60)]
    df = spark.createDataFrame(rows, "doc_id LONG, text STRING")
    chunks = chunk_documents(df, chunk_tokens=12, overlap=3)
    packed = pack_chunks(chunks, capacity=50, num_partitions=8).collect()
    got = {
        (r["doc_id"], r["chunk_id"]): (r["pack_id"], r["pack_pos"], r["n_chunk_tokens"])
        for r in packed
    }
    # python oracle: global (doc_id, chunk_id) order cumsum
    ordered = sorted(got)
    before = 0
    for key in ordered:
        pack_id, pack_pos, n = got[key]
        assert pack_id == before // 50, key
        assert pack_pos == before - pack_id * 50, key
        before += n
    # every chunk present exactly once; total tokens preserved
    assert len(got) == chunks.count()
    assert before == sum(n for _, _, n in got.values())


def test_decontaminate_flags_eval_overlap(spark):
    """Planted benchmark overlap: a train doc embedding an eval question's
    5-gram flags contaminated; clean docs report 0 hits; the hash-join
    mode agrees with exact string matching; verbatim short questions
    match via the whole-text fallback."""
    from prase_spark.datapipe.decontam import decontaminate

    evals = spark.createDataFrame(
        [("what is the capital city of france exactly",),
         ("short question",)],
        "text STRING",
    )
    train = spark.createDataFrame(
        [
            (0, "intro text then what is the capital city of france exactly end"),
            (1, "a completely unrelated document about spark shuffles and joins"),
            (2, "short question"),  # verbatim copy below shingle width
        ],
        "doc_id LONG, text STRING",
    )
    got = {
        r["doc_id"]: (r["n_hits"], r["contaminated"])
        for r in decontaminate(train, evals, n=5).collect()
    }
    assert got[0][1] and got[0][0] >= 3  # several shared 5-grams
    assert got[1] == (0, False)
    assert got[2][1]  # whole-text fallback catches the short verbatim copy
    hashed = {
        r["doc_id"]: (r["n_hits"], r["contaminated"])
        for r in decontaminate(train, evals, n=5, hash_fn=F.xxhash64).collect()
    }
    assert hashed == got


def test_hash_sample_deterministic_and_accurate(spark):
    """Same keys picked on every evaluation; empirical rate near target;
    nested samples with different seeds compose multiplicatively;
    stratified rates apply per stratum; bad rates raise."""
    from prase_spark.datapipe.sampling import hash_sample, stratified_sample

    df = spark.range(20_000).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 3 == 0, "en").otherwise("de").alias("lang"),
    )
    s1 = set(r["doc_id"] for r in hash_sample(df, 0.3).collect())
    s2 = set(r["doc_id"] for r in hash_sample(df, 0.3).collect())
    assert s1 == s2  # run-to-run deterministic
    assert abs(len(s1) / 20_000 - 0.3) < 0.02
    # rate monotonicity: lower rate is a subset of the higher (same seed)
    s_small = set(r["doc_id"] for r in hash_sample(df, 0.1).collect())
    assert s_small <= s1
    # composition across seeds ~= product of rates
    nested = hash_sample(hash_sample(df, 0.5, seed=1), 0.5, seed=2).count()
    assert abs(nested / 20_000 - 0.25) < 0.02
    # stratified: en kept whole, de at 10%
    out = stratified_sample(df, {"en": 1.0}, "lang", default_rate=0.1)
    by_lang = {r["lang"]: r["n"] for r in out.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert by_lang["en"] == df.filter("lang = 'en'").count()
    assert abs(by_lang["de"] / df.filter("lang = 'de'").count() - 0.1) < 0.02

    import pytest
    from prase_spark.datapipe.sampling import rate_threshold

    with pytest.raises(ValueError, match="rate"):
        rate_threshold(1.5)


def test_chunk_documents_randomized_reconstruction(spark):
    """Randomized sweep (seeded): for arbitrary messy inputs (unicode,
    punctuation runs, huge whitespace), dropping each chunk's overlap
    prefix and concatenating must reproduce the document's exact token
    stream — chunking never loses, duplicates, or reorders tokens."""
    import random

    from prase_spark.datapipe.chunking import chunk_documents

    rng = random.Random(1234)
    alphabet = "abcXYZ019 ,.!?\t\né中-_\"'"
    rows = [
        (i, "".join(rng.choice(alphabet) for _ in range(rng.randrange(0, 400))))
        for i in range(300)
    ]
    df = spark.createDataFrame(rows, "doc_id LONG, text STRING")
    chunk, overlap = 7, 2
    out = chunk_documents(df, chunk_tokens=chunk, overlap=overlap).collect()
    by_doc = {}
    for r in sorted(out, key=lambda r: (r["doc_id"], r["chunk_id"])):
        by_doc.setdefault(r["doc_id"], []).append(r["chunk_text"])
    import re as _re

    for doc_id, text in rows:
        toks = [t for t in _re.sub(r"[^a-z0-9\s]", " ", text.lower()).split() if t]
        chunks = by_doc[doc_id]
        rebuilt = chunks[0].split(" ") if chunks[0] else []
        for c in chunks[1:]:
            ct = c.split(" ") if c else []
            assert ct[:overlap] == rebuilt[-overlap:] if len(rebuilt) >= overlap else True
            rebuilt.extend(ct[overlap:])
        assert rebuilt == toks, doc_id


def test_remove_boilerplate_per_host(spark):
    """Lines frequent within a host are stripped; identical lines on a
    SMALL host (< min_pages) survive; line order is preserved; blank
    lines are kept and never count as boilerplate evidence."""
    from prase_spark.datapipe.boilerplate import remove_boilerplate

    rows = []
    for i in range(6):  # big host: banner + unique body + footer
        rows.append((
            f"https://big.example.org/p/{i}",
            f"COOKIE BANNER\nunique body {i}\n\nsecond line {i}\nFOOTER TEXT",
        ))
    for i in range(2):  # small host: same banner, must be left alone
        rows.append((
            f"https://tiny.example.org/p/{i}",
            f"COOKIE BANNER\ntiny body {i}",
        ))
    pages = spark.createDataFrame(rows, "url STRING, text STRING")
    out = {
        r["url"]: (r["text"], r["removed_lines"])
        for r in remove_boilerplate(pages, min_pages=4, max_ratio=0.5).collect()
    }
    for i in range(6):
        text, removed = out[f"https://big.example.org/p/{i}"]
        assert text == f"unique body {i}\n\nsecond line {i}", text  # order + blank kept
        assert removed == 2
    for i in range(2):
        text, removed = out[f"https://tiny.example.org/p/{i}"]
        assert text == f"COOKIE BANNER\ntiny body {i}"
        assert removed == 0


def test_canonical_url_rules(spark):
    """Each canonicalization rule, and the ones that must NOT fire:
    non-default ports survive, path case survives, root slash survives,
    tracking-only queries vanish entirely."""
    from prase_spark.datapipe.urlnorm import canonical_url

    cases = [
        ("HTTPS://WWW.Example.org:443/A/B?x=1#frag", "https://www.example.org/A/B?x=1"),
        ("http://h.org:80/p", "http://h.org/p"),
        ("http://h.org:8080/p", "http://h.org:8080/p"),          # non-default port kept
        ("https://h.org/p/?utm_source=a&x=2&fbclid=z", "https://h.org/p?x=2"),
        ("https://h.org/p?utm_source=only", "https://h.org/p"),  # tracking-only query
        ("https://h.org/", "https://h.org/"),                    # root slash kept
        ("https://h.org/a/b/", "https://h.org/a/b"),
    ]
    df = spark.createDataFrame([(u,) for u, _ in cases], "url STRING")
    got = [r["c"] for r in df.select(canonical_url("url").alias("c")).collect()]
    for (raw, want), c in zip(cases, got):
        assert c == want, (raw, c, want)


def test_dedup_by_url_earliest_wins(spark):
    from prase_spark.datapipe.urlnorm import dedup_by_url

    rows = [
        ("https://A.org/x?utm_source=1", 5, "late-messy"),
        ("https://a.org/x", 3, "early-clean"),
        ("https://a.org/y", 7, "solo"),
    ]
    df = spark.createDataFrame(rows, "url STRING, warc_ts LONG, text STRING")
    got = {r["canonical_url"]: (r["text"], r["n_captures"])
           for r in dedup_by_url(df).collect()}
    assert got["https://a.org/x"] == ("early-clean", 2)
    assert got["https://a.org/y"] == ("solo", 1)


def test_probe_webp_bmp_wav_headers(spark):
    """New real header coverage: WEBP (lossy VP8, lossless VP8L, extended
    VP8X), BMP (incl. top-down negative height), and WAV with a REAL
    duration computed from byte rate + data size."""
    import struct

    from prase_spark.datapipe.multimodal import (
        MEDIA,
        probe_container,
        probe_media_metadata,
        probe_wav_duration_ms,
    )

    def mk_vp8(w, h):
        tag = b"\x00\x00\x00" + b"\x9d\x01\x2a" + struct.pack("<HH", w, h)
        return b"RIFF" + struct.pack("<I", 4 + 8 + len(tag)) + b"WEBP" \
               + b"VP8 " + struct.pack("<I", len(tag)) + tag

    def mk_vp8l(w, h):
        bits = (w - 1) | ((h - 1) << 14)
        body = b"\x2f" + struct.pack("<I", bits)
        return b"RIFF" + struct.pack("<I", 4 + 8 + len(body)) + b"WEBP" \
               + b"VP8L" + struct.pack("<I", len(body)) + body

    def mk_vp8x(w, h):
        body = b"\x00\x00\x00\x00" \
               + (w - 1).to_bytes(3, "little") + (h - 1).to_bytes(3, "little")
        return b"RIFF" + struct.pack("<I", 4 + 8 + len(body)) + b"WEBP" \
               + b"VP8X" + struct.pack("<I", len(body)) + body

    def mk_bmp(w, h):
        hdr = b"BM" + b"\x00" * 16 + struct.pack("<ii", w, h)
        return hdr + b"\x00" * 10

    def mk_wav(byte_rate, data_bytes):
        fmt = struct.pack("<HHII", 1, 1, byte_rate, byte_rate) + b"\x00\x00"
        return (b"RIFF" + struct.pack("<I", 36 + data_bytes) + b"WAVE"
                + b"fmt " + struct.pack("<I", len(fmt)) + fmt
                + b"data" + struct.pack("<I", data_bytes) + b"\x00" * data_bytes)

    assert probe_container(mk_vp8(320, 240)) == ("webp", 320, 240, None)
    assert probe_container(mk_vp8l(100, 50)) == ("webp", 100, 50, None)
    assert probe_container(mk_vp8x(4096, 2160)) == ("webp", 4096, 2160, None)
    assert probe_container(mk_bmp(64, -32)) == ("bmp", 64, 32, None)  # top-down
    wav = mk_wav(16000, 48000)  # 3 seconds at 16 kB/s
    assert probe_wav_duration_ms(wav) == 3000
    assert probe_container(wav) == ("wav", None, None, 3000)
    # still real through the Spark plumbing
    rows = [(0, "image", bytearray(mk_vp8x(4096, 2160)), "image/webp", None, None, None),
            (1, "audio", bytearray(wav), "audio/wav", None, None, None)]
    got = {r["media_id"]: (r["fmt"], r["width"], r["height"], r["duration_ms"])
           for r in probe_media_metadata(spark.createDataFrame(rows, MEDIA)).collect()}
    assert got[0] == ("webp", 4096, 2160, None)
    assert got[1] == ("wav", None, None, 3000)


def test_exact_dedup_null_text_groups(spark):
    """NULL-text rows must not vanish (ADVICE r3): an all-NULL hash group
    is trivially uniform — one representative row with the min key and the
    full dup_count — and a COLLIDING group mixing NULL with non-NULL text
    goes through the exact regroup, which keeps NULL as its own group."""
    from prase_spark.datapipe.dedup import exact_dedup

    rows = [(1, None), (2, "x"), (3, None), (4, "x"), (5, "y")]
    df = spark.createDataFrame(rows, "doc_id LONG, text STRING")
    got = {r["doc_id"]: (r["text"], r["dup_count"]) for r in exact_dedup(df).collect()}
    assert got == {1: (None, 2), 2: ("x", 2), 5: ("y", 1)}
    # forced-collision path: constant hash puts NULLs and non-NULLs in ONE
    # hash group -> the regroup must still separate them byte-exactly
    got2 = {
        r["doc_id"]: (r["text"], r["dup_count"])
        for r in exact_dedup(df, hash_fn=lambda c: F.lit(7)).collect()
    }
    assert got2 == {1: (None, 2), 2: ("x", 2), 5: ("y", 1)}


def test_keep_best_uncovered_cluster_falls_back_to_min_key(spark):
    """A cluster none of whose members appear in ``scores`` must NOT be
    dropped (ADVICE r3): it falls back to the min-key rule; partially
    covered clusters pick the best among the scored members."""
    from prase_spark.datapipe.dedup import keep_best

    clusters = spark.createDataFrame(
        [(10, 1), (11, 1), (20, 2), (21, 2), (30, 3)],
        "doc_id LONG, cluster_id LONG",
    )
    # cluster 1: only doc 11 scored; cluster 2: unscored; cluster 3: scored
    scores = spark.createDataFrame(
        [(11, 0.1), (30, 0.9)], "doc_id LONG, quality DOUBLE"
    )
    kept = {r["doc_id"]: r["keep"] for r in keep_best(clusters, scores).collect()}
    assert len(kept) == 5  # nothing vanished
    assert kept == {10: False, 11: True, 20: True, 21: False, 30: True}


def test_pack_chunks_empty_input_no_persist_leak(spark, monkeypatch):
    """pack_chunks on an empty frame returns the full schema with null
    pack columns and UNPERSISTS its pinned snapshot before returning
    (ADVICE r3: the early return used to skip parted.unpersist()). The
    localCheckpoint block the normal path also leaves is fine — the
    contract is that every frame pack_chunks itself persist()ed ends the
    call released."""
    from prase_spark.datapipe.chunking import chunk_documents, pack_chunks

    empty = spark.createDataFrame([], "doc_id LONG, text STRING")
    # patch the CONCRETE class (pyspark 4: pyspark.sql.classic.... overrides
    # the pyspark.sql.DataFrame base, so patching the base never fires)
    cls = type(empty)
    persisted = []
    orig = cls.persist

    def spy(self, *a, **k):
        persisted.append(self)
        return orig(self, *a, **k)

    monkeypatch.setattr(cls, "persist", spy)
    out = pack_chunks(chunk_documents(empty), capacity=64)
    assert out.count() == 0
    assert {"doc_id", "chunk_id", "n_chunk_tokens", "chunk_text", "pack_id",
            "pack_pos"} <= set(out.columns)
    assert persisted, "pack_chunks no longer pins its partitioning snapshot?"
    for df in persisted:
        lvl = df.storageLevel
        assert not (lvl.useMemory or lvl.useDisk), (
            "empty-input early return leaked a persisted frame"
        )


def test_pack_chunks_non_numeric_shuffle_conf(spark, monkeypatch):
    """'auto' shuffle.partitions (AQE-managed platforms return it from
    conf.get even though stock Spark rejects setting it) must fall back to
    defaultParallelism instead of raising (ADVICE r3). Simulated by
    patching RuntimeConfig.get — stock Spark refuses the set() itself."""
    from prase_spark.datapipe.chunking import chunk_documents, pack_chunks

    df = spark.createDataFrame(
        [(i, "a b c d e f g h") for i in range(8)], "doc_id LONG, text STRING"
    )
    cls = type(spark.conf)
    orig = cls.get

    def fake_get(self, key, *a, **k):
        if key == "spark.sql.shuffle.partitions":
            return "auto"
        return orig(self, key, *a, **k)

    monkeypatch.setattr(cls, "get", fake_get)
    packed = pack_chunks(chunk_documents(df, chunk_tokens=4, overlap=0),
                         capacity=16).collect()
    assert len(packed) == 16  # 2 chunks per doc, nothing dropped


def test_evaluate_alignment_duplicate_gold_rows(spark):
    """Recall denominator uses the DEDUPED gold set (ADVICE r3): repeated
    gold rows must not deflate recall/F1."""
    from prase_spark.evaluate import evaluate_alignment

    matches = spark.createDataFrame(
        [(1, 101, 0.9, False), (2, 102, 0.9, False)],
        "ent_id LONG, counterpart_id LONG, prob DOUBLE, is_lit BOOLEAN",
    )
    gold = spark.createDataFrame(
        [(1, 101), (1, 101), (1, 101), (2, 102)], "ent_l LONG, ent_r LONG"
    )
    row = [r for r in evaluate_alignment(matches, gold, thresholds=[0.5])][0]
    assert row["gold"] == 2
    assert row["recall"] == 1.0 and row["precision"] == 1.0 and row["f1"] == 1.0


def test_embedding_neardup_auto_bits_recall_and_candidate_bound(spark):
    """VERDICT r3 #5: at 10^5 vectors with AUTO-sized band keys
    (log2(n)+2 ≈ 19 bits), embedding_neardup must (a) recover ≥0.9 of
    planted near-dup pairs and (b) generate candidates ≪ n² — the two
    sides of the banding trade-off, pinned together so a future band-width
    change cannot silently buy one by spending the other."""
    import numpy as np
    import pandas as pd

    from prase_spark.datapipe.simsearch import embedding_neardup

    n, dim, n_planted = 100_000, 16, 500
    rng = np.random.default_rng(11)
    mat = rng.normal(size=(n, dim))
    # plant near-dups: ids n..n+n_planted-1 are tiny perturbations of
    # ids 0..n_planted-1 (cosine ≥ ~0.998 at this noise scale)
    noise = rng.normal(size=(n_planted, dim)) * 0.02
    planted = mat[:n_planted] + noise * np.linalg.norm(
        mat[:n_planted], axis=1, keepdims=True
    ) / np.sqrt(dim)
    full = np.vstack([mat, planted])
    pdf = pd.DataFrame(
        {"vec_id": np.arange(len(full)), "embedding": [r.tolist() for r in full]}
    )
    corpus = spark.createDataFrame(pdf)
    stats = {}
    out = embedding_neardup(
        corpus, dim=dim, threshold=0.99, n_bits=None, stats_out=stats
    )
    clusters = {
        r["vec_id"]: r["cluster_id"]
        for r in out.filter(
            (F.col("vec_id") < n_planted) | (F.col("vec_id") >= n)
        ).collect()
    }
    hits = sum(1 for i in range(n_planted) if clusters[i] == clusters[n + i])
    recall = hits / n_planted
    assert recall >= 0.9, f"recall {recall} at auto bits"
    # candidate volume: full pairs would be ~5e9; banding must stay ≪ that
    assert 0 < stats["candidate_pairs"] < 60 * (n + n_planted), stats
    assert stats["capped_buckets"] == 0


def test_stratified_sample_join_path_equals_case_path(spark):
    """VERDICT r3 #6: above CASE_JOIN_CUTOVER strata stratified_sample
    switches to a broadcast-joined rate table; both forms must select the
    IDENTICAL rows (and the big-map plan must contain a broadcast join,
    not a 150-arm CASE)."""
    import prase_spark.datapipe.sampling as sampling
    from prase_spark.datapipe.sampling import stratified_sample

    n_strata = 150
    rows = [(i, f"src{i % n_strata}") for i in range(4000)]
    df = spark.createDataFrame(rows, "doc_id LONG, source STRING")
    rates = {f"src{s}": (s % 10) / 10.0 for s in range(n_strata)}

    big = stratified_sample(df, rates, "source", default_rate=0.5)
    assert "BroadcastHashJoin" in (
        big._jdf.queryExecution().executedPlan().toString()
    )
    got_join = {r["doc_id"] for r in big.collect()}
    # force the CASE path on the same map by lifting the cutover
    old = sampling.CASE_JOIN_CUTOVER
    sampling.CASE_JOIN_CUTOVER = 10_000
    try:
        got_case = {
            r["doc_id"]
            for r in stratified_sample(df, rates, "source", default_rate=0.5).collect()
        }
    finally:
        sampling.CASE_JOIN_CUTOVER = old
    assert got_join == got_case
    # unlisted strata fall back to default_rate in the join path too
    rates_partial = {f"src{s}": 0.0 for s in range(n_strata - 10)}
    kept = stratified_sample(df, rates_partial, "source", default_rate=1.0).collect()
    assert {r["source"] for r in kept} == {f"src{s}" for s in range(n_strata - 10, n_strata)}


def _make_png(img, filters, ctype=2):
    from prase_spark.fixtures import synth_png

    return synth_png(img, tuple(filters), ctype)


def _make_bmp(img, top_down=False):
    from prase_spark.fixtures import synth_bmp

    return synth_bmp(img, top_down)


def _make_wav16(samples_by_channel, rate):
    from prase_spark.fixtures import synth_wav16

    return synth_wav16(samples_by_channel, rate)


def test_decode_png_inverts_every_filter():
    """decode_png must invert all five PNG filter types (None/Sub/Up/
    Average/Paeth) byte-exactly, plus the RGBA-drop and gray-broadcast
    channel rules."""
    import numpy as np

    from prase_spark.datapipe.multimodal import decode_png

    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, size=(10, 7, 3), dtype=np.uint8)
    for filters in ([0], [1], [2], [3], [4], [0, 1, 2, 3, 4]):
        got = decode_png(_make_png(img, filters))
        assert np.array_equal(got, img), f"filters={filters}"
    # RGBA: alpha dropped
    rgba = rng.integers(0, 256, size=(4, 5, 4), dtype=np.uint8)
    assert np.array_equal(decode_png(_make_png(rgba, [0, 4], ctype=6)), rgba[:, :, :3])
    # grayscale: broadcast to 3 channels
    gray = rng.integers(0, 256, size=(6, 3, 1), dtype=np.uint8)
    got = decode_png(_make_png(gray, [2, 1], ctype=0))
    assert np.array_equal(got, np.repeat(gray, 3, axis=2))


def test_decode_bmp_padding_and_orientation():
    import numpy as np

    from prase_spark.datapipe.multimodal import decode_bmp

    rng = np.random.default_rng(4)
    img = rng.integers(0, 256, size=(5, 3, 3), dtype=np.uint8)  # stride pad 3->12
    assert np.array_equal(decode_bmp(_make_bmp(img)), img)
    assert np.array_equal(decode_bmp(_make_bmp(img, top_down=True)), img)


def test_decode_wav_mono_average_and_features():
    import numpy as np

    from prase_spark.datapipe.multimodal import audio_rms_features, decode_wav

    t = np.arange(1600) / 16000.0
    left = np.sin(2 * np.pi * 440 * t) * 0.5
    right = np.zeros_like(left)
    samples, rate = decode_wav(_make_wav16([left, right], 16000))
    assert rate == 16000 and len(samples) == 1600
    # stereo averaged to mono: amplitude halves
    assert abs(float(np.max(samples)) - 0.25) < 0.01
    rms = audio_rms_features(samples, n=16)
    assert len(rms) == 16 and all(0.1 < v < 0.3 for v in rms)


def test_decode_media_features_real_and_fallback(spark):
    """decode_media_features: REAL pixel/sample decode for PNG/BMP/WAV
    (decoded=true, real thumbnail/RMS features), deterministic stub with
    decoded=false for DCT-coded formats (a minimal JPEG header here)."""
    import numpy as np

    from prase_spark.datapipe.multimodal import MEDIA, decode_media_features

    rng = np.random.default_rng(6)
    img = rng.integers(0, 256, size=(16, 16, 3), dtype=np.uint8)
    png, bmp = _make_png(img, [0, 1, 2, 3, 4]), _make_bmp(img)
    wav = _make_wav16([np.sin(np.arange(800) / 5.0) * 0.4], 8000)
    # SOI + SOF0 carrying 50x100 dims but NO scan data: probed fine,
    # decode degrades to the stub path (truncated payloads never crash)
    jpg = (b"\xff\xd8\xff\xc0" + (9).to_bytes(2, "big") + b"\x08"
           + (50).to_bytes(2, "big") + (100).to_bytes(2, "big") + b"\x01" + b"\x00" * 4)
    from prase_spark.fixtures import synth_jpeg

    jpg_real = synth_jpeg(img)  # same pixels as the PNG/BMP, 4:4:4 q=1
    rows = [
        (0, "image", bytearray(png), "image/png", None, None, None),
        (1, "image", bytearray(bmp), "image/bmp", None, None, None),
        (2, "audio", bytearray(wav), "audio/wav", None, None, None),
        (3, "image", bytearray(jpg), "image/jpeg", None, None, None),
        (4, "image", bytearray(jpg_real), "image/jpeg", None, None, None),
    ]
    got = {
        r["media_id"]: r
        for r in decode_media_features(
            spark.createDataFrame(rows, MEDIA), thumb=4
        ).collect()
    }
    assert got[0]["decoded"] and got[0]["fmt"] == "png"
    assert got[0]["width"] == 16 and got[0]["height"] == 16
    assert got[1]["decoded"] and got[1]["fmt"] == "bmp"
    # PNG and BMP carry the SAME pixels -> identical real features
    assert got[0]["features"] == got[1]["features"]
    assert len(got[0]["features"]) == 16 and all(0 <= v <= 1 for v in got[0]["features"])
    assert got[2]["decoded"] and got[2]["sample_rate"] == 8000
    assert not got[3]["decoded"] and got[3]["fmt"] == "jpeg"
    assert got[3]["features"] and len(got[3]["features"]) == 4
    # a REAL baseline JPEG decodes for real now (round 5); q=1 4:4:4 is
    # near-lossless, so the thumbnail features sit within a few grey
    # levels of the PNG's
    assert got[4]["decoded"] and got[4]["fmt"] == "jpeg"
    assert got[4]["width"] == 16 and got[4]["height"] == 16
    assert all(
        abs(a - b) <= 4.0 / 255.0
        for a, b in zip(got[4]["features"], got[0]["features"])
    )


def test_media_decode_checksums_integer_sinks(spark):
    """media_decode_checksums: exact-integer n_units/checksum for every
    codec-free format, NULLs (never silence) for entropy-coded ones."""
    import numpy as np

    from prase_spark.datapipe.multimodal import MEDIA, media_decode_checksums
    from prase_spark.fixtures import synth_bmp, synth_jpeg, synth_png, synth_wav16_raw

    img = np.arange(4 * 5 * 3, dtype=np.uint8).reshape(4, 5, 3)
    ints = np.array([0, 100, -100, 32767, -32768, 7])
    # per-8x8-block constant gray -> baseline JPEG decodes EXACTLY
    jimg = np.array(
        [[(41 + (y // 8) * 5 + (x // 8) * 3) % 256 for x in range(11)]
         for y in range(9)],
        dtype=np.uint8,
    )
    rows = [
        (0, "image", bytearray(synth_png(img, (4, 3))), None, None, None, None),
        (1, "image", bytearray(synth_bmp(img, top_down=True)), None, None, None, None),
        (2, "audio", bytearray(synth_wav16_raw(ints, 8000)), None, None, None, None),
        (3, "image", b"\xff\xd8\xff\xe0" + bytes(10), None, None, None, None),  # truncated JPEG
        (4, "image", b"GIF89a" + bytes(10), None, None, None, None),    # malformed GIF
        (5, "image", bytearray(synth_jpeg(jimg)), None, None, None, None),
    ]
    got = {
        r["media_id"]: (r["fmt"], r["n_units"], r["checksum"])
        for r in media_decode_checksums(
            spark.createDataFrame(rows, MEDIA)
        ).collect()
    }

    def wsum(vals):
        v = np.asarray(vals, dtype=np.int64).reshape(-1)
        w = np.arange(v.size, dtype=np.int64) % 10007 + 1
        return int(((w * v) % 1_000_000_007).sum())

    pix_sum = wsum(img)
    assert got[0] == ("png", 20, pix_sum)
    assert got[1] == ("bmp", 20, pix_sum)
    # int16 extremes recovered exactly through the /32768 normalization
    assert got[2] == ("wav", 6, wsum(ints.astype(np.int64) ** 2))
    assert got[3] == ("jpeg", None, None)  # truncated payloads degrade, never crash
    assert got[4] == ("gif", None, None)  # malformed payloads degrade, never crash
    # block-constant baseline JPEG: round trip is pixel-exact, so the
    # checksum equals the arithmetic over the source gray replicated x3
    assert got[5] == ("jpeg", 9 * 11, wsum(np.repeat(jimg[:, :, None], 3, axis=2)))
    # position weighting: a flipped image must NOT collide
    assert pix_sum != wsum(img[::-1])


def test_decode_gif_lzw_roundtrip():
    """decode_gif must invert a REAL LZW encoder (dictionary growth,
    multiple code-width bumps, giflib bump timing) across palette sizes,
    interlace, and local-color-table placement — and agree with the
    palette-applied index array exactly."""
    import numpy as np

    from prase_spark.datapipe.multimodal import decode_gif
    from prase_spark.fixtures import synth_gif

    rng = np.random.default_rng(9)
    for ncol, h, w in ((2, 7, 5), (8, 16, 11), (16, 60, 50), (64, 23, 37)):
        palette = rng.integers(0, 256, size=(ncol, 3), dtype=np.uint8)
        idx = rng.integers(0, ncol, size=(h, w), dtype=np.uint8)
        expect = palette[idx.astype(int)]
        for kwargs in ({}, {"interlace": True}, {"local_table": True},
                       {"interlace": True, "local_table": True}):
            got = decode_gif(synth_gif(idx, palette, **kwargs))
            assert np.array_equal(got, expect), (ncol, h, w, kwargs)
    # structured (compressible) content: long runs exercise deep
    # dictionary chains rather than mostly-literal codes
    palette = rng.integers(0, 256, size=(4, 3), dtype=np.uint8)
    idx = np.repeat(np.arange(4, dtype=np.uint8), 500).reshape(20, 100)
    assert np.array_equal(decode_gif(synth_gif(idx, palette)), palette[idx.astype(int)])


def test_decode_gif_through_spark_plumbing(spark):
    """GIF now rides the decoded=true path of decode_media_features and
    produces real checksums in media_decode_checksums."""
    import numpy as np

    from prase_spark.datapipe.multimodal import MEDIA, media_decode_checksums
    from prase_spark.fixtures import synth_gif

    rng = np.random.default_rng(10)
    palette = rng.integers(0, 256, size=(8, 3), dtype=np.uint8)
    idx = rng.integers(0, 8, size=(9, 13), dtype=np.uint8)
    rows = [(0, "image", bytearray(synth_gif(idx, palette)), "image/gif",
             None, None, None)]
    got = media_decode_checksums(spark.createDataFrame(rows, MEDIA)).first()
    assert got["fmt"] == "gif" and got["n_units"] == 9 * 13
    flat = palette[idx.astype(int)].astype(np.int64).reshape(-1)
    w = np.arange(flat.size, dtype=np.int64) % 10007 + 1
    assert got["checksum"] == int(((w * flat) % 1_000_000_007).sum())


def test_decode_operators_survive_hostile_payloads(spark):
    """Corrupt/truncated/adversarial payloads (the crawl reality) must
    degrade to fallback rows — never raise out of the Spark task. Covers
    truncated walks (IndexError class), corrupt deflate (zlib.error),
    lying chunk sizes, and random garbage under every magic prefix."""
    import numpy as np

    from prase_spark.datapipe.multimodal import (
        MEDIA,
        decode_media_features,
        media_decode_checksums,
    )
    from prase_spark.fixtures import synth_gif, synth_png

    rng = np.random.default_rng(12)
    img = rng.integers(0, 256, size=(6, 6, 3), dtype=np.uint8)
    pal = rng.integers(0, 256, size=(8, 3), dtype=np.uint8)
    good_png = synth_png(img, (0, 1, 2, 3, 4))
    good_gif = synth_gif(rng.integers(0, 8, size=(6, 6), dtype=np.uint8), pal)
    hostile = [
        good_png[: len(good_png) // 2],          # truncated mid-IDAT
        good_png[:33] + b"\x00" * 40,            # IHDR ok, corrupt deflate
        good_gif[: len(good_gif) - 10],           # truncated LZW sub-blocks
        good_gif[:13] + bytes(5),                 # truncated color table
        b"BM" + bytes(60),                        # zeroed BMP header (bpp=0)
        b"RIFF\xff\xff\xff\xffWAVE" + bytes(4),  # lying RIFF size
        b"\x89PNG\r\n\x1a\n",                  # signature only
        bytes(rng.integers(0, 256, size=200, dtype=np.uint8).tolist()),
    ]
    rows = [
        (i, "image", bytearray(b), None, None, None, None)
        for i, b in enumerate(hostile)
    ]
    df = spark.createDataFrame(rows, MEDIA)
    feats = decode_media_features(df).collect()
    sums = media_decode_checksums(df).collect()
    assert len(feats) == len(sums) == len(hostile)
    assert not any(r["decoded"] for r in feats)
    assert all(r["checksum"] is None for r in sums)


def test_decontaminate_bloom_equals_exact(spark):
    """The Bloom-prefiltered path must be OUTPUT-IDENTICAL to the exact
    broadcast path (no false negatives by construction; false positives
    removed by the exact verify join) — including at an absurdly small
    m_bits where nearly every Bloom probe passes."""
    from prase_spark.datapipe.decontam import decontaminate, decontaminate_bloom

    evals = spark.createDataFrame(
        [("what is the capital city of france exactly",), ("short question",)],
        "text STRING",
    )
    train = spark.createDataFrame(
        [
            (0, "intro text then what is the capital city of france exactly end"),
            (1, "a completely unrelated document about spark shuffles and joins"),
            (2, "short question"),
            (3, "another clean doc with plenty of words that overlap nothing"),
        ],
        "doc_id LONG, text STRING",
    )
    exact = {tuple(r) for r in decontaminate(train, evals, n=5).collect()}
    for m_bits in (1 << 20, 64):  # realistic and degenerate-saturated
        bloom = {
            tuple(r)
            for r in decontaminate_bloom(train, evals, n=5, m_bits=m_bits).collect()
        }
        assert bloom == exact, m_bits


def test_bloom_bits_table_shape_and_validation(spark):
    from prase_spark.datapipe.decontam import bloom_bits_table
    import pytest as _pytest

    sh = spark.createDataFrame([("a b c",), ("d e f",)], "shingle STRING")
    bits = bloom_bits_table(sh, 1 << 12, k=3).collect()
    assert 0 < len(bits) <= (1 << 12) // 64
    assert all(0 <= r["word"] < (1 << 12) // 64 for r in bits)
    with _pytest.raises(ValueError):
        bloom_bits_table(sh, 100)  # not a multiple of 64


def test_ivf_index_save_load_roundtrip_equals_inline(spark, tmp_path):
    """build -> save (cell-partitioned) -> load -> search must equal the
    inline ivf_topk on the same injected quantizer, and the persisted
    layout must expose cell= partition directories for pruning."""
    import numpy as np

    from prase_spark.datapipe.simsearch import (
        build_ivf_index,
        ivf_topk,
        load_ivf_index,
        save_ivf_index,
        search_ivf_index,
    )

    rng = np.random.RandomState(7)
    corpus = spark.createDataFrame(
        [(i, rng.randn(8).tolist()) for i in range(200)],
        "vec_id LONG, embedding ARRAY<DOUBLE>",
    )
    queries = spark.createDataFrame(
        [(i, rng.randn(8).tolist()) for i in range(5)],
        "query_id LONG, embedding ARRAY<DOUBLE>",
    )
    cents = rng.randn(8, 8)

    inline = {
        (r["query_id"], r["rank"]): r["vec_id"]
        for r in ivf_topk(corpus, queries, k=5, n_cells=8, centroids=cents).collect()
    }

    c0, assign = build_ivf_index(corpus, n_cells=8, centroids=cents)
    path = str(tmp_path / "ivf")
    save_ivf_index(path, c0, assign)
    assert any(
        p.name.startswith("cell=") for p in (tmp_path / "ivf" / "assignments").iterdir()
    )
    c1, loaded = load_ivf_index(spark, path)
    assert np.allclose(c0, c1)
    via_store = {
        (r["query_id"], r["rank"]): r["vec_id"]
        for r in search_ivf_index(c1, loaded, queries, k=5).collect()
    }
    assert via_store == inline


def test_intra_doc_repetition_python_oracle(spark):
    from collections import Counter

    from prase_spark.datapipe.textstats import intra_doc_repetition

    texts = {
        1: "a b a b a b c\nfooter\nfooter\nbody line",
        2: "x x x x x",
        3: "all distinct words here now",
        4: "",
        5: "one",
        6: "Tab\tand punct, stay; lines\n\nempty kept out",
    }
    d = spark.createDataFrame(list(texts.items()), "doc_id LONG, text STRING")
    got = {r.key: (r.dup_line_pct_e4, r.top_bigram_share_e4,
                   r.dup_trigram_share_e4)
           for r in intra_doc_repetition(d).collect()}

    def toks(t):
        import re
        return [w for w in re.sub(r"[^a-z0-9\s]", " ", t.lower()).split() if w]

    def pct(num, den):
        return (2 * num * 10000 + den) // (2 * den) if den else 0

    for k, t in texts.items():
        lines = [x for x in t.split("\n") if x]
        ws = toks(t)
        bg = [" ".join(p) for p in zip(ws, ws[1:])]
        tg = [" ".join(p) for p in zip(ws, ws[1:], ws[2:])]
        maxrun = max(Counter(bg).values()) if bg else 0
        exp = (
            pct(len(lines) - len(set(lines)), len(lines)),
            pct(maxrun, len(bg)),
            pct(len(tg) - len(set(tg)), len(tg)),
        )
        assert got[k] == exp, (k, got[k], exp)


def test_intra_doc_repetition_single_map_stage(spark):
    from prase_spark.datapipe.textstats import intra_doc_repetition

    d = spark.createDataFrame([(1, "a b c")], "doc_id LONG, text STRING")
    plan = (
        intra_doc_repetition(d)._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan  # pure per-row compute, no shuffle


def test_language_mix_python_oracle(spark):
    from collections import Counter

    from prase_spark.datapipe.textstats import language_mix

    texts = {
        1: "the cat is on the mat\nder hund ist nicht das\nthe dog is in the fog",
        2: "le chat est dans la maison\nle chien est dans le jardin",
        3: "xyzzy qwerty\nasdf ghjk",
        4: "",
        5: "el perro es de los que\nder und die das ist\nle la les et des est\nthe and of to in is",
    }
    d = spark.createDataFrame(list(texts.items()), "doc_id LONG, text STRING")
    got = {r.key: tuple(r)[1:] for r in language_mix(d).collect()}
    assert got[1] == (3, 2, "en", 6667)
    assert got[2] == (2, 1, "fr", 10000)
    assert got[3] == (2, 1, "und", 10000)
    assert got[4] == (0, 0, "und", 0)
    # 4-way tie -> lexicographically smallest language wins
    assert got[5] == (4, 4, "de", 2500)


def test_language_mix_shuffle_free(spark):
    from prase_spark.datapipe.textstats import language_mix

    d = spark.createDataFrame([(1, "a\nb")], "doc_id LONG, text STRING")
    plan = language_mix(d)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_cap_per_group(spark):
    """Anti-dominance cap: top-k per group by order col, deterministic
    key tie-break, NULL order values last, whole-row passthrough."""
    import pytest as _pytest
    from pyspark.sql import functions as F

    from prase_spark.datapipe.sampling import cap_per_group

    rows = [
        (1, "a", 100), (2, "a", 300), (3, "a", 200), (4, "a", 300),
        (5, "b", 50), (6, "b", None), (7, "c", 10),
    ]
    d = spark.createDataFrame(rows, "doc_id long, host string, score int")
    got = sorted(
        r["doc_id"]
        for r in cap_per_group(d, "host", 2, order_col="score").collect()
    )
    # a: scores 300(2),300(4),200(3),100(1) -> keep 2,4 (tie -> min id)
    # b: 50 then NULL-last -> keep both; c: keep 7
    assert got == [2, 4, 5, 6, 7]
    asc = sorted(
        r["doc_id"]
        for r in cap_per_group(d, "host", 1, order_col="score", descending=False).collect()
    )
    assert asc == [1, 5, 7]  # ascending keeps the smallest score, NULL still last
    keyed = sorted(
        r["doc_id"] for r in cap_per_group(d, "host", 1).collect()
    )
    assert keyed == [1, 5, 7]  # no order col: stable min-key cut
    a = sorted(tuple(r) for r in cap_per_group(d, "host", 2, order_col="score").collect())
    b = sorted(tuple(r) for r in cap_per_group(d.repartition(5), "host", 2, order_col="score").collect())
    assert a == b  # partitioning invariance
    with _pytest.raises(ValueError, match="k must be"):
        cap_per_group(d, "host", 0)


def test_cap_per_group_two_phase_plan_and_skew(spark):
    """VERDICT r4 ask #8: cap_per_group runs as a TWO-PHASE partial
    top-k — phase 1 ranks within (group, salt) shards so a hot group
    never fully sorts in one window partition; phase 2 re-ranks only the
    shard survivors. Pins the plan shape (a window partitioned by the
    salt before the final group window) and value-equality with a
    brute-force reference on a skewed fixture."""
    from pyspark.sql import functions as F

    from prase_spark.datapipe.sampling import cap_per_group

    # one dominant group (90% of rows) + two small ones
    d = spark.range(2000).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 10 < 9, F.lit("hot.example"))
        .otherwise(F.concat(F.lit("cold"), (F.col("id") % 2).cast("string")))
        .alias("host"),
        (F.col("id") * 37 % 101).alias("score"),
    )
    out = cap_per_group(d, "host", 5, order_col="score")
    plan = out._jdf.queryExecution().executedPlan().toString()
    norm = plan.replace(" ", "").lower()
    specs = norm.split("windowspecdefinition(")[1:]
    assert len(specs) == 2, plan
    assert any("__salt" in s.split(")")[0][:80] for s in specs), plan
    got = sorted((r["doc_id"], r["host"]) for r in out.collect())
    # brute-force reference: global (score DESC, doc_id ASC) top-5/group
    ref = []
    rows = d.collect()
    for h in {r["host"] for r in rows}:
        grp = sorted(
            (r for r in rows if r["host"] == h),
            key=lambda r: (-r["score"], r["doc_id"]),
        )[:5]
        ref.extend((r["doc_id"], h) for r in grp)
    assert got == sorted(ref)
    # salt granularity doesn't change the answer
    alt = sorted(
        (r["doc_id"], r["host"])
        for r in cap_per_group(d, "host", 5, order_col="score", salt_buckets=7).collect()
    )
    assert alt == got


def test_png_palette_bitdepth_adam7_profiles(spark):
    """Round 5: decode_png covers the full common web profile — palette
    (PLTE) at 1/2/4/8-bit, bit-packed gray, gray+alpha, and Adam7
    interlace — all round-tripped through the synth_png encoder."""
    import numpy as np

    from prase_spark.datapipe.multimodal import decode_png
    from prase_spark.fixtures import synth_png

    rng = np.random.RandomState(5)
    img = rng.randint(0, 256, (13, 9, 3), dtype=np.uint8)
    assert np.array_equal(decode_png(synth_png(img, interlace=True)), img)
    pal = rng.randint(0, 256, (17, 3), dtype=np.uint8)
    idx = rng.randint(0, 17, (11, 14), dtype=np.uint8)
    assert np.array_equal(decode_png(synth_png(idx, ctype=3, palette=pal)), pal[idx])
    pal4 = rng.randint(0, 256, (16, 3), dtype=np.uint8)
    idx4 = rng.randint(0, 16, (10, 13), dtype=np.uint8)
    assert np.array_equal(
        decode_png(synth_png(idx4, ctype=3, palette=pal4, depth=4, interlace=True)),
        pal4[idx4],
    )
    pal1 = np.array([[255, 0, 0], [0, 0, 255]], dtype=np.uint8)
    idx1 = rng.randint(0, 2, (9, 17), dtype=np.uint8)
    assert np.array_equal(
        decode_png(synth_png(idx1, ctype=3, palette=pal1, depth=1)), pal1[idx1]
    )
    g2 = rng.randint(0, 4, (7, 11), dtype=np.uint8)
    assert np.array_equal(
        decode_png(synth_png(g2, ctype=0, depth=2)),
        np.repeat((g2 * 85)[:, :, None], 3, axis=2),
    )
    ga = rng.randint(0, 256, (8, 8, 2), dtype=np.uint8)
    assert np.array_equal(
        decode_png(synth_png(ga, ctype=4)), np.repeat(ga[:, :, :1], 3, axis=2)
    )
    a = rng.randint(0, 256, (16, 16, 4), dtype=np.uint8)
    assert np.array_equal(
        decode_png(synth_png(a, ctype=6, interlace=True)), a[:, :, :3]
    )
    # 16-bit stays a declared boundary
    import pytest as _pytest

    blob = bytearray(synth_png(img))
    sig_ihdr = blob.find(b"IHDR")
    blob[sig_ihdr + 12] = 16  # depth byte
    with _pytest.raises(NotImplementedError, match="depth=16"):
        decode_png(bytes(blob))


# --- random projection (JL) --------------------------------------------------


def test_random_projection_matches_python_fold_exactly(spark):
    from prase_spark.datapipe.simsearch import projection_signs, random_projection

    import numpy as np

    rng = np.random.default_rng(5)
    mat = rng.normal(size=(20, 12))
    df = spark.createDataFrame(
        [(i, [float(x) for x in row]) for i, row in enumerate(mat)],
        "vec_id LONG, embedding ARRAY<DOUBLE>",
    )
    signs = projection_signs(12, 4, seed=9)
    got = {
        r["vec_id"]: list(r["proj"])
        for r in random_projection(df, signs).collect()
    }
    want = {}
    for i, v in enumerate(mat):
        out = []
        for row in signs:
            acc = 0.0
            for x, s in zip(v, row):
                acc = acc + x * float(s)
            out.append(acc)
        want[i] = out
    assert got == want  # bit-exact same-fold sums


def test_random_projection_preserves_cosine_approximately(spark):
    from prase_spark.datapipe.simsearch import projection_signs, random_projection

    import numpy as np

    rng = np.random.default_rng(11)
    base = rng.normal(size=64)
    near = base + rng.normal(scale=0.1, size=64)
    far = rng.normal(size=64)
    df = spark.createDataFrame(
        [(0, [float(x) for x in base]), (1, [float(x) for x in near]),
         (2, [float(x) for x in far])],
        "vec_id LONG, embedding ARRAY<DOUBLE>",
    )
    signs = projection_signs(64, 16)
    rows = {r["vec_id"]: np.asarray(r["proj"]) for r in random_projection(df, signs).collect()}

    def cos(a, b):
        return float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))

    assert cos(rows[0], rows[1]) > 0.8
    assert cos(rows[0], rows[1]) > cos(rows[0], rows[2]) + 0.3


def test_projection_signs_balanced_and_distinct():
    from prase_spark.datapipe.simsearch import projection_signs

    signs = projection_signs(64, 16)
    ones = sum(1 for row in signs for s in row if s == 1)
    assert 400 <= ones <= 624  # balanced-ish out of 1024
    assert len({tuple(r) for r in signs}) == 16  # no column collapse


# --- content-defined chunking ------------------------------------------------


def _cdc_py(texts, divisor):
    import re

    from prase_spark.datapipe.hashing import POLY_INIT, POLY_MULT, POLY_P
    from prase_spark.datapipe.sketches import KMV_FIN_ADD

    def poly(s):
        h = POLY_INIT
        for ch in s:
            h = (h * POLY_MULT + ord(ch)) % POLY_P
        return h

    out = {}
    for key, text in texts:
        toks = [w for w in re.split(r"[^a-z0-9]+", text.lower()) if w]
        if not toks:
            continue
        chunks = {}
        c = 0
        for j, w in enumerate(toks):
            f = (poly(w) ** 2 + KMV_FIN_ADD) % POLY_P
            if j > 0 and f % divisor == 0:
                c += 1
            chunks.setdefault(c, []).append(w)
        for cid, ws in chunks.items():
            out[(key, cid)] = (len(ws), " ".join(ws))
    return out


def test_cdc_chunks_match_python_replica(spark):
    from prase_spark.datapipe.chunking import cdc_chunks

    texts = [
        (1, "the data table joins the fast data row with key order data"),
        (2, "window scan merge"),
        (3, ""),
    ]
    df = spark.createDataFrame(texts, "doc_id LONG, text STRING")
    got = {
        (r["key"], r["chunk_id"]): (r["n_tokens"], r["chunk_text"])
        for r in cdc_chunks(df, divisor=16).collect()
    }
    assert got == _cdc_py(texts, 16)
    assert len({k[0] for k in got}) == 2  # empty doc drops


def test_cdc_chunks_edit_stability(spark):
    from prase_spark.datapipe.chunking import cdc_chunks

    base = "alpha beta data gamma delta epsilon data zeta eta theta"
    edited = base.replace("gamma", "gammaX")  # one token changed
    df = spark.createDataFrame(
        [(1, base), (2, edited)], "doc_id LONG, text STRING"
    )
    got = {
        (r["key"], r["chunk_id"]): r["chunk_text"]
        for r in cdc_chunks(df, divisor=16).collect()
    }
    # 'data' is a boundary word at divisor 16: both docs share the same
    # chunk structure, and the chunks NOT containing the edit are
    # byte-identical between the two docs
    c1 = {v for (k, _), v in got.items() if k == 1}
    c2 = {v for (k, _), v in got.items() if k == 2}
    assert len(c1 & c2) >= 2  # unchanged chunks survive the edit
    assert c1 != c2


def test_cdc_chunks_partitioning_and_validation(spark):
    from prase_spark.datapipe.chunking import cdc_chunks

    texts = [(i, f"data w{i} the fast data key w{i * 3} order") for i in range(40)]
    df = spark.createDataFrame(texts, "doc_id LONG, text STRING")
    a = {tuple(r) for r in cdc_chunks(df, divisor=8).collect()}
    b = {tuple(r) for r in cdc_chunks(df.repartition(7), divisor=8).collect()}
    assert a == b
    import pytest as _pytest

    with _pytest.raises(ValueError):
        cdc_chunks(df, divisor=1)
