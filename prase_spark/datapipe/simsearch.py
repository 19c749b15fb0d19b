"""Similarity search over embedding columns (array<float>).

- cosine_topk: brute-force top-k per query (baseline / oracle path) —
  native cosine (zip_with/aggregate), broadcast queries, max_by-k.
- lsh_topk: random-hyperplane-blocked approximate top-k (scale path).
- ivf_topk: inverted-file variant — coarse centroids via deterministic
  seeded sampling, probe nearest cells only.

Scale posture: queries are broadcast (small side); corpus never self-joins;
LSH/IVF bound candidates per query so the shuffle is O(corpus), not
O(corpus x queries).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from prase_spark.datapipe.buckets import DEFAULT_MAX_BUCKET, cap_band_buckets
from prase_spark.embed import auto_band_bits, cosine_expr, hyperplane_signatures


def _resolve_bits(n_bits: int | None, n_bands: int, corpus: DataFrame) -> int:
    """n_bits=None -> size band keys to the corpus (auto_band_bits over a
    count job): a fixed key width is always wrong at SOME corpus size —
    too narrow re-admits the quadratic join, too wide wastes recall."""
    if n_bits is not None:
        return n_bits
    return auto_band_bits(corpus.count()) * n_bands


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Exact top-k by cosine: broadcast queries x corpus, window top-k.
    Returns (query_id, vec_id, cosine, rank)."""
    q = queries.select(
        F.col(query_id_col).alias("query_id"), F.col(vec_col).alias("q_vec")
    )
    c = corpus.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("c_vec"))
    scored = c.join(F.broadcast(q)).withColumn(
        "cosine", cosine_expr("q_vec", "c_vec")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "vec_id", F.col("cosine"), "rank")
    )


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 10,
    n_bits: int | None = 128,
    n_bands: int = 8,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    max_bucket_size: int | None = DEFAULT_MAX_BUCKET,
    stats_out: dict | None = None,
    multi_probe: int = 0,
) -> DataFrame:
    """Approximate top-k: candidates share ≥1 hyperplane band with the
    query, then exact cosine + window top-k on the candidate set.

    Band-width tradeoff (hyperplane_signatures docstring): 16-bit default
    keys retrieve NEAR-DUPLICATE-grade neighbors (cos ≳ 0.9) with high
    recall at 8 bands; for moderate-similarity top-k (cos ~ 0.3-0.7) the
    band-match probability collapses and the honest scale tool is ivf_topk
    (probe-bounded) — not narrower LSH keys, which re-admit the quadratic
    join. Corpus band buckets are guarded by ``max_bucket_size``.

    ``multi_probe=1`` additionally probes every 1-bit-flip neighbor of
    each QUERY band key (Lv et al.'s multi-probe idea re-expressed as a
    query-side fan-out): the corpus side — the big side — is untouched,
    the broadcast query signature table grows ×(bits_per_band+1), and the
    per-band match probability rises from p^b to p^b + b·p^(b-1)(1-p);
    at cos 0.9 / 16-bit keys / 8 bands that is ~0.49 -> ~0.94 recall.
    This is how recall is bought back at production key widths without
    re-admitting the quadratic join.

    ``n_bits=None`` auto-sizes the band keys to the corpus (one count
    job; auto_band_bits)."""
    n_bits = _resolve_bits(n_bits, n_bands, corpus)
    c_sig = cap_band_buckets(
        hyperplane_signatures(
            corpus.select(F.col(id_col).alias("ent_id"), F.col(vec_col).alias("embedding")),
            dim, n_bits, n_bands, seed,
        ),
        max_bucket_size, stats_out=stats_out, label="lsh_topk",
    ).select(F.col("ent_id").alias("vec_id"), "band", "band_key")
    q_sig = hyperplane_signatures(
        queries.select(F.col(query_id_col).alias("ent_id"), F.col(vec_col).alias("embedding")),
        dim, n_bits, n_bands, seed,
    ).select(F.col("ent_id").alias("query_id"), "band", "band_key")
    if multi_probe:
        if multi_probe != 1:
            raise ValueError("multi_probe supports 0 (off) or 1 (1-bit-flip probes)")
        bits_per_band = n_bits // n_bands
        masks = F.array(F.lit(0), *[F.lit(1 << j) for j in range(bits_per_band)])
        q_sig = q_sig.select(
            "query_id", "band",
            F.explode(masks).alias("__m"),
            "band_key",
        ).select(
            "query_id", "band",
            F.col("band_key").bitwiseXOR(F.col("__m")).alias("band_key"),
        )
    cand = c_sig.join(F.broadcast(q_sig), ["band", "band_key"]).select(
        "query_id", "vec_id"
    ).distinct()
    c = corpus.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("c_vec"))
    q = queries.select(F.col(query_id_col).alias("query_id"), F.col(vec_col).alias("q_vec"))
    scored = cand.join(c, "vec_id").join(F.broadcast(q), "query_id").withColumn(
        "cosine", cosine_expr("q_vec", "c_vec")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "vec_id", "cosine", "rank")
    )


def embedding_neardup(
    corpus: DataFrame,
    dim: int,
    threshold: float = 0.99,
    n_bits: int | None = 128,
    n_bands: int = 8,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_bucket_size: int | None = DEFAULT_MAX_BUCKET,
    stats_out: dict | None = None,
) -> DataFrame:
    """Embedding-cosine near-duplicate CLUSTERING: hyperplane-LSH-blocked
    candidate self-join -> exact native cosine verify >= threshold ->
    connected components -> keep min id per cluster.
    Returns (id_col, cluster_id, keep) for every corpus row.

    Scale posture mirrors minhash_dedup: signatures computed once
    (pinned), candidates are band equi-joins (never all-pairs) with
    16-bit default band keys (near-dup-grade cosine keeps high band-match
    probability, so recall holds where it matters; see
    hyperplane_signatures), degenerate buckets capped (``max_bucket_size``
    — all-zero vectors share every signature), each intermediate
    materialized exactly once. ``stats_out`` surfaces bucket telemetry.
    ``n_bits=None`` auto-sizes the band keys to the corpus (one count
    job)."""
    from prase_spark.matching import connected_components

    n_bits = _resolve_bits(n_bits, n_bands, corpus)
    sig = cap_band_buckets(
        hyperplane_signatures(
            corpus.select(F.col(id_col).alias("ent_id"), F.col(vec_col).alias("embedding")),
            dim, n_bits, n_bands, seed,
        ),
        max_bucket_size, stats_out=stats_out, label="embedding_neardup",
    ).localCheckpoint()
    a = sig.select(F.col("ent_id").alias("key_a"), "band", "band_key")
    b = sig.select(F.col("ent_id").alias("key_b"), "band", "band_key")
    cand = (
        a.join(b, ["band", "band_key"])
        .filter(F.col("key_a") < F.col("key_b"))
        .select("key_a", "key_b")
        .distinct()
        .localCheckpoint()
    )
    if stats_out is not None:
        # candidate volume is THE scale health metric of a banded join
        # (candidates ≪ n² or the banding isn't doing its job); cand is
        # checkpointed, so this count reads materialized blocks
        stats_out["candidate_pairs"] = cand.count()
    va = corpus.select(F.col(id_col).alias("key_a"), F.col(vec_col).alias("va"))
    vb = corpus.select(F.col(id_col).alias("key_b"), F.col(vec_col).alias("vb"))
    verified = (
        cand.join(va, "key_a")
        .join(vb, "key_b")
        .withColumn("cos", cosine_expr("va", "vb"))
        .filter(F.col("cos") >= threshold)
        .select("key_a", "key_b")
        .localCheckpoint()
    )
    comp = connected_components(verified, src="key_a", dst="key_b")
    labeled = (
        corpus.select(F.col(id_col).alias("node"))
        .join(comp, "node", "left")
        .select(
            F.col("node").alias(id_col),
            F.coalesce("component", F.col("node")).alias("cluster_id"),
        )
    )
    # cluster_id is already the component's min member id (the CC label),
    # so the representative test is a pure projection — no window shuffle.
    return labeled.withColumn("keep", F.col(id_col) == F.col("cluster_id"))


def _seeded_centroids(corpus_pd: np.ndarray, n_cells: int, seed: int) -> np.ndarray:
    rng = np.random.default_rng(seed)
    idx = rng.choice(len(corpus_pd), size=min(n_cells, len(corpus_pd)), replace=False)
    cents = corpus_pd[idx]
    return cents / np.maximum(np.linalg.norm(cents, axis=1, keepdims=True), 1e-12)


def _centroid_df(spark, cents: np.ndarray):
    rows = [(i, [float(x) for x in cents[i]]) for i in range(len(cents))]
    return spark.createDataFrame(rows, "cell INT, c_vec ARRAY<DOUBLE>")


def train_ivf_centroids(
    corpus: DataFrame,
    n_cells: int = 16,
    iters: int = 2,
    seed: int = 42,
    sample_cap: int = 4096,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> np.ndarray:
    """Distributed Lloyd refinement of the IVF coarse quantizer (spherical
    k-means): seeded-sample init, then ``iters`` rounds of
    assign (broadcast-centroid cosine argmax) -> per-cell mean (posexplode
    + ONE hash aggregation over corpus×dim rows) -> renormalize. Only
    n_cells×dim rows ever reach the driver per round — this is the
    k-means|| shape that replaces the sample-only centroids at cluster
    scale. Empty cells keep their previous centroid."""
    spark = corpus.sparkSession
    sample = corpus.select(vec_col).limit(sample_cap).collect()
    mat = np.asarray([r[vec_col] for r in sample], dtype=np.float64)
    cents = _seeded_centroids(mat, n_cells, seed)
    c = corpus.select(F.col(id_col).alias("vid"), F.col(vec_col).alias("v"))
    for _ in range(iters):
        cent_df = _centroid_df(spark, cents)
        assign = (
            c.join(F.broadcast(cent_df))
            .withColumn("sim", cosine_expr("v", "c_vec"))
            .groupBy("vid")
            .agg(
                F.max_by("cell", F.struct("sim", (-F.col("cell")).alias("nc"))).alias("cell"),
                F.first("v").alias("v"),
            )
        )
        sums = (
            assign.select("cell", F.posexplode("v").alias("pos", "x"))
            .groupBy("cell", "pos")
            .agg(F.sum("x").alias("s"), F.count("*").alias("n"))
            .collect()
        )
        new = cents.copy()
        acc: dict[int, np.ndarray] = {}
        for r in sums:
            acc.setdefault(r["cell"], np.zeros(cents.shape[1]))[r["pos"]] = r["s"] / r["n"]
        for cell, vec in acc.items():
            nrm = np.linalg.norm(vec)
            if nrm > 1e-12:
                new[cell] = vec / nrm
        cents = new
    return cents


def build_ivf_index(
    corpus: DataFrame,
    n_cells: int = 16,
    seed: int = 42,
    sample_cap: int = 4096,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    train_iters: int = 0,
    centroids: np.ndarray | None = None,
) -> tuple[np.ndarray, DataFrame]:
    """Build the IVF index ONCE: (centroids, assignments) where
    assignments is (vec_id, cell, v). The production shape is build →
    :func:`save_ivf_index` (cell-partitioned parquet) → many
    :func:`search_ivf_index` calls over the persisted table with
    partition pruning; :func:`ivf_topk` composes build+search inline for
    one-shot use. Centroid source precedence: injected ``centroids`` >
    ``train_iters`` Lloyd rounds > deterministic seeded sample."""
    if centroids is not None:
        cents = np.asarray(centroids, dtype=np.float64)
    elif train_iters > 0:
        cents = train_ivf_centroids(
            corpus, n_cells, train_iters, seed, sample_cap, id_col, vec_col
        )
    else:
        sample = corpus.select(vec_col).limit(sample_cap).collect()
        mat = np.asarray([r[vec_col] for r in sample], dtype=np.float64)
        cents = _seeded_centroids(mat, n_cells, seed)
    cent_df = _centroid_df(corpus.sparkSession, cents)
    c = corpus.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("v"))
    assign = (
        c.join(F.broadcast(cent_df))
        .withColumn("sim", cosine_expr("v", "c_vec"))
        .groupBy("vec_id")
        .agg(
            F.max_by("cell", F.struct("sim", (-F.col("cell")).alias("nc"))).alias("cell"),
            F.first("v").alias("v"),
        )
    )
    return cents, assign


def save_ivf_index(path: str, cents: np.ndarray, assign: DataFrame) -> None:
    """Persist the index: centroids as one small parquet, assignments
    partitioned BY CELL — a probe that touches n_probe cells then reads
    only those directories (static partition pruning via
    search_ivf_index's cell filter)."""
    spark = assign.sparkSession
    _centroid_df(spark, cents).write.mode("overwrite").parquet(f"{path}/centroids")
    assign.write.mode("overwrite").partitionBy("cell").parquet(f"{path}/assignments")


def load_ivf_index(spark, path: str) -> tuple[np.ndarray, DataFrame]:
    rows = spark.read.parquet(f"{path}/centroids").orderBy("cell").collect()
    cents = np.asarray([r["c_vec"] for r in rows], dtype=np.float64)
    return cents, spark.read.parquet(f"{path}/assignments")


def search_ivf_index(
    cents: np.ndarray,
    assign: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_probe: int = 4,
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Probe a built (or loaded) IVF index: n_probe nearest cells per
    query, exact cosine re-rank inside them. The probed cell ids (a
    driver-bounded set, <= n_cells values) become a static ``cell IN
    (...)`` filter on the assignments scan, so a persisted index reads
    only the probed partition directories."""
    spark = assign.sparkSession
    cent_df = _centroid_df(spark, cents)
    q = queries.select(F.col(query_id_col).alias("query_id"), F.col(vec_col).alias("q_vec"))
    q_cells = (
        q.join(F.broadcast(cent_df))
        .withColumn("sim", cosine_expr("q_vec", "c_vec"))
        .withColumn(
            "rk",
            F.row_number().over(
                Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("cell"))
            ),
        )
        .filter(F.col("rk") <= n_probe)
        .select("query_id", "cell", "q_vec")
        .persist()
    )
    # static pruning: the probed cell set is driver-bounded (<= n_cells
    # values); turning it into a literal IN filter lets a cell-partitioned
    # persisted index skip unprobed partition directories entirely
    try:
        probed = [r["cell"] for r in q_cells.select("cell").distinct().collect()]
    finally:
        # release the cache immediately: the build-once/probe-many lifecycle
        # calls this repeatedly on a long-lived session, and a leaked persist
        # per search accumulates cached RDDs. The probe join below recomputes
        # q_cells lazily — a broadcast join + bounded window over the query
        # set, deterministic (row_number ties broken by cell asc), so the
        # recompute is cheap and bit-stable.
        q_cells.unpersist()
    pruned = assign.filter(F.col("cell").isin(probed))
    # broadcast the probe set: joining the corpus-sized assignment on a
    # key with only n_cells distinct values via a shuffle join is maximal
    # skew (every row lands in <= n_cells reducer groups)
    scored = pruned.join(F.broadcast(q_cells), "cell").withColumn(
        "cosine", cosine_expr("q_vec", "v")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "vec_id", "cosine", "rank")
    )


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_cells: int = 16,
    n_probe: int = 4,
    seed: int = 42,
    sample_cap: int = 4096,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    train_iters: int = 0,
    centroids: np.ndarray | None = None,
) -> DataFrame:
    """IVF one-shot: coarse-quantize corpus to its nearest centroid cell;
    probe the n_probe nearest cells per query. Composition of
    :func:`build_ivf_index` + :func:`search_ivf_index` — see those for
    the persisted-index lifecycle. Cell assignment and probe selection
    tie-break on the lower cell id, so the result is deterministic across
    retries and engines (the value oracle injects ``centroids``)."""
    cents, assign = build_ivf_index(
        corpus, n_cells, seed, sample_cap, id_col, vec_col, train_iters, centroids
    )
    return search_ivf_index(
        cents, assign, queries, k, n_probe, vec_col, query_id_col
    )


# --- random projection (JL transform) ----------------------------------------

#: modulus family of the shared-arithmetic sign generator (poly_hash61's
#: Mersenne prime).
_RP_P = (1 << 61) - 1
_RP_FIN = 2654435769


def projection_signs(in_dim: int, out_dim: int, seed: int = 42) -> list[list[int]]:
    """Deterministic Rademacher sign matrix (out_dim x in_dim of +-1)
    from pure integer arithmetic — the same numbers in any language, so
    the DuckDB twin can re-derive it (or consume the identical literal).
    Generator: h = ((i*1000003 + 17 + seed) * (j*999983 + 29)) mod P,
    then the quadratic finalizer (h^2 + c) mod P, sign = parity. The
    affine-only / affine-then-square variants collapse to <=2 distinct
    columns (measured); the cross-term product is what scrambles."""
    out = []
    for j in range(out_dim):
        row = []
        for i in range(in_dim):
            h = ((i * 1000003 + 17 + seed) * (j * 999983 + 29)) % _RP_P
            h = (h * h + _RP_FIN) % _RP_P
            row.append(1 if h % 2 else -1)
        out.append(row)
    return out


def random_projection(
    corpus: DataFrame,
    signs: list[list[int]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    out_col: str = "proj",
) -> DataFrame:
    """(id, proj): Johnson-Lindenstrauss random projection to
    len(signs) dimensions via a +-1 sign matrix — the dimensionality
    cut in front of LSH/IVF/PQ when the source embeddings are wide
    (cosine is scale-invariant, so the unscaled +-1 sums preserve
    angles; multiply by 1/sqrt(k) only if you need norms).

    The matrix rides the PLAN as a literal (out_dim x in_dim doubles —
    a few KB), so the projection is one whole-stage-codegen projection:
    per output dim, a zip_with multiply + left-fold sum. No shuffle, no
    Python, no per-row hashing; the same literal fold is the DuckDB
    twin, so projected values are bit-identical (same-fold doctrine)."""
    lit = (
        "array("
        + ", ".join(
            "array(" + ", ".join(f"{float(s)}" for s in row) + ")"
            for row in signs
        )
        + ")"
    )
    proj = F.expr(
        f"transform({lit}, srow -> aggregate(zip_with({vec_col}, srow, "
        "(x, s) -> x * s), CAST(0.0 AS DOUBLE), (acc, x) -> acc + x))"
    )
    return corpus.select(F.col(id_col).alias("vec_id"), proj.alias(out_col))
