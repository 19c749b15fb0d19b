"""Product quantization for embedding-scale ANN (Jégou et al. 2011).

The IVF index (simsearch.py) prunes WHICH vectors a query scans; PQ
compresses WHAT is scanned: each d-dim vector becomes ``m`` one-byte
codes (one per d/m-dim subspace, each quantized against its own
``ksub``-centroid codebook), a 32x-128x memory cut that is what lets a
10^11-vector corpus live in cluster RAM. Search is asymmetric distance
computation (ADC): the query builds an m x ksub lookup table of exact
subspace distances once, and every corpus vector scores as m table
lookups summed — no float vector is ever touched at scan time.

Scale shape:
- encoding: corpus explodes to m sub-vector rows (plan-level slice, no
  data copy), equi-joins the BROADCAST codebook (m*ksub rows), argmins
  per (vec, subspace) with a map-side-combinable min_by, reassembles
  per vec — two hash aggregations, 8-byte-dominated shuffles.
- training: per-subspace Lloyd rounds in the train_ivf_centroids mold —
  assignments distributed, only m*ksub*dsub mean-component rows reach
  the driver per round; all m subspaces train in ONE job per round
  (the subspace id is just another grouping key).
- ADC: the LUT is m*ksub doubles broadcast as a literal expression; the
  scan is one codegen projection + a top-k (orderBy-limit with vec_id
  tie-break).

Determinism: given a codebook, encoding is a pure argmin of left-fold
IEEE double sums (same-fold doctrine — the gate injects an
arithmetic-constructed codebook and DuckDB replays slice/fold/argmin
bit-identically; float ties between distinct codes are measure-zero,
broken code-ASC). Training is driver-seeded numpy like the IVF
quantizer: deterministic for a fixed seed, pytest-verified rather than
SQL-gated (the transcendental discipline).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _sub_dist(sv: str, c: str):
    """Left-fold squared L2 between two array columns — the shared-fold
    expression the DuckDB twin replays exactly."""
    return F.aggregate(
        F.zip_with(F.col(sv), F.col(c), lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def pq_codebook_df(spark, books: np.ndarray) -> DataFrame:
    """(subspace, code, c): DataFrame form of an (m, ksub, dsub)
    codebook array."""
    m, ksub, _ = books.shape
    rows = [
        (s, k, [float(x) for x in books[s, k]])
        for s in range(m)
        for k in range(ksub)
    ]
    return spark.createDataFrame(rows, "subspace INT, code INT, c ARRAY<DOUBLE>")


def pq_encode(
    corpus: DataFrame,
    codebook: DataFrame,
    m: int,
    dsub: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(vec_id, codes): each vector's m nearest-subspace-centroid codes,
    ordered by subspace. Ties break code-ASC (total order)."""
    if m < 1 or dsub < 1:
        raise ValueError(f"m and dsub must be >= 1, got {m}, {dsub}")
    subs = corpus.select(
        F.col(id_col).alias("vec_id"),
        F.explode(
            F.expr(
                f"transform(sequence(0, {m - 1}), s -> "
                f"struct(s AS subspace, slice({vec_col}, s * {dsub} + 1, {dsub}) AS sv))"
            )
        ).alias("e"),
    ).select("vec_id", "e.subspace", "e.sv")
    best = (
        subs.join(F.broadcast(codebook), "subspace")
        .withColumn("dist", _sub_dist("sv", "c"))
        .groupBy("vec_id", "subspace")
        .agg(F.min_by("code", F.struct("dist", "code")).alias("code"))
    )
    return best.groupBy("vec_id").agg(
        F.expr(
            "transform(sort_array(collect_list(struct(subspace, code))), "
            "p -> p.code)"
        ).alias("codes")
    )


def pq_adc_topk(
    codes: DataFrame,
    codebook: DataFrame,
    query: list[float],
    k: int = 10,
    m: int | None = None,
    dsub: int | None = None,
) -> DataFrame:
    """(vec_id, adc_dist): top-k corpus vectors by asymmetric distance —
    the query's exact per-subspace distances to every centroid, summed
    via the stored codes. The LUT collect is m*ksub rows (constant);
    the scan is one projection over the code table."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    rows = codebook.collect()
    m_eff = m if m is not None else max(r["subspace"] for r in rows) + 1
    d = dsub if dsub is not None else len(rows[0]["c"])
    lut: dict[tuple[int, int], float] = {}
    for r in rows:
        s = r["subspace"]
        qs = query[s * d : (s + 1) * d]
        acc = 0.0
        for x, y in zip(qs, r["c"]):
            acc = acc + (x - y) * (x - y)
        lut[(s, r["code"])] = acc
    ksub = max(r["code"] for r in rows) + 1
    lut_sql = "array(" + ", ".join(
        "array("
        + ", ".join(repr(lut[(s, c)]) for c in range(ksub))
        + ")"
        for s in range(m_eff)
    ) + ")"
    score = F.expr(
        f"aggregate(zip_with(sequence(0, {m_eff - 1}), codes, "
        f"(s, cd) -> element_at(element_at({lut_sql}, s + 1), cd + 1)), "
        "CAST(0.0 AS DOUBLE), (acc, x) -> acc + x)"
    )
    return (
        codes.withColumn("adc_dist", score)
        .orderBy(F.col("adc_dist").asc(), F.col("vec_id").asc())
        .limit(k)
        .select("vec_id", "adc_dist")
    )


def train_pq_codebooks(
    corpus: DataFrame,
    m: int = 4,
    ksub: int = 16,
    iters: int = 2,
    seed: int = 42,
    sample_cap: int = 4096,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> np.ndarray:
    """(m, ksub, dsub) codebooks via per-subspace Lloyd rounds: seeded
    sample init (rng(seed), one choice call per subspace), then each
    round assigns distributed (pq_encode's join-argmin) and re-means per
    (subspace, code, dim) with one posexplode aggregation — the
    train_ivf_centroids shape generalized over the subspace key. Empty
    codes keep their previous centroid."""
    spark = corpus.sparkSession
    sample = corpus.select(vec_col).limit(sample_cap).collect()
    mat = np.asarray([r[vec_col] for r in sample], dtype=np.float64)
    d = mat.shape[1]
    if d % m != 0:
        raise ValueError(f"dim {d} not divisible by m={m}")
    dsub = d // m
    rng = np.random.default_rng(seed)
    books = np.empty((m, ksub, dsub))
    for s in range(m):
        idx = rng.choice(len(mat), size=min(ksub, len(mat)), replace=False)
        books[s] = mat[idx, s * dsub : (s + 1) * dsub]
    c = corpus.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("v"))
    for _ in range(iters):
        cb = pq_codebook_df(spark, books)
        subs = c.select(
            "vec_id",
            F.explode(
                F.expr(
                    f"transform(sequence(0, {m - 1}), s -> "
                    f"struct(s AS subspace, slice(v, s * {dsub} + 1, {dsub}) AS sv))"
                )
            ).alias("e"),
        ).select("vec_id", "e.subspace", "e.sv")
        assign = (
            subs.join(F.broadcast(cb), "subspace")
            .withColumn("dist", _sub_dist("sv", "c"))
            .groupBy("vec_id", "subspace")
            .agg(
                F.min_by("code", F.struct("dist", "code")).alias("code"),
                F.first("sv").alias("sv"),
            )
        )
        sums = (
            assign.select("subspace", "code", F.posexplode("sv").alias("pos", "x"))
            .groupBy("subspace", "code", "pos")
            .agg(F.sum("x").alias("sm"), F.count("*").alias("n"))
            .collect()
        )
        new = books.copy()
        for r in sums:
            new[r["subspace"], r["code"], r["pos"]] = r["sm"] / r["n"]
        books = new
    return books
