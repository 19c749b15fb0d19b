"""Exact set-similarity self-join by prefix filtering (AllPairs /
PPJoin family: Bayardo et al. WWW'07, Xiao et al. WWW'08) — every pair
with token-Jaccard >= t, NO false negatives, without LSH.

Where this sits: minhash LSH (dedup.py) trades a deterministic-but-lossy
banding recall (1-(1-j^r)^b) for corpus-scale throughput; FastSS
(fuzzy.py) is lossless for EDIT distance. This operator is the lossless
JACCARD join — the right tool when the dedup policy must be provably
complete (legal-grade dedup, eval-set decontamination where a miss is a
leak) and the token universe is skew-light enough for prefix filtering.

The prefix-filtering principle: fix one GLOBAL total order over tokens
(here: ascending document frequency, ties by token string — rarest
first, the order that makes prefixes selective). A record of n tokens
keeps only its first ``p = n - ceil(t*n) + 1`` tokens as its PREFIX; any
pair with Jaccard >= t must share at least one prefix token on each
side (if all shared tokens sat past x's prefix, the overlap would be at
most ceil(t*n)-1 < the t*n a qualifying pair needs). So the candidate
set = pairs co-occurring in >= 1 prefix-token block — a standard
equi-join — and an exact array-intersect verify finishes the job.

Integer doctrine: the threshold is ``threshold_pct`` and the verify
emits (inter, uni) with the filter ``inter * 100 >= pct * uni`` — one
cross-multiplication of identical integers in any engine, so the full
join is value-hashable (the cms/metablock discipline).

Scale shape:
- the token table ships (key, token) once; document frequencies are one
  hash agg; NO global rank is materialized — the order is the (df,
  token) TUPLE, so per-record prefix selection is a per-key window
  (group size = tokens per record, never corpus-sized);
- candidate volume is sum over prefix tokens of block^2 — rare-first
  ordering pushes hot tokens OUT of prefixes, which is the published
  reason AllPairs scales; a token hot enough to dominate anyway (df >
  ``stats_out`` watch) means the threshold is too low for the corpus,
  not that the algorithm should silently drop it (lossless contract);
- verify is per-pair array_intersect, cost O(pairs x tokens/record),
  independent of token df (the exact_jaccard doctrine, dedup.py:284).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from prase_spark.datapipe.textstats import tokens


def prefix_jaccard_join(
    df: DataFrame,
    threshold_pct: int = 80,
    text_col: str = "text",
    key_col: str = "doc_id",
    stats_out: dict | None = None,
) -> DataFrame:
    """(key_a, key_b, inter, uni): all pairs (key_a < key_b) whose
    distinct-token Jaccard >= threshold_pct/100, exactly. ``inter`` and
    ``uni`` are the exact intersection/union sizes (BIGINT)."""
    if not 1 <= threshold_pct <= 100:
        raise ValueError(f"threshold_pct must be in [1, 100], got {threshold_pct}")
    tk = df.select(
        F.col(key_col).alias("key"),
        F.explode(F.array_distinct(tokens(text_col))).alias("token"),
    ).localCheckpoint()
    dfc = tk.groupBy("token").agg(F.count(F.lit(1)).alias("dfreq"))
    w = Window.partitionBy("key").orderBy(F.col("dfreq").asc(), F.col("token").asc())
    nw = Window.partitionBy("key")
    pref = (
        tk.join(dfc, "token")
        .withColumn("rn", F.row_number().over(w))
        .withColumn("n", F.count(F.lit(1)).over(nw))
        .filter(
            F.col("rn")
            <= F.col("n") - F.expr(f"({threshold_pct} * n + 99) div 100") + F.lit(1)
        )
        .select("key", "token")
    )
    cand = (
        pref.select(F.col("key").alias("key_a"), "token")
        .join(pref.select(F.col("key").alias("key_b"), "token"), "token")
        .filter(F.col("key_a") < F.col("key_b"))
        .select("key_a", "key_b")
        .distinct()
    )
    if stats_out is not None:
        stats_out["prefix_candidates"] = cand.count()
    sets_ = tk.groupBy("key").agg(
        F.collect_set("token").alias("s"), F.count(F.lit(1)).alias("sz")
    )
    out = (
        cand.join(
            sets_.select(
                F.col("key").alias("key_a"), F.col("s").alias("sa"), F.col("sz").alias("za")
            ),
            "key_a",
        )
        .join(
            sets_.select(
                F.col("key").alias("key_b"), F.col("s").alias("sb"), F.col("sz").alias("zb")
            ),
            "key_b",
        )
        .withColumn("inter", F.size(F.array_intersect("sa", "sb")).cast("long"))
        .withColumn("uni", (F.col("za") + F.col("zb") - F.col("inter")).cast("long"))
        .filter(F.col("inter") * 100 >= F.lit(threshold_pct) * F.col("uni"))
        .select("key_a", "key_b", "inter", "uni")
    )
    return out


def containment_join(
    queries: DataFrame,
    corpus: DataFrame,
    threshold_pct: int = 80,
    text_col: str = "text",
    key_col: str = "doc_id",
    stats_out: dict | None = None,
) -> DataFrame:
    """(key_q, key_c, inter, q_sz): all (query, corpus-doc) pairs where
    the QUERY's distinct tokens are >= threshold_pct % CONTAINED in the
    doc's — exact, no false negatives. The asymmetric sibling of
    :func:`prefix_jaccard_join`: containment is what decontamination
    actually asks ("is this eval item inside a training doc?") when the
    doc is much longer than the query, where Jaccard goes to zero.

    Prefix principle, containment form: order Q' = Q ∩ corpus-vocab by
    ascending CORPUS document frequency (tokens absent from the corpus
    can never contribute overlap, so they are excluded from the prefix
    pool — but the threshold stays on the FULL |Q|). Take the first
    ``p = |Q| - ceil(t*|Q|) + 1`` tokens of Q' as the prefix. If a
    qualifying pair (overlap O >= ceil(t*|Q|), all overlap tokens in
    Q') shared no prefix token, the O tokens would all sit past
    position p, giving O <= |Q'| - p <= |Q| - p = ceil(t*|Q|) - 1 — a
    contradiction, so the join is lossless. Candidates = prefix tokens
    joined against the corpus token table; verify = exact array
    intersect with the cross-multiplied integer threshold.
    """
    if not 1 <= threshold_pct <= 100:
        raise ValueError(f"threshold_pct must be in [1, 100], got {threshold_pct}")
    qt = queries.select(
        F.col(key_col).alias("kq"),
        F.explode(F.array_distinct(tokens(text_col))).alias("token"),
    ).localCheckpoint()
    ct = corpus.select(
        F.col(key_col).alias("kc"),
        F.explode(F.array_distinct(tokens(text_col))).alias("token"),
    ).localCheckpoint()
    dfc = ct.groupBy("token").agg(F.count(F.lit(1)).alias("dfreq"))
    sizes = qt.groupBy("kq").agg(F.count(F.lit(1)).alias("q_sz"))
    w = Window.partitionBy("kq").orderBy(F.col("dfreq").asc(), F.col("token").asc())
    pref = (
        qt.join(dfc, "token")  # inner: query-only tokens leave the prefix pool
        .join(sizes, "kq")
        .withColumn("rn", F.row_number().over(w))
        .filter(
            F.col("rn")
            <= F.col("q_sz") - F.expr(f"({threshold_pct} * q_sz + 99) div 100") + F.lit(1)
        )
        .select("kq", "token")
    )
    cand = (
        pref.join(ct, "token")
        .select("kq", "kc")
        .distinct()
    )
    if stats_out is not None:
        stats_out["containment_candidates"] = cand.count()
    qsets = qt.groupBy("kq").agg(
        F.collect_set("token").alias("qs"), F.count(F.lit(1)).alias("q_sz")
    )
    csets = ct.groupBy("kc").agg(F.collect_set("token").alias("cs"))
    return (
        cand.join(qsets, "kq")
        .join(csets, "kc")
        .withColumn("inter", F.size(F.array_intersect("qs", "cs")).cast("long"))
        .filter(F.col("inter") * 100 >= F.lit(threshold_pct) * F.col("q_sz"))
        .select(
            F.col("kq").alias("key_q"),
            F.col("kc").alias("key_c"),
            "inter",
            F.col("q_sz").cast("long").alias("q_sz"),
        )
    )
