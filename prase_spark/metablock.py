"""Meta-blocking: restructure a redundancy-positive block collection into
a pruned candidate-pair graph (Papadakis et al., "Meta-Blocking: Taking
Entity Resolution to the Next Level", TKDE 2014).

Where this sits in the pipeline: the reference seeds alignment from exact
literal equality (objects/KGs.py:53-58) and this repo adds LSH name
blocking (nameblock.py). Token blocking — every shared lowercase word is
a block — is the highest-recall cheap blocker, but on web-scale KGs its
candidate set is dominated by pairs that co-occur only in huge generic
blocks ("the", "inc", a shared color word). Meta-blocking keeps recall
and cuts comparisons by weighting each candidate edge with how MUCH
block evidence it has, then pruning edges below a data-derived
threshold. Everything here is exact integer arithmetic (CBS weights,
cross-multiplied mean comparisons), so every stage is value-replicable
in ANSI SQL and safe to hash-gate.

Stages (each a standalone DataFrame op):

1. :func:`token_blocks` — (key, token) block membership per side.
2. :func:`purge_blocks` — drop oversized blocks (block purging): a token
   whose cross-pair count ``n_l * n_r`` exceeds ``max_block_pairs``
   carries near-zero signal and quadratic cost. This is the guard that
   makes the downstream block join scale-safe: after purging, the join's
   per-token output is bounded by construction, the same doctrine as
   buckets.cap_band_buckets (hard cap + the caller sees what was cut via
   ``stats_out``).
3. :func:`filter_blocks` — block filtering: each entity keeps only its
   ``ratio_pct`` % smallest surviving blocks (smallest = most
   discriminative). Per-entity window; group size = tokens per name,
   bounded by the name length, never by corpus size.
4. :func:`cbs_edges` — the blocking graph: one edge per co-occurring
   cross-side pair, weight = number of shared blocks (CBS scheme —
   exact integers; JS/ECBS need ratios/logs and buy nothing at the
   pruning step that integer cross-multiplication can't express).
5. :func:`prune_wep` / :func:`prune_wnp` / :func:`prune_cnp` — weighted
   edge pruning (global mean threshold), weighted node pruning (keep an
   edge that beats the mean of EITHER endpoint's incident weights — the
   redundancy-positive union variant), cardinality node pruning
   (per-node top-k).

100-TB posture: the only corpus-sized shuffles are the block join
(purge-capped per token) and the groupBy that folds co-occurrences into
weighted edges (map-side combinable). WNP's per-node aggregates are hash
aggs, not windows; CNP's window is per-node with degree bounded by
``max_block_pairs`` x ratio filtering. No all-pairs stage anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from prase_spark.datapipe.textstats import tokens

DEFAULT_MAX_BLOCK_PAIRS = 10_000


def token_blocks(df: DataFrame, name_col: str = "name", key_col: str = "key") -> DataFrame:
    """(key, token) block membership: one row per DISTINCT lowercase word
    token of the entity's surface form. Uses the shared tokens() kernel
    (textstats) so block keys are byte-identical to every other token
    consumer and to the _TOKS_SQL DuckDB twin."""
    return (
        df.select(F.col(key_col).alias("key"), F.explode(F.array_distinct(tokens(name_col))).alias("token"))
        .distinct()
    )


def purge_blocks(
    blocks_l: DataFrame,
    blocks_r: DataFrame,
    max_block_pairs: int = DEFAULT_MAX_BLOCK_PAIRS,
    stats_out: dict | None = None,
) -> DataFrame:
    """Block purging: per token, the cross-comparison count is
    ``n_l * n_r`` (distinct keys per side). Tokens with zero cross pairs
    (one-sided) or more than ``max_block_pairs`` are dropped; the
    survivors come back as (token, n_l, n_r) for the filtering stage.

    The count is a hash agg over the block table (map-side combinable);
    the result is one row per surviving token — small enough to
    broadcast into both membership tables downstream."""
    counts = (
        blocks_l.groupBy("token").agg(F.countDistinct("key").alias("n_l"))
        .join(blocks_r.groupBy("token").agg(F.countDistinct("key").alias("n_r")), "token")
    )
    kept = counts.filter((F.col("n_l") * F.col("n_r")) <= F.lit(max_block_pairs))
    if stats_out is not None:
        total = counts.count()
        k = kept.count()
        stats_out["metablock_tokens_total"] = total
        stats_out["metablock_tokens_purged"] = total - k
    return kept


def filter_blocks(
    blocks: DataFrame, purged: DataFrame, ratio_pct: int = 80
) -> DataFrame:
    """Block filtering: each entity keeps its ``ratio_pct`` % smallest
    surviving blocks, smallest by cross-pair count ``n_l * n_r`` (ties ->
    lexicographically smaller token), at least one block per entity.
    ``ceil`` semantics via exact integers: keep rank ``rn`` iff
    ``rn * 100 <= ratio_pct * n + 99`` is NOT the formulation — the exact
    ceil is ``rn <= (ratio_pct * n + 99) div 100`` and that is what both
    engines compute. The window partitions by entity key; group size =
    the entity's token count (name-length bounded)."""
    from pyspark.sql import Window

    sized = blocks.join(
        F.broadcast(purged.select("token", (F.col("n_l") * F.col("n_r")).alias("pairs"))),
        "token",
    )
    w = Window.partitionBy("key").orderBy(F.col("pairs").asc(), F.col("token").asc())
    n = Window.partitionBy("key")
    return (
        sized.withColumn("rn", F.row_number().over(w))
        .withColumn("nb", F.count(F.lit(1)).over(n))
        .filter(
            F.col("rn")
            <= F.greatest(F.lit(1).cast("long"), F.expr(f"({ratio_pct} * nb + 99) div 100"))
        )
        .select("key", "token")
    )


def cbs_edges(blocks_l: DataFrame, blocks_r: DataFrame) -> DataFrame:
    """The weighted blocking graph: (key_l, key_r, w) where ``w`` is the
    number of blocks the pair co-occurs in (common-blocks scheme). One
    equi-join on token (per-token volume bounded upstream by purging) +
    one map-side-combinable count."""
    return (
        blocks_l.select(F.col("key").alias("key_l"), "token")
        .join(blocks_r.select(F.col("key").alias("key_r"), "token"), "token")
        .groupBy("key_l", "key_r")
        .agg(F.count(F.lit(1)).alias("w"))
    )


def prune_wep(edges: DataFrame, pct: int = 100) -> DataFrame:
    """Weighted edge pruning: keep edges whose weight is >= ``pct`` % of
    the global mean weight. Exact integers: ``w * n * 100 >= pct * sum``.
    The global (sum, n) is a single-row aggregate crossJoin-broadcast —
    the one-row-broadcast idiom used by colloc/sampling."""
    totals = edges.agg(
        F.sum("w").alias("__sum_w"), F.count(F.lit(1)).alias("__n_e")
    )
    return (
        edges.crossJoin(F.broadcast(totals))
        .filter(F.col("w") * F.col("__n_e") * F.lit(100) >= F.lit(pct) * F.col("__sum_w"))
        .select("key_l", "key_r", "w")
    )


def prune_wnp(edges: DataFrame, pct: int = 100) -> DataFrame:
    """Weighted node pruning (union variant): an edge survives if its
    weight is >= ``pct`` % of the mean incident weight of EITHER
    endpoint. Per-node means are hash aggs joined back on the node key —
    no windows, so a hub node costs a skewed-join row set, not a
    single-partition sort. Exact integers via cross-multiplication."""
    lm = edges.groupBy("key_l").agg(
        F.sum("w").alias("__sl"), F.count(F.lit(1)).alias("__nl")
    )
    rm = edges.groupBy("key_r").agg(
        F.sum("w").alias("__sr"), F.count(F.lit(1)).alias("__nr")
    )
    return (
        edges.join(lm, "key_l")
        .join(rm, "key_r")
        .filter(
            (F.col("w") * F.col("__nl") * F.lit(100) >= F.lit(pct) * F.col("__sl"))
            | (F.col("w") * F.col("__nr") * F.lit(100) >= F.lit(pct) * F.col("__sr"))
        )
        .select("key_l", "key_r", "w")
    )


def prune_cnp(edges: DataFrame, k: int = 5) -> DataFrame:
    """Cardinality node pruning (union variant): keep an edge if it is in
    the top-``k`` by weight of either endpoint (ties -> smaller
    counterpart key, a total order so the survivor set is value-stable).
    Per-node windows; node degree is bounded by block purging upstream."""
    from pyspark.sql import Window

    wl = Window.partitionBy("key_l").orderBy(F.col("w").desc(), F.col("key_r").asc())
    wr = Window.partitionBy("key_r").orderBy(F.col("w").desc(), F.col("key_l").asc())
    return (
        edges.withColumn("__rl", F.row_number().over(wl))
        .withColumn("__rr", F.row_number().over(wr))
        .filter((F.col("__rl") <= k) | (F.col("__rr") <= k))
        .select("key_l", "key_r", "w")
    )


def meta_block_candidates(
    names_l: DataFrame,
    names_r: DataFrame,
    scheme: str = "wnp",
    name_col: str = "name",
    key_col: str = "key",
    max_block_pairs: int = DEFAULT_MAX_BLOCK_PAIRS,
    ratio_pct: int = 80,
    pct: int = 100,
    k: int = 5,
    stats_out: dict | None = None,
) -> DataFrame:
    """The composed pipeline: token blocking -> purge -> filter -> CBS
    graph -> prune (``scheme`` in {wep, wnp, cnp, none}). Returns
    (key_l, key_r, w) candidate pairs."""
    bl = token_blocks(names_l, name_col, key_col)
    br = token_blocks(names_r, name_col, key_col)
    purged = purge_blocks(bl, br, max_block_pairs, stats_out=stats_out).localCheckpoint()
    fl = filter_blocks(bl, purged, ratio_pct)
    fr = filter_blocks(br, purged, ratio_pct)
    edges = cbs_edges(fl, fr)
    if scheme == "wep":
        return prune_wep(edges, pct)
    if scheme == "wnp":
        return prune_wnp(edges, pct)
    if scheme == "cnp":
        return prune_cnp(edges, k)
    if scheme == "none":
        return edges
    raise ValueError(f"unknown pruning scheme: {scheme}")


def global_rank(
    df: DataFrame, sort_cols: list[str], n_parts: int = 32, out_col: str = "rank"
) -> DataFrame:
    """df + a 0-based dense global rank under ORDER BY ``sort_cols`` —
    WITHOUT a single-partition sort. Range-repartition on the sort key
    (the sampler spreads skew across consecutive partitions), count rows
    per partition (one bounded collect, n_parts rows), then rank = local
    row_number + partition offset. The per-partition window sorts only
    its range slice — the honest distributed global order, same layout
    doctrine as cdx.write_cdx_index.

    ``sort_cols`` must be a total order (append a unique key as the
    last column); otherwise ranks of ties depend on the partitioner."""
    from pyspark.sql import Window

    ranged = df.repartitionByRange(n_parts, *sort_cols).withColumn(
        "__pid", F.spark_partition_id()
    )
    ranged = ranged.localCheckpoint()
    counts = sorted(
        (r["__pid"], r["n"])
        for r in ranged.groupBy("__pid").agg(F.count(F.lit(1)).alias("n")).collect()
    )
    offsets = {}
    acc = 0
    for pid, n in counts:
        offsets[pid] = acc
        acc += n
    spark = df.sparkSession
    off = spark.createDataFrame(
        [(p, o) for p, o in offsets.items()], "__pid INT, __off LONG"
    )
    w = Window.partitionBy("__pid").orderBy(*[F.col(c).asc() for c in sort_cols])
    return (
        ranged.withColumn("__rn", F.row_number().over(w))
        .join(F.broadcast(off), "__pid")
        .withColumn(out_col, (F.col("__rn") + F.col("__off") - 1).cast("long"))
        .drop("__pid", "__rn", "__off")
    )


def sorted_neighborhood_pairs(
    df: DataFrame,
    sort_col: str,
    window: int = 5,
    key_col: str = "key",
    n_parts: int = 32,
) -> DataFrame:
    """Sorted-neighborhood blocking (Hernández & Stolfo 1995): order all
    records by ``sort_col`` (ties by ``key_col`` — a total order, so the
    pair set is value-stable) and emit every pair within ``window``
    positions: (key_a, key_b, dist) with 1 <= dist < window, key_a the
    lower-ranked record. The third classic blocker next to token/LSH
    blocking — catches near-dups that share a PREFIX of the sort key
    even when token blocks are flooded.

    Candidate volume is exactly (window-1) * n - O(window^2): linear in
    the corpus by construction, the property that makes SNB attractive
    at scale. The window join is bucketized (rank DIV window, each left
    row probing its own and the next bucket) — two equi-join lookups per
    row, no range join, no single-partition sort anywhere (global_rank
    above). Multi-pass SNB = union over calls with different sort
    keys."""
    if window < 2:
        raise ValueError(f"window must be >= 2, got {window}")
    ranked = global_rank(
        df.select(F.col(key_col).alias("key"), F.col(sort_col).alias("__sk")),
        ["__sk", "key"],
        n_parts,
    ).select("key", "rank")
    a = ranked.select(
        F.col("key").alias("key_a"),
        F.col("rank").alias("ra"),
        F.explode(
            F.array(
                (F.col("rank") / window).cast("long"),
                (F.col("rank") / window).cast("long") + 1,
            )
        ).alias("g"),
    )
    b = ranked.select(
        F.col("key").alias("key_b"),
        F.col("rank").alias("rb"),
        (F.col("rank") / window).cast("long").alias("g"),
    )
    return (
        a.join(b, "g")
        .filter((F.col("rb") > F.col("ra")) & (F.col("rb") - F.col("ra") < window))
        .select("key_a", "key_b", (F.col("rb") - F.col("ra")).alias("dist"))
    )
