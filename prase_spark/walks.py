"""Deterministic random-walk corpus generation over the KG
(DeepWalk, Perozzi et al. 2014) — the sentence factory for graph
embeddings.

TransE (transe.py) trains on individual triples; walk-based methods
(DeepWalk/node2vec) instead feed truncated random walks to a skip-gram
model as if they were sentences. This module generates that corpus
in-engine: fixed-length first-order walks whose every "random" choice is
a pure arithmetic function of (walk_id, step), so the corpus is
bit-identical at any partitioning/cluster size and the driver gate can
value-hash it against a DuckDB twin (the same no-RNG-state doctrine as
DSIR's hash-seeded Gumbel top-k). :func:`node2vec_walks` adds the
second-order p/q bias with integer weights, same determinism contract.

Scale shape:
- adjacency builds ONCE: groupBy(src) -> sorted neighbor array (ties and
  multi-edges kept — multiplicity IS the classic edge-weighted sampling
  bias), then every step is one equi-join of the frontier against the
  pinned adjacency plus a pure projection. No windows, no collects.
- the frontier carries (walk_id, step, cur) — 3 columns, never the
  accumulated path — and results union step-wise, so shuffle rows stay
  fixed-width no matter the walk length; lineage localCheckpoints.
- hub risk: a 10^8-out-degree node makes a 10^8-element neighbor array
  in one row. ``max_degree`` caps the array (sorted prefix) with a
  counted-drop in ``stats_out['capped_nodes']``; the cap biases hub
  sampling toward sort-order-small neighbors, so at web scale prefer
  capping hub edges upstream (the documented trade, same honesty rule
  as cap_per_group's skew note).

Determinism contract: the step chooser is
``mix(w, s) = ((w mod P) * 1000003 + s * 999983 + 12345) mod P`` over
DECIMAL(38,0) (P = 2^61 - 1 — the poly_hash61 modulus family), and
``walk_id = poly_hash61(node || '#' || k)`` for k in [0, walks_per_node).
Both are pure shared-arithmetic expressions with exact HUGEINT twins in
DuckDB, which is what makes the whole corpus value-verifiable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from prase_spark.datapipe.hashing import POLY_P, poly_hash61

MIX_MULT = 1000003
MIX_STEP = 999983
MIX_ADD = 12345


def _mix_sql(walk_expr: str, step: int) -> str:
    """Spark SQL for mix(walk_id, step): DECIMAL(38,0) keeps the
    ~2^81 intermediate product exact (ANSI-safe); the result is < P so
    it casts back to BIGINT losslessly."""
    return (
        f"CAST(((CAST({walk_expr} AS DECIMAL(38,0)) % {POLY_P}) * {MIX_MULT} "
        f"+ {int(step)} * {MIX_STEP} + {MIX_ADD}) % {POLY_P} AS BIGINT)"
    )


def random_walks(
    edges: DataFrame,
    walk_length: int = 8,
    walks_per_node: int = 1,
    src: str = "src",
    dst: str = "dst",
    max_degree: int | None = None,
    checkpoint_every: int = 4,
    stats_out: dict | None = None,
) -> DataFrame:
    """(walk_id, start, step, node): ``walks_per_node`` truncated random
    walks from every node, each up to ``walk_length`` hops (step 0 is
    the start node; dead-end nodes truncate the walk early). Rows, not
    arrays, so downstream skip-gram windowing is one self-join on
    (walk_id, |step diff| <= w) and the gate sink is flat.

    Every choice is shared-arithmetic-deterministic (module doc); the
    walk over a node's sorted neighbor multiset picks index
    ``mix(walk_id, step) mod out_deg`` — multi-edges raise a neighbor's
    multiplicity and therefore its sampling weight, the classic
    weighted DeepWalk variant.
    """
    if walk_length < 0:
        raise ValueError(f"walk_length must be >= 0, got {walk_length}")
    if walks_per_node < 1:
        raise ValueError(f"walks_per_node must be >= 1, got {walks_per_node}")
    e = edges.select(F.col(src).alias("s"), F.col(dst).alias("d"))
    adj = e.groupBy(F.col("s").alias("cur")).agg(
        F.sort_array(F.collect_list("d")).alias("nbrs")
    )
    if max_degree is not None:
        if stats_out is not None:
            stats_out["capped_nodes"] = adj.filter(
                F.size("nbrs") > max_degree
            ).count()
        adj = adj.withColumn("nbrs", F.slice("nbrs", 1, int(max_degree)))
    adj = adj.persist()
    adj.count()

    nodes = e.select(F.col("s").alias("node")).union(
        e.select("d")
    ).distinct()
    starts = None
    for k in range(walks_per_node):
        sk = nodes.select(
            poly_hash61(
                F.concat(F.col("node"), F.lit(f"#{k}"))
            ).alias("walk_id"),
            F.col("node").alias("start"),
            F.lit(0).cast("int").alias("step"),
            F.col("node").alias("node"),
        )
        starts = sk if starts is None else starts.unionByName(sk)

    out = starts.localCheckpoint()
    frontier = out
    pinned = []
    for step in range(1, walk_length + 1):
        nxt = (
            frontier.join(adj, frontier["node"] == adj["cur"])
            .select(
                "walk_id",
                "start",
                F.lit(step).cast("int").alias("step"),
                F.element_at(
                    "nbrs",
                    F.expr(
                        f"CAST({_mix_sql('walk_id', step)} % size(nbrs) AS INT) + 1"
                    ),
                ).alias("node"),
            )
        )
        if step % checkpoint_every == 0 and step < walk_length:
            nxt = nxt.localCheckpoint()
        else:
            # pin every frontier: the output union holds one branch per
            # step, and without a persist each branch would recompute
            # all prior hops — O(L^2) joins instead of O(L) (measured
            # 24.8 -> 20.9 s / 11.6 -> 8.4 s on the 8M-edge 4->16 read)
            nxt = nxt.persist()
            pinned.append(nxt)
        out = out.unionByName(nxt)
        frontier = nxt
    # materialize once, then release every intermediate pin: a
    # build-once/consume-many walk corpus must not leak cached RDDs into
    # a long-lived session (the r4 IVF-unpersist advisory class)
    out = out.localCheckpoint()
    for df in pinned:
        df.unpersist()
    adj.unpersist()
    return out


def skipgram_pairs(
    walks: DataFrame, window: int = 2, drop_self: bool = True
) -> DataFrame:
    """(center, context, cnt): skip-gram co-occurrence counts over the
    walk corpus — the direct input of a word2vec-family trainer (and a
    useful KG-proximity statistic by itself). One self-join on walk_id
    with a |step delta| band (band size <= 2*window, never a cross
    join) plus one map-side-combinable count."""
    if window < 1:
        raise ValueError(f"window must be >= 1, got {window}")
    a = walks.select("walk_id", F.col("step").alias("s1"), F.col("node").alias("center"))
    b = walks.select("walk_id", F.col("step").alias("s2"), F.col("node").alias("context"))
    pairs = a.join(b, "walk_id").filter(
        (F.abs(F.col("s1") - F.col("s2")) <= window) & (F.col("s1") != F.col("s2"))
    )
    if drop_self:
        pairs = pairs.filter(F.col("center") != F.col("context"))
    return pairs.groupBy("center", "context").agg(
        F.count("*").cast("long").alias("cnt")
    )


def node2vec_walks(
    edges: DataFrame,
    walk_length: int = 8,
    walks_per_node: int = 1,
    return_w: int = 1,
    common_w: int = 4,
    far_w: int = 2,
    src: str = "src",
    dst: str = "dst",
    checkpoint_every: int = 4,
) -> DataFrame:
    """Second-order biased walks (node2vec, Grover & Leskovec 2016),
    same output contract and determinism doctrine as
    :func:`random_walks`. The step-2+ chooser weights each candidate
    next node by its relation to the PREVIOUS node: ``return_w`` when it
    IS the previous node (node2vec's 1/p), ``common_w`` when it is a
    neighbor of the previous node (distance 1 — BFS-ish, community
    exploring), ``far_w`` otherwise (1/q — DFS-ish). Integer weights
    replace node2vec's float p/q so sampling stays exact shared
    arithmetic: the pick is the first index whose cumulative weight
    exceeds ``mix(walk_id, step) mod total_weight``. With all three
    weights equal the chooser degenerates to exactly
    :func:`random_walks`'s uniform pick (pytest-pinned).

    Scale shape: each step is TWO equi-joins against the pinned
    adjacency (cur's neighbors + prev's neighbors) and one pure array
    projection — the weight/cumsum/pick fold runs inside codegen over
    the neighbor array, no explode, no window, no shuffle beyond the
    joins. The prev-neighbor membership probe is a linear array scan:
    cost O(deg(cur) * deg(prev)) per step-row, the standard node2vec
    trade (alias tables precompute the same product); cap hub degrees
    upstream as with random_walks.
    """
    if walk_length < 0:
        raise ValueError(f"walk_length must be >= 0, got {walk_length}")
    if walks_per_node < 1:
        raise ValueError(f"walks_per_node must be >= 1, got {walks_per_node}")
    for nm, w in (("return_w", return_w), ("common_w", common_w), ("far_w", far_w)):
        if int(w) < 1:
            raise ValueError(f"{nm} must be >= 1, got {w}")
    e = edges.select(F.col(src).alias("s"), F.col(dst).alias("d"))
    adj = (
        e.groupBy(F.col("s").alias("cur"))
        .agg(F.sort_array(F.collect_list("d")).alias("nbrs"))
        .persist()
    )
    adj.count()
    nodes = e.select(F.col("s").alias("node")).union(e.select("d")).distinct()

    starts = None
    for k in range(walks_per_node):
        sk = nodes.select(
            poly_hash61(F.concat(F.col("node"), F.lit(f"#{k}"))).alias("walk_id"),
            F.col("node").alias("start"),
            F.lit(0).cast("int").alias("step"),
            F.col("node").alias("node"),
        )
        starts = sk if starts is None else starts.unionByName(sk)
    out = starts.localCheckpoint()
    pinned = []

    # step 1: uniform (no previous node yet) — identical to random_walks
    frontier = None
    if walk_length >= 1:
        f1 = starts.join(adj, starts["node"] == adj["cur"]).select(
            "walk_id",
            "start",
            F.lit(1).cast("int").alias("step"),
            F.col("node").alias("prev"),
            F.element_at(
                "nbrs",
                F.expr(f"CAST({_mix_sql('walk_id', 1)} % size(nbrs) AS INT) + 1"),
            ).alias("node"),
        ).persist()
        pinned.append(f1)
        out = out.unionByName(f1.drop("prev"))
        frontier = f1

    wr, wc, wf = int(return_w), int(common_w), int(far_w)
    for step in range(2, walk_length + 1):
        a = adj.select(F.col("cur").alias("__c"), F.col("nbrs").alias("__nbrs"))
        ap = adj.select(F.col("cur").alias("__p"), F.col("nbrs").alias("__pnbrs"))
        joined = (
            frontier.join(a, frontier["node"] == a["__c"])
            .join(ap, frontier["prev"] == ap["__p"])
        )
        # cum is 0-seeded ([0, c1, .., cn]) so the running-sum lambda
        # never probes an empty array; the picked neighbor index is then
        # exactly |{c in cum : c <= r}| (the leading 0 supplies the +1)
        pick = F.expr(
            f"""element_at(__nbrs, CAST(size(filter(
                  aggregate(
                    transform(__nbrs, x -> CAST(CASE
                        WHEN x = prev THEN {wr}
                        WHEN array_contains(__pnbrs, x) THEN {wc}
                        ELSE {wf} END AS BIGINT)),
                    array(CAST(0 AS BIGINT)),
                    (acc, w) -> array_append(acc, element_at(acc, -1) + w)
                  ),
                  c -> c <= {_mix_sql('walk_id', step)} % aggregate(
                    transform(__nbrs, x -> CAST(CASE
                        WHEN x = prev THEN {wr}
                        WHEN array_contains(__pnbrs, x) THEN {wc}
                        ELSE {wf} END AS BIGINT)),
                    CAST(0 AS BIGINT), (acc, w) -> acc + w)
                ) ) AS INT))"""
        )
        nxt = joined.select(
            "walk_id",
            "start",
            F.lit(step).cast("int").alias("step"),
            F.col("node").alias("prev"),
            pick.alias("node"),
        )
        if step % checkpoint_every == 0 and step < walk_length:
            nxt = nxt.localCheckpoint()
        else:
            nxt = nxt.persist()  # same O(L) pin as random_walks
            pinned.append(nxt)
        out = out.unionByName(nxt.drop("prev"))
        frontier = nxt
    out = out.localCheckpoint()
    for df in pinned:
        df.unpersist()
    adj.unpersist()
    return out


def context_similarity(
    pairs: DataFrame,
    min_shared: int = 2,
    max_context_df: int = 10_000,
    k: int | None = 10,
    salt_buckets: int = 64,
    stats_out: dict | None = None,
) -> DataFrame:
    """(a, b, shared, minsum): distributional node similarity over a
    skip-gram co-occurrence table (:func:`skipgram_pairs` output) — two
    nodes are similar when their context DISTRIBUTIONS overlap, scored
    by the histogram-intersection kernel sum(min(cnt_a, cnt_b)) over
    shared contexts. Exact integers end to end: the float-free stand-in
    for training embeddings and cosining them, and a direct PARIS-seed /
    related-entity signal by itself (nodes that random walks see in the
    same company).

    Scale shape (the banded-join doctrine): candidate pairs generate
    ONLY through shared contexts; a context appearing in more than
    ``max_context_df`` nodes' rows is dropped first with a counted-drop
    in ``stats_out['dropped_contexts']`` (a stop-context carries little
    signal per pair and would alone contribute df^2 pairs). Pairs are
    ordered a < b; ``k`` keeps the top-k per ``a`` via the two-phase
    salted partial top-k (minsum DESC, shared DESC, b ASC total order),
    ``k=None`` returns all pairs above ``min_shared``."""
    if min_shared < 1:
        raise ValueError(f"min_shared must be >= 1, got {min_shared}")
    p = pairs.select("center", "context", F.col("cnt").cast("long").alias("cnt"))
    df = p.groupBy("context").agg(F.count("*").alias("__df"))
    hot = df.filter(F.col("__df") > max_context_df)
    if stats_out is not None:
        stats_out["dropped_contexts"] = hot.count()
    p = p.join(hot.select("context"), "context", "left_anti")
    a = p.select(F.col("center").alias("a"), "context", F.col("cnt").alias("ca"))
    b = p.select(F.col("center").alias("b"), "context", F.col("cnt").alias("cb"))
    sim = (
        a.join(b, "context")
        .filter(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(
            F.count("*").cast("long").alias("shared"),
            F.sum(F.least("ca", "cb")).cast("long").alias("minsum"),
        )
        .filter(F.col("shared") >= min_shared)
    )
    if k is None:
        return sim
    from pyspark.sql import Window

    order = [F.col("minsum").desc(), F.col("shared").desc(), F.col("b").asc()]
    salt = F.pmod(F.xxhash64(F.col("b").cast("string")), F.lit(int(salt_buckets)))
    w1 = Window.partitionBy("a", "__salt").orderBy(*order)
    w2 = Window.partitionBy("a").orderBy(*order)
    return (
        sim.withColumn("__salt", salt)
        .withColumn("__rn", F.row_number().over(w1))
        .filter(F.col("__rn") <= k)
        .withColumn("__rn", F.row_number().over(w2))
        .filter(F.col("__rn") <= k)
        .drop("__salt", "__rn")
    )
