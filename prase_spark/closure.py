"""Transitive closure over ontology DAGs + broadcast type propagation.

KG construction needs two closure shapes the rest of the package does not
cover: `matching.connected_components` closes UNDIRECTED equivalence
(sameAs merging), but subclass/subproperty/broader-than hierarchies are
DIRECTED and their consumers want the full ancestor set per node with
the minimum hop depth (rdfs:subClassOf* / SKOS broader* semantics — the
reference's KGs hold rdf:type-style attribute triples whose types these
operators expand; cf. /root/reference/objects/KG.py relation/attribute
dicts, which store only the asserted edge).

Scale doctrine (the 100-TB design point):
- The ontology/taxonomy DAG is SMALL — thousands-to-millions of classes,
  never instance-scale. `transitive_closure` therefore iterates ONLY
  over the DAG (frontier BFS, one shuffle per level, localCheckpoint)
  and is explicitly NOT for instance-scale graphs.
- The instance table (10^12 rows of (entity, asserted_type)) is NEVER
  iterated: `propagate_types` closes the tiny DAG once, then applies it
  with ONE broadcast join over the instance table — the only
  instance-scale exchange is the final min-depth aggregation, which is
  map-side combinable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def transitive_closure(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_hops: int = 64,
    checkpoint_every: int = 4,
    stats_out: dict | None = None,
) -> DataFrame:
    """All reachability pairs (src, anc, depth) with depth = MINIMUM
    number of hops >= 1 from ``src`` to ``anc`` along directed edges.

    Frontier-based BFS over pairs: level d discovers exactly the pairs
    whose shortest path is d (anything reachable sooner was anti-joined
    out at an earlier level), so the first discovery IS the min depth and
    no per-pair min() re-aggregation is needed. Terminates on ANY input
    — including cycles — because the frontier is new-pairs-only and the
    pair space is finite; ``max_hops`` just caps the radius (pairs beyond
    it are dropped, counted in ``stats_out['truncated_frontier_rows']``).

    Meant for ontology-sized graphs (the closure materializes O(V * avg
    ancestors) rows); propagate instance tables through the closure with
    `propagate_types`, never by iterating here.
    """
    e = (
        edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
        .where(F.col("src").isNotNull() & F.col("dst").isNotNull())
        .distinct()
        .persist()
    )
    e.count()

    closure = e.select(
        "src", F.col("dst").alias("anc"), F.lit(1).cast("int").alias("depth")
    ).localCheckpoint()
    frontier = closure
    hops = 1
    truncated = 0
    while hops < max_hops:
        step = (
            frontier.join(e.withColumnRenamed("src", "anc"), "anc")
            .select(
                "src",
                F.col("dst").alias("anc"),
                (F.col("depth") + F.lit(1)).cast("int").alias("depth"),
            )
            # multiple equal-length paths to the same ancestor (diamonds)
            # land in the same level — dedup within the level is a plain
            # distinct, no min() needed
            .distinct()
        )
        new = step.join(closure, ["src", "anc"], "left_anti").localCheckpoint()
        n_new = new.count()
        if n_new == 0:
            break
        hops += 1
        closure = closure.unionByName(new)
        if hops % checkpoint_every == 0:
            closure = closure.localCheckpoint()
        frontier = new
    else:
        # max_hops reached with a live frontier: report what was cut
        truncated = (
            frontier.join(e.withColumnRenamed("src", "anc"), "anc")
            .select("src", F.col("dst").alias("anc"))
            .join(closure, ["src", "anc"], "left_anti")
            .limit(1)
            .count()
        )
    if stats_out is not None:
        stats_out["levels"] = hops
        stats_out["truncated_frontier_rows"] = truncated
    e.unpersist()
    return closure


def propagate_types(
    assertions: DataFrame,
    subclass_edges: DataFrame,
    entity: str = "entity",
    typ: str = "type",
    child: str = "src",
    parent: str = "dst",
    max_hops: int = 64,
    stats_out: dict | None = None,
) -> DataFrame:
    """rdf:type inference: expand each (entity, asserted_type) row to the
    full inferred type set (entity, type, depth), depth 0 = asserted,
    depth d = inherited through d subclass hops (min over paths, and an
    assertion always beats inheritance of the same type).

    The subclass DAG is closed once with `transitive_closure` (small,
    iterated), then applied to the instance table with ONE broadcast
    join — the instance table is scanned once and never iterated, which
    is the only posture that survives 10^12 assertion rows. The final
    min-depth groupBy is the single instance-scale exchange and is
    map-side combinable (partial min before the shuffle).
    """
    clos = transitive_closure(
        subclass_edges, src=child, dst=parent, max_hops=max_hops, stats_out=stats_out
    )
    a = assertions.select(
        F.col(entity).alias("entity"), F.col(typ).alias("type")
    )
    asserted = a.select(
        "entity", "type", F.lit(0).cast("int").alias("depth")
    )
    inherited = a.join(
        F.broadcast(clos.withColumnRenamed("src", "type")), "type"
    ).select("entity", F.col("anc").alias("type"), "depth")
    return (
        asserted.unionByName(inherited)
        .groupBy("entity", "type")
        .agg(F.min("depth").alias("depth"))
    )
