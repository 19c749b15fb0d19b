"""Transitive closure over ontology DAGs, broadcast type propagation,
and ρdf (minimal-RDFS) entailment materialization.

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


def rdfs_entail(
    triples: DataFrame,
    schema: DataFrame,
    subj: str = "subj",
    pred: str = "pred",
    obj: str = "obj",
    type_pred: str = "rdf:type",
    subclass_pred: str = "rdfs:subClassOf",
    subprop_pred: str = "rdfs:subPropertyOf",
    domain_pred: str = "rdfs:domain",
    range_pred: str = "rdfs:range",
    max_hops: int = 64,
    stats_out: dict | None = None,
) -> DataFrame:
    """Materialize the ρdf entailment (Muñoz, Pérez & Gutierrez 2009 —
    the minimal RDFS fragment) of instance ``triples`` under ``schema``:
    the asserted triples plus everything rules rdfs2/3/5/7/9/11 derive.

    ``schema`` is a triple DataFrame holding the ontology —
    ``subClassOf`` / ``subPropertyOf`` edges and per-property
    ``domain`` / ``range`` declarations. Returned is the DISTINCT
    (subj, pred, obj) set of the entailment.

    The ρdf rules stratify, so the fixpoint is ONE pass with no
    instance-scale iteration (the posture that survives 10^12 rows):

    1. close the subPropertyOf and subClassOf DAGs (rdfs5/11) with
       :func:`transitive_closure` — schema-sized, iterated, broadcast;
    2. expand instance triples through the property closure (rdfs7):
       one broadcast join over the triple scan;
    3. derive types from domain/range declarations over the EXPANDED
       triples (rdfs2/3 — so a domain on a superproperty fires for its
       subproperties' instances) plus asserted rdf:type rows;
    4. propagate all types through the class closure (rdfs9): one more
       broadcast join.

    No derived instance triple can produce a new SCHEMA triple (schema
    and instance streams are disjoint inputs here), so one pass IS the
    fixpoint. The only instance-scale exchange is the final distinct —
    a single hash aggregation; every join in the pass broadcasts a
    schema-closure-sized table.
    """
    t = (
        triples.select(
            F.col(subj).alias("s"), F.col(pred).alias("p"), F.col(obj).alias("o")
        )
        .distinct()
    )
    sch = schema.select(
        F.col(subj).alias("s"), F.col(pred).alias("p"), F.col(obj).alias("o")
    ).distinct()

    def _edges(marker):
        return sch.where(F.col("p") == marker).select(
            F.col("s").alias("src"), F.col("o").alias("dst")
        )

    p_stats: dict = {}
    c_stats: dict = {}
    clos_p = transitive_closure(
        _edges(subprop_pred), max_hops=max_hops, stats_out=p_stats
    ).select("src", "anc")
    clos_c = transitive_closure(
        _edges(subclass_pred), max_hops=max_hops, stats_out=c_stats
    ).select("src", "anc")
    if stats_out is not None:
        stats_out["subprop_levels"] = p_stats.get("levels", 0)
        stats_out["subclass_levels"] = c_stats.get("levels", 0)
        stats_out["truncated_frontier_rows"] = p_stats.get(
            "truncated_frontier_rows", 0
        ) + c_stats.get("truncated_frontier_rows", 0)

    expanded = t.unionByName(
        t.join(F.broadcast(clos_p.withColumnRenamed("src", "p")), "p").select(
            "s", F.col("anc").alias("p"), "o"
        )
    )
    dom = sch.where(F.col("p") == domain_pred).select(
        F.col("s").alias("p"), F.col("o").alias("c")
    )
    rng = sch.where(F.col("p") == range_pred).select(
        F.col("s").alias("p"), F.col("o").alias("c")
    )
    typed = (
        expanded.where(F.col("p") == type_pred)
        .select(F.col("s").alias("e"), F.col("o").alias("c"))
        .unionByName(
            expanded.join(F.broadcast(dom), "p").select(
                F.col("s").alias("e"), "c"
            )
        )
        .unionByName(
            expanded.join(F.broadcast(rng), "p").select(
                F.col("o").alias("e"), "c"
            )
        )
    )
    all_types = typed.unionByName(
        typed.join(F.broadcast(clos_c.withColumnRenamed("src", "c")), "c").select(
            "e", F.col("anc").alias("c")
        )
    )
    return (
        expanded.unionByName(
            all_types.select(
                F.col("e").alias("s"),
                F.lit(type_pred).alias("p"),
                F.col("c").alias("o"),
            )
        )
        .distinct()
        .select(
            F.col("s").alias(subj), F.col("p").alias(pred), F.col("o").alias(obj)
        )
    )
