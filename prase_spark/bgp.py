"""Basic-graph-pattern (SPARQL-style) matching over the triple store.

The reference answers entity questions by dict lookups over its
adjacency maps (/root/reference/objects/KG.py fact dicts); the
distributed equivalent of "find all bindings of this variable pattern"
is a chain of equi-joins over the triple table — exactly what a SPARQL
BGP compiles to in any triple store. This module is that compiler:

    bgp_match(triples, [("?x", "type", "Person"),
                        ("?x", "worksAt", "?y"),
                        ("?y", "locatedIn", "Berlin")])
    -> DataFrame[x, y]

Plan shape (the part that must survive 10^12 triples):
- each pattern is ONE filtered scan of the triple table — constants
  become pushed-down predicate filters (predicate constants especially:
  a predicate-partitioned store prunes to one partition per pattern);
- patterns join LEFT-DEEP in selectivity order (fewest variables
  first), each join keyed on the shared variables — plain shuffled
  equi-joins Catalyst/AQE can reorder, broadcast, or skew-split;
- a pattern sharing NO variable with the accumulated bindings is
  rejected (cartesian guard) rather than silently cross-joined.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _is_var(term: str) -> bool:
    return isinstance(term, str) and term.startswith("?")


def _pattern_df(
    triples: DataFrame, pat, subj: str, pred: str, obj: str
) -> tuple[DataFrame, set]:
    """One filtered+projected scan: constants filter, variables project."""
    s, p, o = pat
    df = triples
    cols, out = [(s, subj), (p, pred), (o, obj)], []
    seen = {}
    for term, col in cols:
        if _is_var(term):
            name = term[1:]
            if not name:
                raise ValueError(f"empty variable name in pattern {pat}")
            if name in seen:
                # repeated variable within one pattern: equality filter
                df = df.where(F.col(col) == F.col(seen[name]))
            else:
                seen[name] = col
                out.append(F.col(col).alias(name))
        else:
            df = df.where(F.col(col) == F.lit(term))
    return df.select(*out), set(seen)


def bgp_match(
    triples: DataFrame,
    patterns,
    subj: str = "subj",
    pred: str = "pred",
    obj: str = "obj",
    distinct: bool = True,
    optional=(),
    filters=(),
    minus=(),
    values: dict | None = None,
    path_max_hops: int = 64,
) -> DataFrame:
    """All variable bindings satisfying every (s, p, o) pattern.

    Terms starting with ``?`` are variables (shared names join);
    anything else is a constant equality filter. Result columns are the
    variable names without ``?``, sorted. ``distinct=True`` gives SPARQL
    SELECT DISTINCT semantics (duplicate solutions from multi-edge
    bindings collapse); pass False for bag semantics.

    ``optional`` patterns are SPARQL OPTIONAL clauses: each left-joins
    onto the required solution on its shared variables — solutions
    survive with NULL bindings where the optional edge is absent. Each
    optional must share ≥1 variable with the required patterns (same
    cartesian guard), and optionals join the REQUIRED bindings
    independently (a chain of dependent optionals should be one
    required-BGP-plus-optional nesting, not two optionals).

    ``filters`` are SPARQL FILTER clauses over the bound variable
    columns: SQL expression strings (``"x <> y"``,
    ``"CAST(n AS INT) > 5"``) or pyspark Columns. They apply to the
    whole group solution (after optionals) with SQL NULL semantics —
    a comparison on an unbound (NULL) optional variable eliminates
    the solution, which is exactly SPARQL's error-eliminates rule. At
    scale this is free selectivity: Catalyst pushes any filter that
    references one join side down below the joins into the scans.

    ``minus`` patterns are SPARQL MINUS clauses: a solution is removed
    when the minus pattern has ANY binding agreeing with it on their
    shared variables — exactly a left-anti equi-join on those variables
    (EXISTS semantics, so extra minus-side variables need no distinct).
    Each minus pattern must share ≥1 variable with the required
    patterns; SPARQL's degenerate disjoint-domain MINUS (removes
    nothing) is rejected as a query bug, same doctrine as the cartesian
    guard. MINUS applies after OPTIONAL, before FILTER.

    ``values`` is the inline-data clause for the common single-variable
    form — ``VALUES ?n { n1 n2 }`` as ``{"?n": ["n1", "n2"]}`` — applied
    as an IN filter per variable, which Catalyst pushes into the scans
    (free partition pruning on a predicate-partitioned store).
    Row-correlated multi-variable VALUES is a join against a literal
    DataFrame the caller composes.

    A constant predicate ending in ``+`` is a SPARQL one-or-more
    property path (``?x locatedIn+ ?y``): the pattern's source becomes
    the transitive closure of that predicate's edge set
    (``closure.transitive_closure`` — frontier BFS, cycle-safe,
    ``path_max_hops`` radius cap). The closure materializes only the
    ONE predicate's subgraph, never the triple table, so the cost is
    O(edges(p) × avg reach) — the ontology-closure scale posture.
    ``*`` (zero-or-more) is rejected: its zero-length arm binds every
    node in the graph, which is never what a 10^12-triple query means.
    """
    pats = list(patterns)
    if not pats:
        raise ValueError("empty pattern list")
    for p in pats:
        if not any(_is_var(t) for t in p):
            raise ValueError(
                f"pattern {p} binds no variable (ASK-style existence "
                "checks are a count, not a BGP solution)"
            )
    def _source_for(pat):
        """Triple table, or a derived edge set for a property-path
        predicate, rendered back into triple shape so the whole
        left-deep machinery (joins, OPTIONAL, FILTER) applies unchanged.

        Path grammar (``^``, ``|``, trailing ``+`` are metacharacters):
            atom := '^'? name          inverse atom swaps subj/obj
            alt  := atom ('|' atom)*   union of the atoms' edge sets
            path := alt '+'?           '+' = one-or-more over the WHOLE
                                       alternation (SPARQL ``(a|^b)+``)
        Each atom is one predicate-filtered scan; only the path's own
        subgraph is ever unioned/closed, never the triple table."""
        _, p, _ = pat
        if _is_var(p) or not isinstance(p, str):
            return triples
        if p.endswith("*"):
            raise ValueError(
                f"zero-or-more path {p!r} is not supported (its "
                "zero-length arm binds every node); use '+' and union "
                "the identity bindings you actually want"
            )
        plus = p.endswith("+")
        base = p[:-1] if plus else p
        atoms = base.split("|") if ("|" in base or base.startswith("^")) else None
        if atoms is None and not plus:
            return triples  # plain predicate constant
        atoms = atoms if atoms is not None else [base]
        legs = []
        for a in atoms:
            inv = a.startswith("^")
            name = a[1:] if inv else a
            if not name or "^" in name:
                raise ValueError(f"malformed path atom {a!r} in {p!r}")
            scan = triples.where(F.col(pred) == F.lit(name))
            legs.append(
                scan.select(F.col(obj).alias("src"), F.col(subj).alias("dst"))
                if inv
                else scan.select(F.col(subj).alias("src"), F.col(obj).alias("dst"))
            )
        e = legs[0]
        for leg in legs[1:]:
            e = e.unionByName(leg)
        if plus:
            from prase_spark.closure import transitive_closure

            e = transitive_closure(e, max_hops=path_max_hops).select(
                "src", F.col("anc").alias("dst")
            )
        return e.select(
            F.col("src").alias(subj), F.lit(p).alias(pred), F.col("dst").alias(obj)
        )

    # left-deep order: start with the most-constant pattern, then always
    # pick a pattern connected to the bound variables (fewest new vars
    # first) — a greedy selectivity heuristic; Catalyst/AQE still picks
    # the physical join strategy per step.
    remaining = [(_pattern_df(_source_for(p), p, subj, pred, obj), p) for p in pats]
    remaining.sort(key=lambda t: len(t[0][1]))
    (acc, bound), _ = remaining.pop(0)
    while remaining:
        idx = next(
            (i for i, ((_, vs), _) in enumerate(remaining) if vs & bound),
            None,
        )
        if idx is None:
            disconnected = [p for (_, _vs), p in remaining]
            raise ValueError(
                f"pattern(s) {disconnected} share no variable with the rest "
                "of the BGP — refusing the implicit cartesian product"
            )
        (df, vs), _ = remaining.pop(idx)
        acc = acc.join(df, on=sorted(vs & bound))
        bound |= vs
    acc = acc.select(*sorted(bound))
    if distinct:
        acc = acc.distinct()
    for pat in optional:
        df, vs = _pattern_df(_source_for(pat), pat, subj, pred, obj)
        shared = vs & bound
        if not shared:
            raise ValueError(
                f"optional pattern {pat} shares no variable with the "
                "required patterns — refusing the implicit cartesian product"
            )
        if distinct:
            df = df.distinct()
        acc = acc.join(df, on=sorted(shared), how="left")
        bound |= vs
    out = acc.select(*sorted(bound))
    for pat in minus:
        df, vs = _pattern_df(_source_for(pat), pat, subj, pred, obj)
        shared = vs & bound
        if not shared:
            raise ValueError(
                f"MINUS pattern {pat} shares no variable with the required "
                "patterns — SPARQL's disjoint-domain MINUS removes nothing; "
                "refusing the no-op"
            )
        out = out.join(df, on=sorted(shared), how="left_anti")
    for var, vals in (values or {}).items():
        name = var[1:] if _is_var(var) else var
        if name not in bound:
            raise ValueError(f"VALUES variable {var!r} not bound by the BGP")
        out = out.where(F.col(name).isin(list(vals)))
    for flt in filters:
        out = out.where(F.expr(flt) if isinstance(flt, str) else flt)
    return out


def bgp_aggregate(
    triples: DataFrame,
    patterns,
    group_by,
    aggs: dict,
    having=None,
    order_by=(),
    limit: int | None = None,
    distinct: bool = False,
    **bgp_kwargs,
) -> DataFrame:
    """SPARQL aggregate query — ``SELECT ?g (agg(...) AS alias) WHERE
    { patterns } GROUP BY ?g [HAVING ...] [ORDER BY ...] [LIMIT n]`` —
    over the BGP solution bag.

    ``group_by`` lists grouping variables (``?n`` or ``n``); ``aggs``
    maps result alias -> SQL aggregate expression over the bound
    variable columns (``{"n_orders": "count(*)", "cents":
    "sum(CAST(p AS BIGINT))"}``). ``distinct`` defaults to False because
    SPARQL aggregates evaluate over the solution BAG (a solution reached
    through two different edges counts twice); pass True for
    DISTINCT-then-aggregate. ``having`` / ``order_by`` entries are SQL
    expression strings or Columns; an empty ``group_by`` is a global
    (one-row) aggregation.

    Scale shape: the aggregation is one hash agg with map-side partial
    combine over the join output; ``order_by`` + ``limit`` together
    compile to TakeOrderedAndProject (per-partition top-k then a k-row
    merge — no global sort ever materializes). ``optional`` / ``filters``
    / property paths pass through to bgp_match unchanged."""
    sol = bgp_match(triples, patterns, distinct=distinct, **bgp_kwargs)
    keys = [g[1:] if _is_var(g) else g for g in group_by]
    missing = [k for k in keys if k not in sol.columns]
    if missing:
        raise ValueError(f"group_by variable(s) {missing} not bound by the BGP")
    if not aggs:
        raise ValueError("aggs must name at least one aggregate")
    agg_cols = [F.expr(e).alias(a) for a, e in aggs.items()]
    out = sol.groupBy(*keys).agg(*agg_cols) if keys else sol.agg(*agg_cols)
    if having is not None:
        out = out.where(F.expr(having) if isinstance(having, str) else having)
    if order_by:
        import re

        def _order_expr(o):
            # F.expr parses EXPRESSIONS, not sort items — a trailing
            # ASC/DESC would be silently dropped, so peel it ourselves
            if not isinstance(o, str):
                return o
            m = re.match(r"^(.*?)\s+(asc|desc)\s*$", o, re.IGNORECASE)
            if m:
                e = F.expr(m.group(1))
                return e.desc() if m.group(2).lower() == "desc" else e.asc()
            return F.expr(o)

        out = out.orderBy(*[_order_expr(o) for o in order_by])
    if limit is not None:
        out = out.limit(limit)
    return out


def bgp_union(
    triples: DataFrame,
    groups,
    distinct: bool = True,
    **shared_kwargs,
) -> DataFrame:
    """SPARQL UNION — ``{ group1 } UNION { group2 } ...`` — the solution
    bag of every group, merged.

    ``groups`` is a sequence where each element is either a pattern
    list (a plain BGP) or a dict of :func:`bgp_match` keyword arguments
    (``{"patterns": [...], "optional": [...], "filters": [...]}``) for
    a group carrying its own OPTIONAL/FILTER/MINUS/VALUES clauses.
    ``shared_kwargs`` (``subj``/``pred``/``obj`` column names,
    ``path_max_hops``) apply to every group.

    Per SPARQL set semantics, variables bound in one branch but not
    another are UNBOUND (NULL) in the other branch's solutions — the
    union schema is the sorted union of all branches' variables,
    NULL-padded (``unionByName(allowMissingColumns=True)``).
    ``distinct=True`` collapses duplicate solutions ACROSS branches
    (SELECT DISTINCT over the union); False keeps the bag.

    Scale shape: a UNION is a plan-level concatenation — each branch
    keeps its own pushed-down scans and join order, no extra exchange
    is introduced, and the optional final distinct is one hash
    aggregation over the union's output (change-volume-sized when the
    branches are selective)."""
    gs = list(groups)
    if len(gs) < 2:
        raise ValueError("UNION needs >= 2 groups")
    sols = []
    for g in gs:
        kw = dict(g) if isinstance(g, dict) else {"patterns": g}
        pats = kw.pop("patterns")
        # branch-level distinct is pointless work when the union dedups
        sols.append(
            bgp_match(triples, pats, distinct=False, **kw, **shared_kwargs)
        )
    out = sols[0]
    for s in sols[1:]:
        out = out.unionByName(s, allowMissingColumns=True)
    out = out.select(*sorted(out.columns))
    return out.distinct() if distinct else out


def bgp_construct(
    triples: DataFrame,
    patterns,
    template,
    distinct: bool = True,
    **bgp_kwargs,
) -> DataFrame:
    """SPARQL CONSTRUCT — ``CONSTRUCT { template } WHERE { patterns }``
    — build a NEW triple set from the solution bindings: the
    graph-to-graph transformation form (vocabulary mapping, edge
    reification, materializing a derived relation back into the store).

    ``template`` is a list of (s, p, o) terms: ``?var`` pulls the
    binding, anything else is a constant. Solutions with an UNBOUND
    variable in a template position (possible via OPTIONAL) drop that
    template triple only — SPARQL's incomplete-triple rule. Result
    columns are (subj, pred, obj); ``distinct=True`` gives RDF set
    semantics (a CONSTRUCT graph has no duplicate triples).

    Scale shape: the solution is computed ONCE (bag semantics — no
    distinct before the template fan-out); each template triple is a
    projection of it, unioned plan-level, and the final distinct is
    the single output-scale exchange. All bgp_match clauses (OPTIONAL /
    FILTER / MINUS / VALUES / property paths) pass through."""
    tpl = list(template)
    if not tpl:
        raise ValueError("empty CONSTRUCT template")
    sol = bgp_match(triples, patterns, distinct=False, **bgp_kwargs)
    bound = set(sol.columns)
    for t in tpl:
        for term in t:
            if _is_var(term) and term[1:] not in bound:
                raise ValueError(
                    f"template variable {term!r} not bound by the WHERE "
                    f"patterns (bound: {sorted(bound)})"
                )

    def _term(term):
        return F.col(term[1:]) if _is_var(term) else F.lit(term)

    outs = []
    for s, p, o in tpl:
        df = sol.select(
            _term(s).alias("subj"), _term(p).alias("pred"), _term(o).alias("obj")
        ).where(
            F.col("subj").isNotNull()
            & F.col("pred").isNotNull()
            & F.col("obj").isNotNull()
        )
        outs.append(df)
    out = outs[0]
    for df in outs[1:]:
        out = out.unionByName(df)
    return out.distinct() if distinct else out
