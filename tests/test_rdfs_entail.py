"""rdfs_entail: ρdf forward-chaining materialization.

Load-bearing claims:
- output matches a pure-python ρdf fixpoint EXACTLY (set semantics)
  on a KG exercising every rule interaction: multi-hop subPropertyOf
  and subClassOf chains, domain declared on a SUPERproperty firing for
  a subproperty's instances, range-derived types inheriting through
  the class closure, a subPropertyOf-of-rdf:type edge feeding the type
  stream, and a redundant domain duplicating an asserted type
  (dedup check);
- asserted triples always survive; an empty schema is the identity
  (modulo distinct);
- repartition invariance.
"""

from __future__ import annotations

from prase_spark.closure import rdfs_entail

SC, SP, DOM, RNG, TYPE = (
    "rdfs:subClassOf",
    "rdfs:subPropertyOf",
    "rdfs:domain",
    "rdfs:range",
    "rdf:type",
)


def _py_close(pairs):
    c = set(pairs)
    while True:
        new = {(a, d) for (a, b) in c for (b2, d) in c if b == b2} - c
        if not new:
            return c
        c |= new


def _py_entail(triples, schema):
    cp = _py_close({(s, o) for s, p, o in schema if p == SP})
    cc = _py_close({(s, o) for s, p, o in schema if p == SC})
    dom = {(s, o) for s, p, o in schema if p == DOM}
    rng = {(s, o) for s, p, o in schema if p == RNG}
    t = set(triples)
    exp = t | {(s, q, o) for (s, p, o) in t for (p2, q) in cp if p2 == p}
    typed = (
        {(s, o) for (s, p, o) in exp if p == TYPE}
        | {(s, c) for (s, p, o) in exp for (p2, c) in dom if p2 == p}
        | {(o, c) for (s, p, o) in exp for (p2, c) in rng if p2 == p}
    )
    typed |= {(e, d) for (e, c) in typed for (c2, d) in cc if c2 == c}
    return exp | {(e, TYPE, c) for (e, c) in typed}


def _to_df(spark, triples):
    return spark.createDataFrame(
        [tuple(t) for t in triples], "subj string, pred string, obj string"
    )


TRIPLES = [
    ("o1", "placedBy", "c1"),
    ("c1", "memberOf", "n1"),
    ("c2", "inNation", "n2"),
    ("c2", TYPE, "Customer"),       # asserted type, inherits up the chain
    ("x1", "isA", "Gadget"),        # isA ⊑ rdf:type feeds the type stream
    ("o1", TYPE, "Order"),          # duplicated by domain(placedBy) below
]

SCHEMA = [
    ("memberOf", SP, "affiliatedWith"),
    ("affiliatedWith", SP, "relatedTo"),    # 2-hop property chain
    ("isA", SP, TYPE),                      # subproperty OF rdf:type
    ("placedBy", DOM, "Order"),             # redundant with asserted type
    ("placedBy", RNG, "Customer"),
    ("affiliatedWith", DOM, "Member"),      # domain on a SUPERproperty
    ("Customer", SC, "Agent"),
    ("Agent", SC, "Thing"),                 # 2-hop class chain
    ("Gadget", SC, "Artifact"),
    ("Member", SC, "Agent"),
]


def test_matches_python_oracle_exactly(spark):
    got = {
        (r["subj"], r["pred"], r["obj"])
        for r in rdfs_entail(_to_df(spark, TRIPLES), _to_df(spark, SCHEMA)).collect()
    }
    assert got == _py_entail(TRIPLES, SCHEMA)


def test_key_derivations_present(spark):
    got = {
        (r["subj"], r["pred"], r["obj"])
        for r in rdfs_entail(_to_df(spark, TRIPLES), _to_df(spark, SCHEMA)).collect()
    }
    assert set(TRIPLES) <= got                          # asserted survive
    assert ("c1", "relatedTo", "n1") in got             # 2-hop subprop
    assert ("c1", TYPE, "Member") in got                # dom on superprop
    assert ("c1", TYPE, "Thing") in got                 # Member->Agent->Thing
    assert ("c1", TYPE, "Customer") in got              # range(placedBy)
    assert ("c2", TYPE, "Thing") in got                 # asserted type chain
    assert ("x1", TYPE, "Gadget") in got                # isA ⊑ rdf:type
    assert ("x1", TYPE, "Artifact") in got              # ...then subclass
    assert ("n2", TYPE, "Member") not in got            # inNation has no dom


def test_empty_schema_is_identity(spark):
    empty = _to_df(spark, []).limit(0)
    got = {
        (r["subj"], r["pred"], r["obj"])
        for r in rdfs_entail(_to_df(spark, TRIPLES), empty).collect()
    }
    assert got == set(TRIPLES)


def test_repartition_invariance(spark):
    base = _to_df(spark, TRIPLES)
    a = {
        tuple(r)
        for r in rdfs_entail(base.repartition(7), _to_df(spark, SCHEMA)).collect()
    }
    b = {
        tuple(r)
        for r in rdfs_entail(base.coalesce(1), _to_df(spark, SCHEMA)).collect()
    }
    assert a == b
