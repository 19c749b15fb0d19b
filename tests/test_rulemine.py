"""rulemine: AMIE-style rule mining (equiv / inverse / chain).

Load-bearing claims:
- measures match a pure-python implementation of the AMIE definitions
  EXACTLY (integer support / PCA confidence / head coverage) on an
  irregular planted KG, under repartitioning;
- semantics: a planted 90%-noise composition is found as a chain rule
  with conf_e6 = 900000-ish, subsumption is found as equiv both ways
  with the asymmetric PCA confidences the definition implies, an
  inverse predicate is found, and a symmetric predicate surfaces as
  its own inverse;
- the hub guard drops chain bodies through a super-node (telemetry)
  without touching the single-atom families.
"""

from __future__ import annotations

from collections import defaultdict

from prase_spark.rulemine import CONF_SCALE, mine_rules


def _py_mine(triples, min_support=2, min_conf_e6=0, max_deg=None):
    t = sorted(set(triples))
    heads = defaultdict(set)   # hpred -> {(x, y)}
    hx = defaultdict(set)      # hpred -> {x}
    for s, p, o in t:
        heads[p].add((s, o))
        hx[p].add(s)

    deg = defaultdict(int)
    for s, p, o in t:
        deg[s] += 1
        deg[o] += 1
    keep = (
        (lambda n: deg[n] <= max_deg) if max_deg is not None else (lambda n: True)
    )

    bodies = {}
    for p in heads:
        bodies[("equiv", p, None)] = heads[p]
        bodies[("inverse", p, None)] = {(o, s) for s, o in heads[p]}
    chain = defaultdict(set)
    out_by_z = defaultdict(list)
    for s, q, o in t:
        if keep(s) and keep(o):
            out_by_z[s].append((q, o))
    for s, p, z in t:
        if not (keep(s) and keep(z)):
            continue
        for q, y in out_by_z.get(z, ()):
            chain[(p, q)].add((s, y))
    for (p, q), pairs in chain.items():
        bodies[("chain", p, q)] = pairs

    rows = []
    for (rule, b1, b2), pairs in bodies.items():
        for hpred, hpairs in heads.items():
            if rule == "equiv" and hpred == b1:
                continue
            support = len(pairs & hpairs)
            if support < min_support:
                continue
            pca = sum(1 for x, _y in pairs if x in hx[hpred])
            conf = (support * CONF_SCALE) // pca
            hc = (support * CONF_SCALE) // len(hpairs)
            if conf < min_conf_e6:
                continue
            rows.append((rule, b1, b2, hpred, support, pca, len(hpairs), conf, hc))
    return sorted(rows)


def _planted_kg():
    """60 orders, 12 customers, 4 nations; noisy composition, partial
    subsumption, partial inverse, one symmetric predicate."""
    t = []
    for c in range(12):
        t.append((f"c{c}", "inNation", f"n{c % 4}"))
        if c % 3 != 0:
            t.append((f"c{c}", "memberOf", f"n{c % 4}"))   # subsumed
        if c % 2 == 0:
            t.append((f"n{c % 4}", "servedBy", f"c{c}"))   # inverse
    for o in range(60):
        c = o % 12
        t.append((f"o{o}", "placedBy", f"c{c}"))
        n = (c % 4) if o % 10 else ((c % 4) + 1) % 4       # 6/60 corrupted
        t.append((f"o{o}", "shipNation", f"n{n}"))
    t.append(("n0", "tradesWith", "n1"))                   # symmetric
    t.append(("n1", "tradesWith", "n0"))
    t.append(("n2", "tradesWith", "n3"))
    t.append(("n3", "tradesWith", "n2"))
    return t


def _to_df(spark, triples):
    return spark.createDataFrame(
        list(triples), "subj STRING, pred STRING, obj STRING"
    ).repartition(7)


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_matches_python_oracle_exactly(spark):
    t = _planted_kg()
    # duplicate assertions must collapse; an isolated dangling edge
    t += [("c0", "inNation", "n0"), ("z1", "loneEdge", "z2")]
    got = _rows(mine_rules(_to_df(spark, t), min_support=2))
    assert got == _py_mine(t, min_support=2)


def test_planted_rule_semantics(spark):
    got = {
        (r.rule, r.body1, r.body2, r.head): r
        for r in mine_rules(_to_df(spark, _planted_kg()), min_support=2).collect()
    }
    # noisy composition: placedBy ∧ inNation ⇒ shipNation at 90%
    chain = got[("chain", "placedBy", "inNation", "shipNation")]
    assert chain.support == 54 and chain.pca_body == 60
    assert chain.conf_e6 == 900000
    # subsumption: memberOf ⇒ inNation is exact; the converse is exact
    # under PCA (denominator restricted to x with SOME memberOf edge)
    assert got[("equiv", "memberOf", None, "inNation")].conf_e6 == CONF_SCALE
    assert got[("equiv", "inNation", None, "memberOf")].conf_e6 == CONF_SCALE
    assert got[("equiv", "inNation", None, "memberOf")].support == 8
    # inverse: servedBy(y,x) ⇒ inNation(x,y) exact; symmetric predicate
    # is its own inverse
    assert got[("inverse", "servedBy", None, "inNation")].conf_e6 == CONF_SCALE
    assert got[("inverse", "tradesWith", None, "tradesWith")].conf_e6 == CONF_SCALE
    assert ("equiv", "inNation", None, "shipNation") not in got


def test_head_coverage_and_min_conf(spark):
    df = _to_df(spark, _planted_kg())
    got = {
        (r.rule, r.body1, r.body2, r.head): r
        for r in mine_rules(df, min_support=2, min_conf_e6=800000).collect()
    }
    assert all(r.conf_e6 >= 800000 for r in got.values())
    chain = got[("chain", "placedBy", "inNation", "shipNation")]
    assert chain.head_size == 60 and chain.hc_e6 == 900000


def test_hub_guard_drops_chain_only(spark):
    t = _planted_kg()
    # a super-node hub (degree 46 vs <=28 for everything else): many
    # spokes point at 'hub', hub points at every nation — ungated this
    # fabricates chain bodies through the hub
    t += [(f"c{c}", "likes", "hub") for c in range(12)]
    t += [(f"x{i}", "likes", "hub") for i in range(30)]
    t += [("hub", "near", f"n{n}") for n in range(4)]
    stats = {}
    got = _rows(
        mine_rules(_to_df(spark, t), min_support=2, max_node_degree=30,
                   stats_out=stats)
    )
    assert stats["chain_hot_nodes"] == 1 and stats["chain_hot_edges"] == 46
    assert got == _py_mine(t, min_support=2, max_deg=30)
    assert not any(r[0] == "chain" and (r[1] == "likes" or r[2] == "near")
                   for r in got), "hub-mediated chain bodies must be gone"
    # single-atom families untouched by the guard: inverse over the
    # hub's own edges still minable in the unguarded twin
    ungated = _py_mine(t, min_support=2)
    assert any(r[0] == "chain" and r[1] == "likes" for r in ungated)


def test_repartition_invariance(spark):
    t = _planted_kg()
    a = _rows(mine_rules(_to_df(spark, t).repartition(1), min_support=2))
    b = _rows(mine_rules(_to_df(spark, t).repartition(13), min_support=2))
    assert a == b
