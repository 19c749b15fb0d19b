"""truth: proportional-share truth discovery + conflict resolution.

Load-bearing claims:
- bit-determinism — the Spark result equals a pure-Python integer
  simulation of the same recurrence EXACTLY (no tolerance), under any
  repartitioning (what lets the driver gate hash it vs a DuckDB twin);
- the semantics that justify the operator — with iterations=1 the
  resolution IS majority vote (the colluding wrong value wins), and by
  iteration 2 the trust transfer flips the contested slots to the value
  asserted by the reliable minority.
"""

from __future__ import annotations

import pytest

from prase_spark.truth import (
    SHARE_QUANTUM,
    TRUST_SCALE,
    resolve_facts,
    truth_discovery,
)


def _py_truth(votes, iterations, scale=TRUST_SCALE, quantum=SHARE_QUANTUM):
    """Pure-python integer twin: votes = [(source, subj, pred, obj)]."""
    votes = sorted(set(votes))
    sources = sorted({v[0] for v in votes})
    n_claims = {s: sum(1 for v in votes if v[0] == s) for s in sources}
    trust = {s: scale for s in sources}
    share = {}
    for _ in range(iterations):
        braw, tot = {}, {}
        for s, subj, pred, obj in votes:
            braw[(subj, pred, obj)] = braw.get((subj, pred, obj), 0) + trust[s]
        for (subj, pred, _obj), b in braw.items():
            tot[(subj, pred)] = tot.get((subj, pred), 0) + b
        share = {}
        for (subj, pred, obj), b in braw.items():
            t = tot[(subj, pred)]
            if t == 0:
                share[(subj, pred, obj)] = 0
                continue
            d = 1 + t // quantum
            share[(subj, pred, obj)] = ((b // d) * scale) // (t // d)
        tsum = {s: 0 for s in sources}
        for s, subj, pred, obj in votes:
            tsum[s] += share[(subj, pred, obj)]
        trust = {s: tsum[s] // n_claims[s] for s in sources}
    return share, trust


def _claims_df(spark, votes):
    return spark.createDataFrame(
        list(votes), "source STRING, subj STRING, pred STRING, obj STRING"
    )


def _collusion_votes():
    """10 slots where two colluders outvote the truth-teller; 80 slots
    where the colluders' lone wrong values are crushed 3-to-1."""
    votes = []
    for k in range(1, 11):
        s = f"e{k}"
        votes += [("good", s, "p", "A"), ("bad1", s, "p", "B"),
                  ("bad2", s, "p", "B")]
    for k in range(11, 91):
        s = f"e{k}"
        votes += [("good", s, "p", "A"), ("ok1", s, "p", "A"),
                  ("ok2", s, "p", "A"), ("bad1", s, "p", "B"),
                  ("bad2", s, "p", "C")]
    return votes


def test_matches_python_oracle_exactly(spark):
    votes = _collusion_votes()
    # an irregular extra slot: four-way disagreement + a duplicate
    # assertion that must collapse to one vote
    votes += [("good", "x", "q", "v1"), ("good", "x", "q", "v1"),
              ("bad1", "x", "q", "v2"), ("ok1", "x", "q", "v3"),
              ("ok2", "x", "q", "v4")]
    for iterations in (1, 3):
        belief, trust = truth_discovery(
            _claims_df(spark, votes).repartition(7), iterations=iterations
        )
        py_share, py_trust = _py_truth(votes, iterations)
        got_b = {
            (r.subj, r.pred, r.obj): r.conf_e12 for r in belief.collect()
        }
        got_t = {r.source: r.trust_e12 for r in trust.collect()}
        assert got_b == py_share
        assert got_t == py_trust


def test_majority_flip(spark):
    """iterations=1 == majority vote (wrong); iterations=2 flips."""
    df = _claims_df(spark, _collusion_votes())
    b1, _ = truth_discovery(df, iterations=1)
    r1 = {r.subj: r.obj for r in resolve_facts(b1).collect()}
    assert all(r1[f"e{k}"] == "B" for k in range(1, 11))

    b2, t2 = truth_discovery(df, iterations=2)
    r2 = {r.subj: r.obj for r in resolve_facts(b2).collect()}
    assert all(r2[f"e{k}"] == "A" for k in range(1, 11))
    assert all(r2[f"e{k}"] == "A" for k in range(11, 91))
    tr = {r.source: r.trust_e12 for r in t2.collect()}
    assert tr["good"] > tr["bad1"] == tr["bad2"]


def test_resolution_tiebreak_min_obj(spark):
    votes = [("s1", "e", "p", "vB"), ("s2", "e", "p", "vA")]
    belief, _ = truth_discovery(_claims_df(spark, votes), iterations=2)
    rows = resolve_facts(belief).collect()
    assert len(rows) == 1 and rows[0].obj == "vA"
    # share quantization: exact vs the integer twin, ~0.5 vs the ideal
    py_share, _ = _py_truth(votes, 2)
    assert rows[0].conf_e12 == py_share[("e", "p", "vA")]
    assert abs(rows[0].conf_e12 - TRUST_SCALE // 2) < TRUST_SCALE // SHARE_QUANTUM


def test_repartition_invariance(spark):
    votes = _collusion_votes()
    outs = []
    for n in (1, 13):
        belief, trust = truth_discovery(
            _claims_df(spark, votes).repartition(n), iterations=3
        )
        outs.append((
            sorted(map(tuple, belief.collect())),
            sorted(map(tuple, trust.collect())),
        ))
    assert outs[0] == outs[1]


def test_rejects_bad_iterations(spark):
    df = _claims_df(spark, [("s", "e", "p", "v")])
    with pytest.raises(ValueError):
        truth_discovery(df, iterations=0)
