"""blocking_metrics: reduction ratio / pairs completeness / quality.

Load-bearing claims:
- all six counts and three micro-unit ratios match hand-computed
  Christen-metric values exactly (integer division, not float);
- duplicate candidate/gold pairs collapse before counting;
- empty candidates report pc/pq = 0 and rr = 1e6 without erroring.
"""

from __future__ import annotations

from prase_spark.evaluate import blocking_metrics


def _dfs(spark, cands, gold):
    l = spark.createDataFrame([(f"L{i}",) for i in range(4)], "l_id string")
    r = spark.createDataFrame([(f"R{i}",) for i in range(5)], "r_id string")
    c = spark.createDataFrame(cands or [("x", "y")], "l_id string, r_id string")
    if not cands:
        c = c.limit(0)
    g = spark.createDataFrame(gold, "l_id string, r_id string")
    return c, g, l, r


def test_hand_computed_exact(spark):
    # 4x5 = 20 total pairs; 5 distinct candidates (one duplicated);
    # 3 gold; 2 true candidates
    cands = [
        ("L0", "R0"), ("L0", "R0"),          # duplicate collapses
        ("L1", "R1"), ("L1", "R2"),
        ("L2", "R4"), ("L3", "R3"),
    ]
    gold = [("L0", "R0"), ("L1", "R1"), ("L2", "R2")]
    row = blocking_metrics(*_dfs(spark, cands, gold)).collect()[0]
    assert (row["n_left"], row["n_right"], row["total_pairs"]) == (4, 5, 20)
    assert (row["n_candidates"], row["n_gold"], row["n_true_candidates"]) == (
        5, 3, 2,
    )
    assert row["rr_e6"] == 1_000_000 - (1_000_000 * 5) // 20   # 750000
    assert row["pc_e6"] == (1_000_000 * 2) // 3                # 666666
    assert row["pq_e6"] == (1_000_000 * 2) // 5                # 400000


def test_empty_candidates(spark):
    row = blocking_metrics(
        *_dfs(spark, [], [("L0", "R0")])
    ).collect()[0]
    assert row["n_candidates"] == 0
    assert row["pc_e6"] == 0 and row["pq_e6"] == 0
    assert row["rr_e6"] == 1_000_000
