"""fuzzy_join: deletion-neighborhood edit-distance join.

Load-bearing claims:
- output equals a brute-force python Levenshtein cross-join EXACTLY
  (losslessness of the deletion-neighborhood filter) at k = 0, 1, 2
  over a value set with substitutions, insertions, deletions,
  transpositions (distance 2), duplicates, and empty strings;
- edits is the exact distance; per-ID pairing (two ids sharing a value
  both match);
- the hot-key cap drops pairs only via telemetry-visible bucket drops.
"""

from __future__ import annotations

from prase_spark.fuzzy import fuzzy_join


def _lev(a, b):
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(
                min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
            )
        prev = cur
    return prev[-1]


LEFT = [
    ("L1", "marble"),
    ("L2", "marble"),      # duplicate value, distinct id
    ("L3", "almond"),
    ("L4", "bisque"),
    ("L5", ""),            # empty string
    ("L6", "rose"),
]
RIGHT = [
    ("R1", "marble"),      # exact
    ("R2", "marbles"),     # 1 insertion
    ("R3", "marbel"),      # transposition = distance 2
    ("R4", "almnd"),       # 1 deletion
    ("R5", "bosque"),      # 1 substitution
    ("R6", "a"),           # distance 1 from ""
    ("R7", "unrelated"),
]


def _dfs(spark):
    l = spark.createDataFrame(LEFT, "l_id string, value string")
    r = spark.createDataFrame(RIGHT, "r_id string, value string")
    return l, r


def _brute(k):
    return {
        (li, ri, _lev(lv, rv))
        for li, lv in LEFT
        for ri, rv in RIGHT
        if _lev(lv, rv) <= k
    }


def test_matches_brute_force_all_k(spark):
    l, r = _dfs(spark)
    for k in (0, 1, 2):
        got = {
            (x["l_id"], x["r_id"], x["edits"])
            for x in fuzzy_join(l, r, max_edits=k).collect()
        }
        assert got == _brute(k), f"k={k}"


def test_duplicate_values_pair_per_id(spark):
    l, r = _dfs(spark)
    got = {
        (x["l_id"], x["r_id"])
        for x in fuzzy_join(l, r, max_edits=0).collect()
    }
    assert ("L1", "R1") in got and ("L2", "R1") in got


def test_hot_key_cap_telemetry(spark):
    # 60 identical left values share every deletion key; cap at 10
    l = spark.createDataFrame(
        [(f"L{i}", "aaaa") for i in range(60)], "l_id string, value string"
    )
    r = spark.createDataFrame([("R1", "aaab")], "r_id string, value string")
    stats: dict = {}
    out = fuzzy_join(l, r, max_edits=1, max_key_df=10, stats_out=stats)
    assert out.count() == 0
    assert stats["left"]["capped_buckets"] > 0
    assert stats["left"]["capped_rows"] >= 60
