"""earliest_arrival (temporalgraph.py) vs a brute-force temporal BFS."""

import pytest

from prase_spark.temporalgraph import earliest_arrival

# 0 -t5-> 1 -t3-> 2 : the t3 edge departs BEFORE arrival(1)=5, so 2 is
# NOT reachable through it; but 0 -t2-> 3 -t4-> 2 works (arrive 4).
EDGES = [
    (0, 1, 5),
    (1, 2, 3),
    (0, 3, 2),
    (3, 2, 4),
    (2, 4, 4),    # same-time hop allowed (non-strict)
    (4, 5, 1),    # too early forever
    (7, 8, 9),    # disconnected from seed
]


def _brute(edges, seeds, start_ts, hops=None):
    arr = {s: start_ts for s in seeds}
    changed = True
    rounds = 0
    while changed and (hops is None or rounds < hops):
        changed = False
        offers = {}
        for u, v, t in edges:
            if u in arr and t >= arr[u]:
                if v not in offers or t < offers[v]:
                    offers[v] = t
        for v, t in offers.items():
            if v not in arr or t < arr[v]:
                arr[v] = t
                changed = True
        rounds += 1
    return arr


def test_time_respecting_paths(spark):
    edges = spark.createDataFrame(EDGES, ["src", "dst", "ts"])
    seeds = spark.createDataFrame([(0,)], ["node"])
    got = {
        r.node: r.arrival
        for r in earliest_arrival(edges, seeds, start_ts=0).collect()
    }
    assert got == _brute(EDGES, [0], 0)
    assert got[2] == 4        # via 3, not via the out-of-order t3 edge
    assert got[4] == 4        # same-time hop admitted
    assert 5 not in got       # edge at t1 < arrival(4)=4 never fires
    assert 7 not in got


def test_hop_bounded_mode(spark):
    edges = spark.createDataFrame(EDGES, ["src", "dst", "ts"])
    seeds = spark.createDataFrame([(0,)], ["node"])
    for h in (1, 2):
        got = {
            r.node: r.arrival
            for r in earliest_arrival(edges, seeds, start_ts=0, iterations=h).collect()
        }
        assert got == _brute(EDGES, [0], 0, hops=h), f"h={h}"


def test_start_ts_gates_first_hop(spark):
    edges = spark.createDataFrame(EDGES, ["src", "dst", "ts"])
    seeds = spark.createDataFrame([(0,)], ["node"])
    got = {
        r.node: r.arrival
        for r in earliest_arrival(edges, seeds, start_ts=3).collect()
    }
    # the t2 edge departs before start_ts=3: only the t5 route remains
    assert got == _brute(EDGES, [0], 3)
    assert 3 not in got
    assert got[1] == 5
