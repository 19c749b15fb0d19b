"""Redirect-chain resolution: pointer doubling, cycles, hop counts."""

from prase_spark.datapipe.urlnorm import resolve_redirects


def test_chain_cycle_terminal(spark):
    edges = spark.createDataFrame(
        [
            # 5-hop chain: a5 -> a4 -> a3 -> a2 -> a1 -> a0
            ("a5", "a4"), ("a4", "a3"), ("a3", "a2"), ("a2", "a1"), ("a1", "a0"),
            # 2-cycle
            ("c1", "c2"), ("c2", "c1"),
            # 1-hop
            ("b1", "b0"),
        ],
        "src string, dst string",
    )
    got = {r.src: (r.final, r.hops, r.cyclic) for r in resolve_redirects(edges).collect()}
    assert got["a5"] == ("a0", 5, False)
    assert got["a3"] == ("a0", 3, False)
    assert got["b1"] == ("b0", 1, False)
    assert got["c1"][0] is None and got["c1"][2] is True
    assert got["c2"][0] is None and got["c2"][2] is True


def test_long_chain_within_doubling_budget(spark):
    n = 30  # < max_hops=32, needs all 5 doubling rounds
    edges = spark.createDataFrame(
        [("u%d" % i, "u%d" % (i - 1)) for i in range(1, n + 1)],
        "src string, dst string",
    )
    got = {r.src: (r.final, r.hops) for r in resolve_redirects(edges).collect()}
    assert got["u%d" % n] == ("u0", n)
    assert got["u1"] == ("u0", 1)


def test_overlong_chain_flagged(spark):
    edges = spark.createDataFrame(
        [("u%d" % i, "u%d" % (i - 1)) for i in range(1, 6)],
        "src string, dst string",
    )
    got = {r.src: r.cyclic for r in resolve_redirects(edges, max_hops=4).collect()}
    # ceil(log2(4)) = 2 rounds resolve chains up to 4 hops; the 5-hop
    # head still points at a source -> flagged
    assert got["u5"] is True and got["u4"] is False


def test_page_identity_merges_all_signals(spark):
    from prase_spark.datapipe.urlnorm import page_identity

    pages = spark.createDataFrame(
        [
            ("https://A.org/p1?utm_source=x",),   # cosmetic variant of p1
            ("https://a.org/p1#frag",),           # same page, other variant
            ("https://a.org/p2",),                # og:url -> shared target
            ("https://b.org/q",),                 # redirect chain into p2's group
            ("https://lone.org/z?fbclid=1",),     # no signals -> own id
        ],
        "url string",
    )
    canon_hints = spark.createDataFrame(
        [("https://a.org/p1", "https://c.org/T")], "url string, target string"
    )
    og_hints = spark.createDataFrame(
        [
            ("https://a.org/p2", "https://c.org/T"),
            ("https://b.org/q", None),            # NULL target skipped
        ],
        "url string, target string",
    )
    redirects = spark.createDataFrame(
        [("https://b.org/q", "https://a.org/p2#x")], "src string, dst string"
    )
    stats = {}
    got = {
        r.url: r.page_id
        for r in page_identity(
            pages, canon_hints, og_hints, redirects=redirects, stats_out=stats
        ).collect()
    }
    # p1 variants, p2, q all weld through https://c.org/T; the group id
    # is the min CANONICAL url in the component = https://a.org/p1
    assert got == {
        "https://A.org/p1?utm_source=x": "https://a.org/p1",
        "https://a.org/p1#frag": "https://a.org/p1",
        "https://a.org/p2": "https://a.org/p1",
        "https://b.org/q": "https://a.org/p1",
        "https://lone.org/z?fbclid=1": "https://lone.org/z",
    }
    assert stats["n_pages"] == 5 and stats["n_hint_edges"] == 2
    assert stats["n_redirect_edges"] == 1


def test_page_identity_hashed_parity(spark):
    from prase_spark.datapipe.urlnorm import page_identity

    pages = spark.createDataFrame(
        [("https://h%d.org/p%d?utm_source=x" % (i % 9, i),) for i in range(60)],
        "url string",
    )
    hints = spark.createDataFrame(
        [
            ("https://h%d.org/p%d" % (i % 9, i),
             "https://c.org/T%d" % (i // 4))
            for i in range(60)
        ],
        "url string, target string",
    )
    redirects = spark.createDataFrame(
        [("https://h%d.org/p%d" % (i % 9, i),
          "https://h%d.org/p%d" % ((i - 4) % 9, i - 4))
         for i in range(4, 60, 20)],
        "src string, dst string",
    )
    s_stats, h_stats = {}, {}
    s = sorted(map(tuple, page_identity(
        pages, hints, redirects=redirects, stats_out=s_stats).collect()))
    h = sorted(map(tuple, page_identity(
        pages, hints, redirects=redirects, hashed=True,
        stats_out=h_stats).collect()))
    assert s == h and len(s) == 60
    # the collision audit surface exists and is plausible
    assert h_stats["n_nodes"] >= 60


def test_page_identity_indegree_cap(spark):
    from prase_spark.datapipe.urlnorm import page_identity

    pages = spark.createDataFrame(
        [("https://h.org/p%d" % i,) for i in range(30)], "url string"
    )
    # template bug: every page declares the same canonical target
    hints = spark.createDataFrame(
        [("https://h.org/p%d" % i, "https://h.org/BUG") for i in range(30)]
        + [("https://h.org/p1", "https://h.org/p2")],  # one legit pair
        "url string, target string",
    )
    stats = {}
    got = {
        r.url: r.page_id
        for r in page_identity(
            pages, hints, max_target_indegree=5, stats_out=stats
        ).collect()
    }
    # the BUG weld is dropped; pages keep their own identity except the
    # legit pair
    assert got["https://h.org/p7"] == "https://h.org/p7"
    assert got["https://h.org/p2"] == "https://h.org/p1"
    assert stats["n_hot_targets"] == 1 and stats["n_edges_dropped"] == 30
