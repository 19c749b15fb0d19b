"""Link-graph extraction: grammar, href resolution, host graph, anchor priors."""

from pyspark.sql import functions as F

from prase_spark.linkgraph import (
    anchor_text_priors,
    extract_links,
    host_link_graph,
    resolve_href,
)


def _pages(spark, rows):
    return spark.createDataFrame(
        [(u, h.encode("utf-8")) for u, h in rows], "url string, html binary"
    )


def test_extract_links_grammar_and_resolution(spark):
    html = (
        '<p>x</p>'
        '<a href="https://ext.com/a">Abs  Link</a>'
        '<A CLASS="z" HREF="/rooted.html"> Rooted\n text </A>'
        '<a href="rel.html"></a>'
        '<a href="//cdn.net/c">CDN</a>'
        '<a href="https://spam.example/s" rel="ugc nofollow">Spam</a>'
        '<a href="mailto:a@b.c">Mail</a>'
        '<a href="#frag">Frag</a>'
        '<a href="javascript:void(0)">JS</a>'
        '<a href="x.html"><img src="i.png"></a>'  # nested markup: out of grammar
    )
    pages = _pages(spark, [("https://h.example.org/dir/p.html", html)])
    got = sorted(
        extract_links(pages).select("dst_url", "anchor").collect(),
        key=lambda r: (r.dst_url, r.anchor),
    )
    assert [(r.dst_url, r.anchor) for r in got] == [
        ("https://cdn.net/c", "CDN"),
        ("https://ext.com/a", "Abs Link"),
        ("https://h.example.org/dir/rel.html", ""),
        ("https://h.example.org/rooted.html", "Rooted text"),
    ]
    # nofollow kept when drop_nofollow=False
    kept = extract_links(pages, drop_nofollow=False)
    assert kept.where(F.col("dst_url") == "https://spam.example/s").count() == 1


def test_resolve_href_pathless_source(spark):
    df = spark.createDataFrame(
        [("http://host.org", "page.html"), ("http://host.org", "/abs.html")],
        "src string, href string",
    )
    got = sorted(
        df.select(resolve_href("src", "href").alias("u")).collect()
    )
    assert [r.u for r in got] == [
        "http://host.org/abs.html",
        "http://host.org/page.html",
    ]


def test_host_link_graph_weights_and_self_loops(spark):
    links = spark.createDataFrame(
        [
            ("https://a.org/p1", "https://b.org/x", "t"),
            ("https://a.org/p1", "https://b.org/y", "t"),
            ("https://a.org/p2", "https://b.org/x", "t"),
            ("https://a.org/p1", "https://a.org/nav", "self"),
        ],
        "src_url string, dst_url string, anchor string",
    )
    g = host_link_graph(links).collect()
    assert len(g) == 1
    row = g[0]
    assert (row.src_host, row.dst_host, row.n_links, row.n_src_pages) == (
        "a.org", "b.org", 3, 2
    )
    g2 = host_link_graph(links, drop_self=False)
    assert g2.count() == 2


def test_anchor_text_priors_topk_ties(spark):
    rows = (
        [("s%d" % i, "https://t.org/x", "beta") for i in range(3)]
        + [("s%d" % i, "https://t.org/x", "alpha") for i in range(3)]
        + [("s9", "https://t.org/x", "gamma")]
        + [("s1", "https://t.org/x", "")]  # empty anchors never count
    )
    links = spark.createDataFrame(
        rows, "src_url string, dst_url string, anchor string"
    )
    got = sorted(
        anchor_text_priors(links, k=2, salt_buckets=4).collect(),
        key=lambda r: r.anchor,
    )
    # counts tie 3-3 between alpha/beta -> both kept (anchor-asc order);
    # gamma (1) cut by k=2
    assert [(r.anchor, r.n) for r in got] == [("alpha", 3), ("beta", 3)]


def test_link_mentions_argmax_and_nil(spark):
    from prase_spark.linkgraph import link_mentions

    priors = spark.createDataFrame(
        [
            ("https://a.org/x", "Big Apple", 5),
            ("https://b.org/y", "Big Apple", 5),   # tie -> dst asc = a.org
            ("https://c.org/z", "big apple", 9),   # case folds into same key
            ("https://d.org/w", "Unrelated", 3),
        ],
        "dst_url string, anchor string, n long",
    )
    mentions = spark.createDataFrame(
        [("m1", "BIG APPLE"), ("m2", "nothing matches")],
        "id string, mention string",
    )
    got = {r.id: r.entity_url for r in link_mentions(mentions, priors).collect()}
    assert got == {"m1": "https://c.org/z", "m2": None}
    # tie case: drop the 9-count row -> a.org wins by dst asc
    got2 = {
        r.id: r.entity_url
        for r in link_mentions(mentions, priors.where(F.col("n") != 9)).collect()
    }
    assert got2["m1"] == "https://a.org/x"


def test_extract_links_parallelism_invariant(spark):
    html = '<a href="/a.html">A</a><a href="b.html">B b</a>'
    rows = [("https://h%d.org/d/p%d" % (i % 3, i), html) for i in range(40)]
    pages = _pages(spark, rows)
    one = sorted(map(tuple, extract_links(pages.coalesce(1)).collect()))
    many = sorted(map(tuple, extract_links(pages.repartition(7)).collect()))
    assert one == many and len(one) == 80


def test_extract_hreflang_grammar(spark):
    from prase_spark.linkgraph import extract_hreflang

    html = (
        "<html><head>"
        '<link rel="alternate" hreflang="EN" href="/en/p1.html">'
        # attribute order flipped: href first, rel last
        '<link hreflang="fr" href="/fr/p1.html" rel="alternate">'
        # x-default convention
        '<link rel="alternate" hreflang="x-default" href="https://h.org/en/p1.html">'
        # rel=alternate but no hreflang (RSS feed) -> dropped
        '<link rel="alternate" type="application/rss+xml" href="/feed.xml">'
        # not rel=alternate -> out of grammar entirely
        '<link rel="stylesheet" href="/s.css">'
        "</head><body>x</body></html>"
    )
    pages = _pages(spark, [("https://h.org/en/p1.html", html)])
    got = sorted(
        map(tuple, extract_hreflang(pages).collect())
    )
    assert got == [
        ("https://h.org/en/p1.html", "en", "https://h.org/en/p1.html"),
        ("https://h.org/en/p1.html", "fr", "https://h.org/fr/p1.html"),
        ("https://h.org/en/p1.html", "x-default", "https://h.org/en/p1.html"),
    ]


def test_hreflang_clusters_min_url_and_selfloop(spark):
    from prase_spark.linkgraph import hreflang_clusters

    # group 1: en+fr pages cross-declare (plus self rows); group 2: a
    # lone page whose only alternate is itself -> still gets a cluster
    alts = spark.createDataFrame(
        [
            ("https://h.org/en/g1", "fr", "https://h.org/fr/g1"),
            ("https://h.org/en/g1", "en", "https://h.org/en/g1"),
            ("https://h.org/fr/g1", "en", "https://h.org/en/g1"),
            ("https://h.org/fr/g1", "fr", "https://h.org/fr/g1"),
            ("https://h.org/en/g2", "en", "https://h.org/en/g2"),
        ],
        "url string, hreflang string, href string",
    )
    got = {r.url: r.cluster for r in hreflang_clusters(alts).collect()}
    assert got == {
        "https://h.org/en/g1": "https://h.org/en/g1",
        "https://h.org/fr/g1": "https://h.org/en/g1",
        "https://h.org/en/g2": "https://h.org/en/g2",
    }


def test_extract_hreflang_parallelism_invariant(spark):
    from prase_spark.linkgraph import extract_hreflang

    html = (
        '<link rel="alternate" hreflang="en" href="/en/x">'
        '<link rel="alternate" hreflang="de" href="/de/x">'
    )
    rows = [("https://h%d.org/en/x" % (i % 3), html) for i in range(30)]
    pages = _pages(spark, rows)
    one = sorted(map(tuple, extract_hreflang(pages.coalesce(1)).collect()))
    many = sorted(map(tuple, extract_hreflang(pages.repartition(7)).collect()))
    assert one == many and len(one) == 60


def test_hreflang_clusters_hashed_parity_and_cap(spark):
    from prase_spark.linkgraph import hreflang_clusters

    alts = spark.createDataFrame(
        [("https://h.org/%s/g%d" % (l, i), l2, "https://h.org/%s/g%d" % (l2, i))
         for i in range(20) for l in ("en", "fr") for l2 in ("en", "fr")],
        "url string, hreflang string, href string",
    )
    s = sorted(map(tuple, hreflang_clusters(alts).collect()))
    h = sorted(map(tuple, hreflang_clusters(alts, hashed=True).collect()))
    assert s == h and len(s) == 40

    # mega-cluster guard: one template target welding every page
    bug = alts.unionByName(
        spark.createDataFrame(
            [("https://h.org/en/g%d" % i, "x-default", "https://h.org/BUG")
             for i in range(20)],
            "url string, hreflang string, href string",
        )
    )
    stats = {}
    capped = hreflang_clusters(bug, max_target_indegree=3, stats_out=stats)
    # the weld edges drop; the per-group clusters survive intact
    got = {r.url: r.cluster for r in capped.collect()}
    assert got["https://h.org/fr/g7"] == "https://h.org/en/g7"
    assert got["https://h.org/fr/g3"] == "https://h.org/en/g3"
    assert stats["n_hot_targets"] == 1 and stats["n_edges_dropped"] == 20
