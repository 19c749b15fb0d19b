"""RSS/Atom feed parsing + page-head feed autodiscovery."""

from prase_spark.datapipe.feeds import discover_feeds, parse_feeds


def test_parse_rss_items(spark):
    body = (
        '<?xml version="1.0"?><rss version="2.0"><channel>'
        "<title>Chan</title><link>https://h.org/</link>"
        "<item><title>A &amp; B</title><link> https://h.org/a </link>"
        "<guid>g1</guid><pubDate>Mon, 05 Aug 2024 10:00:00 GMT</pubDate></item>"
        "<item><link>https://h.org/b</link></item>"
        "<item><title>no link -> dropped</title></item>"
        "</channel></rss>"
    )
    feeds = spark.createDataFrame([("h.org", body)], "host string, body string")
    got = sorted(map(tuple, parse_feeds(feeds).collect()))
    assert got == [
        ("h.org", "rss", "https://h.org/a", "A & B", "g1",
         "Mon, 05 Aug 2024 10:00:00 GMT"),
        ("h.org", "rss", "https://h.org/b", None, None, None),
    ]


def test_parse_atom_entries(spark):
    body = (
        '<feed xmlns="http://www.w3.org/2005/Atom"><title>F</title>'
        '<entry><title>One</title><link rel="alternate" '
        'href="https://a.org/1"/><id>tag:1</id>'
        "<updated>2024-08-05T10:00:00Z</updated></entry>"
        "<entry><title>no link</title><id>tag:2</id></entry>"
        "</feed>"
    )
    feeds = spark.createDataFrame([("a.org", body)], "host string, body string")
    got = sorted(map(tuple, parse_feeds(feeds).collect()))
    assert got == [
        ("a.org", "atom", "https://a.org/1", "One", "tag:1",
         "2024-08-05T10:00:00Z"),
    ]


def test_parse_feeds_non_feed_dropped(spark):
    feeds = spark.createDataFrame(
        [("x.org", "<html><body>not a feed</body></html>")],
        "host string, body string",
    )
    assert parse_feeds(feeds).count() == 0


def test_discover_feeds(spark):
    html = (
        "<html><head>"
        '<link rel="alternate" type="application/rss+xml" href="/feed.xml">'
        # flipped attribute order + atom
        '<link href="atom.xml" type="application/atom+xml" rel="alternate">'
        # hreflang alternate: not a feed -> dropped
        '<link rel="alternate" hreflang="fr" href="/fr/p.html">'
        '<link rel="stylesheet" href="/s.css">'
        "</head></html>"
    ).encode()
    pages = spark.createDataFrame(
        [("https://h.org/dir/p.html", html)], "url string, html binary"
    )
    got = sorted(map(tuple, discover_feeds(pages).collect()))
    assert got == [
        ("https://h.org/dir/p.html", "https://h.org/dir/atom.xml", "atom"),
        ("https://h.org/dir/p.html", "https://h.org/feed.xml", "rss"),
    ]


def test_parse_feeds_parallelism_invariant(spark):
    body = (
        "<rss><channel>"
        "<item><link>https://h.org/a</link></item>"
        "<item><link>https://h.org/b</link></item>"
        "</channel></rss>"
    )
    rows = [("h%d.org" % (i % 5), body) for i in range(30)]
    feeds = spark.createDataFrame(rows, "host string, body string")
    one = sorted(map(tuple, parse_feeds(feeds.coalesce(1)).collect()))
    many = sorted(map(tuple, parse_feeds(feeds.repartition(7)).collect()))
    assert one == many and len(one) == 60
