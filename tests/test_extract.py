"""Extraction front-end tests: byte-identical text per url across
parallelism levels (input_hint invariant) + exact expected triple sets."""

from prase_spark.extract import (
    extract_text,
    extract_triples,
    html_to_text,
    route_by_http,
)
from prase_spark.fixtures import pages_fixture


def test_html_to_text_pure_and_deterministic():
    html = b"<html><script>x=1</script><style>.a{}</style><body><p>Hello <b>World</b></p></body></html>"
    t1, t2 = html_to_text(html), html_to_text(html)
    assert t1 == t2 == "Hello World"
    assert html_to_text(None) == ""


def test_extracted_text_matches_fixture_text(spark):
    pages, _ = pages_fixture(spark, n_pages=40)
    derived = extract_text(pages)
    orig = pages.selectExpr("url", "text AS orig_text")
    diff = derived.join(orig, "url").filter("text <> orig_text").count()
    assert diff == 0


def test_extraction_parallelism_invariance(spark):
    """Same page set at 1 vs 8 partitions -> identical (url, text) rows."""
    pages, _ = pages_fixture(spark, n_pages=40)
    one = set(map(tuple, extract_text(pages.coalesce(1)).collect()))
    many = set(map(tuple, extract_text(pages.repartition(8)).collect()))
    assert one == many


def test_extract_triples_exact(spark):
    pages, expected = pages_fixture(spark, n_pages=40)
    got = {
        (r["url"], r["subj"], r["pred"], r["obj"], r["is_attr"])
        for r in extract_triples(pages).collect()
    }
    # expected facts are a subset (filler text adds no spurious REL matches
    # beyond the known 'is a' sentence pattern)
    for e in expected:
        assert e in got, f"missing {e}"
    # nothing extracted that wasn't planted, except type facts from filler
    extra = got - set(expected)
    assert all(p in {"type"} for (_, _, p, _, _) in extra) and len(extra) <= 45


def test_route_by_http(spark):
    df = spark.createDataFrame(
        [("a", "p", "http://x.org/y", True), ("a", "q", "plain", False)],
        "subj STRING, pred STRING, obj STRING, is_attr BOOLEAN",
    )
    got = {r["obj"]: r["is_attr"] for r in route_by_http(df).collect()}
    assert got == {"http://x.org/y": False, "plain": True}


def test_extract_head_meta(spark):
    from prase_spark.extract import extract_head_meta

    rows = [
        (
            "u1",
            b'<html><head><title> My  Title </title>'
            b'<meta name="description" content="a desc">'
            b'<link rel="canonical" href="https://c.org/x"></head>'
            b"<body><h1>Head\none</h1></body></html>",
        ),
        (
            "u2",
            b'<html><head><META CONTENT="rev desc" NAME="description">'
            b'<LINK HREF="https://c.org/y" REL="canonical"></head><body></body></html>',
        ),
        ("u3", b"<html><body>nothing</body></html>"),
    ]
    pages = spark.createDataFrame(rows, "url string, html binary")
    got = {r.url: r for r in extract_head_meta(pages).collect()}
    assert (got["u1"].title, got["u1"].h1) == ("My Title", "Head one")
    assert got["u1"].meta_description == "a desc"
    assert got["u1"].canonical_url == "https://c.org/x"
    assert got["u2"].title is None
    assert got["u2"].meta_description == "rev desc"
    assert got["u2"].canonical_url == "https://c.org/y"
    assert got["u3"].title is None and got["u3"].canonical_url is None


def test_extract_og_properties_grammar(spark):
    from prase_spark.extract import extract_og_properties

    html = (
        "<html><head>"
        '<meta property="og:title" content="The Rock">'
        # uppercase property + flipped attribute order -> folds + matches
        '<meta content="video.movie" property="OG:TYPE">'
        '<meta property="og:url" content="https://x.org/rock">'
        # non-og namespace -> dropped
        '<meta property="article:author" content="A. Writer">'
        # plain name= meta -> out of grammar
        '<meta name="description" content="a movie">'
        # empty content -> dropped
        '<meta property="og:image" content="">'
        "</head><body>x</body></html>"
    )
    pages = spark.createDataFrame(
        [("https://x.org/rock?r=1", html.encode())], "url string, html binary"
    )
    got = sorted(map(tuple, extract_og_properties(pages).collect()))
    assert got == [
        ("https://x.org/rock?r=1", "og:title", "The Rock"),
        ("https://x.org/rock?r=1", "og:type", "video.movie"),
        ("https://x.org/rock?r=1", "og:url", "https://x.org/rock"),
    ]


def test_og_cards_pivot_min_and_nulls(spark):
    from prase_spark.extract import og_cards

    props = spark.createDataFrame(
        [
            ("u1", "og:title", "B title"),
            ("u1", "og:title", "A title"),  # duplicate -> min wins
            ("u1", "og:type", "article"),
            ("u2", "og:image", "https://i.org/p.png"),
        ],
        "url string, prop string, content string",
    )
    got = {r.url: r for r in og_cards(props).collect()}
    assert got["u1"].og_title == "A title" and got["u1"].og_type == "article"
    assert got["u1"].og_url is None and got["u1"].og_image is None
    assert got["u2"].og_image == "https://i.org/p.png" and got["u2"].og_title is None


def test_extract_og_parallelism_invariant(spark):
    from prase_spark.extract import extract_og_properties, og_cards

    html = (
        '<meta property="og:title" content="T">'
        '<meta property="og:type" content="website">'
    ).encode()
    rows = [("https://h%d.org/p%d" % (i % 3, i), html) for i in range(40)]
    pages = spark.createDataFrame(rows, "url string, html binary")
    one = sorted(map(tuple, og_cards(extract_og_properties(pages.coalesce(1))).collect()))
    many = sorted(map(tuple, og_cards(extract_og_properties(pages.repartition(7))).collect()))
    assert one == many and len(one) == 40


def test_og_to_raw_triples(spark):
    from prase_spark.extract import og_to_raw_triples

    props = spark.createDataFrame(
        [
            ("u1", "og:title", "T1"),
            ("u1", "og:type", "article"),
            ("u1", "og:url", "https://c.org/1"),
            ("u1", "og:image", "https://i.org/1.png"),
            ("u2", "og:title", "T2"),   # no og:url -> subject = crawl url
        ],
        "url string, prop string, content string",
    )
    got = sorted(map(tuple, og_to_raw_triples(props).collect()))
    assert got == [
        ("https://c.org/1", "og:image", "https://i.org/1.png", False),
        ("https://c.org/1", "og:title", "T1", True),
        ("https://c.org/1", "og:type", "article", True),
        ("u1", "og:url", "https://c.org/1", False),
        ("u2", "og:title", "T2", True),
    ]
