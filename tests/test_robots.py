"""robots.txt parse/eval + meta-noindex: REP subset semantics."""

from pyspark.sql import functions as F

from prase_spark.datapipe.robots import drop_noindex, parse_robots, robots_allowed

_BODY = """# policy
User-agent: googlebot
User-agent: extrabot
Disallow: /g

User-agent: *
Disallow: /private
Allow: /private/ok
Disallow: /tmp
Disallow:
Disallow: /wild*card
Allow: /end$
"""


def _rules(spark):
    return parse_robots(
        spark.createDataFrame([("h.org", _BODY)], "host string, body string")
    )


def test_parse_robots_groups_and_subset(spark):
    rows = {(r.agent, r.allow, r.prefix) for r in _rules(spark).collect()}
    # stacked agents share the /g rule; wildcard/$/empty paths dropped
    assert rows == {
        ("googlebot", False, "/g"),
        ("extrabot", False, "/g"),
        ("*", False, "/private"),
        ("*", True, "/private/ok"),
        ("*", False, "/tmp"),
    }


def _pages(spark, urls):
    return spark.createDataFrame([(u,) for u in urls], "url string")


def test_robots_allowed_longest_match(spark):
    rules = _rules(spark)
    urls = [
        "https://h.org/pub/a",          # no rule -> allowed
        "https://h.org/private/a",      # /private -> denied
        "https://h.org/private/ok/a",   # longest match allows
        "https://h.org/tmp/a",          # denied
        "https://other.org/private/a",  # host without robots -> allowed
    ]
    got = {
        r.url: r.allowed
        for r in robots_allowed(_pages(spark, urls), rules).collect()
    }
    assert got == {
        urls[0]: True, urls[1]: False, urls[2]: True,
        urls[3]: False, urls[4]: True,
    }


def test_robots_exact_agent_shadows_wildcard(spark):
    rules = _rules(spark)
    urls = ["https://h.org/g/x", "https://h.org/private/a"]
    got = {
        r.url: r.allowed
        for r in robots_allowed(_pages(spark, urls), rules, agent="GoogleBot").collect()
    }
    # exact-agent block replaces the wildcard block entirely:
    # /g denied by its own rule, /private NOT denied (wildcard shadowed)
    assert got == {urls[0]: False, urls[1]: True}


def test_allow_wins_length_tie(spark):
    rules = parse_robots(
        spark.createDataFrame(
            [("h.org", "User-agent: *\nDisallow: /abc\nAllow: /abc\n")],
            "host string, body string",
        )
    )
    got = robots_allowed(_pages(spark, ["https://h.org/abc/x"]), rules).first()
    assert got.allowed is True


def test_drop_noindex_both_orders(spark):
    rows = [
        ("u1", b"<html><meta name=\"robots\" content=\"noindex,nofollow\"></html>"),
        ("u2", b"<html><META CONTENT=\"NOINDEX\" NAME=\"robots\"></html>"),
        ("u3", b"<html><meta name=\"viewport\" content=\"width=1\">index me</html>"),
        ("u4", b"<html><meta name=\"robots\" content=\"index,follow\"></html>"),
    ]
    pages = spark.createDataFrame(rows, "url string, html binary")
    kept = sorted(r.url for r in drop_noindex(pages).collect())
    assert kept == ["u3", "u4"]


def test_robots_sitemaps_directives(spark):
    from prase_spark.datapipe.robots import robots_sitemaps

    body = (
        "User-agent: *\n"
        "Disallow: /private\n"
        "Sitemap: https://h.org/sm1.xml\n"
        "sitemap: https://h.org/sm2.xml  # trailing comment\n"
        "# Sitemap: https://h.org/commented.xml\n"
        "Sitemap: /relative.xml\n"          # out of spec -> dropped
        "Sitemap: https://h.org/sm1.xml\n"  # duplicate -> one row
    )
    robots = spark.createDataFrame([("h.org", body)], "host string, body string")
    got = sorted(r.sitemap_url for r in robots_sitemaps(robots).collect())
    assert got == ["https://h.org/sm1.xml", "https://h.org/sm2.xml"]
