"""RSS/Atom feed ingestion — the second crawl-discovery channel next to
sitemaps (``datapipe.sitemaps``): feeds declare NEW urls with publish
timestamps, which drives discovery-crawl scheduling and gives the KG
layer publication-time evidence for extracted facts.

Pure codegen string expressions — per feed document one projection +
explode, zero Python, zero exchanges; a 10^9-feed refresh pass costs
exactly one scan.

Grammar subset (pinned, RE2-replayable, same doctrine as sitemaps):
RSS 2.0 ``<item>`` elements with ``<link>text</link>`` required and
``<title>``/``<guid>``/``<pubDate>`` optional; Atom ``<entry>`` elements
with ``<link ... href="..."/>`` required and ``<title>``/``<id>``/
``<updated>`` optional. Feed kind is classified per document from the
root element (``<rss``/``<feed``). CDATA, attribute-carrying RSS links,
and entities beyond ``&amp;`` are out of grammar. Date strings stay RAW
(RFC-822 for RSS, RFC-3339 for Atom — parsing policy is the caller's,
exactly like sitemap lastmod).

Feed AUTODISCOVERY (``discover_feeds``) mines the page-head convention
``<link rel="alternate" type="application/rss+xml|atom+xml" href=...>``
— the very elements the hreflang extractor deliberately drops.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_ITEM_RE = r"(?is)<item[\s>].*?</item>|<item/>"
_ENTRY_RE = r"(?is)<entry[\s>].*?</entry>"
_TEXT_TAG = r"(?is)<{tag}>\s*([^<]*?)\s*</{tag}>"
_ATOM_LINK_RE = r'(?is)<link\s[^>]*href="([^"]*)"'
_DISC_ELEM_RE = (
    r'(?i)<link\s[^>]*type="application/(?:rss|atom)\+xml"[^>]*>'
)
_DISC_HREF_RE = r'(?i)href="([^"]*)"'
_DISC_TYPE_RE = r'(?i)type="application/(rss|atom)\+xml"'


def _txt(col: str, tag: str):
    got = F.regexp_extract(col, _TEXT_TAG.format(tag=tag), 1)
    un = F.regexp_replace(got, F.lit("&amp;"), F.lit("&"))
    return F.when(un == "", None).otherwise(un)


def parse_feeds(
    feeds: DataFrame, host_col: str = "host", body_col: str = "body"
) -> DataFrame:
    """(host, kind, link, title, entry_id, published) — one row per
    in-grammar feed entry; ``kind`` ∈ {rss, atom} from the document's
    root element. Entries without a resolvable link are dropped;
    ``entry_id`` is the RSS ``<guid>`` / Atom ``<id>`` (NULL when
    absent), ``published`` the raw ``<pubDate>`` / ``<updated>`` string.

    Plan: one kind classification + two regexp_extract_all/explode
    branches unioned — both exchange-free map stages over the same
    scan."""
    kind = (
        F.when(F.col(body_col).rlike(r"(?is)<rss[\s>]"), F.lit("rss"))
        .when(F.col(body_col).rlike(r"(?is)<feed[\s>]"), F.lit("atom"))
    )
    base = feeds.select(
        F.col(host_col).alias("host"),
        F.col(body_col).alias("__b"),
        kind.alias("kind"),
    ).where(F.col("kind").isNotNull())

    rss = base.where(F.col("kind") == "rss").select(
        "host", "kind",
        F.explode(
            F.regexp_extract_all(F.col("__b"), F.lit(_ITEM_RE), 0)
        ).alias("__e"),
    )
    rss = rss.select(
        "host", "kind",
        _txt("__e", "link").alias("link"),
        _txt("__e", "title").alias("title"),
        _txt("__e", "guid").alias("entry_id"),
        _txt("__e", "pubDate").alias("published"),
    )

    atom = base.where(F.col("kind") == "atom").select(
        "host", "kind",
        F.explode(
            F.regexp_extract_all(F.col("__b"), F.lit(_ENTRY_RE), 0)
        ).alias("__e"),
    )
    a_link = F.regexp_extract("__e", _ATOM_LINK_RE, 1)
    atom = atom.select(
        "host", "kind",
        F.when(a_link == "", None).otherwise(a_link).alias("link"),
        _txt("__e", "title").alias("title"),
        _txt("__e", "id").alias("entry_id"),
        _txt("__e", "updated").alias("published"),
    )
    return rss.unionByName(atom).where(F.col("link").isNotNull())


def discover_feeds(
    pages: DataFrame, url_col: str = "url", html_col: str = "html"
) -> DataFrame:
    """(url, feed_url, feed_kind) — feed autodiscovery links declared in
    page heads (``<link type="application/rss+xml|atom+xml" ...>``, any
    attribute order via the per-element second pass); hrefs resolve
    against the page url with the shared linkgraph grammar. One codegen
    projection + Generate, zero exchanges — discovery rides the page
    scan you already pay."""
    from prase_spark.linkgraph import resolve_href

    h = F.decode(F.col(html_col), "utf-8")
    elems = F.regexp_extract_all(h, F.lit(_DISC_ELEM_RE), 0)
    trip = lambda e: F.struct(  # noqa: E731
        F.regexp_extract(e, _DISC_HREF_RE, 1).alias("raw_href"),
        F.lower(F.regexp_extract(e, _DISC_TYPE_RE, 1)).alias("feed_kind"),
    )
    out = (
        pages.select(
            F.col(url_col).alias("url"),
            F.explode(F.transform(elems, trip)).alias("d"),
        )
        .select("url", "d.raw_href", "d.feed_kind")
        .filter(F.col("raw_href") != "")
    )
    return out.select(
        "url",
        resolve_href(F.col("url"), F.col("raw_href")).alias("feed_url"),
        "feed_kind",
    )
