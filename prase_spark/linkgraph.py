"""Web link-graph construction: ``<a href>`` extraction, URL resolution,
host graph, anchor-text priors.

Beyond-reference surface (the reference's KG dumps carry no hyperlink
structure — its only page-shaped input is the TSV triple dump,
/root/reference/objects/KGs.py:55-88), but the FIRST thing a web-scale
KG constructor mines from a crawl is the link graph: anchor texts are
the canonical mention→entity prior (the signal behind Wikipedia-anchor
entity linking), and the host graph feeds reputation/curation
(hoststats) and PageRank (graphstats).

Scale shape:
- ``extract_links`` is ONE codegen'd projection per page — decode,
  ``regexp_extract_all``, explode, per-element field extracts, href
  resolution — zero exchanges, zero Python; a 10^12-page corpus pays
  exactly one scan.
- ``host_link_graph`` is one hash aggregation keyed on (src_host,
  dst_host) — map-side partial combine; the host-pair key space
  (~10^9-10^10 at crawl scale) is the aggregate's output, never
  materialized per-page.
- ``anchor_text_priors`` reuses the salted two-phase top-k
  (datapipe.sampling.cap_per_group), so one mega-popular target URL
  (10^8 in-links) never serializes a single-partition sort.

Link-element grammar (deterministic, RE2-compatible — the gate's DuckDB
twin replays the exact same regexes): an anchor element is
``<a ...href="...".>text</a>`` where the attribute list carries a
double-quoted href and the anchor text contains no ``<``. Nested markup
inside the anchor, unquoted hrefs, and single quotes are out of grammar
(dropped) — the point is a pinned, engine-replayable spec, not a
browser-grade parser.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# one <a> element: href in the attribute list, text free of '<'
_ELEM_RE = r'(?i)<a\s[^>]*href="[^"]*"[^>]*>[^<]*</a>'
_HREF_RE = r'(?i)href="([^"]*)"'
_TEXT_RE = r"(?i)>([^<]*)</a>"
# schemes that are never crawlable link targets
_DROP_HREF_RE = r"(?i)^(javascript:|mailto:|tel:|data:|#|$)"


def resolve_href(src_url: Column | str, href: Column | str) -> Column:
    """Absolute URL for ``href`` found on page ``src_url`` (NULL when the
    href is non-crawlable: empty, fragment-only, javascript:/mailto:/...).

    Resolution rules (RFC 3986 subset, no ``..`` normalization):
    absolute stays; ``//host/p`` inherits the source scheme; ``/p`` is
    origin-rooted; anything else resolves against the source URL's
    directory (its path up to the last ``/``, or ``/`` when the source
    has no path)."""
    src = F.col(src_url) if isinstance(src_url, str) else src_url
    h = F.col(href) if isinstance(href, str) else href
    scheme = F.regexp_extract(src, r"^([a-zA-Z][a-zA-Z0-9+.-]*)://", 1)
    origin = F.regexp_extract(src, r"^([a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*)", 1)
    path = F.regexp_replace(src, r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*", "")
    path = F.regexp_replace(path, r"[?#].*$", "")
    pdir = F.regexp_extract(path, r"^(.*/)", 1)
    base = F.concat(origin, F.when(pdir == "", F.lit("/")).otherwise(pdir))
    return (
        F.when(h.rlike(_DROP_HREF_RE), F.lit(None).cast("string"))
        .when(h.rlike(r"(?i)^https?://"), h)
        .when(h.startswith("//"), F.concat(scheme, F.lit(":"), h))
        .when(h.startswith("/"), F.concat(origin, h))
        .otherwise(F.concat(base, h))
    )


def extract_links(
    pages: DataFrame,
    url_col: str = "url",
    html_col: str = "html",
    drop_nofollow: bool = True,
) -> DataFrame:
    """(src_url, dst_url, anchor) — one row per in-grammar ``<a>`` element
    whose href resolves to a crawlable absolute URL.

    ``anchor`` is the element's text, whitespace-collapsed and trimmed
    (may be ``''`` for image-only anchors). ``drop_nofollow=True``
    discards elements carrying ``rel=...nofollow...`` — the link-graph
    convention (nofollow edges are excluded from reputation/rank).

    Plan: decode → regexp_extract_all → explode → field extracts, all
    inside one WholeStageCodegen projection; link multiplicity is
    preserved (the host graph weighs repeated edges)."""
    h = F.decode(F.col(html_col), "utf-8")
    elems = F.regexp_extract_all(h, F.lit(_ELEM_RE), 0)
    df = pages.select(
        F.col(url_col).alias("src_url"), F.explode(elems).alias("__elem")
    )
    if drop_nofollow:
        df = df.where(~F.col("__elem").rlike(r'(?i)rel="[^"]*nofollow[^"]*"'))
    href = F.regexp_extract(F.col("__elem"), _HREF_RE, 1)
    anchor = F.trim(
        F.regexp_replace(F.regexp_extract(F.col("__elem"), _TEXT_RE, 1), r"\s+", " ")
    )
    return (
        df.select(
            "src_url",
            resolve_href(F.col("src_url"), href).alias("dst_url"),
            anchor.alias("anchor"),
        )
        .where(F.col("dst_url").isNotNull())
    )


def host_link_graph(links: DataFrame, drop_self: bool = True) -> DataFrame:
    """(src_host, dst_host, n_links, n_src_pages) — the host-level web
    graph. ``n_links`` counts edges with multiplicity; ``n_src_pages``
    counts distinct linking pages (the dedup-resistant weight).
    ``drop_self=True`` removes intra-host navigation edges (they dwarf
    cross-host edges and carry no linking signal).

    One hash aggregation (two-phase for the distinct); feeds
    graphstats.pagerank / hoststats reputation directly."""
    from prase_spark.datapipe.boilerplate import host_of

    g = links.select(
        host_of("src_url").alias("src_host"),
        host_of("dst_url").alias("dst_host"),
        "src_url",
    )
    if drop_self:
        g = g.where(F.col("src_host") != F.col("dst_host"))
    return g.groupBy("src_host", "dst_host").agg(
        F.count(F.lit(1)).alias("n_links"),
        F.countDistinct("src_url").alias("n_src_pages"),
    )


def anchor_text_priors(
    links: DataFrame, k: int = 3, min_count: int = 1, salt_buckets: int = 64
) -> DataFrame:
    """(dst_url, anchor, n) — the top-``k`` non-empty anchor texts per
    link target by in-link count: the mention→entity prior table for
    anchor-based entity linking (what "the big apple" resolving to a
    city page looks like at corpus scale).

    Ties break anchor-ASC (deterministic at any partitioning). Counting
    is one hash agg; the per-target cut is the salted TWO-PHASE top-k
    (cap_per_group), so a 10^8-in-link target never single-partition
    sorts."""
    from prase_spark.datapipe.sampling import cap_per_group

    counts = (
        links.where(F.col("anchor") != "")
        .groupBy("dst_url", "anchor")
        .agg(F.count(F.lit(1)).alias("n"))
        .where(F.col("n") >= min_count)
    )
    return cap_per_group(
        counts, "dst_url", k, order_col="n", key_col="anchor",
        salt_buckets=salt_buckets,
    )


def link_mentions(
    mentions: DataFrame,
    priors: DataFrame,
    mention_col: str = "mention",
) -> DataFrame:
    """Anchor-based entity linking: resolve each mention string to the
    link target the web most often labels with that anchor — the
    classic Wikipedia-anchor linker, here over the crawl's own anchor
    statistics (``anchor_text_priors`` output or the raw (dst_url,
    anchor, n) counts).

    Matching is case-insensitive on the whitespace-collapsed anchor;
    per anchor the highest-``n`` target wins, ties break dst_url-ASC
    (deterministic at any partitioning). Adds ``entity_url`` (NULL when
    no anchor matches — the caller's NIL-entity policy).

    Scale shape: the anchor→target dictionary reduces FIRST (one hash
    agg over the priors, anchor-vocabulary-sized output), then joins the
    mention stream on the lowercased string key — a plain equi-join
    Catalyst broadcasts when the dictionary is small and shuffles on
    8-byte-hashable keys when it is not. The mention stream is never
    windowed or collected."""
    dictionary = (
        priors.groupBy(F.lower(F.col("anchor")).alias("__m"))
        .agg(
            F.min_by(
                "dst_url", F.struct((-F.col("n")).alias("nn"), F.col("dst_url"))
            ).alias("entity_url")
        )
    )
    return (
        mentions.join(
            dictionary,
            F.lower(F.col(mention_col)) == F.col("__m"),
            "left",
        )
        .drop("__m")
    )


# --- hreflang alternates -----------------------------------------------------

_ALT_ELEM_RE = (
    r'(?i)<link\s[^>]*rel="alternate"[^>]*>'
)
_HREFLANG_RE = r'(?i)hreflang="([^"]*)"'
_LINK_HREF_RE = r'(?i)href="([^"]*)"'


def extract_hreflang(pages: DataFrame, html_col: str = "html") -> DataFrame:
    """(url, hreflang, href) — one row per ``<link rel="alternate"
    hreflang=...>`` element, the cross-language same-document declaration
    publishers emit for translated page sets.

    Same pinned RE2-replayable grammar discipline as :func:`extract_links`
    (double-quoted attributes, any attribute order via the per-element
    second pass); one codegen projection + Generate, zero Python, zero
    shuffles. Elements missing either attribute resolve to empty strings
    and are dropped. hreflang values are lowercased (BCP-47 is
    case-insensitive); hrefs are resolved against the page url with the
    shared :func:`resolve_href` grammar."""
    h = F.decode(F.col(html_col), "utf-8")
    elems = F.regexp_extract_all(h, F.lit(_ALT_ELEM_RE), 0)
    pair = lambda e: F.struct(  # noqa: E731
        F.lower(F.regexp_extract(e, _HREFLANG_RE, 1)).alias("hreflang"),
        F.regexp_extract(e, _LINK_HREF_RE, 1).alias("raw_href"),
    )
    out = (
        pages.select("url", F.explode(F.transform(elems, pair)).alias("alt"))
        .select("url", "alt.hreflang", "alt.raw_href")
        .filter((F.col("hreflang") != "") & (F.col("raw_href") != ""))
    )
    return out.select(
        "url", "hreflang", resolve_href(F.col("url"), F.col("raw_href")).alias("href")
    )


def hreflang_clusters(
    alts: DataFrame,
    hashed: bool = False,
    max_target_indegree: int | None = None,
    stats_out: dict | None = None,
) -> DataFrame:
    """(url, cluster) — group pages declared as language variants of one
    logical document via connected components over the alternate graph
    (cluster = min url, the :func:`matching.connected_components`
    convention). Self-referential alternates (the x-default/self link
    publishers emit) are kept as self-loops so single-variant pages still
    receive a cluster row. Cross-language entity-page grouping is the
    crawl-side analog of the reference's cross-lingual DBP15K alignment
    inputs — clusters feed the KG layer as same-entity evidence.

    Scale options (shared with ``urlnorm.page_identity``):
    ``hashed=True`` iterates CC over xxhash64 keys (8-byte shuffle
    rows, min-url labels recovered once at the end — identical output
    modulo 2⁻⁶⁴ collisions, ``stats_out['n_nodes']`` is the audit
    denominator); ``max_target_indegree`` drops alternates pointing at
    super-capacity targets (a template bug welding a site into one
    cluster — a legitimate variant set is bounded by the number of
    languages), with ``n_hot_targets``/``n_edges_dropped`` telemetry."""
    from prase_spark.matching import components_min_label

    edges = alts.select(F.col("url").alias("src"), F.col("href").alias("dst"))
    if max_target_indegree is not None:
        hint_e = edges.where(F.col("src") != F.col("dst"))
        deg = hint_e.groupBy("dst").count()
        hot = deg.where(F.col("count") > max_target_indegree).select("dst")
        if stats_out is not None:
            stats_out["n_hot_targets"] = hot.count()
            stats_out["n_edges_dropped"] = (
                hint_e.join(hot, "dst", "left_semi").count()
            )
        edges = (
            edges.where(F.col("src") == F.col("dst"))
            .unionByName(hint_e.join(hot, "dst", "left_anti"))
        )
    lab = components_min_label(edges, hashed=hashed, stats_out=stats_out)
    return lab.select(F.col("node").alias("url"), F.col("label").alias("cluster"))
