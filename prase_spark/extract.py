"""Page-corpus front-end: html -> text -> (subj, pred, obj) triples.

NEW surface per BASELINE.json input_hint (the reference's only extraction
analog is the ``"http" in v`` router at test.py:49-52). Both steps are pure,
stateless, row-local functions executed as Arrow-batched pandas transforms
(``mapInPandas``) — no per-row Python UDF calls, no batch-dependent state,
so extracted text is byte-identical per url at any parallelism (the
input_hint invariant; verified by tests at local[8] vs local[32]).
"""

from __future__ import annotations

import re
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# --- html -> text -----------------------------------------------------------

_SCRIPT_RE = re.compile(r"(?is)<(script|style)\b.*?</\1>")
_TAG_RE = re.compile(r"(?s)<[^>]*>")
_WS_RE = re.compile(r"\s+")


def html_to_text(html: bytes | None) -> str:
    """Deterministic tag-strip extraction. Pure function of the bytes."""
    if html is None:
        return ""
    raw = bytes(html).decode("utf-8", errors="replace")
    no_blocks = _SCRIPT_RE.sub(" ", raw)
    no_tags = _TAG_RE.sub(" ", no_blocks)
    return _WS_RE.sub(" ", no_tags).strip()


# --- text -> triples ---------------------------------------------------------
# Pattern bank over sentence-ish spans. Entity mentions are capitalized
# tokens; attribute objects are quoted strings. Deterministic regexes only.

_ENT = r"([A-Z][A-Za-z0-9_]*)"
_REL_PATTERNS: list[tuple[re.Pattern, str]] = [
    (re.compile(rf"{_ENT} was born in {_ENT}"), "bornIn"),
    (re.compile(rf"{_ENT} works for {_ENT}"), "employer"),
    (re.compile(rf"{_ENT} is located in {_ENT}"), "locatedIn"),
    (re.compile(rf"{_ENT} is a {_ENT}"), "type"),
]
_ATTR_PATTERN = re.compile(rf"{_ENT} 's ([a-z][A-Za-z0-9_]*) is \"([^\"]*)\"")


def extract_triples_from_text(text: str | None) -> list[tuple[str, str, str, bool]]:
    """(subj, pred, obj, is_attr) tuples in deterministic document order."""
    if not text:
        return []
    out = []
    for pattern, pred in _REL_PATTERNS:
        for m in pattern.finditer(text):
            out.append((m.group(1), pred, m.group(2), False))
    for m in _ATTR_PATTERN.finditer(text):
        out.append((m.group(1), m.group(2), m.group(3), True))
    return out


# --- Spark plumbing ----------------------------------------------------------

_EXTRACT_SCHEMA = "url STRING, subj STRING, pred STRING, obj STRING, is_attr BOOLEAN"


def extract_text(pages: DataFrame) -> DataFrame:
    """(url, html) -> (url, text). Arrow-batched; stateless per row."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {"url": pdf["url"], "text": pdf["html"].map(html_to_text)}
            )

    return pages.select("url", "html").mapInPandas(run, "url STRING, text STRING")


def extract_triples(pages: DataFrame, use_text_column: bool = True) -> DataFrame:
    """pages -> (url, subj, pred, obj, is_attr), one row per extracted fact.

    ``use_text_column=True`` trusts the pre-extracted ``text`` column;
    otherwise text is re-derived from ``html``. Column-pruned scan: only
    (url, text|html) is read from the source.
    """
    src = pages.select("url", "text") if use_text_column else extract_text(pages)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            urls, subjs, preds, objs, attrs = [], [], [], [], []
            for url, text in zip(pdf["url"], pdf["text"]):
                for s, p, o, a in extract_triples_from_text(text):
                    urls.append(url)
                    subjs.append(s)
                    preds.append(p)
                    objs.append(o)
                    attrs.append(a)
            yield pd.DataFrame(
                {"url": urls, "subj": subjs, "pred": preds, "obj": objs, "is_attr": attrs}
            )

    return src.mapInPandas(run, _EXTRACT_SCHEMA)


def pages_to_raw_triples(pages: DataFrame) -> DataFrame:
    """Adapter to the KG builder's RAW_TRIPLES contract (drops provenance)."""
    return extract_triples(pages).select("subj", "pred", "obj", "is_attr")


def extract_head_meta(pages: DataFrame, html_col: str = "html") -> DataFrame:
    """(url, title, h1, meta_description, canonical_url) — the WAT-record
    head fields a crawl pipeline mines for document titles (entity-name
    candidates), snippets, and rel=canonical dedup hints.

    One codegen projection (decode + four regexp extracts, whitespace
    collapsed); absent fields are NULL. Grammar matches the linkgraph
    doctrine: double-quoted attributes, text free of ``<``, either
    attribute order for meta/link tags — pinned and RE2-replayable."""
    h = F.decode(F.col(html_col), "utf-8")

    def _clean(c):
        t = F.trim(F.regexp_replace(c, r"\s+", " "))
        return F.when(t == "", None).otherwise(t)

    title = F.regexp_extract(h, r"(?is)<title[^>]*>([^<]*)</title>", 1)
    h1 = F.regexp_extract(h, r"(?is)<h1[^>]*>([^<]*)</h1>", 1)
    desc = F.concat(
        F.regexp_extract(
            h,
            r'(?is)<meta\s[^>]*name\s*=\s*"description"[^>]*content\s*=\s*"([^"]*)"',
            1,
        ),
        F.regexp_extract(
            h,
            r'(?is)<meta\s[^>]*content\s*=\s*"([^"]*)"[^>]*name\s*=\s*"description"',
            1,
        ),
    )
    canon = F.concat(
        F.regexp_extract(
            h,
            r'(?is)<link\s[^>]*rel\s*=\s*"canonical"[^>]*href\s*=\s*"([^"]*)"',
            1,
        ),
        F.regexp_extract(
            h,
            r'(?is)<link\s[^>]*href\s*=\s*"([^"]*)"[^>]*rel\s*=\s*"canonical"',
            1,
        ),
    )
    return pages.select(
        "url",
        _clean(title).alias("title"),
        _clean(h1).alias("h1"),
        _clean(desc).alias("meta_description"),
        _clean(canon).alias("canonical_url"),
    )


def route_by_http(triples: DataFrame) -> DataFrame:
    """S2's self-classifying router (test.py:49-52): object containing
    'http' -> relation triple, else attribute triple."""
    return triples.withColumn("is_attr", ~F.col("obj").contains("http"))


# --- OpenGraph protocol metadata ---------------------------------------------

_OG_ELEM_RE = r'(?i)<meta\s[^>]*property="og:[^"]*"[^>]*>'
_OG_PROP_RE = r'(?i)property="(og:[^"]*)"'
_OG_CONTENT_RE = r'(?i)content="([^"]*)"'

#: the entity-card core of the OG protocol (ogp.me "basic metadata")
OG_CARD_PROPS = ("og:title", "og:type", "og:url", "og:image")


def extract_og_properties(pages: DataFrame, html_col: str = "html") -> DataFrame:
    """(url, prop, content) — one row per ``<meta property="og:..."
    content="...">`` element, the OpenGraph entity-card declarations
    (ogp.me) that make a crawl page a typed entity description: og:title
    is the page's self-declared entity name, og:type its class, og:url
    its canonical identity — directly subject/predicate/object shaped,
    the fourth embedded-syntax stream next to JSON-LD / microdata /
    RDFa Lite (``structured.extract_structured``).

    Same pinned RE2-replayable grammar discipline as the other head
    extractors (double-quoted attributes, any attribute order via the
    per-element second pass); one codegen projection + Generate, zero
    Python, zero shuffles. Property names are lowercased (publishers
    uppercase them; the protocol is case-insensitive); elements with an
    empty/absent content, and meta tags outside the ``og:`` namespace
    (plain ``name=`` metas, ``article:``/``twitter:`` properties), are
    dropped."""
    h = F.decode(F.col(html_col), "utf-8")
    elems = F.regexp_extract_all(h, F.lit(_OG_ELEM_RE), 0)
    pair = lambda e: F.struct(  # noqa: E731
        F.lower(F.regexp_extract(e, _OG_PROP_RE, 1)).alias("prop"),
        F.regexp_extract(e, _OG_CONTENT_RE, 1).alias("content"),
    )
    return (
        pages.select("url", F.explode(F.transform(elems, pair)).alias("m"))
        .select("url", "m.prop", "m.content")
        .filter((F.col("prop") != "") & (F.col("content") != ""))
    )


def og_cards(props: DataFrame) -> DataFrame:
    """(url, og_title, og_type, og_url, og_image) — one entity-card row
    per page from the extracted OG property stream; absent properties
    are NULL. Duplicate declarations of one property resolve to
    min(content) so the card is deterministic at any partitioning
    (the protocol says first-declared wins, but document order does not
    survive a distributed explode — min is the pinned, engine-replayable
    convention). One hash aggregation with map-side partial combine;
    the pivot is a fixed 4-column conditional aggregate, never a
    wide-pivot shuffle."""
    aggs = [
        F.min(F.when(F.col("prop") == p, F.col("content"))).alias(
            "og_" + p.split(":", 1)[1]
        )
        for p in OG_CARD_PROPS
    ]
    return props.groupBy("url").agg(*aggs)


def og_to_raw_triples(props: DataFrame) -> DataFrame:
    """RAW_TRIPLES adapter for the OpenGraph stream (composes with
    ``kgbuild.build_kg`` exactly like
    ``structured.structured_to_raw_triples``): the page's declared
    identity — its og:url content when present, else the crawl url —
    becomes the subject; every other og property becomes a triple with
    ``is_attr`` by value shape (og:image objects are URIs → relation;
    title/type/locale etc. → attribute); pages that declare an og:url
    additionally emit the identity relation (crawl url, og:url,
    subject) so the KG keeps the crawl-to-canonical link.

    One self-join on url against the (at most one after the min-dedup)
    og:url row — broadcast-sized relative to the corpus only when the
    OG-bearing subset is; at crawl scale both sides are the same
    filtered stream, co-partitioned on url."""
    ogu = (
        props.where(F.col("prop") == "og:url")
        .groupBy("url")
        .agg(F.min("content").alias("__subj"))
    )
    rest = props.where(F.col("prop") != "og:url")
    j = rest.join(ogu, "url", "left").select(
        F.coalesce("__subj", "url").alias("subj"),
        F.col("prop").alias("pred"),
        F.col("content").alias("obj"),
        (F.col("prop") != "og:image").alias("is_attr"),
    )
    ident = ogu.select(
        F.col("url").alias("subj"),
        F.lit("og:url").alias("pred"),
        F.col("__subj").alias("obj"),
        F.lit(False).alias("is_attr"),
    )
    return j.unionByName(ident)
