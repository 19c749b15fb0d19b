"""Structured-data extraction: JSON-LD + microdata + RDFa -> (subj, pred, obj).

The canonical web-KG construction source the plain-text pattern bank
(extract.py) cannot see: schema.org annotations embedded by publishers in
``<script type="application/ld+json">`` blocks and in microdata
(``itemscope``/``itemprop``/``itemtype``) attributes. Common Crawl's own
published statistics put structured data on a large fraction of crawled
pages, so at the 10^12-document target this is the highest-precision triple
stream the pipeline has — publisher-asserted facts with explicit ``@id``
subjects that feed straight into the PARIS/TransE canonicalization engines
(reference analog: the TSV triple loads at objects/KG.py via test.py:16-47;
this module produces the same (subj, pred, obj, is_lit) contract from raw
crawl HTML instead of pre-built dumps).

Execution discipline matches extract.py: both extractors are PURE, stateless,
row-local functions of the html bytes, run as Arrow-batched ``mapInPandas``
kernels — no per-row Python UDFs, no cross-row state, so output is
byte-identical per url at any parallelism and the operator is a single
narrow map stage (zero shuffles; the scan is column-pruned to (url, html)).

Determinism contract:
- JSON objects are walked depth-first in document key order (``json.loads``
  preserves insertion order), so emission order and blank-node numbering are
  pure functions of the bytes.
- Blank-node labels are ``_:b{n}`` numbered in walk order PER PAGE; they are
  only unique within a url. Downstream cross-page merging must key blank
  nodes on (url, subj) — exactly how RDF blank-node scoping works — or map
  them through ids.dict_encode on that pair.
- Malformed JSON blocks are skipped, never raised; ``structured_stats``
  exposes the malformed count per url so crawl QA can alert on it (same
  counted-drop contract as rdfio's N-Triples parser).

Microdata profile (documented subset, fixture-grade but honest): nesting is
tracked with a tag-depth stack (void/self-closing elements handled);
``itemprop`` values come from ``content`` (meta), ``href`` (a/link),
``src`` (img/audio/video/embed/iframe/source), ``datetime`` (time), else the
element's IMMEDIATE text (up to the next ``<``). ``itemscope`` on an
``itemprop`` element links parent -> child item. ``itemid`` names the
subject, else a blank node. itemref is not supported (rare in crawl data;
requires a second pass keyed on element ids).

RDFa Lite profile (same documented-subset discipline): ``typeof`` opens an
item whose subject is ``resource`` else ``about`` else a ``_:r{n}`` blank
node; ``typeof`` terms emit rdf:type. ``property`` binds to the innermost
open subject; an element carrying both ``property`` and ``typeof`` links
parent -> child. Property values: ``resource`` (IRI) else ``content``
(literal) else href/src-family (IRI, same tag table as microdata) else
``datetime`` (literal) else immediate text. Terms are kept compact —
``vocab``/``prefix`` IRI expansion is NOT applied, consistent with the
raw-key treatment of JSON-LD keys and microdata itemprops (canonicalization
is the KG layer's job, normalize.py).
"""

from __future__ import annotations

import json
import re
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame

RDF_TYPE = "rdf:type"

# --- JSON-LD ------------------------------------------------------------------

_LDJSON_RE = re.compile(
    r'(?is)<script\b[^>]*type\s*=\s*["\']application/ld\+json["\'][^>]*>(.*?)</script>'
)


def _lit(value) -> str:
    """Canonical literal lexical form: JSON scalars -> strings."""
    if isinstance(value, bool):
        return "true" if value else "false"
    if isinstance(value, float):
        return repr(value)
    return str(value)


def _subject_of(node: dict, counter: list[int]) -> str:
    subj = node.get("@id")
    if isinstance(subj, str) and subj:
        return subj
    subj = f"_:b{counter[0]}"
    counter[0] += 1
    return subj


def _walk_ld(node, out: list, counter: list[int], subj: str | None = None) -> None:
    """Depth-first walk of one JSON-LD node.

    Emission order per node: @type triples first, then keys in document
    order; a dict child's link triple precedes its subtree (subject is
    assigned before recursion, so blank-node numbering follows link order).
    """
    if not isinstance(node, dict):
        return
    if subj is None:
        subj = _subject_of(node, counter)
    types = node.get("@type")
    for t in types if isinstance(types, list) else ([types] if types else []):
        if isinstance(t, str):
            out.append((subj, RDF_TYPE, t, False))
    for key, value in node.items():
        if key.startswith("@"):
            continue
        for v in value if isinstance(value, list) else [value]:
            if isinstance(v, dict):
                child = _subject_of(v, counter)
                out.append((subj, key, child, False))
                _walk_ld(v, out, counter, subj=child)
            elif isinstance(v, (str, int, float, bool)):
                out.append((subj, key, _lit(v), True))


def ldjson_triples(html: str) -> tuple[list[tuple[str, str, str, bool]], int, int]:
    """All JSON-LD triples in a page + (n_blocks, n_malformed).

    Handles top-level objects, top-level arrays, and ``@graph`` wrappers.
    """
    out: list[tuple[str, str, str, bool]] = []
    counter = [0]
    n_blocks = 0
    n_malformed = 0
    for m in _LDJSON_RE.finditer(html):
        n_blocks += 1
        try:
            doc = json.loads(m.group(1))
        except ValueError:
            n_malformed += 1
            continue
        roots = doc if isinstance(doc, list) else [doc]
        for root in roots:
            if isinstance(root, dict) and isinstance(root.get("@graph"), list):
                for node in root["@graph"]:
                    _walk_ld(node, out, counter)
            elif isinstance(root, dict):
                _walk_ld(root, out, counter)
    return out, n_blocks, n_malformed


# --- microdata ------------------------------------------------------------------

_TAG_RE = re.compile(r"(?s)<(/?)([a-zA-Z][a-zA-Z0-9]*)((?:[^>\"']|\"[^\"]*\"|'[^']*')*)(/?)>")
_ATTR_RE = re.compile(r"([a-zA-Z_:][-a-zA-Z0-9_:.]*)\s*(?:=\s*(\"[^\"]*\"|'[^']*'|[^\s>]*))?")
_VOID_TAGS = frozenset(
    "area base br col embed hr img input link meta param source track wbr".split()
)
_URL_VALUE_TAGS = {
    "a": "href", "link": "href", "area": "href",
    "img": "src", "audio": "src", "video": "src", "embed": "src",
    "iframe": "src", "source": "src", "track": "src",
    "object": "data",
}


def _attrs(raw: str) -> dict[str, str]:
    out = {}
    for m in _ATTR_RE.finditer(raw):
        name = m.group(1).lower()
        val = m.group(2) or ""
        if val[:1] in ("'", '"'):
            val = val[1:-1]
        out.setdefault(name, val)
    return out


def microdata_triples(html: str) -> tuple[list[tuple[str, str, str, bool]], int]:
    """Microdata triples + item count, via one sequential tag scan.

    A stack of (element_depth, subject) tracks open ``itemscope`` items;
    an ``itemprop`` binds to the innermost open item. Blank-node numbering
    continues in tag order (``_:m{n}`` namespace, disjoint from JSON-LD's
    ``_:b{n}``).
    """
    out: list[tuple[str, str, str, bool]] = []
    stack: list[tuple[int, str]] = []
    depth = 0
    n_items = 0
    bn = 0
    for m in _TAG_RE.finditer(html):
        closing, tag, raw_attrs, self_close = m.groups()
        tag = tag.lower()
        if closing:
            if tag in _VOID_TAGS:
                continue  # stray </img> etc. never opened a depth level
            if stack and stack[-1][0] == depth:
                stack.pop()
            depth = max(0, depth - 1)
            continue
        attrs = _attrs(raw_attrs)
        is_void = bool(self_close) or tag in _VOID_TAGS
        child_subj = None
        if "itemscope" in attrs:
            n_items += 1
            child_subj = attrs.get("itemid") or f"_:m{bn}"
            if not attrs.get("itemid"):
                bn += 1
            itemtype = attrs.get("itemtype", "")
            for t in itemtype.split():
                out.append((child_subj, RDF_TYPE, t, False))
        if "itemprop" in attrs and stack:
            parent = stack[-1][1]
            for prop in attrs["itemprop"].split():
                if child_subj is not None:
                    out.append((parent, prop, child_subj, False))
                else:
                    value, is_lit = _prop_value(tag, attrs, html, m.end())
                    if value is not None:
                        out.append((parent, prop, value, is_lit))
        if "itemscope" in attrs and not is_void:
            stack.append((depth + 1, child_subj))
        if not is_void:
            depth += 1
    return out, n_items


def _prop_value(tag: str, attrs: dict, html: str, text_start: int):
    if tag == "meta":
        return attrs.get("content"), True
    if tag in _URL_VALUE_TAGS:
        v = attrs.get(_URL_VALUE_TAGS[tag])
        return v, False
    if tag == "time" and "datetime" in attrs:
        return attrs["datetime"], True
    if tag == "data" and "value" in attrs:
        return attrs["value"], True
    end = html.find("<", text_start)
    text = html[text_start : end if end >= 0 else len(html)]
    text = re.sub(r"\s+", " ", text).strip()
    return (text if text else None), True


# --- RDFa Lite ------------------------------------------------------------------


def rdfa_triples(html: str) -> tuple[list[tuple[str, str, str, bool]], int]:
    """RDFa Lite triples + item count, one sequential tag scan.

    Mirrors microdata_triples' stack discipline: (element_depth, subject)
    frames track open ``typeof`` items, ``property`` binds to the innermost
    frame. Blank nodes use the ``_:r{n}`` namespace (disjoint from JSON-LD
    ``_:b`` and microdata ``_:m``). Subset documented in the module header.
    """
    out: list[tuple[str, str, str, bool]] = []
    stack: list[tuple[int, str]] = []
    depth = 0
    n_items = 0
    bn = 0
    for m in _TAG_RE.finditer(html):
        closing, tag, raw_attrs, self_close = m.groups()
        tag = tag.lower()
        if closing:
            if tag in _VOID_TAGS:
                continue
            if stack and stack[-1][0] == depth:
                stack.pop()
            depth = max(0, depth - 1)
            continue
        attrs = _attrs(raw_attrs)
        is_void = bool(self_close) or tag in _VOID_TAGS
        child_subj = None
        if "typeof" in attrs:
            n_items += 1
            child_subj = attrs.get("resource") or attrs.get("about")
            if not child_subj:
                child_subj = f"_:r{bn}"
                bn += 1
            for t in attrs["typeof"].split():
                out.append((child_subj, RDF_TYPE, t, False))
        if "property" in attrs and stack:
            parent = stack[-1][1]
            for prop in attrs["property"].split():
                if child_subj is not None:
                    out.append((parent, prop, child_subj, False))
                else:
                    value, is_lit = _rdfa_value(tag, attrs, html, m.end())
                    if value is not None:
                        out.append((parent, prop, value, is_lit))
        if "typeof" in attrs and not is_void:
            stack.append((depth + 1, child_subj))
        if not is_void:
            depth += 1
    return out, n_items


def _rdfa_value(tag: str, attrs: dict, html: str, text_start: int):
    if "resource" in attrs:
        return attrs["resource"], False
    if "content" in attrs:
        return attrs["content"], True
    if tag in _URL_VALUE_TAGS and _URL_VALUE_TAGS[tag] in attrs:
        return attrs[_URL_VALUE_TAGS[tag]], False
    if tag == "time" and "datetime" in attrs:
        return attrs["datetime"], True
    end = html.find("<", text_start)
    text = html[text_start : end if end >= 0 else len(html)]
    text = re.sub(r"\s+", " ", text).strip()
    return (text if text else None), True


# --- Spark plumbing ---------------------------------------------------------------

_STRUCT_SCHEMA = (
    "url STRING, subj STRING, pred STRING, obj STRING, "
    "obj_is_lit BOOLEAN, source STRING"
)
_STATS_SCHEMA = (
    "url STRING, n_ld_blocks INT, n_ld_malformed INT, "
    "n_ld_triples INT, n_md_items INT, n_md_triples INT, "
    "n_rdfa_items INT, n_rdfa_triples INT"
)


def _decode(html) -> str:
    if html is None:
        return ""
    return bytes(html).decode("utf-8", errors="replace")


def extract_structured(pages: DataFrame, html_col: str = "html") -> DataFrame:
    """(url, html) -> one row per structured-data triple.

    Output: (url, subj, pred, obj, obj_is_lit, source) with source in
    {'ldjson', 'microdata', 'rdfa'}; the three streams emit in that order
    per url, each in its own deterministic document order. Single narrow
    Arrow map stage; column-pruned to (url, html).
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {k: [] for k in ("url", "subj", "pred", "obj", "obj_is_lit", "source")}
            for url, html in zip(pdf["url"], pdf[html_col]):
                text = _decode(html)
                ld, _, _ = ldjson_triples(text)
                md, _ = microdata_triples(text)
                ra, _ = rdfa_triples(text)
                for src, triples in (("ldjson", ld), ("microdata", md), ("rdfa", ra)):
                    for s, p, o, is_lit in triples:
                        rows["url"].append(url)
                        rows["subj"].append(s)
                        rows["pred"].append(p)
                        rows["obj"].append(o)
                        rows["obj_is_lit"].append(is_lit)
                        rows["source"].append(src)
            yield pd.DataFrame(rows)

    return pages.select("url", html_col).mapInPandas(run, _STRUCT_SCHEMA)


def structured_stats(pages: DataFrame, html_col: str = "html") -> DataFrame:
    """Per-url structured-data telemetry: block/item/triple/malformed counts.

    The crawl-QA surface for the counted-drop contract: a publisher pushing
    broken JSON-LD shows up as n_ld_malformed > 0 here, never as an executor
    exception. Same single-map-stage shape as extract_structured."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {
                k: []
                for k in (
                    "url", "n_ld_blocks", "n_ld_malformed",
                    "n_ld_triples", "n_md_items", "n_md_triples",
                    "n_rdfa_items", "n_rdfa_triples",
                )
            }
            for url, html in zip(pdf["url"], pdf[html_col]):
                text = _decode(html)
                ld, n_blocks, n_bad = ldjson_triples(text)
                md, n_items = microdata_triples(text)
                ra, n_rdfa = rdfa_triples(text)
                rows["url"].append(url)
                rows["n_ld_blocks"].append(n_blocks)
                rows["n_ld_malformed"].append(n_bad)
                rows["n_ld_triples"].append(len(ld))
                rows["n_md_items"].append(n_items)
                rows["n_md_triples"].append(len(md))
                rows["n_rdfa_items"].append(n_rdfa)
                rows["n_rdfa_triples"].append(len(ra))
            yield pd.DataFrame(rows)

    return pages.select("url", html_col).mapInPandas(run, _STATS_SCHEMA)


def structured_to_raw_triples(pages: DataFrame) -> DataFrame:
    """Adapter to the KG builder's RAW_TRIPLES contract: blank nodes are
    qualified with the url (RDF blank-node scoping) so cross-page collisions
    are impossible; provenance column dropped."""
    from pyspark.sql import functions as F

    t = extract_structured(pages)
    qual = F.when(
        F.col("subj").startswith("_:"),
        F.concat(F.lit("_:"), F.col("url"), F.lit("#"), F.expr("substring(subj, 3)")),
    ).otherwise(F.col("subj"))
    qual_obj = F.when(
        F.col("obj").startswith("_:") & ~F.col("obj_is_lit"),
        F.concat(F.lit("_:"), F.col("url"), F.lit("#"), F.expr("substring(obj, 3)")),
    ).otherwise(F.col("obj"))
    return t.select(
        qual.alias("subj"),
        F.col("pred"),
        qual_obj.alias("obj"),
        F.col("obj_is_lit").alias("is_attr"),
    )
