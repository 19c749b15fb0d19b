"""Structured-data extraction (JSON-LD + microdata + RDFa) — prase_spark/structured.py.

Reference analog: the TSV triple loads (test.py:16-47) give the reference its
triples pre-built; this surface derives the same (subj, pred, obj, is_lit)
contract from raw crawl HTML's schema.org annotations.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from prase_spark.structured import (
    extract_structured,
    ldjson_triples,
    microdata_triples,
    rdfa_triples,
    structured_stats,
    structured_to_raw_triples,
)

LD_PAGE = """<html><head>
<script type="application/ld+json">
{"@context":"https://schema.org","@type":"Person","@id":"https://ex.org/ent/7",
 "name":"Person 7","birthDate":"1907",
 "worksFor":{"@type":"Organization","name":"Org 7"},
 "affiliation":[{"@id":"https://ex.org/org/0"}],
 "height":1.75,"active":true}
</script>
<script type="application/ld+json">{broken json</script>
<script type="application/ld+json">
{"@graph":[{"@id":"g1","@type":["A","B"],"p":"v"},{"p2":["x","y"]}]}
</script>
</head><body>
<div itemscope itemtype="https://schema.org/Person" itemid="https://ex.org/md/7">
  <span itemprop="name">Person 7</span>
  <meta itemprop="birthYear" content="1907">
  <a itemprop="homepage" href="https://ex.org/home/7">home</a>
  <div itemprop="address" itemscope itemtype="https://schema.org/PostalAddress">
     <span itemprop="locality">City 7</span>
  </div>
  <time itemprop="born" datetime="1907-01-01">Jan 1</time>
</div>
<div itemscope><span itemprop="note">flat blank</span></div>
<div vocab="https://schema.org/" typeof="Person" resource="https://ex.org/ra/7">
  <span property="name">Person 7</span>
  <a property="knows" href="https://ex.org/ent/8">peer</a>
  <meta property="memberOf" content="Group 7">
  <time property="born" datetime="1907-01-01">Jan 1</time>
  <span property="alt" resource="https://ex.org/alias/7">alias</span>
  <div property="address" typeof="PostalAddress">
     <span property="locality">City 7</span>
  </div>
</div>
<div typeof="Thing"><span property="note">rdfa blank</span></div>
</body></html>"""


class TestLdJson:
    def test_full_walk(self):
        out, n_blocks, n_bad = ldjson_triples(LD_PAGE)
        assert n_blocks == 3 and n_bad == 1
        assert ("https://ex.org/ent/7", "rdf:type", "Person", False) in out
        assert ("https://ex.org/ent/7", "name", "Person 7", True) in out
        # nested object -> blank node link + child subtree
        assert ("https://ex.org/ent/7", "worksFor", "_:b0", False) in out
        assert ("_:b0", "rdf:type", "Organization", False) in out
        assert ("_:b0", "name", "Org 7", True) in out
        # @id-only child: link to the IRI, no subtree
        assert ("https://ex.org/ent/7", "affiliation", "https://ex.org/org/0", False) in out
        # scalar canonical forms
        assert ("https://ex.org/ent/7", "height", "1.75", True) in out
        assert ("https://ex.org/ent/7", "active", "true", True) in out
        # @graph wrapper: both nodes, list @type, list-of-literals
        assert ("g1", "rdf:type", "A", False) in out
        assert ("g1", "rdf:type", "B", False) in out
        assert ("_:b1", "p2", "x", True) in out
        assert ("_:b1", "p2", "y", True) in out

    def test_link_precedes_child_subtree(self):
        out, _, _ = ldjson_triples(LD_PAGE)
        link = out.index(("https://ex.org/ent/7", "worksFor", "_:b0", False))
        child = out.index(("_:b0", "rdf:type", "Organization", False))
        assert link < child

    def test_top_level_array(self):
        html = ('<script type="application/ld+json">'
                '[{"@id":"a","p":"1"},{"@id":"b","p":"2"}]</script>')
        out, n_blocks, n_bad = ldjson_triples(html)
        assert out == [("a", "p", "1", True), ("b", "p", "2", True)]
        assert (n_blocks, n_bad) == (1, 0)

    def test_non_object_roots_ignored(self):
        html = '<script type="application/ld+json">["just", "strings", 3]</script>'
        out, n_blocks, n_bad = ldjson_triples(html)
        assert out == [] and n_blocks == 1 and n_bad == 0

    def test_malformed_counted_not_raised(self):
        out, n_blocks, n_bad = ldjson_triples(
            '<script type="application/ld+json">{,}</script>'
        )
        assert out == [] and n_bad == 1 and n_blocks == 1

    def test_attr_order_and_quotes(self):
        html = ("<script async type='application/ld+json' id=\"x\">"
                '{"@id":"s","p":"v"}</script>')
        out, _, _ = ldjson_triples(html)
        assert out == [("s", "p", "v", True)]

    def test_deterministic_blank_numbering(self):
        a, _, _ = ldjson_triples(LD_PAGE)
        b, _, _ = ldjson_triples(LD_PAGE)
        assert a == b


class TestMicrodata:
    def test_full_scan(self):
        out, n_items = microdata_triples(LD_PAGE)
        assert n_items == 3
        s = "https://ex.org/md/7"
        assert (s, "rdf:type", "https://schema.org/Person", False) in out
        assert (s, "name", "Person 7", True) in out  # immediate text
        assert (s, "birthYear", "1907", True) in out  # meta content
        assert (s, "homepage", "https://ex.org/home/7", False) in out  # a href
        assert (s, "born", "1907-01-01", True) in out  # time datetime
        # nested item: parent link + child triples under a blank node
        assert (s, "address", "_:m0", False) in out
        assert ("_:m0", "rdf:type", "https://schema.org/PostalAddress", False) in out
        assert ("_:m0", "locality", "City 7", True) in out
        # itemscope without itemtype/itemid: blank subject, props still bind
        assert ("_:m1", "note", "flat blank", True) in out

    def test_multi_prop_and_multi_type(self):
        html = ('<div itemscope itemtype="T1 T2">'
                '<span itemprop="a b">v</span></div>')
        out, _ = microdata_triples(html)
        assert ("_:m0", "rdf:type", "T1", False) in out
        assert ("_:m0", "rdf:type", "T2", False) in out
        assert ("_:m0", "a", "v", True) in out
        assert ("_:m0", "b", "v", True) in out

    def test_void_and_self_closing_depth(self):
        html = ('<div itemscope itemid="s"><br><img src="x"/>'
                '<meta itemprop="m" content="c">'
                '</img><span itemprop="t">txt</span></div>')
        out, _ = microdata_triples(html)
        assert ("s", "m", "c", True) in out
        assert ("s", "t", "txt", True) in out  # stray </img> didn't pop scope

    def test_prop_outside_scope_ignored(self):
        out, n_items = microdata_triples('<span itemprop="x">v</span>')
        assert out == [] and n_items == 0

    def test_scope_closes(self):
        html = ('<div itemscope itemid="a"><span itemprop="p">1</span></div>'
                '<span itemprop="q">2</span>')
        out, _ = microdata_triples(html)
        assert out == [("a", "p", "1", True)]  # q is after the scope closed

    def test_data_tag_value(self):
        html = '<div itemscope itemid="s"><data itemprop="n" value="42">x</data></div>'
        out, _ = microdata_triples(html)
        assert ("s", "n", "42", True) in out


class TestRdfa:
    def test_full_scan(self):
        out, n_items = rdfa_triples(LD_PAGE)
        assert n_items == 3  # Person, nested PostalAddress, trailing Thing
        s = "https://ex.org/ra/7"
        assert (s, "rdf:type", "Person", False) in out
        assert (s, "name", "Person 7", True) in out  # immediate text
        assert (s, "knows", "https://ex.org/ent/8", False) in out  # a href -> IRI
        assert (s, "memberOf", "Group 7", True) in out  # meta content
        assert (s, "born", "1907-01-01", True) in out  # time datetime
        assert (s, "alt", "https://ex.org/alias/7", False) in out  # resource value
        # nested typeof+property: child's type precedes the parent link
        assert ("_:r0", "rdf:type", "PostalAddress", False) in out
        assert (s, "address", "_:r0", False) in out
        assert ("_:r0", "locality", "City 7", True) in out
        # typeof without resource/about: blank subject, props still bind
        assert ("_:r1", "rdf:type", "Thing", False) in out
        assert ("_:r1", "note", "rdfa blank", True) in out
        # no cross-talk: microdata itemprops never emitted as rdfa
        assert not any(p in ("birthYear", "homepage") for _, p, _, _ in out)

    def test_about_subject(self):
        html = '<div typeof="T" about="https://ex.org/ab"><span property="p">v</span></div>'
        out, _ = rdfa_triples(html)
        assert out == [("https://ex.org/ab", "rdf:type", "T", False),
                       ("https://ex.org/ab", "p", "v", True)]

    def test_multi_type_and_multi_property(self):
        html = '<div typeof="T1 T2" resource="s"><span property="a b">v</span></div>'
        out, _ = rdfa_triples(html)
        assert ("s", "rdf:type", "T1", False) in out
        assert ("s", "rdf:type", "T2", False) in out
        assert ("s", "a", "v", True) in out and ("s", "b", "v", True) in out

    def test_property_outside_scope_ignored(self):
        out, n_items = rdfa_triples('<span property="x">v</span>')
        assert out == [] and n_items == 0

    def test_scope_closes(self):
        html = ('<div typeof="T" resource="a"><span property="p">1</span></div>'
                '<span property="q">2</span>')
        out, _ = rdfa_triples(html)
        assert ("a", "p", "1", True) in out
        assert not any(p == "q" for _, p, _, _ in out)

    def test_microdata_scan_unaffected_by_rdfa_markup(self):
        out, n_items = microdata_triples(LD_PAGE)
        assert n_items == 3
        assert not any(p in ("knows", "memberOf", "alt", "locality") and s.startswith("_:r")
                       for s, p, _, _ in out)


@pytest.fixture()
def pages_df(spark):
    rows = [("https://ex.org/p1", LD_PAGE.encode()),
            ("https://ex.org/p2", b"<html><body>no structured data</body></html>"),
            ("https://ex.org/p3", None)]
    return spark.createDataFrame(rows, "url string, html binary")


class TestSpark:
    def test_extract_structured(self, pages_df):
        rows = extract_structured(pages_df).collect()
        by_url = {}
        for r in rows:
            by_url.setdefault(r.url, []).append(r)
        assert set(by_url) == {"https://ex.org/p1"}
        ld = [r for r in by_url["https://ex.org/p1"] if r.source == "ldjson"]
        md = [r for r in by_url["https://ex.org/p1"] if r.source == "microdata"]
        ra = [r for r in by_url["https://ex.org/p1"] if r.source == "rdfa"]
        exp_ld, _, _ = ldjson_triples(LD_PAGE)
        exp_md, _ = microdata_triples(LD_PAGE)
        exp_ra, _ = rdfa_triples(LD_PAGE)
        assert [(r.subj, r.pred, r.obj, r.obj_is_lit) for r in ld] == exp_ld
        assert [(r.subj, r.pred, r.obj, r.obj_is_lit) for r in md] == exp_md
        assert [(r.subj, r.pred, r.obj, r.obj_is_lit) for r in ra] == exp_ra

    def test_parallelism_invariance(self, pages_df):
        one = sorted(map(tuple, extract_structured(pages_df.repartition(1)).collect()))
        many = sorted(map(tuple, extract_structured(pages_df.repartition(7)).collect()))
        assert one == many

    def test_stats(self, pages_df):
        stats = {r.url: r for r in structured_stats(pages_df).collect()}
        s1 = stats["https://ex.org/p1"]
        assert (s1.n_ld_blocks, s1.n_ld_malformed) == (3, 1)
        exp_ld, _, _ = ldjson_triples(LD_PAGE)
        exp_md, _ = microdata_triples(LD_PAGE)
        assert s1.n_ld_triples == len(exp_ld)
        assert (s1.n_md_items, s1.n_md_triples) == (3, len(exp_md))
        exp_ra, _ = rdfa_triples(LD_PAGE)
        assert (s1.n_rdfa_items, s1.n_rdfa_triples) == (3, len(exp_ra))
        s2 = stats["https://ex.org/p2"]
        assert (s2.n_ld_blocks, s2.n_md_items, s2.n_md_triples) == (0, 0, 0)
        assert (s2.n_rdfa_items, s2.n_rdfa_triples) == (0, 0)
        s3 = stats["https://ex.org/p3"]  # NULL html -> zeros, never a crash
        assert (s3.n_ld_blocks, s3.n_ld_triples) == (0, 0)

    def test_raw_triples_adapter_qualifies_bnodes(self, spark):
        # two pages with IDENTICAL html: unqualified _:b0 would collide
        rows = [("u1", LD_PAGE.encode()), ("u2", LD_PAGE.encode())]
        df = spark.createDataFrame(rows, "url string, html binary")
        out = structured_to_raw_triples(df)
        blanks = (out.filter(F.col("subj").startswith("_:"))
                     .select("subj").distinct().collect())
        labels = {r.subj for r in blanks}
        assert any(b.startswith("_:u1#") for b in labels)
        assert any(b.startswith("_:u2#") for b in labels)
        assert not any(b == "_:b0" for b in labels)
        # object-position blanks qualified the same way; literals untouched
        obj_blanks = {r.obj for r in out.filter(
            F.col("obj").startswith("_:") & ~F.col("is_attr")).collect()}
        assert all("#" in b for b in obj_blanks)

    def test_plan_is_single_map_stage(self, pages_df):
        plan = extract_structured(pages_df)._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan


class TestWebKgE2E:
    SF = "/root/testdata/sf0.001"

    def test_pages_to_paris_alignment_pr(self, spark):
        """North-star P/R on actual web markup: raw pages (JSON-LD site vs
        RDFa site, disjoint namespaces, different predicate vocabularies)
        -> extraction -> KG pair -> 2-iteration PARIS; entity alignment
        must recover the by-construction gold ent/i <-> ent/i at
        P/R >= 0.95 (the BASELINE.json bar)."""
        import __spark_entry__ as e

        res = e._q_web_kg_align_pages(spark, self.SF)
        ours = {
            (r.name_l, r.name_r)
            for r in res.filter("kind = 'entity'").collect()
            if "/ent/" in r.name_l
        }
        n = spark.read.parquet(f"{self.SF}/documents.parquet").count()
        gold = {
            (f"https://a.example/ent/{i}", f"https://b.example/ent/{i}")
            for i in range(n)
        }
        inter = len(ours & gold)
        precision = inter / len(ours) if ours else 0.0
        recall = inter / len(gold)
        assert precision >= 0.95, (precision, recall, len(ours))
        assert recall >= 0.95, (precision, recall, len(ours))
