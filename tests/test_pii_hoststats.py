"""PII redaction (datapipe.pii) and host reputation / domain blocklists
(datapipe.hoststats) — python re oracle for counts/redaction, arithmetic
oracle for host stats, broadcast-anti-join plan guard."""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F

from prase_spark.datapipe.hoststats import (
    filter_by_domain_blocklist,
    filter_by_hosts,
    flag_hosts,
    host_stats,
    registrable_domain,
)
from prase_spark.datapipe.pii import (
    PII_PATTERNS,
    REDACTIONS,
    add_pii_counts,
    redact_corpus,
    redact_pii,
)

PII_TEXTS = [
    "contact bob.smith+x@Example.co.uk or 10.0.0.1 tel +1-555-123-4567 ok",
    "no pii here at all",
    "u1@10.0.0.1 is not an email but 255.255.255.255 is an ip a@b.io yes",
    "edge 1.2.3.4.5 and 999.999.999.999 and x@y.z@z.ab mixed +12-123-456-7890x",
    "a@b.c-d.ef dots.. and trailing dot ip 1.2.3.4.",
    "two mails a@b.cd e@f.gh and two ips 1.1.1.1 2.2.2.2",
    "",
]


def py_redact(t):
    for kind, pat in PII_PATTERNS.items():
        t = re.sub(pat, REDACTIONS[kind], t)
    return t


@pytest.fixture(scope="module")
def pii_df(spark):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(PII_TEXTS)], "doc_id LONG, text STRING"
    )


class TestPII:
    def test_counts_match_python_re(self, pii_df):
        rows = {r.doc_id: r for r in add_pii_counts(pii_df).collect()}
        for i, t in enumerate(PII_TEXTS):
            for kind in PII_PATTERNS:
                exp = len(re.findall(PII_PATTERNS[kind], t))
                assert rows[i][f"n_{kind}"] == exp, (i, kind)

    def test_redaction_matches_python_re(self, pii_df):
        got = {
            r.doc_id: r.red
            for r in pii_df.select(
                "doc_id", redact_pii("text").alias("red")
            ).collect()
        }
        for i, t in enumerate(PII_TEXTS):
            assert got[i] == py_redact(t), i

    def test_redacted_text_is_pii_free(self, pii_df):
        red = pii_df.select("doc_id", redact_pii("text").alias("text"))
        assert (
            add_pii_counts(red)
            .filter("n_email + n_ipv4 + n_phone > 0")
            .count()
            == 0
        )

    def test_max_hits_kill_rule(self, pii_df):
        kept = {r.doc_id for r in redact_corpus(pii_df, max_hits=2).collect()}
        for i, t in enumerate(PII_TEXTS):
            hits = sum(
                len(re.findall(p, t)) for p in PII_PATTERNS.values()
            )
            assert (i in kept) == (hits <= 2), (i, hits)


HOST_ROWS = [
    # host a: 4 docs, 2 identical -> dup_pct 25% (1 dup of 4)
    (0, "a.example.org", "the table is big and fast"),
    (1, "a.example.org", "same body"),
    (2, "a.example.org", "same body"),
    (3, "a.example.org", "another page about data and the rows"),
    # host b: 2 docs, all unique
    (4, "b.example.org", "the query is a fast join and the scan is big"),
    (5, "b.example.org", "zz"),
]


@pytest.fixture(scope="module")
def host_df(spark):
    return spark.createDataFrame(
        HOST_ROWS, "doc_id LONG, host STRING, text STRING"
    )


class TestHostStats:
    def test_stats_arithmetic(self, host_df):
        s = {r.host: r for r in host_stats(host_df).collect()}
        a, b = s["a.example.org"], s["b.example.org"]
        assert (a.n_docs, a.n_unique) == (4, 3)
        assert (b.n_docs, b.n_unique) == (2, 2)
        # dup_pct_e4 = round_half_up((n_docs-n_unique)/n_docs * 1e4)
        assert a.dup_pct_e4 == 2500
        assert b.dup_pct_e4 == 0
        assert a.total_tokens == 6 + 2 + 2 + 7
        assert 0 < a.avg_quality_e6 <= 1_000_000

    def test_flag_and_filter(self, host_df, spark):
        flagged = flag_hosts(
            host_stats(host_df), min_avg_quality_e6=0, max_dup_pct_e4=2000
        )
        blocked = flagged.filter("blocked").select("host")
        assert [r.host for r in blocked.collect()] == ["a.example.org"]
        survivors = filter_by_hosts(host_df, blocked)
        assert {r.host for r in survivors.collect()} == {"b.example.org"}

    def test_filter_plan_broadcasts_blocklist(self, host_df, spark):
        bl = spark.createDataFrame([("a.example.org",)], ["host"])
        plan = filter_by_hosts(host_df, bl)._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in plan and "LeftAnti" in plan
        assert "SortMergeJoin" not in plan


class TestDomains:
    def test_registrable_domain_rules(self, spark):
        cases = {
            "www.shop.co.uk": "shop.co.uk",
            "Deep.a.b.Example.com": "example.com",
            "example.com": "example.com",
            "localhost": "localhost",
            "x.gov.uk": "x.gov.uk",  # host IS an eTLD+1 under a 2-level suffix
            "a.x.com.au": "x.com.au",
        }
        df = spark.createDataFrame([(h,) for h in cases], ["h"])
        got = {
            r.h: r.d
            for r in df.select("h", registrable_domain("h").alias("d")).collect()
        }
        assert got == cases

    def test_domain_blocklist_filter(self, spark):
        pages = spark.createDataFrame(
            [
                (0, "https://www.Shop.co.uk/a"),
                (1, "https://cdn.img.shop.co.uk/b"),
                (2, "https://other.org/c"),
            ],
            ["doc_id", "url"],
        )
        bl = spark.createDataFrame([("shop.co.uk",)], ["domain"])
        out = filter_by_domain_blocklist(pages, bl)
        assert [r.doc_id for r in out.collect()] == [2]
        assert out.columns == ["doc_id", "url"]
