"""SURT canonicalization + CDX index: spec pins, layout, prefix lookup."""

import datetime
import hashlib
import json

from pyspark.sql import functions as F

from prase_spark.cdx import build_cdx, cdx_lookup, surt_key, to_cdxj, write_cdx_index


def _surt(spark, url):
    return (
        spark.createDataFrame([(url,)], "u string")
        .select(surt_key("u").alias("s"))
        .first()
        .s
    )


def test_surt_spec(spark):
    assert (
        _surt(spark, "HTTPS://WWW.Sub.Example.COM:443/A/b?Q=1#frag")
        == "com,example,sub)/a/b?q=1"
    )
    assert _surt(spark, "http://example.org") == "org,example)/"
    assert _surt(spark, "http://a.b.c.d/p") == "d,c,b,a)/p"
    # www only strips as a LEADING label; ports strip regardless of value
    assert _surt(spark, "http://www.www2.org:8080/x") == "org,www2)/x"


def _pages(spark):
    rows = [
        (
            "https://%s.example.com/p%d" % ("ab"[i % 2], i),
            datetime.datetime(2024, 1, 1, 0, i),
            ("payload %d" % i).encode(),
        )
        for i in range(20)
    ]
    return spark.createDataFrame(
        rows, "url string, warc_ts timestamp, html binary"
    )


def test_build_cdx_digest_length_ts(spark):
    rec = build_cdx(_pages(spark)).where(F.col("url").endswith("/p3")).first()
    assert rec.surt == "com,example,b)/p3"
    assert rec.ts == "20240101000300"
    assert rec.digest == hashlib.md5(b"payload 3").hexdigest()
    assert rec.length_bytes == len(b"payload 3")


def test_cdx_index_roundtrip_and_pruneable_layout(spark, tmp_path):
    path = str(tmp_path / "cdx")
    write_cdx_index(build_cdx(_pages(spark)), path, n_shards=4)
    back = spark.read.parquet(path)
    assert back.count() == 20
    # shards are globally range-ordered: per-file (min, max) surt+ts
    # intervals must not overlap — the property parquet pruning needs
    spans = (
        back.select(
            F.input_file_name().alias("f"),
            F.concat_ws("\x00", "surt", "ts").alias("k"),
        )
        .groupBy("f")
        .agg(F.min("k").alias("lo"), F.max("k").alias("hi"))
        .collect()
    )
    spans = sorted([(r.lo, r.hi) for r in spans])
    for (_, hi_prev), (lo, _) in zip(spans, spans[1:]):
        assert hi_prev <= lo
    # prefix lookup: one host's captures only, ts-ordered
    got = cdx_lookup(back, "com,example,a)").collect()
    want = sorted(range(0, 20, 2), key=lambda i: "p%d" % i)  # surt-lexicographic
    assert [r.url for r in got] == [
        "https://a.example.com/p%d" % i for i in want
    ]


def test_mark_revisits(spark):
    from prase_spark.cdx import mark_revisits

    cdx = spark.createDataFrame(
        [
            ("u", "20240101000000", "d1"),
            ("u", "20240102000000", "d1"),  # same digest -> revisit
            ("u", "20240103000000", "d2"),  # content changed -> fresh
            ("u", "20240104000000", "d2"),  # revisit again
            ("v", "20240101000000", "d1"),  # other URL: first capture
        ],
        "url string, ts string, digest string",
    )
    got = {
        (r.url, r.ts): r.revisit for r in mark_revisits(cdx).collect()
    }
    assert got == {
        ("u", "20240101000000"): False,
        ("u", "20240102000000"): True,
        ("u", "20240103000000"): False,
        ("u", "20240104000000"): True,
        ("v", "20240101000000"): False,
    }


def test_to_cdxj_line_shape(spark):
    line = (
        to_cdxj(build_cdx(_pages(spark).limit(1))).first().line
    )
    surt, ts, payload = line.split(" ", 2)
    assert surt == "com,example,a)/p0" and ts == "20240101000000"
    obj = json.loads(payload)
    assert obj == {
        "url": "https://a.example.com/p0",
        "digest": hashlib.md5(b"payload 0").hexdigest(),
        "length": len(b"payload 0"),
    }
