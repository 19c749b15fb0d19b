"""WARC container reader: writer/parser inverse (byte-identical payloads),
gzip-member handling, type filtering, corruption resync, parallelism
invariance. The raw-crawl seam of the input_hint page table."""

import os

import pytest

from prase_spark.warc import (
    gzip_member,
    parse_warc_stats,
    parse_warc_bytes,
    read_warc,
    warc_record_bytes,
    warc_to_pages,
)


def _mk_records(n, tag="a"):
    recs = []
    for k in range(n):
        html = f"<html><body>{tag} page {k} é</body></html>".encode()
        recs.append(
            (
                f"https://ex.org/{tag}/{k}",
                f"2024-04-{1 + k % 9:02d}T{k % 10:02d}:00:00Z",
                html,
                (200, 301, 404)[k % 3],
            )
        )
    return recs


def _container(recs, gz=False, interleave=True):
    parts = []
    if interleave:
        parts.append(
            warc_record_bytes(
                None, "2024-04-01T00:00:00Z", b"software: prase",
                warc_type="warcinfo", mime="application/warc-fields",
            )
        )
    for url, ts, html, status in recs:
        if interleave:
            parts.append(
                warc_record_bytes(
                    url, ts, b"GET / HTTP/1.1\r\n\r\n",
                    warc_type="request", with_http=False,
                    mime="application/http; msgtype=request",
                )
            )
        parts.append(warc_record_bytes(url, ts, html, http_status=status))
    if gz:
        return b"".join(gzip_member(p) for p in parts)
    return b"".join(parts)


def test_roundtrip_byte_identity_plain_and_gzip():
    recs = _mk_records(7)
    for gz in (False, True):
        got = [r for r in parse_warc_bytes(_container(recs, gz=gz))
               if r["warc_type"] == "response"]
        assert len(got) == 7
        for (url, ts, html, status), r in zip(recs, got):
            assert r["url"] == url
            assert r["html"] == html  # byte-identical payload
            assert r["http_status"] == status
            assert r["mime"] == "text/html"
            assert r["warc_ts"].isoformat() + "Z" == ts


def test_offsets_stable_across_compression():
    """rec_offset is in the decompressed stream -> gzip/plain identical."""
    recs = _mk_records(5)
    plain = [r["rec_offset"] for r in parse_warc_bytes(_container(recs))]
    gz = [r["rec_offset"] for r in parse_warc_bytes(_container(recs, gz=True))]
    assert plain == gz and plain == sorted(plain)


def test_non_response_records_parse_with_their_own_types():
    out = list(parse_warc_bytes(_container(_mk_records(3))))
    assert [r["warc_type"] for r in out] == [
        "warcinfo", "request", "response"] * 1 + ["request", "response"] * 2
    info = out[0]
    assert info["html"] == b"software: prase" and info["url"] is None


def test_conversion_records_carry_raw_block():
    rec = warc_record_bytes(
        "https://ex.org/wet/1", "2024-04-02T03:00:00Z", b"extracted text only",
        warc_type="conversion", mime="text/plain", with_http=False,
    )
    (r,) = parse_warc_bytes(rec)
    assert r["warc_type"] == "conversion"
    assert r["html"] == b"extracted text only"
    assert r["mime"] == "text/plain" and r["http_status"] is None


def test_corruption_resync_and_truncated_tail():
    recs = _mk_records(6)
    blobs = [warc_record_bytes(u, t, h, http_status=s) for u, t, h, s in recs]
    # garbage between records, a lying Content-Length, and a truncated tail
    lying = blobs[2].replace(b"Content-Length: ", b"Content-Length: 9", 1)
    data = (
        blobs[0] + b"\x00garbage\xff" + blobs[1] + lying
        + blobs[3] + blobs[4] + blobs[5][: len(blobs[5]) // 2]
    )
    got = [r["url"] for r in parse_warc_bytes(data) if r["warc_type"] == "response"]
    # record 2 (corrupt length) and 5 (truncated) drop; the rest survive
    assert got == [recs[0][0], recs[1][0], recs[3][0], recs[4][0]]


def test_non_gzip_tail_ends_member_stream_cleanly():
    recs = _mk_records(4)
    members = [gzip_member(warc_record_bytes(u, t, h, http_status=s))
               for u, t, h, s in recs]
    members[2] = b"XX" + members[2][2:]  # member 2 loses its gzip magic
    got = [r["url"] for r in parse_warc_bytes(b"".join(members))]
    assert got == [recs[0][0], recs[1][0]]


def test_read_warc_spark_and_pages_adapter(spark, tmp_path):
    recs_a, recs_b = _mk_records(9, "a"), _mk_records(8, "b")
    (tmp_path / "part-a.warc").write_bytes(_container(recs_a))
    (tmp_path / "part-b.warc.gz").write_bytes(_container(recs_b, gz=True))
    df = read_warc(spark, os.path.join(str(tmp_path), "*.warc*"))
    rows = {r["url"]: r for r in df.collect()}
    assert len(rows) == 17
    for url, ts, html, status in recs_a + recs_b:
        r = rows[url]
        assert bytes(r["html"]) == html and r["http_status"] == status
    assert rows["https://ex.org/a/0"]["warc_file"] == "part-a.warc"
    assert rows["https://ex.org/b/0"]["warc_file"] == "part-b.warc.gz"

    pages = warc_to_pages(df)
    assert [f.name for f in pages.schema.fields] == [
        "url", "warc_ts", "html", "text", "lang"]
    from prase_spark.extract import extract_text, html_to_text
    texts = {r["url"]: r["text"] for r in extract_text(pages).collect()}
    assert texts["https://ex.org/a/3"] == html_to_text(recs_a[3][2])


def test_read_warc_type_filter_and_plan_is_exchange_free(spark, tmp_path):
    (tmp_path / "c.warc").write_bytes(_container(_mk_records(5, "c")))
    path = os.path.join(str(tmp_path), "c.warc")
    both = read_warc(spark, path, warc_types=("response", "request", "warcinfo"))
    counts = {
        r["warc_type"]: r["count"]
        for r in both.groupBy("warc_type").count().collect()
    }
    assert counts == {"warcinfo": 1, "request": 5, "response": 5}
    plan = read_warc(spark, path)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_parallelism_invariance(spark, tmp_path):
    for i in range(6):
        (tmp_path / f"p{i}.warc.gz").write_bytes(
            _container(_mk_records(4, f"p{i}"), gz=True)
        )
    glob = os.path.join(str(tmp_path), "*.warc.gz")
    one = {tuple((k, str(v)) for k, v in sorted(r.asDict().items()))
           for r in read_warc(spark, glob).coalesce(1).collect()}
    many = {tuple((k, str(v)) for k, v in sorted(r.asDict().items()))
            for r in read_warc(spark, glob).repartition(8).collect()}
    assert one == many and len(one) == 24


def test_warc_to_kg_end_to_end(spark, tmp_path):
    """The full raw-crawl seam: WARC bytes -> pages -> byte-derived text
    -> triples -> dict-encoded KG. Sentences in the payloads match the
    extraction pattern bank, so expected triples are known exactly."""
    from prase_spark.extract import extract_triples
    from prase_spark.kgbuild import build_kg, kg_info

    bodies = {
        "https://kg.org/1": b"<html><body><p>Alice works for Acme</p></body></html>",
        "https://kg.org/2": b"<html><body>Bob was born in Paris</body></html>",
        "https://kg.org/3": b'<html><body>Acme \'s founded is "1999"</body></html>',
    }
    parts = [
        warc_record_bytes(url, "2024-04-01T00:00:00Z", body)
        for url, body in sorted(bodies.items())
    ]
    (tmp_path / "kg.warc.gz").write_bytes(b"".join(gzip_member(p) for p in parts))

    pages = warc_to_pages(read_warc(spark, str(tmp_path / "kg.warc.gz")))
    triples = extract_triples(pages, use_text_column=False)
    got = {(r["subj"], r["pred"], r["obj"], r["is_attr"]) for r in triples.collect()}
    assert got == {
        ("Alice", "employer", "Acme", False),
        ("Bob", "bornIn", "Paris", False),
        ("Acme", "founded", "1999", True),
    }
    kg = build_kg(triples.select("subj", "pred", "obj", "is_attr"))
    info = kg_info(kg)
    assert info["relation_tuples"] == 2 and info["attribute_tuples"] == 1


def test_wet_conversion_to_pages_and_triples(spark, tmp_path):
    """WET mode: conversion records carry pre-extracted text; the PAGES
    adapter decodes the byte-identical payload into the text column and
    extraction consumes it directly (use_text_column=True)."""
    from prase_spark.extract import extract_triples
    from prase_spark.warc import wet_to_pages

    texts = {
        "https://wet.org/1": "Alice works for Acme",
        "https://wet.org/2": "Bob was born in Paris",
    }
    parts = [
        warc_record_bytes(url, "2024-04-02T00:00:00Z", txt.encode(),
                          warc_type="conversion", mime="text/plain",
                          with_http=False)
        for url, txt in sorted(texts.items())
    ]
    (tmp_path / "seg.warc.wet.gz").write_bytes(
        b"".join(gzip_member(p) for p in parts))

    recs = read_warc(spark, str(tmp_path / "seg.warc.wet.gz"),
                     warc_types=("conversion",))
    pages = wet_to_pages(recs)
    rows = {r["url"]: r for r in pages.collect()}
    assert rows["https://wet.org/1"]["text"] == "Alice works for Acme"
    assert rows["https://wet.org/1"]["html"] is None
    got = {(r["subj"], r["pred"], r["obj"]) for r in extract_triples(pages).collect()}
    assert got == {("Alice", "employer", "Acme"), ("Bob", "bornIn", "Paris")}


def test_parse_warc_stats_counts_and_resyncs():
    recs = _mk_records(6)
    clean = _container(recs)  # warcinfo + 6 req + 6 resp
    s = parse_warc_stats(clean)
    assert s["records_by_type"] == {"warcinfo": 1, "request": 6, "response": 6}
    assert s["n_records"] == 13 and s["n_resyncs"] == 0
    assert s["payload_bytes"] > 0

    blobs = [warc_record_bytes(u, t, h, http_status=st) for u, t, h, st in recs]
    lying = blobs[2].replace(b"Content-Length: ", b"Content-Length: 99999", 1)
    dirty = blobs[0] + lying + blobs[3] + blobs[4][: len(blobs[4]) // 2]
    s2 = parse_warc_stats(dirty)
    # lying record resyncs; truncated tail resyncs; 0 and 3 count
    assert s2["records_by_type"] == {"response": 2}
    assert s2["n_resyncs"] == 2


def test_warc_file_metrics_spark(spark, tmp_path):
    from prase_spark.warc import warc_file_metrics

    (tmp_path / "m0.warc").write_bytes(_container(_mk_records(5, "m0")))
    (tmp_path / "m1.warc.gz").write_bytes(_container(_mk_records(3, "m1"), gz=True))
    rows = {
        r["warc_file"]: r
        for r in warc_file_metrics(
            spark, os.path.join(str(tmp_path), "m*.warc*")
        ).collect()
    }
    assert rows["m0.warc"]["n_responses"] == 5
    assert rows["m0.warc"]["n_records"] == 11  # warcinfo + 5 req + 5 resp
    assert rows["m1.warc.gz"]["n_responses"] == 3
    assert all(r["n_resyncs"] == 0 for r in rows.values())
    # stats agree with the record reader
    n = read_warc(spark, os.path.join(str(tmp_path), "m*.warc*"),
                  warc_types=("response",)).count()
    assert n == 8
