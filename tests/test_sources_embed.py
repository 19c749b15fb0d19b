"""Source readers (S1/S2/S4/S5/S6, T4) + embedding ops (J7 argmax, P15
blend, LSH blocking) unit tests."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from prase_spark.embed import (
    blend_embeddings,
    brute_force_argmax,
    lsh_argmax,
)
from prase_spark.sources import (
    read_gold_links_tsv,
    read_seed_links_tsv,
    read_triples_tsv,
    sample_links,
)


@pytest.fixture()
def tsv_dir(tmp_path):
    rel = tmp_path / "rel_triples"
    rel.write_text("a\tp\thttp://x/b\n\n  \t\t\nc\tp\thttp://x/d\nbad line\n", encoding="utf8")
    attr = tmp_path / "attr_triples"
    attr.write_text('a\tname\t"alice"\nc\tname\t"carol"\n', encoding="utf8")
    links = tmp_path / "links"
    links.write_text("a\tb2\t0.7\nc\td2\n", encoding="utf8")
    return tmp_path


def test_read_triples_two_file(spark, tsv_dir):
    df = read_triples_tsv(spark, str(tsv_dir / "rel_triples"), str(tsv_dir / "attr_triples"))
    rows = {(r["subj"], r["pred"], r["obj"], r["is_attr"]) for r in df.collect()}
    assert ("a", "p", "http://x/b", False) in rows
    assert ("a", "name", '"alice"', True) in rows
    assert len(rows) == 4  # blank + malformed lines dropped (P4)


def test_read_triples_self_classifying(spark, tsv_dir):
    df = read_triples_tsv(spark, str(tsv_dir / "rel_triples"))
    got = {r["obj"]: r["is_attr"] for r in df.collect()}
    assert got == {"http://x/b": False, "http://x/d": False}


def test_read_seed_and_gold(spark, tsv_dir):
    seeds = read_seed_links_tsv(spark, str(tsv_dir / "links"))
    got = {r["name_l"]: r["prob"] for r in seeds.collect()}
    assert got == {"a": 0.7, "c": 1.0}  # missing prob -> 1.0
    gold = read_gold_links_tsv(spark, str(tsv_dir / "links"))
    assert gold.count() == 2
    assert sample_links(seeds, 1).count() == 1
    assert sample_links(seeds, None).count() == 2


def test_brute_force_argmax(spark):
    emb_l = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [0.0, 1.0])], "ent_id LONG, embedding ARRAY<DOUBLE>"
    )
    emb_r = spark.createDataFrame(
        [(10, [0.9, 0.1]), (11, [0.1, 0.9]), (12, [0.5, 0.5])],
        "ent_id LONG, embedding ARRAY<DOUBLE>",
    )
    sub, sup = brute_force_argmax(emb_l, emb_r, prob=0.2)
    got = {r["ent_id"]: (r["counterpart_id"], r["prob"]) for r in sub.collect()}
    assert got == {0: (10, 0.2), 1: (11, 0.2)}  # J7: dot-product row argmax
    got_sup = {r["ent_id"]: r["counterpart_id"] for r in sup.collect()}
    assert got_sup == {10: 0, 11: 1}


def test_lsh_argmax_agrees_with_brute_force(spark):
    rng = np.random.default_rng(3)
    mat_l = rng.normal(size=(60, 16))
    mat_r = mat_l + rng.normal(size=(60, 16)) * 0.1  # r ~ noisy copy of l
    rows_l = [(i, [float(x) for x in mat_l[i]]) for i in range(60)]
    rows_r = [(i + 1000, [float(x) for x in mat_r[i]]) for i in range(60)]
    emb_l = spark.createDataFrame(rows_l, "ent_id LONG, embedding ARRAY<DOUBLE>")
    emb_r = spark.createDataFrame(rows_r, "ent_id LONG, embedding ARRAY<DOUBLE>")
    approx = {
        r["ent_id"]: r["counterpart_id"]
        # production-width default band keys (128/8 = 16-bit): noisy copies
        # (cos ≈ 0.995) keep per-band match prob ~0.6, ~0.999 over 8 bands
        for r in lsh_argmax(emb_l, emb_r, dim=16).collect()
    }
    correct = sum(1 for i in range(60) if approx.get(i) == i + 1000)
    assert correct >= 54  # ≥90% recall of the true nearest copy


def test_blend_embeddings(spark):
    cur = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [0.0, 1.0])], "ent_id LONG, embedding ARRAY<DOUBLE>"
    )
    upd = spark.createDataFrame([(0, [0.0, 1.0])], "ent_id LONG, embedding ARRAY<DOUBLE>")
    out = {r["ent_id"]: r["embedding"] for r in blend_embeddings(cur, upd, alpha=0.5).collect()}
    # αold+(1-α)new = [0.5,0.5] -> normalized [≈0.707, ≈0.707] (P15)
    assert abs(out[0][0] - 0.7071067) < 1e-4 and abs(out[0][1] - 0.7071067) < 1e-4
    assert out[1] == [0.0, 1.0]  # untouched rows pass through


def test_read_pages_jsonl(spark, tmp_path):
    """JSONL page reader: base64 html round-trips to the exact bytes;
    malformed JSON and records missing url/text are dropped."""
    import base64

    from prase_spark.sources import read_pages_jsonl

    p = tmp_path / "pages.jsonl"
    html = b"<html><body>Hi</body></html>"
    b64 = base64.b64encode(html).decode()
    p.write_text(
        f'{{"url": "u1", "warc_ts": "2024-01-02 03:04:05", "html": "{b64}", '
        '"text": "hello", "lang": "en"}\n'
        "garbage line\n"
        '{"warc_ts": "2024-01-01 00:00:00", "lang": "en"}\n'
        '{"url": "u2", "warc_ts": "2024-01-02 03:04:05", "html": null, '
        '"text": "no html", "lang": "de"}\n',
        encoding="utf8",
    )
    rows = {r["url"]: r for r in read_pages_jsonl(spark, str(p)).collect()}
    assert set(rows) == {"u1", "u2"}
    assert bytes(rows["u1"]["html"]) == html
    assert rows["u2"]["html"] is None and rows["u2"]["lang"] == "de"
