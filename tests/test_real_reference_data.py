"""Exercise the seed/gold/embedding-mapping LOADERS against the real
D-W-15K_V2 files shipped with the reference (data/D_W_15K_V2 — triple files
are absent per .MISSING_LARGE_BLOBS, so KGs are reconstructed from the
kg*_ent_ids name inventories; only the load paths are under test:
objects/KGs.py:481-512 seed load, :522-539 id-mapping load, :281-295 gold).
"""

import os

import pytest
from pyspark.sql import functions as F

DATA = "/root/reference/data/D_W_15K_V2"

pytestmark = pytest.mark.skipif(
    not os.path.exists(f"{DATA}/BootEA/alignment_results_12"),
    reason="reference D-W-15K data not present",
)


def _names(path):
    with open(path, encoding="utf8") as f:
        return [line.split("\t")[0] for line in f if line.strip()]


@pytest.fixture(scope="module")
def kgs(spark):
    """Minimal KGs whose entity namespaces are the REAL D-W-15K inventories
    (one synthetic attr triple per entity registers the node)."""
    from prase_spark.kgbuild import build_kg
    from prase_spark.sources import _read_tsv

    def kg_from_ids(path):
        m = _read_tsv(spark, path, "name STRING, idx LONG")
        raw = m.select(
            F.col("name").alias("subj"),
            F.lit("label").alias("pred"),
            F.concat(F.lit("v"), F.col("idx").cast("string")).alias("obj"),
            F.lit(True).alias("is_attr"),
        )
        return build_kg(raw)

    return (
        kg_from_ids(f"{DATA}/BootEA/kg1_ent_ids"),
        kg_from_ids(f"{DATA}/BootEA/kg2_ent_ids"),
    )


def test_real_seed_links_load_and_resolve(spark, kgs):
    from prase_spark.seed import load_seed_links
    from prase_spark.sources import read_seed_links_tsv

    kg1, kg2 = kgs
    links = read_seed_links_tsv(spark, f"{DATA}/BootEA/alignment_results_12")
    assert links.count() == 1577
    lo, hi = links.agg(F.min("prob"), F.max("prob")).first()
    assert 0.0 < lo and hi <= 1.0

    sub, sup = load_seed_links(links, kg1, kg2)
    # independent expectation: every link whose two names exist in the
    # respective inventories resolves to exactly one id-level row
    names1, names2 = set(_names(f"{DATA}/BootEA/kg1_ent_ids")), set(
        _names(f"{DATA}/BootEA/kg2_ent_ids")
    )
    with open(f"{DATA}/BootEA/alignment_results_12", encoding="utf8") as f:
        raw = [line.rstrip("\n").split("\t") for line in f if line.strip()]
    expected = sum(1 for p in raw if p[0] in names1 and p[1] in names2)
    assert sub.count() == expected > 0
    assert sup.count() == expected

    # prob passes through unscaled, resolved to the right counterpart
    first_l, first_r, first_p = raw[0][0], raw[0][1], float(raw[0][2])
    id_l = kg1.nodes.filter(F.col("name") == first_l).first()["ent_id"]
    id_r = kg2.nodes.filter(F.col("name") == first_r).first()["ent_id"]
    row = sub.filter(F.col("ent_id") == id_l).first()
    assert row["counterpart_id"] == id_r
    assert abs(row["prob"] - first_p) < 1e-12
    assert not row["is_lit"]


def test_real_gold_links_load(spark, kgs):
    from prase_spark.sources import read_gold_links_tsv

    kg1, kg2 = kgs
    gold = read_gold_links_tsv(spark, f"{DATA}/ent_links")
    assert gold.count() == 15000
    # the gold inventory is fully resolvable against the id files
    unresolved = gold.join(
        kg1.nodes.select(F.col("name").alias("name_l")), "name_l", "left_anti"
    ).count()
    assert unresolved == 0


def test_real_id_mapping_embedding_resolve(spark, kgs):
    """S4 with the real kg1_ent_ids mapping: synthetic vectors keyed by idx
    attach to every inventory name and resolve to engine ids."""
    from prase_spark.embed import resolve_embeddings
    from prase_spark.sources import _read_tsv

    kg1, _ = kgs
    mapping = _read_tsv(spark, f"{DATA}/BootEA/kg1_ent_ids", "name STRING, idx LONG")
    vectors = mapping.select(
        "idx", F.array(F.col("idx").cast("float"), F.lit(1.0).cast("float")).alias("embedding")
    )
    named = mapping.join(vectors, "idx").select("name", "embedding")
    resolved = resolve_embeddings(named, kg1.nodes)
    assert resolved.count() == 15000
    assert resolved.select("ent_id").distinct().count() == 15000
