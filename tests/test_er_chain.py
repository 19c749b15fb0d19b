"""End-to-end ER chain over the NEW round-5 layer: token meta-blocking
-> Fellegi-Sunter linkage -> connected components -> survivorship
golden records. Each stage is individually gate/pytest-verified; this
test pins the SEAMS — schemas, key flow, and that the composed chain
recovers the planted entities."""

import pytest
from pyspark.sql import functions as F

from prase_spark.linkage import fellegi_sunter
from prase_spark.matching import connected_components
from prase_spark.metablock import meta_block_candidates
from prase_spark.survivorship import golden_record

# two "sources" describing the same 6 companies with noisy fields; the
# shared "corp" token makes token blocking emit CROSS pairs too, so the
# FS u-probabilities are estimated from genuine non-matches. Planted
# truth: lk <-> rk are the same entity.
LEFT = [
    (1, "acme steel corp", "us", 1910),
    (2, "globex trading corp", "de", 1960),
    (3, "initech systems corp", "us", 1990),
    (4, "umbrella holdings corp", "jp", 1980),
    (5, "stark industries corp", "us", 1940),
    (6, "wayne enterprises corp", "gb", 1939),
]
RIGHT = [
    (11, "acme steel corp", "us", 1910),
    (12, "globex trading corp", "de", 1961),      # year off by one
    (13, "initech systems corp", "ca", 1990),     # country differs
    (14, "umbrella holdings corp", "jp", 1980),
    (15, "stark industries corp", "us", 1940),
    (16, "wayne enterprises corp ltd", "gb", 1939),  # name variant
]
GOLD = [(1, 11), (2, 12), (3, 13)]  # half the truth, as a training seed
TRUTH = {(1, 11), (2, 12), (3, 13), (4, 14), (5, 15), (6, 16)}


def test_er_chain_end_to_end(spark):
    l = spark.createDataFrame(LEFT, ["key", "name", "cc", "year"])
    r = spark.createDataFrame(RIGHT, ["key", "name", "cc", "year"])

    # 1. blocking: token meta-blocking, no pruning (tiny fixture)
    cand = meta_block_candidates(l, r, scheme="none").select(
        F.col("key_l"), F.col("key_r")
    )
    cand_set = {(x.key_l, x.key_r) for x in cand.collect()}
    assert TRUTH <= cand_set  # blocking must not lose a true pair

    # 2. linkage: FS decisions from the half-truth seed
    gold = spark.createDataFrame(GOLD, ["key_l", "key_r"])
    feats = {"name": ("name", "name"), "cc": ("cc", "cc"), "year": ("year", "year")}
    dec = fellegi_sunter(cand, l, r, gold, feats, accept=1)
    linked = dec.filter("is_match").select("key_l", "key_r")
    linked_set = {(x.key_l, x.key_r) for x in linked.collect()}
    # the model generalizes past the half-truth seed to ALL true pairs
    # — including the name-variant (6, 16), recovered on cc+year
    # evidence alone — with zero false positives among the 30 cross
    # candidates
    assert linked_set == TRUTH

    # 3. canonicalization: CC over the accepted pairs
    comp = connected_components(
        linked.select(F.col("key_l").alias("src"), F.col("key_r").alias("dst"))
    )
    canon = comp.select(F.col("node"), F.col("component").alias("canon"))

    # 4. survivorship: fuse both sides' year claims per canonical entity
    claims = (
        l.selectExpr("key AS subj", "'year' AS pred", "CAST(year AS STRING) AS obj")
        .unionByName(
            r.selectExpr("key AS subj", "'year' AS pred", "CAST(year AS STRING) AS obj")
        )
    )
    golden = golden_record(claims, canon=canon)
    by_subj = {(x.subj, x.pred): (x.obj, x.weight) for x in golden.collect()}
    # entity {1, 11}: both claim 1910 -> weight 2
    e1 = min(1, 11)
    assert by_subj[(e1, "year")] == ("1910", 2)
    # unlinked records survive as their own canonical singleton
    assert (6, "year") in by_subj or (16, "year") in by_subj
