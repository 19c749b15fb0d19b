"""distsup: sentence split, gazetteer n-gram matching, KB-labeled pairs.

Value contract: mentions are exact token spans (pos, len) of gazetteer
names; pairs are ordered, non-overlapping, per-sentence, labeled by the
KB with optional NA negatives; everything is a pure function of content
(partitioning-invariant), which is what lets the driver gate hash it."""

from __future__ import annotations

import pytest

from prase_spark.distsup import distant_supervision, find_mentions, split_sentences


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id LONG, text STRING")


def _names(spark, pairs):
    return spark.createDataFrame(pairs, "name STRING, entity STRING")


def _kb(spark, triples):
    return spark.createDataFrame(triples, "subj STRING, pred STRING, obj STRING")


def test_split_sentences_ids_and_blank_drop(spark):
    got = {
        (r["key"], r["sent_id"], r["sentence"])
        for r in split_sentences(
            _docs(spark, [(1, "alpha beta. gamma!  delta? ")])
        ).collect()
    }
    # trailing split part after the final '?' is blank and dropped;
    # sent_id numbers the split parts, not the survivors
    assert got == {(1, 0, "alpha beta"), (1, 1, "gamma"), (1, 2, "delta")}


def test_find_mentions_multi_token_and_case(spark):
    sents = split_sentences(_docs(spark, [(7, "Bob lives in Big City now.")]))
    names = _names(
        spark,
        [("bob", "E:bob"), ("BIG CITY", "E:bigcity"), ("city", "E:city")],
    )
    got = {
        (r["entity"], r["pos"], r["len"])
        for r in find_mentions(sents, names).collect()
    }
    assert got == {("E:bob", 0, 1), ("E:bigcity", 3, 2), ("E:city", 4, 1)}


def test_find_mentions_rejects_bad_length(spark):
    sents = split_sentences(_docs(spark, [(1, "a b.")]))
    with pytest.raises(ValueError):
        find_mentions(sents, _names(spark, [("a", "E:a")]), max_name_tokens=0)


def test_pairs_ordered_nonoverlapping_and_labeled(spark):
    sents = split_sentences(_docs(spark, [(3, "Bob lives in Big City today.")]))
    names = _names(
        spark,
        [("bob", "Bob"), ("big city", "BigCity"), ("city", "City")],
    )
    kb = _kb(spark, [("Bob", "livesIn", "BigCity")])
    mentions = find_mentions(sents, names)
    pos = {
        (r["subj"], r["pred"], r["obj"], r["subj_pos"], r["obj_pos"])
        for r in distant_supervision(mentions, kb).collect()
    }
    assert pos == {("Bob", "livesIn", "BigCity", 0, 3)}
    neg = {
        (r["subj"], r["pred"], r["obj"])
        for r in distant_supervision(mentions, kb, include_negatives=True).collect()
    }
    # ordered pairs over non-overlapping spans: BigCity/City overlap and
    # must NOT pair with each other; every other ordered pair appears,
    # labeled when the KB has the fact, NA otherwise
    assert neg == {
        ("Bob", "livesIn", "BigCity"),
        ("BigCity", "NA", "Bob"),
        ("Bob", "NA", "City"),
        ("City", "NA", "Bob"),
    }


def test_multi_fact_pairs_and_dedup(spark):
    sents = split_sentences(_docs(spark, [(1, "ann met ann and acme.")]))
    names = _names(spark, [("ann", "Ann"), ("acme", "Acme")])
    kb = _kb(
        spark,
        [("Ann", "worksFor", "Acme"), ("Ann", "founded", "Acme")],
    )
    got = {
        (r["subj"], r["pred"], r["obj"], r["subj_pos"], r["obj_pos"])
        for r in distant_supervision(find_mentions(sents, names), kb).collect()
    }
    # two Ann mentions (pos 0, 2) x one Acme mention (pos 4) x two facts
    assert got == {
        ("Ann", "worksFor", "Acme", 0, 4),
        ("Ann", "founded", "Acme", 0, 4),
        ("Ann", "worksFor", "Acme", 2, 4),
        ("Ann", "founded", "Acme", 2, 4),
    }


def test_mention_cap_and_telemetry(spark):
    sents = split_sentences(_docs(spark, [(1, "x1 x2 x3 x4.")]))
    names = _names(spark, [(f"x{i}", f"E{i}") for i in range(1, 5)])
    kb = _kb(spark, [("E1", "r", "E2")])
    stats = {}
    got = distant_supervision(
        find_mentions(sents, names), kb,
        include_negatives=True,
        max_mentions_per_sentence=2,
        stats_out=stats,
    ).collect()
    # cap keeps the two lowest-pos mentions (E1, E2); 2 ordered pairs
    assert stats["dropped_mentions"] == 2
    assert {(r["subj"], r["obj"]) for r in got} == {("E1", "E2"), ("E2", "E1")}


def test_partitioning_invariance(spark):
    docs = _docs(
        spark,
        [(i, f"p{i % 5} knows q{i % 3}. q{i % 3} cites p{(i * 7) % 5}.") for i in range(60)],
    )
    names = _names(
        spark,
        [(f"p{i}", f"P{i}") for i in range(5)] + [(f"q{i}", f"Q{i}") for i in range(3)],
    )
    kb = _kb(spark, [(f"P{i}", "knows", f"Q{j}") for i in range(5) for j in range(3) if (i + j) % 2 == 0])

    def run(d):
        return {
            tuple(r)
            for r in distant_supervision(
                find_mentions(split_sentences(d), names), kb, include_negatives=True
            ).collect()
        }

    assert run(docs) == run(docs.repartition(17))
