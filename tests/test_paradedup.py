"""Corpus-wide paragraph dedup (datapipe.paradedup) — hand oracle,
keep_first ownership, blank handling, repartitioning determinism."""

from __future__ import annotations

import pytest

from prase_spark.datapipe.paradedup import dedup_paragraphs

SEP = "\n\n"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        [
            (1, SEP.join(["alpha body", "shared blurb", "gamma tail"])),
            (2, SEP.join(["shared blurb", "delta body"])),
            # blank paragraph in the middle ("eps" SEP SEP SEP "zeta")
            (3, "eps body" + SEP + SEP + "shared blurb"),
            (4, "shared blurb"),  # entirely duplicated
            (5, " shared blurb "),  # trim-variant counts as the same para
        ],
        "doc_id LONG, text STRING",
    )


def _by_id(df):
    return {r["doc_id"]: (r["text"], r["removed_paras"]) for r in df.collect()}


def test_remove_everywhere(docs):
    out = _by_id(dedup_paragraphs(docs, min_dup_docs=2))
    assert out[1] == ("alpha body" + SEP + "gamma tail", 1)
    assert out[2] == ("delta body", 1)
    # blank middle paragraph survives (never dup evidence, kept as-is)
    assert out[3] == ("eps body" + SEP, 1)
    # fully-duplicated doc comes back empty, not missing
    assert out[4] == ("", 1)
    assert out[5] == ("", 1)
    assert len(out) == 5


def test_keep_first_owner(docs):
    out = _by_id(dedup_paragraphs(docs, min_dup_docs=2, keep_first=True))
    # min-key owner (doc 1) keeps its own raw spelling of the paragraph
    assert out[1] == (SEP.join(["alpha body", "shared blurb", "gamma tail"]), 0)
    assert out[2] == ("delta body", 1)
    assert out[4] == ("", 1)


def test_threshold_not_met(docs):
    out = _by_id(dedup_paragraphs(docs, min_dup_docs=6))
    assert out[1][0] == SEP.join(["alpha body", "shared blurb", "gamma tail"])
    assert all(removed == 0 for _, removed in out.values())


def test_partitioning_invariance(docs):
    a = sorted(map(tuple, dedup_paragraphs(docs, min_dup_docs=2).collect()))
    b = sorted(
        map(
            tuple,
            dedup_paragraphs(docs.repartition(7), min_dup_docs=2).collect(),
        )
    )
    assert a == b
