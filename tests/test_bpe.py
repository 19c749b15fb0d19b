"""BPE tokenizer training: value parity against an independent
pure-Python reference implementation (Sennrich 2016 learn_bpe
semantics, written scalar-first below — no Spark code shared),
greedy-merge edge cases, partitioning invariance, and segmentation
round-trip."""

import pytest
from pyspark.sql import functions as F

from prase_spark.datapipe.bpetrain import (
    EOW,
    apply_merge,
    bpe_token_counts,
    bpe_train,
    char_symbols,
    word_table,
)

# ---------------------------------------------------------------------------
# independent scalar reference
# ---------------------------------------------------------------------------


def _ref_pair_counts(vocab):
    counts = {}
    for syms, cnt in vocab:
        for i in range(len(syms) - 1):
            p = (syms[i], syms[i + 1])
            counts[p] = counts.get(p, 0) + cnt
    return counts


def _ref_apply(syms, left, right):
    out, i = [], 0
    while i < len(syms):
        if i + 1 < len(syms) and syms[i] == left and syms[i + 1] == right:
            out.append(left + right)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return out


def _ref_bpe(words, n_merges, min_count=1):
    """words: dict word -> corpus count. Returns (merges, final_vocab)."""
    vocab = [(list(w) + [EOW], c) for w, c in sorted(words.items())]
    merges = []
    for rank in range(1, n_merges + 1):
        counts = _ref_pair_counts(vocab)
        if not counts:
            break
        # max count, ties -> lexicographically smallest (l, r)
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        (l, r), cnt = best
        if cnt < min_count:
            break
        merges.append((rank, l, r, cnt))
        vocab = [(_ref_apply(s, l, r), c) for s, c in vocab]
    return merges, vocab


def _docs(spark, texts, parts=4):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id LONG, text STRING"
    ).repartition(parts)


CORPUS = [
    "low lower lowest low low",
    "newest newest widest widest newest",
    "the lower the wider the newest",
    "aaaa aaa banana bandana",
    "low low low newest widest wider",
]


def _spark_merges(spark, texts, k, parts=4, min_count=1):
    df = bpe_train(_docs(spark, texts, parts), n_merges=k, min_count=min_count)
    return [
        (r["rank"], r["l"], r["r"], r["pair_cnt"])
        for r in df.orderBy("rank").collect()
    ]


def _ref_merges(texts, k, min_count=1):
    words = {}
    for t in texts:
        for w in t.split():
            words[w] = words.get(w, 0) + 1
    merges, _ = _ref_bpe(words, k, min_count)
    return merges


def test_merges_match_reference(spark):
    assert _spark_merges(spark, CORPUS, 12) == _ref_merges(CORPUS, 12)


def test_merges_match_reference_seeded_random(spark):
    import random

    rng = random.Random(7)
    alpha = "abcde"
    texts = [
        " ".join(
            "".join(rng.choice(alpha) for _ in range(rng.randint(1, 7)))
            for _ in range(30)
        )
        for _ in range(40)
    ]
    assert _spark_merges(spark, texts, 15) == _ref_merges(texts, 15)


def test_greedy_identical_symbol_runs(spark):
    # "aaaa" -> (aa)(aa); "aaa" -> (aa)a : even-offset pairing
    df = spark.createDataFrame([("aaaa",), ("aaa",), ("baab",)], "word STRING")
    out = {
        r["word"]: r["m"]
        for r in df.select(
            "word", apply_merge(char_symbols("word"), "a", "a").alias("m")
        ).collect()
    }
    assert out["aaaa"] == ["aa", "aa", EOW]
    assert out["aaa"] == ["aa", "a", EOW]
    assert out["baab"] == ["b", "aa", "b", EOW]


def test_partitioning_invariance(spark):
    assert _spark_merges(spark, CORPUS, 10, parts=1) == _spark_merges(
        spark, CORPUS, 10, parts=13
    )


def test_min_count_early_stop(spark):
    ref = _ref_merges(CORPUS, 50, min_count=6)
    got = _spark_merges(spark, CORPUS, 50, min_count=6)
    assert got == ref
    assert 0 < len(got) < 50
    assert all(c >= 6 for (_, _, _, c) in got)


def test_segmentation_roundtrip_and_counts(spark):
    docs = _docs(spark, CORPUS)
    merges, vocab = bpe_train(docs, n_merges=10, return_vocab=True)
    try:
        # every word's symbols concatenate back to word + EOW
        bad = vocab.filter(
            F.concat_ws("", "syms") != F.concat(F.col("word"), F.lit(EOW))
        ).count()
        assert bad == 0
        # per-doc counts equal the scalar replay
        ref_merges, ref_vocab = _ref_bpe(
            {
                r["word"]: r["cnt"]
                for r in word_table(docs).collect()
            },
            10,
        )
        seg = {"".join(s)[: -len(EOW)]: len(s) for s, _ in ref_vocab}
        got = {
            r["key"]: r["bpe_tokens"]
            for r in bpe_token_counts(docs, vocab).collect()
        }
        for i, t in enumerate(CORPUS):
            assert got[i] == sum(seg[w] for w in t.split())
    finally:
        vocab.unpersist()


def test_empty_and_null_docs_report_zero(spark):
    docs = spark.createDataFrame(
        [(0, "low low lower"), (1, ""), (2, None), (3, "...!!!")],
        "doc_id LONG, text STRING",
    )
    merges, vocab = bpe_train(docs, n_merges=3, return_vocab=True)
    try:
        got = {r["key"]: r["bpe_tokens"] for r in bpe_token_counts(docs, vocab).collect()}
        assert got[1] == 0 and got[2] == 0 and got[3] == 0 and got[0] > 0
    finally:
        vocab.unpersist()
