"""Distributed BPE tokenizer training (Sennrich et al. 2016, "Neural
Machine Translation of Rare Words with Subword Units") — learn the
merge table a training-data pipeline needs BEFORE it can count tokens,
pack chunks, or temperature-mix by token mass with the tokenizer it
will actually train on.

Scale shape — the production BPE insight is that the corpus collapses
after ONE pass: tokenization statistics depend only on (word, count),
so a 10^12-document corpus becomes a vocab-sized table (10^6-10^8 rows)
in a single exploded scan + map-side-combinable groupBy, and the entire
merge loop runs on THAT table. Per merge iteration:

- pair counting is two whole-array slices + one ``zip_with`` struct-zip
  (the measured-fast ``word_ngrams`` n=2 shape) materialized in a map
  projection BEFORE the explode (the interpreted-Generate trap
  ``textstats.tokens`` documents), then a map-side-combinable
  ``groupBy(l, r)`` over vocab-bounded rows;
- the arg-max merge is ``orderBy().limit(1)`` — a
  TakeOrderedAndProject per-partition heap, never a global sort — and
  the only driver collect is that ONE row per iteration;
- the merge applies as a native ``aggregate`` fold over each word's
  symbol array (greedy leftmost non-overlapping, the reference
  semantics), prefiltered to words that contain both symbols; no
  Python ever touches an executor;
- ``localCheckpoint`` every ``checkpoint_every`` iterations truncates
  the fold-on-fold lineage (the pagerank doctrine).

Plan-hygiene constraint (pinned by ``test_bpe_plan_hygiene``): the
merge loop MUST read a materialized vocab (``bpe_train`` persists it
before iterating). On an unpersisted vocab Catalyst pushes the pair
explode's implicit non-empty filter below the word aggregate, re-
computing ``size(zip_with(...)) > 0`` per CORPUS token occurrence —
interpreted HOF work on the corpus-sized stream, the exact class of
cost the one-pass collapse exists to avoid. Persisting pins the filter
to the vocab-sized InMemory scan (verified via ``.explain``).

Greedy semantics pinned by tests and the DuckDB twin: within a run of
identical symbols ("aaaa", merge (a,a)) pairs merge at even offsets
((aa)(aa)); for l != r adjacent matches can never share a symbol (that
would need r = l), so all matches merge. Words carry a trailing ``_``
end-of-word symbol (tokens are ``[a-z0-9]+`` so ``_`` cannot collide),
the Sennrich '</w>' convention, letting merges distinguish word-final
contexts ("est_") from in-word ones.

Ranking/tie-break is a total order — (pair_cnt DESC, l ASC, r ASC) over
ascii symbols compares identically under Spark and DuckDB binary
collation — so the merge table is bit-identical at any partitioning and
cross-engine (gates ``bpe_merges_docs`` / ``bpe_token_counts_docs``).

No reference analog (the reference consumes pre-built triples) —
first-class LLM-pipeline op alongside token_count_bpe's regex
approximation: this module LEARNS the vocabulary that regex fakes.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from prase_spark.datapipe.textstats import tokens

EOW = "_"


def word_table(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, cnt): the one corpus pass — everything downstream is
    vocab-sized. Map-side combine collapses each task to its distinct
    words before the only corpus shuffle."""
    return (
        docs.select(F.explode(tokens(text_col)).alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("cnt"))
    )


def char_symbols(word_col: Column | str) -> Column:
    """Initial symbol array: characters plus the trailing EOW marker."""
    c = F.col(word_col) if isinstance(word_col, str) else word_col
    return F.concat(F.split(c, ""), F.array(F.lit(EOW)))


def pair_counts(vocab: DataFrame) -> DataFrame:
    """(l, r, pair_cnt): every adjacent symbol pair, weighted by word
    count — overlapping occurrences all count ("aaa" has (a,a) twice),
    the reference get_stats semantics. The pair array is built in a map
    projection (two slices + zip_with, one array object per WORD); only
    the final array feeds the explode."""
    n = F.size("syms")
    pairs = F.zip_with(
        F.slice("syms", 1, n - 1),
        F.slice(F.col("syms"), 2, n - 1),
        lambda a, b: F.struct(a.alias("l"), b.alias("r")),
    )
    return (
        vocab.select("cnt", pairs.alias("__p"))
        .select("cnt", F.explode("__p").alias("p"))
        .groupBy(F.col("p.l").alias("l"), F.col("p.r").alias("r"))
        .agg(F.sum("cnt").alias("pair_cnt"))
    )


def apply_merge(syms_col: Column | str, left: str, right: str) -> Column:
    """Greedy leftmost non-overlapping replacement of adjacent
    (left, right) with their concatenation — one native aggregate fold,
    state (out, carry): a carry matching ``left`` followed by ``right``
    emits the merged symbol and clears; anything else flushes the carry.
    Within an identical-symbol run this is exactly even-offset pairing
    (pinned by test_bpe greedy cases and the DuckDB run-parity twin)."""
    c = F.col(syms_col) if isinstance(syms_col, str) else syms_col
    merged = left + right
    init = F.struct(
        F.array().cast("array<string>").alias("out"),
        F.lit(None).cast("string").alias("carry"),
    )

    def step(st, x):
        is_merge = (
            st["carry"].isNotNull()
            & (st["carry"] == F.lit(left))
            & (x == F.lit(right))
        )
        return F.when(
            is_merge,
            F.struct(
                F.concat(st["out"], F.array(F.lit(merged))).alias("out"),
                F.lit(None).cast("string").alias("carry"),
            ),
        ).otherwise(
            F.struct(
                F.when(st["carry"].isNull(), st["out"])
                .otherwise(F.concat(st["out"], F.array(st["carry"])))
                .alias("out"),
                x.alias("carry"),
            )
        )

    def finish(st):
        return F.when(st["carry"].isNull(), st["out"]).otherwise(
            F.concat(st["out"], F.array(st["carry"]))
        )

    return F.aggregate(c, init, step, finish)


def bpe_train(
    docs: DataFrame,
    n_merges: int = 16,
    min_count: int = 1,
    text_col: str = "text",
    checkpoint_every: int = 8,
    return_vocab: bool = False,
):
    """Learn ``n_merges`` BPE merges; returns a DataFrame
    (rank, l, r, pair_cnt) — exact BIGINTs/strings, bit-identical at any
    partitioning — or, with ``return_vocab``, a (merges, vocab) pair
    where vocab is (word, cnt, syms) AFTER all merges (the segmentation
    table ``bpe_token_counts`` reuses, so segmenting costs nothing
    beyond training). Stops early when the best pair's count drops
    below ``min_count`` (or no pair exists)."""
    spark = docs.sparkSession
    vocab = (
        word_table(docs, text_col)
        .withColumn("syms", char_symbols("word"))
        .persist()
    )
    rows: list[tuple] = []
    try:
        for k in range(1, n_merges + 1):
            top = (
                pair_counts(vocab)
                .orderBy(F.desc("pair_cnt"), F.asc("l"), F.asc("r"))
                .limit(1)
                .collect()  # ONE row per iteration
            )
            if not top or top[0]["pair_cnt"] < min_count:
                break
            l, r, cnt = top[0]["l"], top[0]["r"], int(top[0]["pair_cnt"])
            rows.append((k, l, r, cnt))
            has_pair = F.array_contains("syms", l) & F.array_contains("syms", r)
            nxt = vocab.withColumn(
                "syms",
                F.when(has_pair, apply_merge("syms", l, r)).otherwise(
                    F.col("syms")
                ),
            )
            if k % checkpoint_every == 0:
                nxt = nxt.localCheckpoint(eager=True)  # truncate fold lineage
            else:
                nxt = nxt.persist()
                nxt.count()
            vocab.unpersist()
            vocab = nxt
        merges = spark.createDataFrame(
            rows, "rank LONG, l STRING, r STRING, pair_cnt LONG"
        )
        return (merges, vocab) if return_vocab else merges
    finally:
        if not return_vocab:
            vocab.unpersist()


def bpe_token_counts(
    docs: DataFrame,
    vocab: DataFrame,
    text_col: str = "text",
    key_col: str = "doc_id",
) -> DataFrame:
    """(key, bpe_tokens): per-document token count under the trained
    tokenizer — segmentation is a LOOKUP, not a re-derivation: the
    trained vocab already holds each word's final symbol array, so the
    corpus pays one exploded scan + one word-keyed join (vocab-sized
    build side; Spark picks broadcast vs shuffle-hash by its stats) +
    one map-side-combinable per-doc sum. Docs with no tokens report 0
    (left join keeps every input row). Counting a DIFFERENT corpus than
    the one that trained ``vocab`` undercounts: unseen words drop at the
    inner word join (real BPE would back off to characters) — union the
    new corpus's ``word_table`` into the vocab with ``char_symbols`` +
    the merge replay first, or accept the documented drop."""
    per_word = vocab.select("word", F.size("syms").alias("__n"))
    per_doc = (
        docs.select(F.col(key_col).alias("key"), F.explode(tokens(text_col)).alias("word"))
        .join(per_word, "word")
        .groupBy("key")
        .agg(F.sum("__n").alias("bpe_tokens"))
    )
    return (
        docs.select(F.col(key_col).alias("key"))
        .join(per_doc, "key", "left")
        .select("key", F.coalesce("bpe_tokens", F.lit(0)).cast("long").alias("bpe_tokens"))
    )
