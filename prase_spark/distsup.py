"""Distant supervision: KB facts x sentence co-mentions -> labeled
relation-extraction training pairs (Mintz et al. 2009).

The bridge between the two halves of this engine: the constructed KG
(triples with canonical entities) and the curated text corpus. Distant
supervision projects KB facts onto sentences — every sentence mentioning
both entities of a fact becomes a (noisy) positive training example for
that relation, and co-mention pairs with no fact become the classic NA
negatives — producing the training set for the relation-extraction models
that in turn grow the KG. The reference has no corpus side at all
(objects/KGs.py consumes pre-built triple dumps), so this is part of the
beyond-reference training-data suite, same tier as DSIR/classifier.

Pipeline (all native expressions — no Python on executors):

1. :func:`split_sentences` — one narrow map: regexp split on
   sentence-final punctuation, posexplode keeps a deterministic
   ``sent_id`` per document.
2. :func:`find_mentions` — gazetteer matching without a trie UDF: each
   sentence's token array expands to all n-grams up to
   ``max_name_tokens`` via nested ``transform`` (pure codegen,
   |tokens| x L rows at most), which equi-join the name dictionary on
   the lowercased gram. Catalyst broadcasts a small gazetteer; a
   KB-scale one shuffles both sides on the string key — at that scale
   pre-hash the dictionary and join on ``xxhash64(gram)`` with an
   equality re-verify (the minhash banding doctrine, buckets.py).
3. :func:`distant_supervision` — co-mention pairs within a sentence
   (ordered, non-overlapping spans), deterministically capped per
   sentence, labeled by an equi-join against the KB on
   (subj name, obj name); unlabeled pairs optionally kept as ``NA``
   negatives.

Scale shape: the only joins are equi-joins (gazetteer, KB — both
entity-vocabulary-sized, broadcastable in practice); the one window is
partitioned by (doc, sentence), whose group size is bounded by the
sentence's own token count, so it cannot skew regardless of corpus
size. The pair self-join is per-sentence and capped at
``max_mentions_per_sentence`` mentions -> <= m^2 pairs per sentence,
with dropped-mention telemetry (``stats_out``) per the counted-drop
doctrine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: sentence-final punctuation: one or more of .!? (abbreviation handling
#: is a tokenizer concern out of scope for the training-pair contract).
SENT_SPLIT_RE = r"[.!?]+"


def split_sentences(
    docs: DataFrame,
    text_col: str = "text",
    key_col: str = "doc_id",
) -> DataFrame:
    """(key, sent_id, sentence): documents split on sentence-final
    punctuation. ``sent_id`` is the 0-based position among the SPLIT
    PARTS (stable under any content), blank parts dropped after
    numbering so ids are reproducible even when sentences are removed
    upstream. One narrow map stage, no shuffle."""
    return (
        docs.select(
            F.col(key_col).alias("key"),
            F.posexplode(F.split(F.col(text_col), SENT_SPLIT_RE)).alias(
                "sent_id", "sentence"
            ),
        )
        .withColumn("sentence", F.trim("sentence"))
        .filter(F.col("sentence") != "")
    )


def find_mentions(
    sents: DataFrame,
    names: DataFrame,
    name_col: str = "name",
    entity_col: str = "entity",
    max_name_tokens: int = 4,
) -> DataFrame:
    """(key, sent_id, entity, pos, len): every occurrence of a gazetteer
    name in a sentence, as token position + token length. Matching is
    case-insensitive on whitespace-tokenized text; overlapping matches
    are all kept (mention disambiguation is downstream's policy —
    :func:`distant_supervision` pairs only non-overlapping spans).

    The n-gram expansion is a single nested-``transform`` expression:
    for token i, grams of length 1..min(L, n_tokens - i). Pure
    whole-stage codegen; the fan-out is exactly sum_i min(L, n-i)
    <= L x n_tokens rows per sentence, each an 8-byte pos/len plus the
    gram string that immediately hash-joins the dictionary."""
    if max_name_tokens < 1:
        raise ValueError(f"max_name_tokens must be >= 1, got {max_name_tokens}")
    toks = F.split(F.col("sentence"), r"\s+")
    grams = F.expr(
        f"""flatten(transform(__toks, (t, i) ->
              transform(sequence(1, least({int(max_name_tokens)},
                                          size(__toks) - i)),
                        n -> struct(i AS pos, n AS len,
                                    array_join(slice(__toks, i + 1, n), ' ')
                                    AS gram))))"""
    )
    gram_rows = (
        sents.withColumn("__toks", toks)
        .select("key", "sent_id", F.explode(grams).alias("g"))
        .select("key", "sent_id", "g.pos", "g.len", F.lower("g.gram").alias("__m"))
    )
    dictionary = names.select(
        F.lower(F.col(name_col)).alias("__m"), F.col(entity_col).alias("entity")
    ).distinct()
    return gram_rows.join(dictionary, "__m").select(
        "key", "sent_id", "entity", "pos", "len"
    )


def distant_supervision(
    mentions: DataFrame,
    kb: DataFrame,
    subj_col: str = "subj",
    pred_col: str = "pred",
    obj_col: str = "obj",
    include_negatives: bool = False,
    max_mentions_per_sentence: int = 32,
    stats_out: dict | None = None,
) -> DataFrame:
    """(key, sent_id, subj, pred, obj, subj_pos, obj_pos): ordered
    co-mention pairs labeled by the KB.

    - Pairs are ORDERED (relation direction matters) over distinct
      mention spans in the same sentence whose token spans do NOT
      overlap (a gazetteer matching both "big city7" and "city7" must
      not pair the containing span with its own substring).
    - A pair gets one row per KB fact (subj name, pred, obj name) —
      multi-relation entity pairs yield multiple positives, the
      standard multi-instance DS setup.
    - ``include_negatives``: pairs with NO fact survive with pred
      ``'NA'`` (the Mintz negative class). Default off: negatives at
      corpus scale dwarf positives; callers sample them explicitly.
    - Determinism: mentions per sentence are capped by
      (pos, len, entity) rank — a pure function of content — and the
      drop count lands in ``stats_out['dropped_mentions']``.
    """
    m = mentions.select("key", "sent_id", "entity", "pos", "len").distinct()
    if max_mentions_per_sentence is not None:
        from pyspark.sql import Window

        w = Window.partitionBy("key", "sent_id").orderBy("pos", "len", "entity")
        ranked = m.withColumn("__r", F.row_number().over(w))
        if stats_out is not None:
            stats_out["dropped_mentions"] = (
                ranked.filter(F.col("__r") > max_mentions_per_sentence).count()
            )
        m = ranked.filter(F.col("__r") <= max_mentions_per_sentence).drop("__r")

    a = m.select(
        "key", "sent_id",
        F.col("entity").alias("__subj_ent"),
        F.col("pos").alias("subj_pos"), F.col("len").alias("__subj_len"),
    )
    b = m.select(
        "key", "sent_id",
        F.col("entity").alias("__obj_ent"),
        F.col("pos").alias("obj_pos"), F.col("len").alias("__obj_len"),
    )
    pairs = a.join(b, ["key", "sent_id"]).filter(
        # distinct, non-overlapping token spans (ordered pairs: both
        # directions survive as separate rows)
        (F.col("subj_pos") + F.col("__subj_len") <= F.col("obj_pos"))
        | (F.col("obj_pos") + F.col("__obj_len") <= F.col("subj_pos"))
    )
    facts = kb.select(
        F.col(subj_col).alias("__subj_ent"),
        F.col(pred_col).alias("pred"),
        F.col(obj_col).alias("__obj_ent"),
    ).distinct()
    how = "left" if include_negatives else "inner"
    out = pairs.join(facts, ["__subj_ent", "__obj_ent"], how)
    if include_negatives:
        out = out.withColumn("pred", F.coalesce("pred", F.lit("NA")))
    return out.select(
        "key", "sent_id",
        F.col("__subj_ent").alias("subj"), "pred",
        F.col("__obj_ent").alias("obj"),
        "subj_pos", "obj_pos",
    )
