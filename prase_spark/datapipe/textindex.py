"""Corpus term statistics + inverted index: the search/analysis surface
of a training-data pipeline (which terms exist, how widely, and where).

Beyond-reference operator family (the reference has no text corpus at
all); shares the whitespace/punct tokenizer with textstats so every
text operator in the suite agrees on what a token is.

Scale shape:
- :func:`term_counts` is explode → groupBy(key, term) — ONE shuffle,
  map-side partial counts.
- :func:`document_frequency` aggregates per-doc DISTINCT terms (the
  array_distinct runs below the explode, so a term repeated 1000× in
  one doc ships once), groupBy(term) — one shuffle.
- :func:`inverted_index` caps posting lists with ``max_df`` BEFORE
  collecting them (a semi-join against the in-band df table): the
  stop-term postings — 'the' appearing in 10^11 documents — are never
  materialized, the same hot-key discipline as the dedup suite's
  ``max_shingle_df``. Postings are emitted as a canonical sorted
  comma-joined string, which is both the gate-hashable form and the
  natural sink row for a sharded index file.
- :func:`tfidf_terms` keeps idf in doubles (log is the right tool and
  ordering-only decisions don't need cross-engine bit equality — ties
  broken lexically); the driver gate covers the exact integer surfaces
  (df, tf, postings) instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from prase_spark.datapipe.textstats import tokens, word_ngrams


def term_counts(
    docs: DataFrame, text_col: str = "text", key_col: str = "doc_id"
) -> DataFrame:
    """(key, term, tf): within-document term frequencies. One shuffle."""
    return (
        docs.select(F.col(key_col).alias("key"), tokens(text_col).alias("__t"))
        .select("key", F.explode("__t").alias("term"))
        .groupBy("key", "term")
        .agg(F.count("*").alias("tf"))
    )


def document_frequency(
    docs: DataFrame, text_col: str = "text", key_col: str = "doc_id"
) -> DataFrame:
    """(term, df): number of documents containing each term. The
    per-document distinct happens in the token array (array_distinct
    below the explode) so the shuffle carries one row per (doc, term)."""
    return (
        docs.select(F.col(key_col).alias("key"), tokens(text_col).alias("__t"))
        .select("key", F.explode(F.array_distinct("__t")).alias("term"))
        .groupBy("term")
        .agg(F.count("*").alias("df"))
    )


def inverted_index(
    docs: DataFrame,
    text_col: str = "text",
    key_col: str = "doc_id",
    min_df: int = 1,
    max_df: int | None = 10_000,
) -> DataFrame:
    """(term, df, postings): sorted comma-joined document keys per term.

    ``max_df`` (default 10^4, same doctrine as dedup.max_shingle_df)
    drops stop-terms BEFORE their postings are collected — without it a
    crawl-scale index materializes billion-element lists for 'the'.
    ``min_df`` prunes hapax noise. Pass ``max_df=None`` only on corpora
    known to be small."""
    pairs = (
        docs.select(F.col(key_col).alias("key"), tokens(text_col).alias("__t"))
        .select("key", F.explode(F.array_distinct("__t")).alias("term"))
    )
    dfreq = pairs.groupBy("term").agg(F.count("*").alias("df"))
    keep = dfreq.filter(F.col("df") >= min_df)
    if max_df is not None:
        keep = keep.filter(F.col("df") <= max_df)
    return (
        pairs.join(keep, "term")
        .groupBy("term", "df")
        .agg(
            F.array_join(F.sort_array(F.collect_list("key")), ",").alias("postings")
        )
    )


def tfidf_terms(
    docs: DataFrame,
    text_col: str = "text",
    key_col: str = "doc_id",
    k: int = 10,
    min_df: int = 1,
) -> DataFrame:
    """(key, term, tf, tfidf): top-``k`` characteristic terms per doc by
    tf * ln(N / df), ties broken lexically so output is deterministic.
    N is computed in-band (one count job); df joins back shuffle-side."""
    n_docs = docs.count()
    tf = term_counts(docs, text_col, key_col)
    dfreq = document_frequency(docs, text_col, key_col).filter(
        F.col("df") >= min_df
    )
    scored = tf.join(dfreq, "term").select(
        "key",
        "term",
        "tf",
        (F.col("tf") * F.log(F.lit(float(n_docs)) / F.col("df"))).alias("tfidf"),
    )
    w = Window.partitionBy("key").orderBy(
        F.col("tfidf").desc(), F.col("term").asc()
    )
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .drop("__rn")
    )


def rare_term_ratio(
    docs: DataFrame,
    text_col: str = "text",
    key_col: str = "doc_id",
    n: int = 2,
    max_df: int = 2,
) -> DataFrame:
    """(key, n_distinct, n_rare, rare_pct_e4): novelty / gibberish score —
    the share of a document's DISTINCT word ``n``-grams seen in at most
    ``max_df`` documents corpus-wide. Machine-generated or mangled text
    is dominated by n-grams nobody else writes; template text by n-grams
    everybody writes — both tails are curation drop rules.

    ``rare_pct_e4`` is exact-integer half-up (ratio x 1e4), 0 for docs
    with no n-gram (shorter than ``n`` tokens), per the repo's
    cross-engine discipline.

    Scale shape: the per-doc DISTINCT runs below the explode (an n-gram
    repeated in one doc ships once); df is one groupBy(gram) with
    map-side partials; the rare keep-set then semi-joins the same pair
    stream — head grams ('of the') survive that shuffle but carry no
    aggregation state, so AQE skew-split can cut them, the same
    discipline as inverted_index's max_df band. The pair stream is
    referenced twice and left LAZY — at production scale persist it (or
    cut it with a stop-gram df band first) rather than recompute the
    tokenizer."""
    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")
    base = docs.select(F.col(key_col).alias("key"), tokens(text_col).alias("__t"))
    grams = word_ngrams(F.col("__t"), n)
    per_doc = base.select(
        "key", F.array_distinct(grams).alias("__gs")
    ).select("key", "__gs", F.size("__gs").cast("long").alias("n_distinct"))
    pairs = per_doc.select("key", F.explode("__gs").alias("gram"))
    rare = (
        pairs.groupBy("gram")
        .agg(F.count("*").alias("df"))
        .filter(F.col("df") <= max_df)
        .select("gram")
    )
    n_rare = (
        pairs.join(rare, "gram", "left_semi")
        .groupBy("key")
        .agg(F.count("*").alias("n_rare"))
    )
    return (
        per_doc.select("key", "n_distinct")
        .join(n_rare, "key", "left")
        .select(
            "key",
            "n_distinct",
            F.coalesce(F.col("n_rare"), F.lit(0)).cast("long").alias("n_rare"),
        )
        .withColumn(
            "rare_pct_e4",
            F.when(
                F.col("n_distinct") > 0,
                F.expr("(2 * n_rare * 10000 + n_distinct) div (2 * n_distinct)"),
            )
            .otherwise(F.lit(0))
            .cast("long"),
        )
    )
