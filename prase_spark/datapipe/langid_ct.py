"""Trained n-gram language identification: Cavnar-Trenkle rank-profile
classification ("N-Gram-Based Text Categorization", SDAIR 1994) — the
classic behind textcat/langid, here with every stage exact-integer so
the trained model AND the classifications value-hash across engines.

Where this sits: textstats.language_id is the zero-training heuristic
(stopword/script ratios); this module is the TRAINED path — profiles
learned in-engine from labeled text (a seed corpus, or the crawl's own
high-confidence pages), then applied corpus-wide. The CT measure is
rank-based, which is why it fits the repo's doctrine: no likelihoods,
no floats — a language profile is its top-N character n-grams ranked by
(count desc, gram asc), a document profile likewise, and the distance
is the out-of-place sum ``sum(|rank_doc - rank_lang|)`` with a fixed
``top`` penalty for grams absent from the language profile. Ranks,
sums, argmin: all integers, all total-ordered.

Character n-grams are taken over the lowercased text with non-alnum
runs folded to single spaces (the shared tokens() normalization,
rejoined with spaces) — so word boundaries contribute grams, as CT
prescribes, and the DuckDB twin regenerates identical grams by
substring arithmetic.

Scale shape: training is one (lang, gram) count + a per-lang top-N
window (N languages — tiny groups); model size = n_langs * top rows,
broadcast everywhere. Classification is per-doc gram ranking (per-doc
window, doc-length bounded) + one broadcast join against the model +
one argmin hash agg. Nothing corpus-sized shuffles more than the
per-doc gram table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from prase_spark.datapipe.textstats import tokens


def _char_grams(text_col: str, n: int):
    """All (non-distinct) character n-grams of the normalized text:
    lowercase, non-alnum runs -> single space, single-space-joined."""
    norm = F.concat_ws(" ", tokens(text_col))
    idx = F.sequence(F.lit(1), F.greatest(F.length(norm) - (n - 1), F.lit(0)))
    return F.transform(idx, lambda i: F.substr(norm, i, F.lit(n)))


def train_language_profiles(
    labeled: DataFrame,
    text_col: str = "text",
    lang_col: str = "lang",
    n: int = 3,
    top: int = 100,
) -> DataFrame:
    """(lang, gram, rank): each language's ``top`` character n-grams
    ranked by (count desc, gram asc) over the labeled corpus."""
    grams = labeled.select(
        F.col(lang_col).alias("lang"), F.explode(_char_grams(text_col, n)).alias("gram")
    )
    counts = grams.groupBy("lang", "gram").agg(F.count(F.lit(1)).alias("c"))
    w = Window.partitionBy("lang").orderBy(F.col("c").desc(), F.col("gram").asc())
    return (
        counts.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= top)
        .select("lang", "gram", F.col("rank").cast("long").alias("rank"))
    )


def classify_language(
    docs: DataFrame,
    profiles: DataFrame,
    text_col: str = "text",
    key_col: str = "doc_id",
    n: int = 3,
    top: int = 100,
) -> DataFrame:
    """(<key_col>, lang, dist): each document's best language by the
    out-of-place measure — sum over the doc's ranked grams of
    |rank_doc - rank_lang|, grams missing from a language's profile
    costing ``top``. Ties -> lang asc. Documents with no grams (empty
    after normalization) are absent from the output."""
    grams = docs.select(
        F.col(key_col).alias("key"), F.explode(_char_grams(text_col, n)).alias("gram")
    )
    counts = grams.groupBy("key", "gram").agg(F.count(F.lit(1)).alias("c"))
    w = Window.partitionBy("key").orderBy(F.col("c").desc(), F.col("gram").asc())
    dprof = (
        counts.withColumn("r_doc", F.row_number().over(w))
        .filter(F.col("r_doc") <= top)
        .select("key", "gram", F.col("r_doc").cast("long").alias("r_doc"))
    )
    langs = profiles.select("lang").distinct()
    # every (doc-gram, lang) pair scores: matched grams |r_doc - r_lang|,
    # unmatched grams the max penalty `top`
    scored = (
        dprof.crossJoin(F.broadcast(langs))
        .join(F.broadcast(profiles), ["lang", "gram"], "left")
        .select(
            "key",
            "lang",
            F.coalesce(
                F.abs(F.col("r_doc") - F.col("rank")), F.lit(top).cast("long")
            ).alias("pen"),
        )
    )
    dists = scored.groupBy("key", "lang").agg(F.sum("pen").alias("dist"))
    return dists.groupBy("key").agg(
        F.expr("min_by(lang, struct(dist, lang))").alias("lang"),
        F.min(F.struct("dist", "lang")).getField("dist").alias("dist"),
    ).withColumnRenamed("key", key_col)
