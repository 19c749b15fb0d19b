"""Corpus-wide paragraph deduplication — the RefinedWeb/Dolma curation
pass that removes text spans repeated ACROSS documents (licence blurbs,
syndicated ledes, templated listings). Complements ``boilerplate`` (which
is per-host, frequency-ratio) with a corpus-global absolute-count rule:
a paragraph appearing in >= ``min_dup_docs`` distinct documents is a
duplicate span.

Scale shape (the 100-TB contract): documents explode into positioned
paragraphs ONCE; every shuffle after that carries (hash, key) — never
raw text. The duplicate set is one hash-aggregation (distinct-doc count
+ min-key owner per paragraph hash); membership joins back on the 8-byte
hash; text is rebuilt by an ordered in-doc collect. Nothing is quadratic
and no stage depends on partitioning, so the output is deterministic at
any cluster size.

No reference analog (the reference consumes pre-built triples;
`/root/reference/objects/KGs.py` starts from TSV facts) — this is a
first-class training-data-prep operator, SQL-oracled via
``__spark_entry__``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def dedup_paragraphs(
    docs: DataFrame,
    min_dup_docs: int = 2,
    keep_first: bool = False,
    key_col: str = "doc_id",
    text_col: str = "text",
    para_sep: str = "\n\n",
) -> DataFrame:
    """(key, text, removed_paras) with corpus-duplicated paragraphs removed.

    A paragraph (split on ``para_sep``, compared after trim) that occurs
    in at least ``min_dup_docs`` distinct documents is removed from every
    document — or, with ``keep_first=True``, kept only in the document
    with the smallest key (a deterministic canonical owner). Blank
    paragraphs are never duplicate evidence and are kept as-is, so
    intra-document spacing survives. Paragraph order inside each document
    is preserved; documents whose every paragraph is removed come back
    with empty text rather than vanishing.

    Determinism: membership depends only on corpus-global paragraph
    frequencies and the min-key owner — never on partitioning. The
    frequency aggregation runs over 64-bit xxhash64 paragraph hashes; a
    collision could only merge two paragraphs' doc counts, biasing toward
    removing one extra near-duplicate span — it can never corrupt text,
    because rebuilt output only ever concatenates a document's own
    paragraphs.
    """
    paras = docs.select(
        F.col(key_col).alias("__key"),
        F.posexplode(F.split(F.col(text_col), F.lit(para_sep), -1)).alias(
            "__pos", "__para"
        ),
    ).withColumn("__ph", F.xxhash64(F.trim(F.col("__para"))))

    dup = (
        paras.filter(F.trim("__para") != "")
        .groupBy("__ph")
        .agg(
            F.countDistinct("__key").alias("__ndocs"),
            F.min("__key").alias("__owner"),
        )
        .filter(F.col("__ndocs") >= min_dup_docs)
        .select("__ph", "__owner")
    )

    flagged = paras.join(dup, "__ph", "left")
    is_dup = F.col("__owner").isNotNull() & (F.trim("__para") != "")
    if keep_first:
        drop = is_dup & (F.col("__key") != F.col("__owner"))
    else:
        drop = is_dup
    kept = flagged.withColumn("__drop", drop)

    rebuilt = kept.groupBy("__key").agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.when(
                            ~F.col("__drop"), F.struct("__pos", "__para")
                        )
                    )
                ),
                lambda s: s["__para"],
            ),
            para_sep,
        ).alias(text_col),
        F.sum(F.col("__drop").cast("long")).alias("removed_paras"),
    )
    return (
        docs.select(F.col(key_col).alias("__key"))
        .join(rebuilt, "__key", "left")
        .select(
            F.col("__key").alias(key_col),
            F.coalesce(text_col, F.lit("")).alias(text_col),
            F.coalesce("removed_paras", F.lit(0)).alias("removed_paras"),
        )
    )
