"""File sources matching the reference's ingest formats (SURVEY.md §2.1).

- S1: 2-file TSV triple scan (rel + attr), blank/malformed-line tolerant
  (test.py:10-34, P4 filters)
- S2: single-file self-classifying scan — the ``"http" in obj`` router
  (test.py:35-52); the reference's stateful prev-line pairing hack is an
  artifact of malformed input and is replaced by a proper schema'd read
- S5/S6: seed-link / gold-link TSVs (objects/KGs.py:481-512, 281-295)
- S4: embedding mapping TSV + vector parquet (objects/KGs.py:522-539)

At cluster scale the same readers point at Iceberg tables; schemas are
identical.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_TRIPLE_SCHEMA = "subj STRING, pred STRING, obj STRING"


def _read_tsv(spark: SparkSession, path: str, schema: str, mode: str = "DROPMALFORMED") -> DataFrame:
    return (
        spark.read.option("sep", "\t")
        .option("mode", mode)
        # raw-line semantics: quotes are literal content (RDF-ish values
        # like '"1963"^^<xsd:date>' must survive intact, test.py:17-21)
        .option("quote", "")
        .schema(schema)
        .csv(path)
    )


def read_triples_tsv(
    spark: SparkSession, rel_path: str, attr_path: str | None = None
) -> DataFrame:
    """S1/S2 -> RAW_TRIPLES. With ``attr_path`` the two files are routed
    explicitly; without it, triples self-classify by ``obj contains http``
    (test.py:49-52)."""
    rel = _read_tsv(spark, rel_path, _TRIPLE_SCHEMA)
    good = (
        F.col("subj").isNotNull()
        & F.col("pred").isNotNull()
        & F.col("obj").isNotNull()
        & (F.length(F.trim("subj")) > 0)
        & (F.length(F.trim("pred")) > 0)
        & (F.length(F.trim("obj")) > 0)
    )
    rel = rel.filter(good)
    if attr_path is not None:
        attr = _read_tsv(spark, attr_path, _TRIPLE_SCHEMA).filter(good)
        return rel.withColumn("is_attr", F.lit(False)).unionByName(
            attr.withColumn("is_attr", F.lit(True))
        )
    return rel.withColumn("is_attr", ~F.col("obj").contains("http"))


def read_seed_links_tsv(spark: SparkSession, path: str) -> DataFrame:
    """S5: (name_l, name_r[, prob]) — missing prob defaults to 1.0
    (objects/KGs.py:494-498)."""
    # PERMISSIVE: a 2-column line is a links row without prob, not malformed
    df = _read_tsv(spark, path, "name_l STRING, name_r STRING, prob DOUBLE", mode="PERMISSIVE")
    return df.filter(
        F.col("name_l").isNotNull() & F.col("name_r").isNotNull()
    ).withColumn("prob", F.coalesce("prob", F.lit(1.0)))


def read_gold_links_tsv(spark: SparkSession, path: str) -> DataFrame:
    """S6: gold (name_l, name_r) pairs; extra columns ignored (the
    reference reads params[0], params[1] only, objects/KGs.py:285-286)."""
    return _read_tsv(spark, path, "name_l STRING, name_r STRING", mode="PERMISSIVE").filter(
        F.col("name_l").isNotNull() & F.col("name_r").isNotNull()
    )


def read_embedding_table(
    spark: SparkSession, mapping_path: str, vectors_path: str
) -> DataFrame:
    """S4: mapping TSV (name, idx) + vector parquet (idx, embedding)
    -> (name, embedding); join on idx replaces the reference's
    row-index-into-np.ndarray attach."""
    mapping = _read_tsv(spark, mapping_path, "name STRING, idx LONG")
    vectors = spark.read.parquet(vectors_path)
    return mapping.join(vectors, "idx").select("name", "embedding")


def read_pages_jsonl(spark: SparkSession, path: str) -> DataFrame:
    """Page corpus from JSONL records — the common interchange for crawl
    dumps alongside Iceberg (no reference analog; input_hint schema):

        {"url": str, "warc_ts": ISO-8601 str, "html": base64 str,
         "text": str, "lang": str}

    Malformed JSON lines and records missing url/text are dropped (the P4
    filter posture); html is decoded base64 -> binary. Output matches the
    PAGES schema."""
    raw = (
        spark.read.schema(
            "url STRING, warc_ts STRING, html STRING, text STRING, lang STRING"
        )
        .option("mode", "DROPMALFORMED")
        .json(path)
    )
    return raw.filter(
        F.col("url").isNotNull() & F.col("text").isNotNull()
    ).select(
        "url",
        F.to_timestamp("warc_ts").alias("warc_ts"),
        F.unbase64("html").alias("html"),
        "text",
        "lang",
    )


def sample_links(links: DataFrame, num: int | None, seed: int = 42) -> DataFrame:
    """T4 (objects/KGs.py:506): bounded random sample of seed links —
    deterministic via seeded rand ordering instead of random.choices."""
    if num is None:
        return links
    return links.orderBy(F.rand(seed)).limit(num)
