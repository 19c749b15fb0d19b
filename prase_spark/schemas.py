"""Explicit StructType schemas for every engine table (SURVEY.md §1).

The reference keeps an implicit schema in Python objects (objects/Entity.py,
objects/Relation.py, objects/KG.py); here everything is a columnar DataFrame.
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    BooleanType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

# Common-Crawl-style page corpus (BASELINE.json input_hint)
PAGES = StructType(
    [
        StructField("url", StringType(), False),
        StructField("warc_ts", TimestampType(), True),
        StructField("html", BinaryType(), True),
        StructField("text", StringType(), True),
        StructField("lang", StringType(), True),
    ]
)

# Raw string triples (reference TSV rows, test.py:10-55) + attr routing flag
RAW_TRIPLES = StructType(
    [
        StructField("subj", StringType(), False),
        StructField("pred", StringType(), False),
        StructField("obj", StringType(), False),
        StructField("is_attr", BooleanType(), False),
    ]
)

# Dict-encoded node table (objects/Entity.py:1-41; ids objects/KG.py:202-235)
NODES = StructType(
    [
        StructField("ent_id", LongType(), False),
        StructField("name", StringType(), False),
        StructField("value", StringType(), True),
        StructField("is_literal", BooleanType(), False),
    ]
)

# Predicate table (objects/Relation.py:2-49)
PREDICATES = StructType(
    [
        StructField("pred_id", LongType(), False),
        StructField("name", StringType(), False),
        StructField("value", StringType(), True),
        StructField("is_attribute", BooleanType(), False),
        StructField("is_inv", BooleanType(), False),
    ]
)

# Id-level triples incl. INV doubling (objects/KG.py:145-157)
TRIPLES = StructType(
    [
        StructField("subj", LongType(), False),
        StructField("pred", LongType(), False),
        StructField("obj", LongType(), False),
        StructField("subj_is_lit", BooleanType(), False),
        StructField("obj_is_lit", BooleanType(), False),
    ]
)

# Per-predicate functionality (objects/Relation.py:45-49)
FUNCTIONALITY = StructType(
    [
        StructField("pred_id", LongType(), False),
        StructField("functionality", DoubleType(), False),
        StructField("functionality_inv", DoubleType(), False),
    ]
)

# Entity-match state, one side (objects/KGs.py:30-33)
MATCHES = StructType(
    [
        StructField("ent_id", LongType(), False),
        StructField("counterpart_id", LongType(), False),
        StructField("prob", DoubleType(), False),
    ]
)

# Relation-alignment state, one side (objects/KGs.py:28)
REL_ALIGN = StructType(
    [
        StructField("pred_id", LongType(), False),
        StructField("counterpart_pred_id", LongType(), False),
        StructField("prob", DoubleType(), False),
    ]
)

# Entity embeddings (objects/KG.py:240-254)
EMBEDDINGS = StructType(
    [
        StructField("ent_id", LongType(), False),
        StructField("embedding", ArrayType(FloatType()), False),
    ]
)

# Gold alignment links (data/*/ent_links)
GOLD_LINKS = StructType(
    [
        StructField("ent_l", LongType(), False),
        StructField("ent_r", LongType(), False),
    ]
)

# Final materialized graph row (FIXTURES.md §3)
KG_TRIPLES_OUT = StructType(
    [
        StructField("subj", StringType(), False),
        StructField("pred", StringType(), False),
        StructField("obj", StringType(), False),
        StructField("canonical_subj", LongType(), True),
        StructField("canonical_obj", LongType(), True),
        StructField("partition_id", IntegerType(), True),
        StructField("lineage", StringType(), True),
    ]
)
