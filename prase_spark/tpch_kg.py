"""Derive a deterministic two-KG alignment dataset from the driver's TPC-H
parquet tables (TESTDATA.md) — used by __spark_entry__ so every KG operator
has a DuckDB-checkable oracle over the same inputs.

KG1 ("a.org") carries customers/suppliers/nations/regions/orders with
URI-wrapped names; KG2 ("b.org") is the same graph renamed (Wikidata-ish Q
ids), with deterministic order dropout (o_orderkey % 7 == 0 removed) and
literal perturbation (c_custkey % 13 == 0 -> upper-cased name), mirroring
the FIXTURES.md §2 recipe. The matching SQL lives in TPCH_KG_SQL below and
MUST stay semantically identical to the DataFrame derivation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: spark.read.parquet(f"{sf_dir}/{t}.parquet") for t in TABLES}


def _kg1(t: dict[str, DataFrame]) -> DataFrame:
    c, n, r, s, o = t["customer"], t["nation"], t["region"], t["supplier"], t["orders"]
    ent = lambda pfx, col: F.concat(F.lit(f"<http://a.org/resource/{pfx}"), col.cast("string"), F.lit(">"))  # noqa: E731
    pred = lambda name: F.lit(f"http://a.org/ontology/{name}")  # noqa: E731
    rel = [
        c.join(n, c["c_nationkey"] == n["n_nationkey"]).select(
            ent("Customer_", F.col("c_custkey")).alias("subj"),
            pred("inNation").alias("pred"),
            ent("Nation_", F.col("n_name")).alias("obj"),
            F.lit(False).alias("is_attr"),
        ),
        s.join(n, s["s_nationkey"] == n["n_nationkey"]).select(
            ent("Supplier_", F.col("s_suppkey")).alias("subj"),
            pred("inNation").alias("pred"),
            ent("Nation_", F.col("n_name")).alias("obj"),
            F.lit(False).alias("is_attr"),
        ),
        n.join(r, n["n_regionkey"] == r["r_regionkey"]).select(
            ent("Nation_", F.col("n_name")).alias("subj"),
            pred("inRegion").alias("pred"),
            ent("Region_", F.col("r_name")).alias("obj"),
            F.lit(False).alias("is_attr"),
        ),
        o.select(
            ent("Order_", F.col("o_orderkey")).alias("subj"),
            pred("placedBy").alias("pred"),
            ent("Customer_", F.col("o_custkey")).alias("obj"),
            F.lit(False).alias("is_attr"),
        ),
    ]
    attr = [
        c.select(
            ent("Customer_", F.col("c_custkey")).alias("subj"),
            pred("name").alias("pred"),
            F.concat(F.lit('"'), F.col("c_name"), F.lit('"')).alias("obj"),
            F.lit(True).alias("is_attr"),
        ),
        c.select(
            ent("Customer_", F.col("c_custkey")).alias("subj"),
            pred("mktsegment").alias("pred"),
            F.col("c_mktsegment").alias("obj"),
            F.lit(True).alias("is_attr"),
        ),
        o.select(
            ent("Order_", F.col("o_orderkey")).alias("subj"),
            pred("orderDate").alias("pred"),
            F.concat(
                F.lit('"'),
                F.date_format("o_orderdate", "yyyy-MM-dd"),
                F.lit('"^^<http://www.w3.org/2001/XMLSchema#date>'),
            ).alias("obj"),
            F.lit(True).alias("is_attr"),
        ),
    ]
    out = rel[0]
    for d in rel[1:] + attr:
        out = out.unionByName(d)
    return out


def _kg2(t: dict[str, DataFrame]) -> DataFrame:
    c, n, r, s = t["customer"], t["nation"], t["region"], t["supplier"]
    o = t["orders"].filter(F.col("o_orderkey") % 7 != 0)  # deterministic dropout
    ent = lambda pfx, col: F.concat(F.lit(f"http://b.org/entity/{pfx}"), col.cast("string"))  # noqa: E731
    pred = lambda name: F.lit(f"http://b.org/prop/direct/{name}")  # noqa: E731
    pert_name = F.when(F.col("c_custkey") % 13 == 0, F.upper("c_name")).otherwise(F.col("c_name"))
    rel = [
        c.join(n, c["c_nationkey"] == n["n_nationkey"]).select(
            ent("QC", F.col("c_custkey")).alias("subj"),
            pred("P27").alias("pred"),
            ent("QN_", F.col("n_name")).alias("obj"),
            F.lit(False).alias("is_attr"),
        ),
        s.join(n, s["s_nationkey"] == n["n_nationkey"]).select(
            ent("QS", F.col("s_suppkey")).alias("subj"),
            pred("P27").alias("pred"),
            ent("QN_", F.col("n_name")).alias("obj"),
            F.lit(False).alias("is_attr"),
        ),
        n.join(r, n["n_regionkey"] == r["r_regionkey"]).select(
            ent("QN_", F.col("n_name")).alias("subj"),
            pred("P361").alias("pred"),
            ent("QR_", F.col("r_name")).alias("obj"),
            F.lit(False).alias("is_attr"),
        ),
        o.select(
            ent("QO", F.col("o_orderkey")).alias("subj"),
            pred("P123").alias("pred"),
            ent("QC", F.col("o_custkey")).alias("obj"),
            F.lit(False).alias("is_attr"),
        ),
    ]
    attr = [
        c.select(
            ent("QC", F.col("c_custkey")).alias("subj"),
            pred("label").alias("pred"),
            F.concat(F.lit('"'), pert_name, F.lit('"')).alias("obj"),
            F.lit(True).alias("is_attr"),
        ),
        c.select(
            ent("QC", F.col("c_custkey")).alias("subj"),
            pred("segment").alias("pred"),
            F.col("c_mktsegment").alias("obj"),
            F.lit(True).alias("is_attr"),
        ),
        o.select(
            ent("QO", F.col("o_orderkey")).alias("subj"),
            pred("date").alias("pred"),
            F.concat(
                F.lit('"'),
                F.date_format("o_orderdate", "yyyy-MM-dd"),
                F.lit('"^^<http://www.w3.org/2001/XMLSchema#date>'),
            ).alias("obj"),
            F.lit(True).alias("is_attr"),
        ),
    ]
    out = rel[0]
    for d in rel[1:] + attr:
        out = out.unionByName(d)
    return out


def tpch_raw_triples(spark: SparkSession, sf_dir: str, kg: int = 1) -> DataFrame:
    t = load_tables(spark, sf_dir)
    return _kg1(t) if kg == 1 else _kg2(t)


def tpch_gold_names(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gold alignment (name_l, name_r): identity over shared keys."""
    t = load_tables(spark, sf_dir)
    c = t["customer"].select(
        F.concat(F.lit("<http://a.org/resource/Customer_"), F.col("c_custkey").cast("string"), F.lit(">")).alias("name_l"),
        F.concat(F.lit("http://b.org/entity/QC"), F.col("c_custkey").cast("string")).alias("name_r"),
    )
    s = t["supplier"].select(
        F.concat(F.lit("<http://a.org/resource/Supplier_"), F.col("s_suppkey").cast("string"), F.lit(">")).alias("name_l"),
        F.concat(F.lit("http://b.org/entity/QS"), F.col("s_suppkey").cast("string")).alias("name_r"),
    )
    n = t["nation"].select(
        F.concat(F.lit("<http://a.org/resource/Nation_"), F.col("n_name"), F.lit(">")).alias("name_l"),
        F.concat(F.lit("http://b.org/entity/QN_"), F.col("n_name")).alias("name_r"),
    )
    return c.unionByName(s).unionByName(n)


# --- the same derivations as DuckDB SQL (oracle side) ------------------------

KG1_SQL = """
    SELECT '<http://a.org/resource/Customer_' || c_custkey || '>' AS subj,
           'http://a.org/ontology/inNation' AS pred,
           '<http://a.org/resource/Nation_' || n_name || '>' AS obj,
           FALSE AS is_attr
    FROM customer JOIN nation ON c_nationkey = n_nationkey
    UNION ALL
    SELECT '<http://a.org/resource/Supplier_' || s_suppkey || '>',
           'http://a.org/ontology/inNation',
           '<http://a.org/resource/Nation_' || n_name || '>', FALSE
    FROM supplier JOIN nation ON s_nationkey = n_nationkey
    UNION ALL
    SELECT '<http://a.org/resource/Nation_' || n_name || '>',
           'http://a.org/ontology/inRegion',
           '<http://a.org/resource/Region_' || r_name || '>', FALSE
    FROM nation JOIN region ON n_regionkey = r_regionkey
    UNION ALL
    SELECT '<http://a.org/resource/Order_' || o_orderkey || '>',
           'http://a.org/ontology/placedBy',
           '<http://a.org/resource/Customer_' || o_custkey || '>', FALSE
    FROM orders
    UNION ALL
    SELECT '<http://a.org/resource/Customer_' || c_custkey || '>',
           'http://a.org/ontology/name', '"' || c_name || '"', TRUE
    FROM customer
    UNION ALL
    SELECT '<http://a.org/resource/Customer_' || c_custkey || '>',
           'http://a.org/ontology/mktsegment', c_mktsegment, TRUE
    FROM customer
    UNION ALL
    SELECT '<http://a.org/resource/Order_' || o_orderkey || '>',
           'http://a.org/ontology/orderDate',
           '"' || strftime(o_orderdate, '%Y-%m-%d') || '"^^<http://www.w3.org/2001/XMLSchema#date>', TRUE
    FROM orders
"""

KG2_SQL = """
    SELECT 'http://b.org/entity/QC' || c_custkey AS subj,
           'http://b.org/prop/direct/P27' AS pred,
           'http://b.org/entity/QN_' || n_name AS obj,
           FALSE AS is_attr
    FROM customer JOIN nation ON c_nationkey = n_nationkey
    UNION ALL
    SELECT 'http://b.org/entity/QS' || s_suppkey,
           'http://b.org/prop/direct/P27',
           'http://b.org/entity/QN_' || n_name, FALSE
    FROM supplier JOIN nation ON s_nationkey = n_nationkey
    UNION ALL
    SELECT 'http://b.org/entity/QN_' || n_name,
           'http://b.org/prop/direct/P361',
           'http://b.org/entity/QR_' || r_name, FALSE
    FROM nation JOIN region ON n_regionkey = r_regionkey
    UNION ALL
    SELECT 'http://b.org/entity/QO' || o_orderkey,
           'http://b.org/prop/direct/P123',
           'http://b.org/entity/QC' || o_custkey, FALSE
    FROM orders WHERE o_orderkey % 7 <> 0
    UNION ALL
    SELECT 'http://b.org/entity/QC' || c_custkey,
           'http://b.org/prop/direct/label',
           '"' || CASE WHEN c_custkey % 13 = 0 THEN upper(c_name) ELSE c_name END || '"', TRUE
    FROM customer
    UNION ALL
    SELECT 'http://b.org/entity/QC' || c_custkey,
           'http://b.org/prop/direct/segment', c_mktsegment, TRUE
    FROM customer
    UNION ALL
    SELECT 'http://b.org/entity/QO' || o_orderkey,
           'http://b.org/prop/direct/date',
           '"' || strftime(o_orderdate, '%Y-%m-%d') || '"^^<http://www.w3.org/2001/XMLSchema#date>', TRUE
    FROM orders WHERE o_orderkey % 7 <> 0
"""

# INV-doubling at the name level (objects/KG.py:145-157) as SQL over a
# raw-triples CTE named {src}.
INV_SQL = """
    SELECT trim(subj) AS subj, trim(pred) AS pred, trim(obj) AS obj,
           is_attr, FALSE AS is_inv,
           FALSE AS subj_is_lit, is_attr AS obj_is_lit
    FROM {src}
    UNION ALL
    SELECT trim(obj), trim(pred) || '-(INV)', trim(subj),
           is_attr, TRUE, is_attr, FALSE
    FROM {src}
"""

# Normalizers (objects/KG.py:59-87) as DuckDB expressions over column {c}.
NORM_URI_SQL = (
    "CASE WHEN contains(trim(regexp_extract(trim({c}), '^\"?<?([^\">]*)>?\"?', 1)), '/') "
    "THEN trim(list_extract(string_split(trim(regexp_extract(trim({c}), '^\"?<?([^\">]*)>?\"?', 1)), '/'), -1)) "
    "ELSE trim(regexp_extract(trim({c}), '^\"?<?([^\">]*)>?\"?', 1)) END"
)
NORM_LIT_SQL = (
    "trim(regexp_replace(regexp_replace(regexp_replace(regexp_replace("
    "trim(list_extract(string_split(trim({c}), '^'), 1)), "
    "'^<', ''), '>$', ''), '^\"', ''), '\"$', ''))"
)
