"""Normalizer golden tests (reference objects/KG.py:59-87 semantics).

The pure-Python expected values below re-derive the reference's two
pre-funcs independently so the native column expressions can be checked
string-for-string.
"""

import re

from pyspark.sql import functions as F

from prase_spark.normalize import inv_pred_name, normalize_literal, normalize_uri


def expected_uri(name: str) -> str:
    m = re.match(r'"?<?([^">]*)>?"?.*', name)
    value = m.group(1).strip()
    if "/" in value:
        value = value.split("/")[-1].strip()
    return value


def expected_literal(name: str) -> str:
    value = name.split("^")[0].strip()
    start, end = 0, len(value) - 1
    if start < len(value) and value[start] == "<":
        start += 1
    if end > 0 and value[end] == ">":
        end -= 1
    if start < len(value) and value[start] == '"':
        start += 1
    if end > 0 and value[end] == '"':
        end -= 1
    if start > end:
        return name
    return value[start : end + 1].strip()


URI_SAMPLES = [
    "<http://dbpedia.org/resource/Jamie_Lawrence>",
    "http://www.wikidata.org/entity/Q212459",
    '"plainquoted"',
    "<http://dbpedia.org/ontology/birthPlace>",
    "no_slashes_here",
    "  <http://a.org/x/y>  ",
    "<http://a.org/resource/E12>",
]

LITERAL_SAMPLES = [
    '"1963-12-18"^^<http://www.w3.org/2001/XMLSchema#date>',
    '"Jamie Lawrence"',
    "plain literal",
    '"42.5"^^<http://www.w3.org/2001/XMLSchema#double>',
    "<oddly wrapped>",
    '"quoted"',
]


def test_normalize_uri_matches_reference_semantics(spark):
    df = spark.createDataFrame([(s,) for s in URI_SAMPLES], "name STRING")
    got = [r["v"] for r in df.select(normalize_uri(F.col("name")).alias("v")).collect()]
    assert got == [expected_uri(s.strip()) for s in URI_SAMPLES]


def test_normalize_literal_matches_reference_semantics(spark):
    df = spark.createDataFrame([(s,) for s in LITERAL_SAMPLES], "name STRING")
    got = [r["v"] for r in df.select(normalize_literal(F.col("name")).alias("v")).collect()]
    assert got == [expected_literal(s.strip()) for s in LITERAL_SAMPLES]


def test_inv_pred_name(spark):
    df = spark.createDataFrame([("  pred ",)], "p STRING")
    assert df.select(inv_pred_name(F.col("p")).alias("v")).first()["v"] == "pred-(INV)"
