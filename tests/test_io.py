"""Table-sink abstraction: Iceberg-or-parquet format gate (SURVEY §2.1).
The sandbox has no Iceberg runtime, so the tests pin the fallback contract."""

import pytest

from prase_spark.io import iceberg_available, read_table, write_table


def test_parquet_fallback_roundtrip(spark, tmp_path):
    assert not iceberg_available(spark)  # sandbox: no Iceberg catalog wired
    df = spark.range(10).selectExpr("id", "id * 2 AS v")
    fmt = write_table(df, str(tmp_path / "t"))
    assert fmt == "parquet"
    back = read_table(spark, str(tmp_path / "t"))
    assert {tuple(r) for r in back.collect()} == {tuple(r) for r in df.collect()}


def test_forcing_iceberg_without_runtime_raises(spark, tmp_path):
    df = spark.range(3)
    with pytest.raises(RuntimeError, match="Iceberg catalog"):
        write_table(df, str(tmp_path / "t"), fmt="iceberg")


def test_materialize_routes_through_format_gate(spark, tmp_path):
    from pyspark.sql import functions as F

    from prase_spark.fixtures import two_kg_fixture
    from prase_spark.kgbuild import build_kg
    from prase_spark.pipeline import materialize, partition_metrics

    fx = two_kg_fixture(spark, n_ent=20, seed=42)
    kg = build_kg(fx["raw_l"])
    canonical = spark.createDataFrame([], "side STRING, ent_id LONG, canonical_id LONG")
    out = materialize(fx["raw_l"], kg, canonical, side="L", out_path=str(tmp_path / "m"))
    assert out.count() > 0
    metrics = partition_metrics(out)
    assert metrics.agg(F.sum("rows")).first()[0] == out.count()
