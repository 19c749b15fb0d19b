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


def test_bucket_metrics_partitioning_invariant(spark):
    """The load-bearing property: content-keyed bucket metrics (incl. the
    XOR checksum) are identical no matter how the input is partitioned —
    the laptop and the 1000-executor cluster produce the same lineage."""
    from prase_spark.io import bucket_metrics

    df = spark.range(500).selectExpr(
        "concat('s', id % 97) AS subj",
        "concat('p', id % 7) AS pred",
        "concat('o', id) AS obj",
    )
    a = {tuple(r) for r in bucket_metrics(df.repartition(1), 8).collect()}
    b = {tuple(r) for r in bucket_metrics(df.repartition(17, "obj"), 8).collect()}
    assert a == b
    assert len(a) == 8


def test_bucket_metrics_detects_single_row_change(spark):
    from prase_spark.io import bucket_metrics

    df = spark.range(100).selectExpr(
        "concat('s', id) AS subj", "'p' AS pred", "concat('o', id) AS obj"
    )
    base = {r["bucket"]: r["checksum"] for r in bucket_metrics(df, 4).collect()}
    tweaked = df.selectExpr(
        "subj", "pred", "CASE WHEN subj = 's17' THEN 'CHANGED' ELSE obj END AS obj"
    )
    after = {r["bucket"]: r["checksum"] for r in bucket_metrics(tweaked, 4).collect()}
    assert base != after  # exactly the touched bucket flips
    assert sum(base[k] != after.get(k) for k in base) == 1


def test_bucket_column_rejects_nonpositive(spark):
    from prase_spark.io import bucket_column

    with pytest.raises(ValueError):
        bucket_column("subj", 0)


def test_materialize_bucketed_writes_partition_dirs(spark, tmp_path):
    from pyspark.sql import functions as F

    from prase_spark.fixtures import two_kg_fixture
    from prase_spark.kgbuild import build_kg
    from prase_spark.pipeline import materialize, partition_metrics

    fx = two_kg_fixture(spark, n_ent=20, seed=42)
    kg = build_kg(fx["raw_l"])
    canonical = spark.createDataFrame([], "side STRING, ent_id LONG, canonical_id LONG")
    out = materialize(
        fx["raw_l"], kg, canonical, side="L",
        out_path=str(tmp_path / "mb"), n_buckets=4,
    )
    # directory-partitioned by the deterministic bucket
    assert any(p.name.startswith("bucket=") for p in (tmp_path / "mb").iterdir())
    # partition_metrics keys on the bucket and still covers every row
    metrics = partition_metrics(out)
    assert metrics.agg(F.sum("rows")).first()[0] == out.count()
    assert metrics.count() <= 4
