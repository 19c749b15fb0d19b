"""Table-sink abstraction: Iceberg when the session is wired to an Iceberg
catalog, parquet otherwise.

SURVEY.md §2.1 lands S3/S8/S9 on Iceberg tables at cluster scale. This
sandbox ships no Iceberg runtime (no iceberg-spark-runtime jar, no
catalog), so parquet is the stand-in — with the SAME directory layout and
atomic-publish semantics (checkpoint.py) — and the swap is a session
config, not a code change: configure
``spark.sql.catalog.<name> = org.apache.iceberg.spark.SparkCatalog`` and
pass table identifiers instead of paths.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def iceberg_available(spark: SparkSession) -> bool:
    """True when some ``spark.sql.catalog.*`` points at an Iceberg catalog
    implementation (the standard way an Iceberg runtime is wired in)."""
    for k, v in spark.sparkContext.getConf().getAll():
        if k.startswith("spark.sql.catalog.") and "iceberg" in str(v).lower():
            return True
    return False


def write_table(
    df: DataFrame,
    location: str,
    mode: str = "overwrite",
    fmt: str | None = None,
) -> str:
    """Write ``df`` to ``location`` and return the format used.

    ``fmt=None`` auto-detects: Iceberg when the session has an Iceberg
    catalog (``location`` is then a table identifier, written via the
    DataFrameWriterV2 so overwrites are atomic snapshots), parquet
    otherwise (``location`` is a path). Forcing ``fmt='iceberg'`` without a
    runtime raises immediately with the wiring instructions instead of a
    deep Spark classpath error."""
    spark = df.sparkSession
    if fmt is None:
        fmt = "iceberg" if iceberg_available(spark) else "parquet"
    if fmt == "iceberg":
        if not iceberg_available(spark):
            raise RuntimeError(
                "fmt='iceberg' but no Iceberg catalog is configured on this "
                "session; add iceberg-spark-runtime to the classpath and set "
                "spark.sql.catalog.<name> (see prase_spark/io.py docstring)"
            )
        writer = df.writeTo(location).using("iceberg")
        if mode == "overwrite":
            writer.createOrReplace()
        else:
            writer.append()
    else:
        df.write.mode(mode).parquet(location)
    return fmt


def read_table(spark: SparkSession, location: str, fmt: str | None = None) -> DataFrame:
    """Read back a table written by :func:`write_table`."""
    if fmt is None:
        fmt = "iceberg" if iceberg_available(spark) else "parquet"
    if fmt == "iceberg":
        return spark.read.format("iceberg").load(location)
    return spark.read.parquet(location)
