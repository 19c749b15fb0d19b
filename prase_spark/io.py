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
    implementation (the standard way an Iceberg runtime is wired in).

    Reads the SESSION conf via ``SET`` (covers catalogs configured at
    runtime with ``spark.conf.set`` — DSv2 catalogs resolve lazily, so
    that wiring is legitimate), falling back to the launch-time context
    conf."""
    try:
        rows = spark.sql("SET").collect()
        pairs = [(r[0], r[1]) for r in rows]
    except Exception:
        pairs = spark.sparkContext.getConf().getAll()
    for k, v in pairs:
        if str(k).startswith("spark.sql.catalog.") and "iceberg" in str(v).lower():
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
        elif mode == "append":
            writer.append()
        else:
            # 'error'/'ignore' have no DataFrameWriterV2 analog; appending
            # would silently break the fail-if-exists contract
            raise ValueError(
                f"mode={mode!r} is not supported for fmt='iceberg'; "
                "use 'overwrite' or 'append'"
            )
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
