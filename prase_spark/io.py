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

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


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
    partition_by: tuple[str, ...] | None = None,
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
        if partition_by and mode == "overwrite":
            # append inherits the existing table's partition spec; only
            # create/replace may (re)declare it
            writer = writer.partitionedBy(*[F.col(c) for c in partition_by])
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
        w = df.write.mode(mode)
        if partition_by:
            w = w.partitionBy(*partition_by)
        w.parquet(location)
    return fmt


def read_table(spark: SparkSession, location: str, fmt: str | None = None) -> DataFrame:
    """Read back a table written by :func:`write_table`."""
    if fmt is None:
        fmt = "iceberg" if iceberg_available(spark) else "parquet"
    if fmt == "iceberg":
        return spark.read.format("iceberg").load(location)
    return spark.read.parquet(location)


def bucket_column(
    key: Column | str, n_buckets: int, hash_fn=F.xxhash64
) -> Column:
    """Deterministic content-keyed bucket id in [0, n_buckets): the
    explicit hash-partitioning key for the materialized triple store.

    Unlike ``spark_partition_id()``, this is a pure function of the ROW —
    the same triple lands in the same bucket on a laptop and on a
    1000-executor cluster, so per-bucket lineage/metrics stay comparable
    across runs, cluster sizes, and engine versions (and become
    value-hashable by the correctness gate). ``hash_fn`` defaults to the
    JVM-native xxhash64; the gate passes the SQL-replicable poly hash."""
    if n_buckets <= 0:
        raise ValueError(f"n_buckets must be positive, got {n_buckets}")
    c = F.col(key) if isinstance(key, str) else key
    return F.pmod(hash_fn(c), F.lit(n_buckets)).cast("int")


def bucket_metrics(
    df: DataFrame,
    n_buckets: int,
    subj_col: str = "subj",
    row_cols: tuple[str, ...] = ("subj", "pred", "obj"),
    hash_fn=F.xxhash64,
) -> DataFrame:
    """Per-bucket lineage/metrics for a hash-partitioned triple store:
    (bucket, n_rows, n_subjects, checksum).

    ``checksum`` is the bit-XOR of a row content hash — order-independent
    and exact (no float accumulation), so two materializations of the
    same logical table compare equal regardless of task scheduling, and a
    single-row difference flips it. One shuffle (groupBy bucket) with
    map-side partial aggregation; the row hash is computed stream-side."""
    row_hash = hash_fn(F.concat_ws("\x01", *row_cols))
    return (
        df.withColumn("bucket", bucket_column(subj_col, n_buckets, hash_fn))
        .groupBy("bucket")
        .agg(
            F.count("*").alias("n_rows"),
            F.countDistinct(subj_col).alias("n_subjects"),
            F.bit_xor(row_hash).alias("checksum"),
        )
    )


def zorder_key(a, b, bits: int = 16):
    """Morton/Z-order key: interleave the low ``bits`` bits of two
    non-negative integer columns — bit i of ``a`` lands at position 2i,
    bit i of ``b`` at 2i+1. Records close in BOTH dimensions get close
    keys, so range-partitioning + sorting on the key gives every file
    a tight bounding box in (a, b) — parquet min/max stats then prune
    multi-dimensional predicates (host x time, partkey x date) that a
    single-column sort can only serve on its leading column. This is
    the layout primitive behind OPTIMIZE ZORDER-style maintenance,
    expressed as one pure codegen integer expression (2*bits shifts +
    ors), identical in any engine.

    Inputs must already be non-negative and fit ``bits`` bits (mod/hash
    them down first — the caller owns the dimension quantization, same
    doctrine as bucket_metrics)."""
    from pyspark.sql import Column
    from pyspark.sql import functions as F

    ca = F.col(a) if isinstance(a, str) else a
    cb = F.col(b) if isinstance(b, str) else b
    z = F.lit(0).cast("long")
    for i in range(bits):
        # Column `|` is logical OR; bitwiseOR is the integer op
        z = z.bitwiseOR(
            F.shiftleft(F.shiftright(ca, i).bitwiseAND(F.lit(1)), 2 * i)
        ).bitwiseOR(
            F.shiftleft(F.shiftright(cb, i).bitwiseAND(F.lit(1)), 2 * i + 1)
        )
    return z.cast("long")


def zorder_layout(df, a: str, b: str, n_files: int = 32, bits: int = 16):
    """Range-partition + sort the frame by its Z-order key (appended as
    ``__z``): the write-side companion of :func:`zorder_key`, same
    shard discipline as cdx.write_cdx_index — each output partition
    holds one contiguous Z-range, i.e. a bounded rectangle-union in
    (a, b), which is what makes parquet row-group stats selective on
    BOTH columns."""
    keyed = df.withColumn("__z", zorder_key(a, b, bits))
    return keyed.repartitionByRange(n_files, "__z").sortWithinPartitions("__z")
