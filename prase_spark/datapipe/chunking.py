"""Token-window document chunking — the context-window prep step of a
training-data pipeline: split each document into fixed-token chunks with
overlap, entirely in native array expressions (tokenize once, slice per
chunk — no UDF, no explode of raw tokens through a shuffle).

Scale shape: one narrow map stage; output rows = Σ ceil(tokens/step),
partitioning inherited from the input scan. The token definition is
textstats.tokens (whitespace after lowercase+punct-strip), so chunk
token counts agree with token_count_docs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from prase_spark.datapipe.textstats import tokens


def chunk_documents(
    df: DataFrame,
    chunk_tokens: int = 256,
    overlap: int = 32,
    text_col: str = "text",
    key_col: str = "doc_id",
) -> DataFrame:
    """(key, chunk_id, n_chunk_tokens, chunk_text) with chunk i covering
    tokens [i·step, i·step + chunk_tokens), step = chunk_tokens − overlap.

    Chunk count = 1 for docs with ≤ chunk_tokens tokens (including empty
    docs — one empty chunk, so no document silently disappears), else
    1 + ceil((n − chunk_tokens)/step): the last chunk may be short but
    every token is covered and consecutive chunks share ``overlap``
    tokens. All arithmetic is integer-exact and engine-replicable (the
    gate's DuckDB twin reproduces identical rows)."""
    if not 0 <= overlap < chunk_tokens:
        raise ValueError(
            f"need 0 <= overlap ({overlap}) < chunk_tokens ({chunk_tokens})"
        )
    step = chunk_tokens - overlap
    # Materialize the token array in a projection BELOW the explode: the
    # Generate bars projection collapse, so the tokenizer runs ONCE per
    # document. Capturing tokens(text_col) inline in the transform lambda
    # re-runs the full regex tokenizer per CHUNK element (interpreted
    # HOFs do no subexpression elimination — measured 6x slower).
    toked = df.select(F.col(key_col), tokens(text_col).alias("__toks"))
    t = F.col("__toks")
    n = F.size(t)
    # ceil((n - chunk)/step) via (n - chunk + step - 1)/step: exact for any
    # doc below ~2^50 tokens (double division of small ints + floor).
    n_chunks = F.when(n <= chunk_tokens, F.lit(1)).otherwise(
        F.lit(1) + F.floor((n - F.lit(chunk_tokens) + F.lit(step - 1)) / F.lit(step))
    )
    chunks = F.transform(
        F.sequence(F.lit(0), n_chunks.cast("int") - 1),
        lambda i: F.struct(
            i.alias("chunk_id"),
            F.slice(t, i * step + 1, chunk_tokens).alias("ctoks"),
        ),
    )
    return (
        toked.select(F.col(key_col), F.explode(chunks).alias("c"))
        .select(
            key_col,
            F.col("c.chunk_id").alias("chunk_id"),
            F.size("c.ctoks").alias("n_chunk_tokens"),
            F.array_join("c.ctoks", " ").alias("chunk_text"),
        )
    )


def pack_chunks(
    chunks: DataFrame,
    capacity: int = 2048,
    key_cols: tuple[str, str] = ("doc_id", "chunk_id"),
    token_col: str = "n_chunk_tokens",
    num_partitions: int | None = None,
) -> DataFrame:
    """Deterministic fill-packing of chunks into context windows (sample
    packing): chunks are laid out in global ``key_cols`` order and chunk c
    lands in ``pack_id = cum_before(c) // capacity`` where cum_before is
    the token count preceding c. Packs fill to ~capacity; a chunk that
    straddles a boundary stays whole (its pack may exceed capacity by
    less than one chunk — standard fill packing, nothing is split or
    dropped).

    A naive ``sum() OVER (ORDER BY ...)`` is a single-partition window —
    a scale-killer — so the global prefix sum uses the same two-phase
    distributed pattern as ids.assign_dense_ids: range-partition + sort,
    per-partition token totals (one ≤n_part-row collect), broadcast
    offsets, partition-local running sum. Deterministic because
    ``key_cols`` is a unique key. Adds (pack_id, pack_pos): pack_pos is
    the chunk's token offset inside its pack."""
    spark = chunks.sparkSession
    if num_partitions:
        n_part = num_partitions
    else:
        # shuffle.partitions may be non-numeric ("auto" on AQE-managed
        # platforms) — fall back to the cluster's default parallelism.
        try:
            n_part = int(spark.conf.get("spark.sql.shuffle.partitions"))
        except (TypeError, ValueError):
            n_part = spark.sparkContext.defaultParallelism
    n_part = max(1, n_part)
    order = [F.col(c) for c in key_cols]

    parted = (
        chunks.repartitionByRange(n_part, *order)
        .sortWithinPartitions(*order)
        .withColumn("__pid", F.spark_partition_id())
    )
    # pin one partitioning snapshot for the totals read AND the output
    # (RangePartitioner re-samples on re-evaluation — see ids.py).
    parted = parted.persist()
    totals = {
        r["__pid"]: r["tok"]
        for r in parted.groupBy("__pid")
        .agg(F.sum(token_col).alias("tok"))
        .collect()
    }
    offsets, acc = [], 0
    for pid in range(max(totals, default=-1) + 1):
        offsets.append((pid, acc))
        acc += totals.get(pid, 0)
    if not offsets:
        # empty input: release the pinned snapshot and return through the
        # same checkpointed shape as the normal path (no persisted leak,
        # no live lineage back to ``chunks``).
        empty = (
            parted.drop("__pid")
            .withColumn("pack_id", F.lit(None).cast("long"))
            .withColumn("pack_pos", F.lit(None).cast("long"))
            .localCheckpoint()
        )
        parted.unpersist()
        return empty
    offset_df = spark.createDataFrame(offsets, schema="__pid INT, __offset LONG")

    w = (
        Window.partitionBy("__pid")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    local_before = F.coalesce(F.sum(token_col).over(w), F.lit(0))
    out = (
        parted.join(F.broadcast(offset_df), "__pid")
        .withColumn("__before", (local_before + F.col("__offset")).cast("long"))
        .withColumn("pack_id", F.floor(F.col("__before") / F.lit(capacity)))
        .withColumn(
            "pack_pos", F.col("__before") - F.col("pack_id") * F.lit(capacity)
        )
        .drop("__pid", "__offset", "__before")
    )
    out = out.localCheckpoint()  # ids must never be recomputed (ids.py note)
    parted.unpersist()
    return out


def cdc_chunks(
    df: DataFrame,
    divisor: int = 16,
    text_col: str = "text",
    key_col: str = "doc_id",
) -> DataFrame:
    """(key, chunk_id, n_tokens, chunk_text): content-defined chunking —
    a boundary opens BEFORE every token whose finalized hash is
    divisible by ``divisor`` (expected chunk length = ``divisor``
    tokens), the gear/Rabin rule reduced to its single-token form.
    Unlike :func:`chunk_documents`' fixed windows, boundaries are a
    pure function of LOCAL content: inserting or deleting a token
    reshapes only its own chunk (and at most one boundary), so chunk
    hashes of the unchanged remainder stay identical — the property
    that makes chunk-level dedup robust to small edits (the same reason
    backup systems CDC before hashing).

    Hash: poly_hash61(token) through the quadratic finalizer
    (h^2 + c mod P — sketches.py measurement: the raw poly is affine in
    trailing chars and its residues cluster; the finalizer scatters),
    all shared arithmetic, so the whole boundary structure value-hashes
    against a DuckDB twin. One narrow map + one explode + one
    (key, chunk) aggregation whose group size is content-bounded
    (~divisor tokens); no corpus-sized window anywhere."""
    if divisor < 2:
        raise ValueError(f"divisor must be >= 2, got {divisor}")
    from prase_spark.datapipe.hashing import POLY_P
    from prase_spark.datapipe.sketches import KMV_FIN_ADD

    toks = df.select(
        F.col(key_col).alias("key"), tokens(text_col).alias("__t")
    ).filter(F.size("__t") > 0)
    h = F.transform(F.col("__t"), lambda w: _poly61(w))
    fin = (
        f"transform(__h, x -> CAST((CAST(x AS DECIMAL(38,0)) * x "
        f"+ {KMV_FIN_ADD}) % {POLY_P} AS BIGINT))"
    )
    flags = (
        f"transform(__f, (x, j) -> CASE WHEN j > 0 AND x % {int(divisor)} = 0 "
        "THEN 1 ELSE 0 END)"
    )
    # 0-seeded running sum: chunk of token j = cum[j + 2] (leading zero)
    cum = (
        "aggregate(__b, array(CAST(0 AS INT)), "
        "(acc, f) -> array_append(acc, element_at(acc, -1) + f))"
    )
    rows = (
        toks.withColumn("__h", h)
        .withColumn("__f", F.expr(fin))
        .withColumn("__b", F.expr(flags))
        .withColumn("__c", F.expr(cum))
        .select(
            "key",
            F.posexplode(
                F.expr("zip_with(__t, slice(__c, 2, size(__t)), "
                       "(w, c) -> struct(w AS w, c AS c))")
            ).alias("j", "s"),
        )
        .select("key", "j", "s.w", "s.c")
    )
    return rows.groupBy(
        "key", F.col("c").cast("long").alias("chunk_id")
    ).agg(
        F.count("*").cast("long").alias("n_tokens"),
        F.expr(
            "array_join(transform(array_sort(collect_list(struct(j, w))), "
            "s -> s.w), ' ')"
        ).alias("chunk_text"),
    )


def _poly61(w):
    from prase_spark.datapipe.hashing import poly_hash61

    return poly_hash61(w)
