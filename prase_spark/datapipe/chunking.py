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

from pyspark.sql import DataFrame
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
    t = tokens(text_col)
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
        df.select(F.col(key_col), F.explode(chunks).alias("c"))
        .select(
            key_col,
            F.col("c.chunk_id").alias("chunk_id"),
            F.size("c.ctoks").alias("n_chunk_tokens"),
            F.array_join("c.ctoks", " ").alias("chunk_text"),
        )
    )
