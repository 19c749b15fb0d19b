"""Pluggable 64-bit hashing for the dedup/fingerprint suite.

Two interchangeable families:

- ``F.xxhash64`` (default everywhere): JVM-native, the fast path for
  production — but it has no DuckDB twin, so results can only be
  rows-checked by the driver gate.
- :func:`poly_hash61`: a polynomial-rolling hash over the string's code
  points, ``h = fold((acc * 1000003 + code) mod (2^61 - 1), init 17)``,
  built purely from arithmetic both engines share. ~10-50x slower than
  xxhash64 on long strings (per-character fold), but value-replicable in
  ANSI SQL — the correctness-gate queries use it so MinHash/SimHash/
  fingerprint results are hash-verified end-to-end against DuckDB
  (:data:`POLY_SQL` is the DuckDB twin).

Both are uniform enough for MinHash universal-hash inputs and SimHash bit
votes; the poly variant only populates bits 0..60 (values < 2^61), which
costs SimHash banding 3 of 64 bits of discrimination — candidates grow
slightly, verification is unaffected.

Arithmetic is decimal(38,0) so Spark's ANSI mode never sees a long
overflow (acc < 2^61, *1000003 stays < 10^26 << 10^38).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

POLY_P = (1 << 61) - 1
POLY_MULT = 1000003
POLY_INIT = 17

# DuckDB twin of poly_hash61; format with the column/expression as {c}.
POLY_SQL = (
    "CAST(list_reduce(list_prepend(CAST(" + str(POLY_INIT) + " AS HUGEINT), "
    "list_transform(list_filter(string_split_regex({c}, ''), x -> len(x) > 0), "
    "x -> CAST(ord(x) AS HUGEINT))), "
    f"(acc, code) -> (acc * {POLY_MULT} + code) % {POLY_P}) AS BIGINT)"
)


def poly_hash61(col: Column | str) -> Column:
    """SQL-replicable polynomial hash of a string column (see module doc).
    Returns a non-negative long in [0, 2^61)."""
    c = F.col(col) if isinstance(col, str) else col
    chars = F.filter(F.split(c, ""), lambda ch: F.length(ch) > 0)
    return F.aggregate(
        chars,
        F.lit(POLY_INIT).cast("decimal(38,0)"),
        lambda acc, ch: ((acc * F.lit(POLY_MULT) + F.ascii(ch)) % F.lit(POLY_P)).cast(
            "decimal(38,0)"
        ),
    ).cast("long")
