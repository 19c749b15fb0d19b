"""Local replica of the driver's correctness gate: run each __spark_entry__
query and its DuckDB oracle on the same sf dir, compare row count + schema +
order-insensitive values.

Usage: python tools/check_oracles.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys
import time
from collections import Counter

import duckdb

sys.path.insert(0, ".")

import __spark_entry__ as entry_mod  # noqa: E402
from prase_spark.config import get_spark  # noqa: E402
from prase_spark.tpch_kg import TABLES  # noqa: E402


def norm_val(v):
    if isinstance(v, bool):
        return v
    if isinstance(v, float):
        return round(v, 6)
    return v


def rows_to_counter(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return Counter(tuple(norm_val(r[i]) for i in order) for r in rows)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark("oracle_check")
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs, oracles = entry_mod.queries(), entry_mod.oracle_sql()
    failures = 0
    t_start = time.monotonic()
    for name, fn in qs.items():
        if only and name not in only:
            continue
        sql = oracles.get(name)
        t_q = time.monotonic()
        if sql is None:
            try:
                n = fn(spark, sf_dir).count()
                print(f"{name:28s} ROWS-ONLY rows={n} t={time.monotonic() - t_q:.1f}s")
            except Exception as ex:
                failures += 1
                print(f"{name:28s} ERROR (rows-only): {str(ex).splitlines()[0][:200]}")
            continue
        try:
            sdf = fn(spark, sf_dir)
            s_cols = sdf.columns
            s_rows = [tuple(r) for r in sdf.collect()]
            rel = con.sql(sql)
            d_cols = rel.columns
            d_rows = rel.fetchall()
            ok_schema = sorted(s_cols) == sorted(d_cols)
            sc, dc = rows_to_counter(s_cols, s_rows), rows_to_counter(d_cols, d_rows)
            ok_rows = len(s_rows) == len(d_rows)
            ok_vals = sc == dc
            status = "OK" if (ok_schema and ok_rows and ok_vals) else "MISMATCH"
            if status == "MISMATCH":
                failures += 1
            print(
                f"{name:28s} {status} spark_rows={len(s_rows)} duck_rows={len(d_rows)} "
                f"schema={'ok' if ok_schema else (s_cols, d_cols)} "
                f"t={time.monotonic() - t_q:.1f}s"
            )
            if not ok_vals and ok_schema:
                extra = list((sc - dc).items())[:3]
                missing = list((dc - sc).items())[:3]
                print(f"    spark-only: {extra}")
                print(f"    duck-only : {missing}")
        except Exception as ex:
            failures += 1
            print(f"{name:28s} ERROR: {str(ex).splitlines()[0][:300]}")
    print(f"\ntotal_gate_wall={time.monotonic() - t_start:.1f}s")
    print(f"{'ALL OK' if failures == 0 else f'{failures} FAILURES'}")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
