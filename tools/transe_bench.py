"""One-off TransE training throughput read (same fixture as the BENCH.md
round-4 record: synthetic 400k-entity KG -> ~2M relation facts, dim=32,
2 epochs, local[32]) — re-measured after the round-5 codegen-native
gradient reduce replaced the per-id Arrow applyInPandas (VERDICT r4 #2).

Usage: python tools/transe_bench.py [n_ent] [epochs]
Prints one JSON line; paste/append the read into BENCH.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    n_ent = int(sys.argv[1]) if len(sys.argv) > 1 else 400_000
    epochs = int(sys.argv[2]) if len(sys.argv) > 2 else 2

    from pyspark.sql import functions as F

    from prase_spark.config import get_spark
    from prase_spark.fixtures import synthetic_kg_distributed
    from prase_spark.kgbuild import build_kg
    from prase_spark.transe import train_transe

    spark = get_spark("transe_bench", master="local[32]", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    kg = build_kg(synthetic_kg_distributed(spark, n_ent, kg=1, partitions=64))
    rel = kg.triples.filter(~F.col("obj_is_lit")).persist()
    n_facts = rel.count()
    n_ids = int(kg.nodes.agg(F.max("ent_id")).collect()[0][0]) + 1
    t0 = time.time()
    train_transe(rel, n_entities=n_ids, dim=32, epochs=epochs, lr=0.05)
    elapsed = time.time() - t0
    print(
        json.dumps(
            {
                "facts": n_facts,
                "ids": n_ids,
                "dim": 32,
                "epochs": epochs,
                "sec": round(elapsed, 1),
                "facts_per_sec_per_epoch": round(n_facts / (elapsed / epochs), 1),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
