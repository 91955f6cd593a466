#!/usr/bin/env python
"""Measure ×N scaling for registry queries (the SCALE.md protocol).

Builds a ×N replica of sf0.1 under /tmp/spark_graft_scale{N} —
documents / embeddings / events / orders / lineitem replicated with
distinct ids (32 output files each: a multi-split scan), other tables
symlinked — then times each named query at sf0.1 and at the replica
(warm best-of-2) and prints a markdown table row per query.

Usage: python tools/scale10.py [--factor N] [query ...]
(default factor 10, default queries: the round-3 set; --factor 100
turns the ×10 extrapolation into a second measured decade — VERDICT r7
asked for exactly this on the heavy families)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BASE = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
FACTOR = 10
R10 = "/tmp/spark_graft_scale10"

DEFAULT = [
    "quality_logreg",
    "ngram_novelty",
    "temperature_resample",
    "hll_distinct",
    "trend_per_user",
    "embedding_whiten",
    "graph_triangles",
    "label_spread",
    "kcenter_coreset",
    "pricing_summary",
    "market_share",
    "customer_distribution",
    # r4 additions (dedup-family ratios carry the replica-regime
    # caveat recorded in SCALE.md)
    "exact_substr_dedup",
    "dsir_select",
    "bpe_train",
]

REPLICATE = {
    # table -> (id columns to offset per replica copy)
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
    "events": ["event_id", "user_id"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey"],
}
SYMLINK = ["region", "nation", "customer", "supplier", "part"]
OFFSET = 1_000_000_000


def build_replica(spark) -> None:
    from pyspark.sql import functions as F

    os.makedirs(R10, exist_ok=True)
    for t in SYMLINK:
        dst = f"{R10}/{t}.parquet"
        if not os.path.exists(dst):
            os.symlink(f"{BASE}/{t}.parquet", dst)
    for t, id_cols in REPLICATE.items():
        dst = f"{R10}/{t}.parquet"
        if os.path.exists(dst) and os.listdir(dst):
            continue
        df = spark.read.parquet(f"{BASE}/{t}.parquet")
        copies = None
        for i in range(FACTOR):
            c = df
            for col in id_cols:
                c = c.withColumn(col, F.col(col) + F.lit(i * OFFSET))
            copies = c if copies is None else copies.union(c)
        copies.repartition(32).write.mode("overwrite").parquet(dst)
        print(f"built {t} x10", file=sys.stderr)


def time_query(fn, spark, sf: str) -> float:
    best = None
    for _ in range(2):
        t0 = time.time()
        fn(spark, sf).collect()
        dt = time.time() - t0
        best = dt if best is None else min(best, dt)
    return best


def main() -> None:
    global FACTOR, R10
    import __spark_entry__ as entry
    from pdf_to_vectordb_etl_spark.session import get_spark

    args = sys.argv[1:]
    if args and args[0] == "--factor":
        FACTOR = int(args[1])
        args = args[2:]
    R10 = f"/tmp/spark_graft_scale{FACTOR}"
    names = args or DEFAULT
    spark = get_spark(
        app_name="scale10", master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]",
        shuffle_partitions=int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    )
    build_replica(spark)
    qs = entry.queries()
    print(f"| op | sf0.1 | ×{FACTOR} | ratio |")
    print("|---|---|---|---|")
    for name in names:
        fn = qs[name]
        try:
            t1 = time_query(fn, spark, BASE)
            t10 = time_query(fn, spark, R10)
            print(f"| {name} | {t1:.2f} s | {t10:.2f} s |"
                  f" {t10 / t1:.1f}× |", flush=True)
        except Exception as ex:  # keep measuring the rest
            print(f"| {name} | ERROR | {type(ex).__name__}:"
                  f" {str(ex)[:120]} | — |", flush=True)
        spark.catalog.clearCache()


if __name__ == "__main__":
    main()
