#!/usr/bin/env python
"""×10 scaling measurement for the suffix-array family (SCALE.md rows).

The registry queries `suffix_ranks` / `longest_repeated_substring`
cap their input (doc_id < 100, 120 ASCII chars) to keep the oracle
gate fast — useless for a scaling ratio, since the ×10 replica's new
doc_ids fall outside the cap. This harness calls the OPERATORS
directly on the FULL documents table at sf0.1 and at the ×10 replica
(tools/scale10.py's builder), so the measured ratio covers the real
O(log max_len) round loop: per round one distinct + range-partition
dense-rank + equi-join (suffix_ranks), and the two-phase hash-probe
binary search (longest_repeated_substring).

Usage: python tools/scale_suffix.py [max_chars]   (default 200)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import tools.scale10 as s10  # noqa: E402
from tools.scale10 import BASE  # noqa: E402


def main() -> None:
    from pyspark.sql import functions as F

    from pdf_to_vectordb_etl_spark.operators import suffixes
    from pdf_to_vectordb_etl_spark.session import get_spark

    args = sys.argv[1:]
    if args and args[0] == "--factor":
        s10.FACTOR = int(args[1])
        s10.R10 = f"/tmp/spark_graft_scale{s10.FACTOR}"
        args = args[2:]
    max_chars = int(args[0]) if args else 200
    spark = get_spark(
        app_name="scale_suffix", master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]",
        shuffle_partitions=int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    )
    s10.build_replica(spark)
    R10 = s10.R10

    def load(sf: str):
        # full table, ASCII-projected and length-capped the same way
        # the registry query slices — but NO doc_id cap
        return spark.read.parquet(f"{sf}/documents.parquet").select(
            "doc_id",
            F.regexp_replace(
                F.substring("text", 1, max_chars), r"[^\x20-\x7e]", ""
            ).alias("text"),
        )

    def t_ranks(sf: str) -> float:
        t0 = time.time()
        n = suffixes.suffix_ranks(load(sf)).count()
        dt = time.time() - t0
        print(f"#   suffix_ranks@{sf}: {n} suffixes", file=sys.stderr)
        return dt

    def t_lrs(sf: str) -> float:
        t0 = time.time()
        row = suffixes.longest_repeated_substring(load(sf)).first()
        dt = time.time() - t0
        print(
            f"#   lrs@{sf}: len={row['lrs_len']} occ={row['n_occurrences']}",
            file=sys.stderr,
        )
        return dt

    print(f"| op | sf0.1 | ×{s10.FACTOR} | ratio |")
    print("|---|---|---|---|")
    for name, fn in (("suffix_ranks", t_ranks),
                     ("longest_repeated_substring", t_lrs)):
        t1 = min(fn(BASE), fn(BASE))
        t10 = min(fn(R10), fn(R10))
        print(f"| {name} (full docs, {max_chars}ch) "
              f"| {t1:.2f} s | {t10:.2f} s | {t10 / t1:.1f}× |")


if __name__ == "__main__":
    main()
