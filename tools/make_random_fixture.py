#!/usr/bin/env python
"""Seed-randomized sf0.001-class fixture — fresh rounding-boundary dice
on every run.

r6/r7 history: every NEW dataset rolled rounding/tie boundaries the old
fixtures never hit (nation_trade_volume's decimal-cast-before-round,
resample_locf's avg-order split, cohen_d's empty arm — each caught only
by new data). `tools/make_degenerate.py` covers PATHOLOGIES with fixed
content; this generator covers fresh STATISTICS: same schemas, same
literal domains (the r4 literal audit: region names AFRICA..MIDDLE
EAST, NATION_0..24 round-robin, p_type 6 values, Brand#1..25, order
years 1995-2001, event types view/click/purchase/signup/error, the
31-word document vocabulary), new values each run.

Usage: python tools/make_random_fixture.py [seed] [out_dir]
Prints the seed (reproduce a catch by re-running with it) and writes
parquet to out_dir (default /tmp/spark_graft_randfix). Gate step:
sweep with `python tools/check_oracle.py --sf /tmp/spark_graft_randfix`.
Anything OTHER than the gate (tests, probes) must pass its own
out_dir: a concurrent regeneration of the gate's path mid-sweep makes
Spark and DuckDB read different corpora (observed — 5 phantom dedup
"failures" from a pytest/gate race).
"""

from __future__ import annotations

import datetime as dt
import random
import sys
import time

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

DEFAULT_OUT = "/tmp/spark_graft_randfix"

REGIONS = ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]
SEGMENTS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
PTYPES = ["ECONOMY", "LARGE", "MEDIUM", "PROMO", "SMALL", "STANDARD"]
PRIOS = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
ADJS = ["blue", "cold", "hot", "large", "new", "old", "red", "small"]
NOUNS = ["anvil", "bolt", "gear", "gizmo", "plate", "ring", "rod", "widget"]
EVENT_TYPES = ["view", "click", "purchase", "signup", "error"]
LANGS = ["en", "de", "es", "fr", "zh"]
VOCAB = (
    "the a fast slow big small hash sort merge join scan filter group agg "
    "window stream batch spark table row column key value data query part "
    "order line customer vector dup"
).split()


def main() -> None:
    seed = int(sys.argv[1]) if len(sys.argv) > 1 else int(time.time())
    out = sys.argv[2] if len(sys.argv) > 2 else DEFAULT_OUT
    global OUT
    OUT = out
    print(f"make_random_fixture seed = {seed}")
    rng = random.Random(seed)
    nprng = np.random.default_rng(seed)
    import os

    os.makedirs(OUT, exist_ok=True)

    def w(name: str, table: pa.Table) -> None:
        pq.write_table(table, f"{OUT}/{name}.parquet")

    us = pa.timestamp("us")
    w("region", pa.table({
        "r_regionkey": pa.array(range(5), pa.int32()),
        "r_name": REGIONS,
    }))
    w("nation", pa.table({
        "n_nationkey": pa.array(range(25), pa.int32()),
        "n_name": [f"NATION_{i}" for i in range(25)],
        "n_regionkey": pa.array([i % 5 for i in range(25)], pa.int32()),
    }))
    n_cust, n_supp, n_part, n_ord, n_li = 150, 10, 200, 1500, 6000
    w("customer", pa.table({
        "c_custkey": pa.array(range(n_cust), pa.int64()),
        "c_name": [f"Customer#{i:09d}" for i in range(n_cust)],
        "c_nationkey": pa.array(
            [rng.randrange(25) for _ in range(n_cust)], pa.int32()
        ),
        "c_acctbal": [round(rng.uniform(-1000, 10000), 2) for _ in range(n_cust)],
        "c_mktsegment": [rng.choice(SEGMENTS) for _ in range(n_cust)],
    }))
    w("supplier", pa.table({
        "s_suppkey": pa.array(range(n_supp), pa.int64()),
        "s_name": [f"Supplier#{i:09d}" for i in range(n_supp)],
        "s_nationkey": pa.array(
            [rng.randrange(25) for _ in range(n_supp)], pa.int32()
        ),
        "s_acctbal": [round(rng.uniform(0, 9999), 2) for _ in range(n_supp)],
    }))
    w("part", pa.table({
        "p_partkey": pa.array(range(n_part), pa.int64()),
        "p_name": [f"{rng.choice(ADJS)} {rng.choice(NOUNS)}" for _ in range(n_part)],
        "p_brand": [f"Brand#{rng.randrange(1, 26)}" for _ in range(n_part)],
        "p_type": [rng.choice(PTYPES) for _ in range(n_part)],
        "p_size": pa.array(
            [rng.randrange(1, 51) for _ in range(n_part)], pa.int32()
        ),
        "p_retailprice": [round(900 + rng.uniform(0, 20), 1) for _ in range(n_part)],
    }))
    d0 = dt.datetime(1995, 1, 1)
    span_days = (dt.datetime(2001, 8, 1) - d0).days
    odates = [d0 + dt.timedelta(days=rng.randrange(span_days + 1))
              for _ in range(n_ord)]
    w("orders", pa.table({
        "o_orderkey": pa.array(range(n_ord), pa.int64()),
        "o_custkey": pa.array(
            [rng.randrange(n_cust) for _ in range(n_ord)], pa.int64()
        ),
        "o_orderstatus": [rng.choice(["F", "O", "P"]) for _ in range(n_ord)],
        "o_totalprice": [round(rng.uniform(1000, 500000), 2) for _ in range(n_ord)],
        "o_orderdate": pa.array(odates, us),
        "o_orderpriority": [rng.choice(PRIOS) for _ in range(n_ord)],
    }))
    lkeys = sorted(rng.randrange(n_ord) for _ in range(n_li))
    lnum: dict[int, int] = {}
    lnums = []
    for k in lkeys:
        lnum[k] = lnum.get(k, 0) + 1
        lnums.append(lnum[k])
    w("lineitem", pa.table({
        "l_orderkey": pa.array(lkeys, pa.int64()),
        "l_partkey": pa.array(
            [rng.randrange(n_part) for _ in range(n_li)], pa.int64()
        ),
        "l_suppkey": pa.array(
            [rng.randrange(n_supp) for _ in range(n_li)], pa.int64()
        ),
        "l_linenumber": pa.array(lnums, pa.int32()),
        "l_quantity": [float(rng.randrange(1, 51)) for _ in range(n_li)],
        "l_extendedprice": [round(rng.uniform(900, 105000), 2) for _ in range(n_li)],
        "l_discount": [round(rng.randrange(0, 11) / 100, 2) for _ in range(n_li)],
        "l_tax": [round(rng.randrange(0, 9) / 100, 2) for _ in range(n_li)],
        "l_returnflag": [rng.choice(["A", "N", "R"]) for _ in range(n_li)],
        "l_linestatus": [rng.choice(["F", "O"]) for _ in range(n_li)],
        "l_shipdate": pa.array(
            [d0 + dt.timedelta(days=rng.randrange(span_days + 1))
             for _ in range(n_li)], us
        ),
    }))
    n_ev = 1000
    t0 = dt.datetime(2024, 1, 1)
    ts = []
    cur = 0
    for _ in range(n_ev):
        cur += rng.randrange(1, 120_000_000)  # us gaps, ~uniform minutes
        ts.append(t0 + dt.timedelta(microseconds=cur))
    w("events", pa.table({
        "event_id": pa.array(range(n_ev), pa.int64()),
        "ts": pa.array(ts, us),
        "user_id": pa.array(
            [rng.randrange(15) for _ in range(n_ev)], pa.int64()
        ),
        "event_type": [rng.choice(EVENT_TYPES) for _ in range(n_ev)],
        "value": [round(rng.uniform(0, 330), 2) for _ in range(n_ev)],
        "props": [f'{{"k": {rng.randrange(100)}}}' for _ in range(n_ev)],
    }))
    n_docs = 500
    texts = []
    for i in range(n_docs):
        nw = rng.randrange(10, 100)
        texts.append(" ".join(rng.choice(VOCAB) for _ in range(nw)))
    # a few exact duplicates so dedup paths have real work
    for _ in range(5):
        a, b = rng.randrange(n_docs), rng.randrange(n_docs)
        texts[a] = texts[b]
    langs = [LANGS[0] if rng.random() < 0.4 else rng.choice(LANGS[1:])
             for _ in range(n_docs)]
    w("documents", pa.table({
        "doc_id": pa.array(range(n_docs), pa.int64()),
        "text": texts,
        "lang": langs,
        "source": [f"src{rng.randrange(20)}" for _ in range(n_docs)],
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    }))
    n_vec = 500
    emb = (nprng.standard_normal((n_vec, 64)) * 0.12).astype(np.float32)
    w("embeddings", pa.table({
        "vec_id": pa.array(range(n_vec), pa.int64()),
        "embedding": pa.array([list(r) for r in emb], pa.list_(pa.float32())),
        "label": pa.array([rng.randrange(10) for _ in range(n_vec)], pa.int32()),
    }))
    print(f"wrote random fixture (seed {seed}) to {OUT}")


if __name__ == "__main__":
    main()
