#!/usr/bin/env python
"""Build a DEGENERATE testdata directory for robustness sweeps.

The driver regenerates testdata between rounds; literals and
denominators that hold on today's healthy distributions can crash
(ANSI division by zero) or hash-diverge on edge-shaped data. This
fixture concentrates the edges: near-empty tables, ONE user, tied
timestamps, empty/whitespace/1-char/unicode documents, constant
values, zero discounts, a single part/supplier/order chain.

Usage: python tools/make_degenerate.py [outdir]   (default
/tmp/spark_graft_degenerate), then
``python tools/check_oracle.py --sf <outdir>``. Crashes and
mismatches are the signal; empty results that hash-match are fine.
"""

from __future__ import annotations

import datetime as dt
import os
import sys

import pyarrow as pa
import pyarrow.parquet as pq

OUT = sys.argv[1] if len(sys.argv) > 1 else "/tmp/spark_graft_degenerate"


def w(name: str, table: pa.Table) -> None:
    pq.write_table(table, os.path.join(OUT, f"{name}.parquet"))


def main() -> None:
    os.makedirs(OUT, exist_ok=True)
    ts = dt.datetime(1999, 12, 31, 23, 59, 59)
    us = pa.timestamp("us")

    w("region", pa.table({
        "r_regionkey": pa.array([0], pa.int64()),
        "r_name": ["EUROPE"],
    }))
    w("nation", pa.table({
        "n_nationkey": pa.array([0], pa.int64()),
        "n_name": ["NATION_0"],
        "n_regionkey": pa.array([0], pa.int64()),
    }))
    w("customer", pa.table({
        "c_custkey": pa.array([1], pa.int64()),
        "c_name": ["Customer#000000001"],
        "c_acctbal": [0.0],
        "c_nationkey": pa.array([0], pa.int64()),
        "c_mktsegment": ["BUILDING"],
    }))
    w("supplier", pa.table({
        "s_suppkey": pa.array([1], pa.int64()),
        "s_name": ["Supplier#000000001"],
        "s_acctbal": [0.0],
        "s_nationkey": pa.array([0], pa.int64()),
    }))
    w("part", pa.table({
        "p_partkey": pa.array([1], pa.int64()),
        "p_name": ["azure red blue"],
        "p_brand": ["Brand#1"],
        "p_type": ["STANDARD BRUSHED"],
        "p_size": pa.array([15], pa.int32()),
        "p_retailprice": [0.0],
    }))
    w("orders", pa.table({
        "o_orderkey": pa.array([1], pa.int64()),
        "o_custkey": pa.array([1], pa.int64()),
        "o_orderstatus": ["F"],
        "o_totalprice": [0.0],
        "o_orderdate": pa.array([ts], us),
        "o_orderpriority": ["1-URGENT"],
    }))
    w("lineitem", pa.table({
        "l_orderkey": pa.array([1, 1], pa.int64()),
        "l_partkey": pa.array([1, 1], pa.int64()),
        "l_suppkey": pa.array([1, 1], pa.int64()),
        "l_linenumber": pa.array([1, 2], pa.int32()),
        "l_quantity": [1.0, 1.0],
        "l_extendedprice": [0.0, 0.0],   # zero-revenue world
        "l_discount": [0.0, 0.0],
        "l_tax": [0.0, 0.0],
        "l_returnflag": ["N", "N"],
        "l_linestatus": ["O", "O"],
        "l_shipdate": pa.array([ts, ts], us),
    }))
    # ONE user, every event at the SAME instant, constant value, one type
    w("events", pa.table({
        "event_id": pa.array([1, 2, 3], pa.int64()),
        "ts": pa.array([ts, ts, ts], us),
        "user_id": pa.array([7, 7, 7], pa.int64()),
        "event_type": ["click", "click", "click"],
        "value": [5.0, 5.0, 5.0],
        "props": ['{"k": 1}', "not json", ""],
    }))
    # empty / whitespace / single-char / unicode / duplicate docs
    texts = ["", "   ", "a", "é ñ 中", "dup dup", "dup dup"]
    ids = list(range(len(texts)))
    # boilerplate cluster: 48 verbatim copies of one template (below the
    # LSH DEFAULT_MAX_BUCKET_SIZE cap, so the capped Spark plan and the
    # exact-Jaccard DuckDB oracle still agree pair-for-pair while the
    # banding path sees a genuinely hot bucket). ids start at 100 to
    # stay outside the suffix-family doc_id < 100 latency caps.
    template = ("terms of service boilerplate page copied verbatim on "
                "every mirror of the site please read carefully")
    texts += [template] * 48
    ids += [100 + i for i in range(48)]
    # one NULL text row: regexp/split kernels must treat it as empty,
    # not poison whole-row outputs to NULL (the gopher-gate lesson)
    texts += [None]
    ids += [99]
    # CRLF + lone-CR text: Java's (?m)$ matches before \r\n, RE2's only
    # before \n — line-anchored gopher counters must canonicalize line
    # endings on BOTH sides or bullet/ellipsis fractions split (r6
    # ADVICE). Bullet lines and a trailing-ellipsis line included so
    # the counters are nonzero.
    texts += ["- first bullet\r\n- second bullet\r\nplain line...\r\n"
              "the be to of and that have with\rlone carriage return"]
    ids += [98]
    # PII-dense doc (emails/IP/phone/SSN/card) so the pii_* oracles
    # exercise every detector; its second line is also a boilerplate
    # line shared with the hot template below (strip interplay).
    texts += ["reach admin@example.com or x.y+z@sub.ex-ample.org now\n"
              "cookie consent banner we use cookies to improve your\n"
              "host 192.168.0.1 phone +1 (555) 123-4567 ssn 123-45-6789 "
              "card 4111 1111 1111 1111 ver v1.2.3.4a pi 3.14159"]
    ids += [97]
    # GPT-2 pre-tokenizer hard spots (byte-level BPE): multi-space runs
    # before words (the lookahead-emulation split), space-attached
    # contractions whose letter tail merges into a following bare
    # letter run ("  'sa" -> " ", " '", "sa"), tab/CR runs, contraction
    # after digits, and multi-byte UTF-8 next to attach points.
    texts += ["it 's  'sa don't  \t x\r\n  'll go 9 'm  中文  'the end  "]
    ids += [96]
    # HOT template: 560 verbatim copies — ABOVE the LSH
    # DEFAULT_MAX_BUCKET_SIZE=512 cap. The graded minhash queries run
    # collapse_exact=True, so this group must fold to ONE banded row
    # (star pairs replayed exactly by the DuckDB oracle) instead of a
    # 560-occupancy bucket; uncollapsed library paths hit the star-
    # routing cap, pinned by the scale-hardening pytests. ids start at
    # 1000 to stay outside the suffix-family doc_id < 100 caps.
    hot = ("cookie consent banner we use cookies to improve your "
           "experience accept all manage preferences reject optional")
    texts += [hot] * 560
    ids += [1000 + i for i in range(560)]
    w("documents", pa.table({
        "doc_id": pa.array(ids, pa.int64()),
        "text": texts,
        "lang": ["en"] * len(texts),
        "source": ["src0"] * len(texts),
        "n_chars": pa.array([len(t) if t is not None else 0 for t in texts], pa.int64()),
    }))
    # constant + zero vectors (cosine with a zero vector!)
    vecs = [[0.0] * 64, [1.0] * 64, [1.0] * 64]
    w("embeddings", pa.table({
        "vec_id": pa.array([0, 1, 2], pa.int64()),
        "embedding": pa.array(vecs, pa.list_(pa.float32())),
        "label": pa.array([0, 0, 0], pa.int32()),
    }))
    print(f"wrote degenerate fixture to {OUT}")


if __name__ == "__main__":
    main()
