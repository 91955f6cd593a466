"""Driver-contract smoke: a PLAIN SparkSession (no session factory, no
pre-set confs) must run a representative slice of the registry — the
driver builds its own session, so any query that silently depends on
get_spark's config (nanosAsLong, shuffle partitions, AQE flags) fails
HERE instead of in the correctness gate.

Runs in a SUBPROCESS: inside pytest, SparkSession.builder.getOrCreate()
would reuse the conftest session (confs included) and prove nothing.
"""

from __future__ import annotations

import os
import subprocess
import sys
import textwrap

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# one query per operator family added in round 3, plus the two
# historically conf-sensitive shapes (events time math, streaming)
SAMPLE = [
    "pricing_summary",        # TPC-H wave
    "min_cost_supplier",      # derived-supply self-join
    "trend_per_user",         # events time math (nanosAsLong at runtime)
    "ewma_smooth",            # events window
    "hll_distinct",           # sketch
    "semantic_chunks",        # portable-embedding chunker
    "quality_logreg",         # codegen scoring
    "markov_transitions",     # graph family
    "t9_stream_hll",          # streaming (raw file schema)
]


def test_registry_sample_on_plain_session():
    script = textwrap.dedent(f"""
        import sys
        sys.path.insert(0, {REPO!r})
        from pyspark.sql import SparkSession
        spark = (SparkSession.builder.master("local[4]")
                 .appName("vanilla").getOrCreate())
        import __spark_entry__ as entry
        qs = entry.queries()
        for name in {SAMPLE!r}:
            n = qs[name](spark, "/root/testdata/sf0.001").count()
            print(name, n, flush=True)
        print("VANILLA_OK")
    """)
    out = subprocess.run(
        [sys.executable, "-c", script],
        capture_output=True,
        text=True,
        timeout=600,
        cwd=REPO,
    )
    assert "VANILLA_OK" in out.stdout, (
        f"stdout:\n{out.stdout[-2000:]}\nstderr:\n{out.stderr[-2000:]}"
    )
