#!/usr/bin/env python
"""Registry-wide single-partition-window audit.

A Window with no PARTITION BY funnels the whole input through one task
— the classic scale killer. This sweeps every queries() entry's
optimized plan and reports each `Window` operator whose simple-plan
line carries only two bracket groups (exprs + order) instead of three
(exprs + partition + order).

Known/documented global windows are allowlisted with the reason the
docstring gives; anything NEW showing up here is a regression.

Usage: python tools/audit_global_windows.py [--sf /root/testdata/sf0.01]
"""

from __future__ import annotations

import argparse
import io
import os
import re
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

#: queries whose BUILD executes work (iterative loops, streams, collect
#: -based training) — their per-round plans are pinned individually in
#: tests/test_plan_quality.py; skipping keeps the audit to seconds
EXEC_HEAVY = {
    "kmeans_centroids", "centroids_ivf_train", "k1_topk_ivf",
    "ivf_assign_cosine", "ivfpq_topk", "pq_adc_topk", "pq_reconstruction",
    "graph_pagerank", "graph_khop", "graph_cc_star", "kcenter_coreset",
    "label_spread", "mmr_rerank", "dedup_semantic", "semantic_chunks",
    "t3_stream_agg", "t4_stateful_totals", "t5_stream_dedup",
    "t6_stream_interval_join", "t7_stream_sessionize", "t8_stream_anomaly",
    "t9_stream_hll", "t10_stream_cdc", "t11_stream_cms",
    "dedup_embedding_cosine", "dedup_embedding_blocked", "binary_hamming_topk",
    "dedup_incremental_exact", "dedup_incremental_minhash", "zorder_files",
    "compaction_plan", "enem_questions", "enem_txt", "enem_json",
    # r4: prefix-doubling rounds / binary-search probes / CSV sink
    # round-trip all execute during build; dense-rank windows are
    # partitioned by spark_partition_id (never global) — pinned in
    # tests/test_round4_ops.py
    "suffix_ranks", "longest_repeated_substring", "o7_stats_csv_roundtrip",
    "t17_stream_gram_hist", "bpe_train",
}

#: (query, reason) pairs for windows that are global BY DESIGN —
#: every entry must name why the windowed input is BOUNDED (or a
#: documented compat mode); new names landing in `bad` are regressions
ALLOWLIST = {
    "token_budget_allocation": "greedy prefix-sum over the per-source aggregate — one row per source, bounded by construction",
    "t40_stream_token_budget": "same finale as token_budget_allocation over the per-source streaming snapshot — one row per source, bounded by construction",
    "w3_sequential_ids": "reference-compat sequential IDs; hash IDs are the default (SURVEY §7 scope)",
    "hybrid_search_rrf": "rank fusion over two k=50 shortlists — window input bounded by construction",
    "share_of_total": "percent-of-total over the 5-row segment aggregate (agg first, window on the aggregate)",
    "yoy_growth": "lag() over the 8-row per-year aggregate",
    "eval_auc": "cumulative negatives over the fixed 1000-bin score grid — bounded by construction",
    "survival_km": "at-risk/survival windows over the distinct-duration table — time-domain-sized, not subject-sized",
    "zipf_fit": "rank over the vocabulary aggregate (vocabulary-bounded), cut to top-100 before the fit",
    "eval_pr_auc": "descending cum-tp/fp over the fixed 1000-bin score grid — bounded by construction",
    "eval_ndcg_bm25": "position windows over the two 10-row top-k shortlists (post-limit) — bounded by construction",
    "t14_stream_auc": "rank-sum finale over the 1000-row streaming bin snapshot — state bounded by construction",
    "ivf_recall_curve": "centroid list_id numbering over the 16-row post-limit md5 sample — bounded by construction",
    "ivf_tombstone_topk": "centroid list_id numbering over the n_lists-row post-limit md5 sample (inside ivf_centroids) — bounded by construction, same window as ivf_recall_curve",
    "ivf_compact_rebuild": "centroid list_id numbering over the n_lists-row post-limit md5 sample (both quantizers, inside ivf_centroids) — bounded by construction, same window as ivf_recall_curve",
    "t15_stream_survival": "KM finale over the per-user streaming snapshot folded to the distinct-duration table — time-domain-sized",
    "stump_value_split": "cumulative class counts over the fixed 1000-bin score grid — bounded by construction (same family as eval_auc)",
    "quantile_normalize_approx": "pooled cumulative counts over the 256-bucket histogram aggregate — bounded by construction (the sketch that replaces the global sort)",
    "eval_auc_delong": "placement-value cum windows over the fixed 1000-bin score grid — bounded by construction (same family as eval_auc)",
}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    args = ap.parse_args()

    import __spark_entry__ as entry
    from pdf_to_vectordb_etl_spark.session import get_spark

    spark = get_spark(
        app_name="audit_gw", master="local[8]", shuffle_partitions=8
    )
    bad, allowed, skipped, errors = [], [], [], []
    for name, fn in sorted(entry.queries().items()):
        if name in EXEC_HEAVY:
            skipped.append(name)
            continue
        try:
            df = fn(spark, args.sf)
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("simple")
            plan = buf.getvalue()
        except Exception as e:  # noqa: BLE001
            errors.append((name, str(e).splitlines()[0][:100]))
            continue
        for line in plan.splitlines():
            if "WindowGroupLimit" in line or "Window" not in line:
                continue
            # a window is GLOBAL iff its windowspecdefinition has no
            # leading partition columns: spec args before the first
            # "x ASC/DESC" order arg or the specifiedwindowframe
            for spec in re.findall(r"windowspecdefinition\((.*)", line):
                spec_args, depth, cur = [], 0, []
                for ch in spec:
                    if ch == "(":
                        depth += 1
                        cur.append(ch)
                    elif ch == ")":
                        if depth == 0:
                            break
                        depth -= 1
                        cur.append(ch)
                    elif ch == "," and depth == 0:
                        spec_args.append("".join(cur).strip())
                        cur = []
                    else:
                        cur.append(ch)
                if cur:
                    spec_args.append("".join(cur).strip())
                n_part = 0
                for a in spec_args:
                    if (
                        " ASC" in a
                        or " DESC" in a
                        or a.startswith("specifiedwindowframe")
                    ):
                        break
                    n_part += 1
                if n_part == 0:
                    (allowed if name in ALLOWLIST else bad).append(
                        (name, line.strip()[:120])
                    )
                    break
            else:
                continue
            break
    print(f"scanned {len(entry.queries()) - len(skipped)} plans "
          f"({len(skipped)} exec-heavy skipped, pinned separately)")
    for name, why in sorted(ALLOWLIST.items()):
        tag = "PRESENT" if any(n == name for n, _ in allowed) else "absent"
        print(f"ALLOWED  {name}: {why} [{tag}]")
    for name, line in bad:
        print(f"GLOBAL-WINDOW  {name}: {line}")
    for name, err in errors:
        print(f"ERROR  {name}: {err}")
    print(f"\n{len(bad)} unexpected global windows, {len(errors)} errors")
    sys.exit(1 if bad or errors else 0)


if __name__ == "__main__":
    main()
