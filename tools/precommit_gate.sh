#!/usr/bin/env bash
# The full local correctness gate — run before any commit that touches
# queries, oracles, or operators. Mirrors what the driver grades plus
# the two surfaces the driver can't see (second SF, degenerate data):
# 274 of the 324 registry queries are NOT in the driver's fixed 50-key
# snapshot, so this script is the only thing standing between an edit
# to one of them and a silently-shipped regression.
#
# Usage: tools/precommit_gate.sh [quick|full-sf01]
#   quick     — sf0.01 registry + pytest only (inner-loop edits);
#   full-sf01 — launch the ~17-min sf0.1 full-registry sweep DETACHED
#               (nohup; outlives tool timeouts) and exit; log + verdict
#               land in /tmp/sweep_sf01.log — REQUIRED whenever a new
#               rounded aggregate or oracle lands (sf0.1 rolls
#               different rounding-boundary dice than the small
#               fixtures; caught 2 real splits in r6);
#   default runs all three SFs + the global-window audit.
set -euo pipefail
cd "$(dirname "$0")/.."

if [[ "${1:-full}" == "full-sf01" ]]; then
  echo "== detaching sf0.1 full-registry sweep (~17 min) =="
  nohup python tools/check_oracle.py --sf /root/testdata/sf0.1 \
    > /tmp/sweep_sf01.log 2>&1 &
  echo "pid $! — tail -1 /tmp/sweep_sf01.log for the verdict"
  exit 0
fi

echo "== oracle gate @ sf0.01 =="
python tools/check_oracle.py

echo "== pytest =="
python -m pytest tests/ -q

if [[ "${1:-full}" != "quick" ]]; then
  echo "== oracle gate @ sf0.001 (different rounding-boundary dice) =="
  python tools/check_oracle.py --sf /root/testdata/sf0.001

  echo "== degenerate sweep (1-row tables, ties, zero vectors) =="
  python tools/make_degenerate.py
  python tools/check_oracle.py --sf /tmp/spark_graft_degenerate

  echo "== seed-randomized fixture sweep (fresh rounding dice) =="
  # a NEW seed every run: r6/r7 caught a real cross-engine split on
  # every fresh dataset; the seed is printed so a catch reproduces
  python tools/make_random_fixture.py
  python tools/check_oracle.py --sf /tmp/spark_graft_randfix

  echo "== distributed NN-descent path (driver fast path disabled) =="
  # the ≤16k-node driver fast path serves every fixture, so without
  # this the distributed local-join loop would never run at gate time
  # and could rot; same oracle hash must hold on both paths.
  # SPARK_GRAFT_NN_FASTPATH=0 disables BOTH the build and the r10
  # beam-probe fast paths, so this one sweep exercises the full
  # distributed serving plan too.
  # FASTPATH=0 exercises the hop-FUSED distributed beam probe (BSP,
  # r11); adding NN_BSP=0 exercises the per-hop join cascade — the
  # final fallback when the index artifact exceeds the broadcast caps.
  SPARK_GRAFT_NN_FASTPATH=0 python tools/check_oracle.py \
    --sf /root/testdata/sf0.001 ann_nndescent_recall
  SPARK_GRAFT_NN_FASTPATH=0 SPARK_GRAFT_NN_BSP=0 python tools/check_oracle.py \
    --sf /root/testdata/sf0.001 ann_nndescent_recall ann_tombstone_search

  echo "== distributed merge-loop path (driver fast path disabled) =="
  # same contract for the r10 tokenizer-training fast path: the
  # distributed argmax/rewrite loop must keep producing the identical
  # merge table (count argmax AND likelihood argmax)
  SPARK_GRAFT_MERGE_FASTPATH=0 python tools/check_oracle.py \
    --sf /root/testdata/sf0.001 bpe_bytelevel_train wordpiece_train

  echo "== distributed Bradley-Terry MM path (driver fast path disabled) =="
  SPARK_GRAFT_BT_FASTPATH=0 python tools/check_oracle.py \
    --sf /root/testdata/sf0.001 bradley_terry

  echo "== distributed K-NN Shapley path (driver fast path disabled) =="
  SPARK_GRAFT_SHAPLEY_FASTPATH=0 python tools/check_oracle.py \
    --sf /root/testdata/sf0.001 knn_shapley

  echo "== distributed unigram-LM paths (driver fast path disabled) =="
  SPARK_GRAFT_UNIGRAM_FASTPATH=0 python tools/check_oracle.py \
    --sf /root/testdata/sf0.001 unigram_lm_train unigram_lm_encode

  echo "== global-window audit =="
  python tools/audit_global_windows.py
fi

echo "== gate PASSED =="
