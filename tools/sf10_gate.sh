#!/bin/bash
# The 100x tier as a REPRODUCIBLE gate (round 20, VERDICT r19 item 2).
#
# Round 19 found its two biggest asymptotic bugs (hierarchy rollup 25.8x,
# semantic dedup superlinearity) only at this tier, but the evidence lived
# in ROUNDLOG prose and the tier itself was a /tmp directory. This script
# makes the whole pipeline one target a future round (or judge) can rerun
# and diff:
#   1. regenerate the K=100 tier from the driver's sf0.1 fixtures with
#      scale_gen's full integrity gate (PK/FK closure, doc-length law,
#      suffix-free cross-replica vocab disjointness, embedding norms),
#   2. bench the 30-query scale-sensitive subset (the operators whose
#      cost is corpus-grain: dedup/substring/BPE/hierarchy/ANN/joins),
#   3. oracle-verify the DuckDB-tractable slice of that subset at sf10
#      (the trained-index chains are excluded: a K=391 Lloyd unroll over
#      200k vectors is days of DuckDB list-lambda wall, not evidence).
#
# Artifacts (committed): SCALE_${ROUND}_sf10_integrity.log,
# bench_sf10_${ROUND}.json, SCALE_${ROUND}_sf10_oracle.log.
set -euo pipefail
cd "$(dirname "$0")/.."

K=${K:-100}
SRC=${SRC:-/root/testdata/sf0.1}
DIR=${SF10_DIR:-/tmp/graft_sf10}
ROUND=${ROUND:-r20}
CPUS=${CPUS:-32}

# scale-sensitive bench subset: 30 queries, corpus-grain cost
BENCH_QUERIES="q_agg_pricing_summary,q_join_shuffle_fact,q_join_range_followers,q_join_range_outer,q_window_latest_state,q_sort_topk_global,q_hierarchy_closure,q_hierarchy_rollup,q_hierarchy_paths,q_dedup_exact,q_dedup_minhash_lsh,q_dedup_semantic,q_substring_dedup,q_substring_dedup_hashed,q_cdc_chunks,q_cdc_chunk_gc,q_token_ids,q_tokens_per_doc,q_bpe_pairs,q_bpe_train,q_bpe_fertility,q_text_termfreq,q_text_tfidf,q_sim_knn_ivf2,q_sim_knn_filtered,q_ann_eval,q_graph_kcore,q_pack_manifest,q_span_scrub,q_profile_lineitem"

# DuckDB-tractable oracle slice (11 queries; linear-ish mirrors)
ORACLE_QUERIES="q_agg_pricing_summary,q_join_shuffle_fact,q_window_latest_state,q_hierarchy_rollup,q_dedup_exact,q_substring_dedup_hashed,q_tokens_per_doc,q_text_termfreq,q_join_range_outer,q_sort_topk_global,q_dedup_minhash_lsh"

echo "=== [1/3] regenerate sf10 tier (K=$K) + integrity gate ==="
python3 tools/scale_gen.py "$K" "$SRC" "$DIR" | tee "SCALE_${ROUND}_sf10_integrity.log"

echo "=== [2/3] 30-query scale-sensitive bench ==="
SPARK_GRAFT_SF_DIR="$DIR" SPARK_GRAFT_CPUS="$CPUS" \
  SPARK_GRAFT_BENCH_OUT="bench_sf10_${ROUND}.json" \
  sbt -batch "runMain graft.Bench $BENCH_QUERIES" | tail -1

echo "=== [3/3] sf10 oracle spot-check (budget ${ORACLE_BUDGET_SEC:-900}s/query) ==="
SPARK_GRAFT_CPUS="$CPUS" \
  sbt -batch "runMain graft.Verify $DIR /tmp/verify_sf10_${ROUND} $ORACLE_QUERIES"
ORACLE_BUDGET_SEC="${ORACLE_BUDGET_SEC:-900}" \
  python3 tools/oracle_check.py "$DIR" "/tmp/verify_sf10_${ROUND}" \
  | tee "SCALE_${ROUND}_sf10_oracle.log"

echo "sf10 gate complete: SCALE_${ROUND}_sf10_integrity.log bench_sf10_${ROUND}.json SCALE_${ROUND}_sf10_oracle.log"
