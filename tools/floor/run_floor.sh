#!/bin/bash
# Isolated per-query floor protocol (SCALE.md r12/r15 recipe):
# one fresh JVM per query, min-of-6 inside that JVM, 32 cpus, sf0.1.
cd /root/repo
OUT=/root/repo/tools/floor/floor_raw_r16.txt
: > "$OUT"
QUERIES="m1_update_forecast corpus_pipeline m1_auto_order bpe_vocab_drift bpe_learn text_dialogue_chains bpe_learn_by_lang incremental_refresh ann_graph_recall bpe_vocab_roundtrip dedup_pagerank dedup_lsh_recall"
for q in $QUERIES; do
  echo "=== $q ===" >> "$OUT"
  SPARK_GRAFT_BENCH_REPS=6 SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
    sbt -batch "runMain graft.Bench $q" 2>/dev/null | grep -o '{"metric".*}' >> "$OUT"
done
echo DONE >> "$OUT"
