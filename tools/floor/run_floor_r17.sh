#!/bin/bash
# Isolated per-query floor protocol, r17 extension (SCALE.md r12/r15
# recipe): one fresh JVM per query, min-of-N inside that JVM, 32 cpus,
# sf0.1. java-direct off a class snapshot (no sbt lock), with the same
# --add-opens set build.sbt forks with.
#
#   run_floor_r17.sh <classdir> <outfile> <reps> <query...>
#
# r17 additions: every query that has ever appeared in a driver
# `slowest` map gets a floor row (min-of-6), and the three r16 readings
# above the 1.5x floor band get a 12-rep adjudication run.
set -u
CLASSES=$1; OUT=$2; REPS=$3; shift 3
ADDOPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic \
         sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  ADDOPENS="$ADDOPENS --add-opens java.base/$p=ALL-UNNAMED"
done
: > "$OUT"
for q in "$@"; do
  echo "=== $q ===" >> "$OUT"
  SPARK_GRAFT_BENCH_REPS=$REPS SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
  SPARK_GRAFT_CPUS=32 \
    java $ADDOPENS -Xmx16g -Dspark.ui.enabled=false \
      -cp "$CLASSES:/opt/spark/jars/*" graft.Bench "$q" 2>/dev/null \
    | grep -o '{"metric".*}' >> "$OUT"
done
echo DONE >> "$OUT"
