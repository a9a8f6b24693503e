#!/bin/bash
# Freeze BENCH_scale.json ONE QUERY PER JVM.
#
# A single long-lived JVM timing 30+ queries at two scales accumulates
# JIT/GC/block-manager state, and late-suite rows inherit it — every
# round through r12 had to re-measure "inflated" rows in isolation and
# write attribution comments. This loop makes the isolated measure the
# ONLY measure: each query gets a fresh process (warmup at sf0.01, then
# 1x, then 10x, then untimed row counts), and SPARK_GRAFT_SCALE_MERGE
# folds its row into the artifact. Run with no args to freeze every
# query, or pass query names to re-freeze a subset.
#
# Prereq: sbt compile (classes under target/scala-2.13/classes).
set -euo pipefail
cd "$(dirname "$0")/.."

CP="target/scala-2.13/classes:/opt/spark/jars/*"
OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic \
         sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  OPENS="$OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
JAVA_FLAGS="$OPENS -Xmx${SPARK_DRIVER_MEM:-24g} -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC"

if [ $# -gt 0 ]; then
  QUERIES="$*"
else
  QUERIES=$(SPARK_GRAFT_SCALE_LIST=1 java $JAVA_FLAGS -cp "$CP" graft.ScaleBench 2>/dev/null)
fi

for q in $QUERIES; do
  t0=$(date +%s)
  SPARK_GRAFT_SCALE_ONLY="$q" SPARK_GRAFT_SCALE_MERGE=1 \
    java $JAVA_FLAGS -cp "$CP" graft.ScaleBench >/dev/null 2>&1
  echo "frozen: $q ($(( $(date +%s) - t0 ))s)"
done
echo "artifact: BENCH_scale.json"
