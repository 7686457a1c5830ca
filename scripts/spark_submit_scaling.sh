#!/usr/bin/env bash
# North-rule scaling evidence via spark-submit (the cluster-style launch
# path): package the library once, then run the SAME job at N and 4N cores
# on the SAME prebuilt artifact. On a real cluster the two invocations set
# --num-executors N / 4N instead of --master local[k]; nothing else changes.
#
# Usage: scripts/spark_submit_scaling.sh [sites] [pagesPerSite]
set -euo pipefail
cd "$(dirname "$0")/.."

sbt -batch package
JAR=$(ls target/scala-2.13/paracosmspark_*.jar | head -1)

run() { # cores
  SCALE_SITES="${1:-80000}" SCALE_PPS="${2:-1000}" SCALE_SCHEDULE="$3" \
  /opt/spark/bin/spark-submit \
    --master "local[$4]" \
    --driver-memory "${SPARK_DRIVER_MEM:-48g}" \
    --conf spark.sql.shuffle.partitions=64 \
    --conf spark.sql.adaptive.enabled=false \
    --conf spark.ui.enabled=false \
    --class graft.BenchScalingOnly "$JAR"
}

# one process per level would rebuild the artifact; BenchScalingOnly already
# interleaves levels in-process over one artifact, so a single submit runs
# the full N-vs-4N protocol:
SCALE_SITES="${1:-80000}" SCALE_PPS="${2:-1000}" \
/opt/spark/bin/spark-submit \
  --master 'local[32]' \
  --driver-memory "${SPARK_DRIVER_MEM:-48g}" \
  --conf spark.ui.enabled=false \
  --class graft.BenchScalingOnly "$JAR"
