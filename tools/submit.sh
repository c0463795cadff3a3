#!/usr/bin/env bash
# Production launch template: the same pipelines the sandbox drives via
# `sbt -batch runMain` submitted to a real multi-executor cluster. The
# sandbox's local[N] runs are the single-node proxy for exactly this
# invocation (BENCH.md documents the N→4N scaling evidence).
#
# Usage: tools/submit.sh <main-class> [args...]
#   e.g. tools/submit.sh graft.Bench
#   maintenance between micro-batches (deferred compaction / GC / evolution):
#     tools/submit.sh graft.Maintain s3a://bucket/tables/snapshots compact
#     tools/submit.sh graft.Maintain s3a://bucket/tables/snapshots rebucket 1024
#     tools/submit.sh graft.Maintain s3a://bucket/tables/snapshots stats
#        tools/submit.sh graft.ScalingBench 32
#
# Sizing rationale (100-TB deployment):
#  - shuffle/state partitions: fixed at launch (state checkpoints bake
#    the layout in); pick ~2-3x total executor cores so AQE can coalesce
#    down but skew splits still have room. The streaming job CANNOT
#    change this after the first checkpoint — size for the target
#    cluster, not the bootstrap one.
#  - maxPartitionBytes 256m keeps scan tasks near the sweet spot for
#    bucketed parquet; AQE advisory size matches.
#  - ObjectHashAggregate fallback raised: the snapshot fold's max_by
#    aggregates degrade to sort-agg at the default 4096 groups/partition.
#  - RocksDB state store for the fMGWS fold: heap state stores OOM at
#    10^8+ live conversations per executor share.
set -euo pipefail
MAIN="${1:?main class, e.g. graft.Bench}"; shift || true

: "${SPARK_HOME:?point SPARK_HOME at a Spark 4.x distribution}"
: "${GRAFT_JAR:?sbt package output, e.g. target/scala-2.13/znapspark_2.13-0.1.jar}"
: "${EXECUTORS:=128}"
: "${EXECUTOR_CORES:=8}"
: "${EXECUTOR_MEM:=28g}"   # stay under the ~32g CompressedOops cliff (see tools/scaling.sh)

exec "$SPARK_HOME/bin/spark-submit" \
  --class "$MAIN" \
  --master "${SPARK_MASTER:-yarn}" \
  --deploy-mode cluster \
  --num-executors "$EXECUTORS" \
  --executor-cores "$EXECUTOR_CORES" \
  --executor-memory "$EXECUTOR_MEM" \
  --conf spark.sql.shuffle.partitions=$(( EXECUTORS * EXECUTOR_CORES * 2 )) \
  --conf spark.sql.session.timeZone=UTC \
  --conf spark.sql.adaptive.enabled=true \
  --conf spark.sql.adaptive.skewJoin.enabled=true \
  --conf spark.sql.files.maxPartitionBytes=256m \
  --conf spark.sql.adaptive.advisoryPartitionSizeInBytes=256m \
  --conf spark.sql.objectHashAggregate.sortBased.fallbackThreshold=10000000 \
  --conf spark.sql.streaming.stateStore.providerClass=org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider \
  --conf spark.serializer=org.apache.spark.serializer.KryoSerializer \
  "$GRAFT_JAR" "$@"
