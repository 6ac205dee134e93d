#!/bin/bash
# Write-stage lab: run the e2e job once with extra confs, then print the
# stage profile. Usage: write_lab.sh <cpus> <n_conv> <tag> [extra --conf args...]
set -e
CPUS=$1; NCONV=$2; TAG=$3; shift 3
HERE=/root/repo
WH=/dev/shm/wh_lab_${CPUS}_${TAG}
EV=/tmp/spark-events/lab_${CPUS}_${TAG}
rm -rf $WH $EV; mkdir -p $EV
spark-submit --master local[$CPUS] \
  --driver-memory ${SPARK_GRAFT_DRIVER_MEM:-16g} \
  --conf spark.sql.shuffle.partitions=$((4*CPUS)) \
  --conf spark.ui.enabled=false \
  --conf spark.sql.adaptive.enabled=true \
  --conf spark.sql.adaptive.skewJoin.enabled=true \
  --conf spark.sql.adaptive.coalescePartitions.enabled=false \
  --conf spark.local.dir=/dev/shm/spark-local \
  --conf "spark.driver.extraJavaOptions=-XX:+UseParallelGC" \
  --conf spark.sql.parquet.compression.codec=zstd \
  --conf spark.hadoop.mapreduce.fileoutputcommitter.algorithm.version=2 \
  --conf spark.eventLog.enabled=true \
  --conf spark.eventLog.dir=$EV \
  --conf spark.eventLog.compress=false \
  "$@" \
  --py-files $HERE/dist/logging_spark.zip \
  $HERE/run_job.py --warehouse $WH \
  --input-parquet /dev/shm/bench_input_${NCONV}/turns \
  --lookup-parquet /dev/shm/bench_input_${NCONV}/lookup \
  --n-conversations $NCONV --turns-per-conv 100 --num-buckets 32 \
  --snapshot lab-$CPUS-$TAG --write-partitions 128 2>/dev/null | tail -1
rm -rf $WH
python $HERE/tools/stage_profile.py $EV
