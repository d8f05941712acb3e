#!/bin/bash
# Per-phase profile of the suite under the EXACT scaling-bench setup
# (taskset pin + ActiveProcessorCount + tmpfs shuffle dirs), at one
# core count. Usage: scripts/run_profile.sh <cores> [n_rows]
set -e
CORES=$1
N=${2:-20000000}
REPO=$(cd "$(dirname "$0")/.." && pwd)
SHM=/dev/shm/dcs-profile-$CORES
mkdir -p "$SHM"
trap 'rm -rf "$SHM"' EXIT
taskset -c 0-$((CORES-1)) spark-submit \
  --master "local[$CORES]" \
  --driver-memory 16g \
  --conf "spark.driver.extraJavaOptions=-XX:ActiveProcessorCount=$CORES" \
  --conf "spark.local.dir=$SHM" \
  --py-files "$REPO/build/dcs.zip" \
  "$REPO/scripts/profile_suite.py" "$CORES" \
  "$REPO/build/pages_$N.parquet" "$REPO/build/pages_v2_$N.parquet" 2>/dev/null | grep '^{'
