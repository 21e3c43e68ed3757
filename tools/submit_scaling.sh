#!/usr/bin/env bash
# North-rule deployment shape: the identical job submitted via
# spark-submit --py-files at two parallelism levels (N and 4N cores).
# On a real cluster replace --master local[N] with the cluster master
# and N/4N executors; here cores are additionally OS-pinned (taskset)
# so "N cores" is real, not just N task slots.
#
# Usage: tools/submit_scaling.sh [N_URLS] [ROUNDS]
set -euo pipefail
cd "$(dirname "$0")/.."
N_URLS="${1:-200000}"; ROUNDS="${2:-2}"

PKG_ZIP=$(mktemp -u /tmp/tc_spark_pkg_XXXX.zip)
(cd . && zip -qr "$PKG_ZIP" topicalcrawler_spark -i '*.py')

run_level() {
  local CORES=$1 CPULIST=$2 OUT=$3
  # --driver-memory must be a submit arg (the JVM exists before any
  # in-session config applies; the 1g default OOMs a 300k-URL crawl).
  # UseAVX=2: this sandbox's virtualized AVX-512 segfaults the JIT's
  # avx3 arraycopy stubs (hs_err in jlong_disjoint_arraycopy_avx3).
  taskset -c "$CPULIST" spark-submit \
    --master "local[$CORES]" \
    --py-files "$PKG_ZIP" \
    --driver-memory 8g \
    --conf spark.sql.shuffle.partitions=$((CORES*2)) \
    --conf spark.sql.session.timeZone=UTC \
    --conf "spark.driver.extraJavaOptions=-XX:UseAVX=2" \
    tools/scaling_run.py "$CORES" "$N_URLS" "$ROUNDS" > "$OUT"
  echo "cores=$CORES -> $OUT"; cat "$OUT"
}

run_level 4 0-3 /tmp/submit_scaling_4.json
run_level 1 0   /tmp/submit_scaling_1.json
