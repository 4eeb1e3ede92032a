#!/usr/bin/env bash
# Round-11 scale ladder: 1x/10x/30x/100x/300x replicas of sf0.1, full
# Bench per rung (headline + ext ops incl. the round-11 roster), detail
# JSON per rung. ONE session config at every rung: SPARK_GRAFT_AQE=1
# (AQE coalescing from a high initial partition count) replaces the
# per-rung SPARK_GRAFT_SHUFFLE guesswork.
#
# Rung ORDER is by value density, not size: 1x first (quiet box, it is
# the rung compared to the driver artifact), then 300x (the round's
# headline deliverable: ann_dedup_reps unskipped), then 100x/30x/10x.
# Each rung is its own JVM, so order does not affect comparability.
#
# 300x recipe (round-10 lessons): -Xmx100g, periodic cleaner GC 3min,
# 4g driver result cap. Skip ONLY the two intrinsically
# replication-quadratic pair-GRAIN ops (the LISTING op whose collect is
# ~87M rows x 7 passes, and the stats rollup over the same pair compute,
# probed at 352 s/run this round — 7 bench passes would add ~41 min for
# one number already committed as a single-run probe). ann_dedup_reps
# and ann_dedup_cluster_hist run UNSKIPPED at 300x — the round-11 fix.
set -uo pipefail
cd /root/repo

ADD_OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic \
         sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
CP="/root/repo/target/scala-2.13/classes:/opt/spark/jars/*"
JAVA="java $ADD_OPENS -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC -cp $CP"

log() { echo "[ladder11 $(date +%H:%M:%S)] $*"; }

bench() { # dir label mem extra_jvm...
  local dir="$1" label="$2" mem="$3"; shift 3
  log "bench $label (mem $mem)"
  SPARK_GRAFT_SF_DIR="$dir" SPARK_GRAFT_CPUS=32 SPARK_GRAFT_AQE=1 \
  SPARK_GRAFT_BENCH_OUT="/root/scale/r11_bench_$label.json" \
    $JAVA "-Xmx$mem" "$@" graft.Bench > "/root/scale/r11_bench_$label.log" 2>&1
  log "bench $label rc=$? tail: $(tail -c 300 /root/scale/r11_bench_$label.json 2>/dev/null)"
}

bench /root/testdata/sf0.1 1x 8g

export SPARK_GRAFT_BENCH_SKIP=ann_lsh_dedup_pairs,ann_dedup_pair_stats
bench /root/scale/x300 300x 100g -Dspark.cleaner.periodicGC.interval=3min -Dspark.driver.maxResultSize=4g
unset SPARK_GRAFT_BENCH_SKIP

bench /root/scale/x100 100x 48g
bench /root/scale/x30  30x  24g
bench /root/scale/x10  10x  16g

log "assembling docs/BENCH_SCALE.json"
: > docs/BENCH_SCALE.json
for r in 1x 10x 30x 100x 300x; do
  [ -f "/root/scale/r11_bench_$r.json" ] && cat "/root/scale/r11_bench_$r.json" >> docs/BENCH_SCALE.json
done
log "DONE"
