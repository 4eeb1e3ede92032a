#!/usr/bin/env bash
# Round-12 scale ladder: 1x/10x/30x/100x/300x replicas of sf0.1, full
# Bench per rung (headline + ext ops incl. the round-12 roster), detail
# JSON per rung. ONE session config at every rung: SPARK_GRAFT_AQE=1
# (AQE coalescing from a high initial partition count).
#
# Corpora are REGENERATED this round: ScaleGen now plants hour-of-week
# seasonality spikes (monitor family output-bearing at every rung) and
# the generated documents carry media piles (phash near-dups by
# construction) — each rung's gen step runs right before its bench.
#
# Rung ORDER is by value density, not size: 1x first (quiet box, the
# rung compared to the driver artifact), then 300x (the round's
# headline deliverable: ann_dedup_pair_stats unskipped), then
# 100x/30x/10x. Each rung is its own JVM, so order does not affect
# comparability.
#
# 300x recipe (round-10 lessons): -Xmx100g, periodic cleaner GC 3min,
# 4g driver result cap. Skip ONLY the intrinsically
# replication-quadratic pair-LISTING op (its collect is ~87M rows x 7
# passes); ann_dedup_pair_stats now aggregates IN-PASS inside the
# per-cell scan (round-12 fix) and runs UNSKIPPED, alongside
# ann_dedup_reps and ann_dedup_cluster_hist (the round-11 fixes).
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

log() { echo "[ladder12 $(date +%H:%M:%S)] $*"; }

gen() { # factor dir mem
  local factor="$1" dir="$2" mem="$3"
  log "scalegen ${factor}x -> $dir"
  $JAVA "-Xmx$mem" graft.ScaleGen /root/testdata/sf0.1 "$dir" "$factor" \
    > "/root/scale/r12_gen_${factor}x.log" 2>&1
  log "scalegen ${factor}x rc=$?"
}

bench() { # dir label mem extra_jvm...
  local dir="$1" label="$2" mem="$3"; shift 3
  log "bench $label (mem $mem)"
  SPARK_GRAFT_SF_DIR="$dir" SPARK_GRAFT_CPUS=32 SPARK_GRAFT_AQE=1 \
  SPARK_GRAFT_BENCH_OUT="/root/scale/r12_bench_$label.json" \
    $JAVA "-Xmx$mem" "$@" graft.Bench > "/root/scale/r12_bench_$label.log" 2>&1
  log "bench $label rc=$? tail: $(tail -c 300 /root/scale/r12_bench_$label.json 2>/dev/null)"
}

bench /root/testdata/sf0.1 1x 8g

gen 300 /root/scale/x300 32g
export SPARK_GRAFT_BENCH_SKIP=ann_lsh_dedup_pairs
bench /root/scale/x300 300x 100g -Dspark.cleaner.periodicGC.interval=3min -Dspark.driver.maxResultSize=4g
unset SPARK_GRAFT_BENCH_SKIP

gen 100 /root/scale/x100 24g
bench /root/scale/x100 100x 48g
gen 30 /root/scale/x30 16g
bench /root/scale/x30  30x  24g
gen 10 /root/scale/x10 16g
bench /root/scale/x10  10x  16g

log "assembling docs/BENCH_SCALE.json"
: > docs/BENCH_SCALE.json
for r in 1x 10x 30x 100x 300x; do
  [ -f "/root/scale/r12_bench_$r.json" ] && cat "/root/scale/r12_bench_$r.json" >> docs/BENCH_SCALE.json
done
log "DONE"
