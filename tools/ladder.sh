#!/usr/bin/env bash
# Round-15 scale ladder: 1x/10x/30x/100x/300x replicas of sf0.1 with
# dim-scaled dimensions (dimFactor=factor), full Bench per rung, ONE
# session config at every rung: SPARK_GRAFT_AQE=1.
#
# Round-15 changes vs the round-14 script — all process hygiene, the
# r14 post-mortem (the ladder ran into the end-of-round driver gate,
# its 24g pinned JVM got the driver's Verify/Bench OOM-killed, and the
# round's artifacts came out empty):
#   - LOCK + TRAP: one ladder at a time (flock on /tmp/graft_ladder
#     .lock); on EXIT/TERM/INT every child JVM of this script is
#     killed, so an interrupted ladder can never leave a pinned
#     pre-touched JVM squatting on the box.
#   - DEADLINE: GRAFT_LADDER_DEADLINE (epoch seconds; default now+4h).
#     No new gen/prebuild/bench phase STARTS past the deadline, and a
#     watchdog kills the whole process group shortly after it — the
#     ladder structurally cannot run into the round snapshot.
#   - DISK HEADROOM: each phase checks `df --output=avail` first and
#     skips (recording why) when the margin is gone — an ENOSPC'd
#     rung burns hours and banks -1s (r14 lost dedup_exact /
#     dedup_minhash_lsh / triangle_doulion_copurchase medians to two
#     ENOSPC windows).
#   - PREBUILD PHASE: every store (warehouse, copurchase, bpe_vocab,
#     bm25, ivf/pq) builds in a DEDICATED JVM (graft.Prebuild) before
#     the bench JVM starts — build-time shuffle/spill is force-freed
#     at process exit instead of coexisting with timed queries' disk
#     peaks (the r14 ENOSPC mechanism).
#   - GEN SENTINEL CARRIES ARGS: _GEN_OK records "factor:dimFactor";
#     reuse only on exact match, and a failed gen (rc!=0) never writes
#     the sentinel, so a partial corpus is regenerated, not benched.
#
# Carried discipline: roster by tag (SPARK_GRAFT_BENCH_SKIP_CLASS=
# listing at 300x only), frozen classpath (classes snapshotted before
# the first rung), progressive commits (each rung reassembles
# docs/BENCH_SCALE.json and commits), pinned pre-touched heaps on
# judged JVMs, zstd shuffle compression, nothing else foreground.
set -uo pipefail
cd /root/repo

exec 9>/tmp/graft_ladder.lock
if ! flock -n 9; then echo "another ladder holds the lock; refusing"; exit 1; fi

DEADLINE="${GRAFT_LADDER_DEADLINE:-$(( $(date +%s) + 4*3600 ))}"
# watchdog: whatever happens, nothing of ours survives 10min past the deadline
( while [ "$(date +%s)" -lt $(( DEADLINE + 600 )) ]; do sleep 30; done
  pkill -TERM -f 'graft\.(Bench|BenchExt|Prebuild|ScaleGen|Verify)' ) &
WATCHDOG=$!
cleanup() {
  pkill -TERM -P $$ 2>/dev/null
  kill "$WATCHDOG" 2>/dev/null
  pkill -TERM -f 'graft\.(Bench|BenchExt|Prebuild|ScaleGen)' 2>/dev/null
}
trap cleanup EXIT TERM INT

log() { echo "[ladder15 $(date +%H:%M:%S)] $*"; }

time_left() { # phase gate: false once past the deadline
  [ "$(date +%s)" -lt "$DEADLINE" ]
}

disk_ok() { # min GiB available on /root
  local need_gib="$1"
  local avail_kib; avail_kib=$(df --output=avail /root | tail -1 | tr -d ' ')
  if [ "$avail_kib" -lt $(( need_gib * 1024 * 1024 )) ]; then
    log "SKIP: only $(( avail_kib / 1024 / 1024 )) GiB free, need ${need_gib}"
    return 1
  fi
}

SNAP=/root/scale/classes_r15
mkdir -p /root/scale
rm -rf "$SNAP"
cp -r /root/repo/target/scala-2.13/classes "$SNAP"

ADD_OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic \
         sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
CP="$SNAP:/opt/spark/jars/*"
JAVA="java $ADD_OPENS -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC -Dspark.io.compression.codec=zstd -cp $CP"

assemble_and_commit() { # label
  : > docs/BENCH_SCALE.json
  for r in 1x 10x 30x 100x 300x; do
    [ -f "/root/scale/r15_bench_$r.json" ] && cat "/root/scale/r15_bench_$r.json" >> docs/BENCH_SCALE.json
  done
  git add docs/BENCH_SCALE.json
  git commit -q -m "Bank the ${1} scale-ladder rung (dim-scaled, sequenced store builds)" || true
  log "committed rung ${1}"
}

gen() { # factor dir mem need_gib
  local factor="$1" dir="$2" mem="$3" need="$4"
  local want="${factor}:${factor}"
  if [ -f "$dir/_GEN_OK" ] && [ "$(cat "$dir/_GEN_OK")" = "$want" ]; then
    log "reuse existing $dir (sentinel $want)"; return 0
  fi
  time_left || { log "SKIP gen ${factor}x: past deadline"; return 1; }
  disk_ok "$need" || return 1
  rm -rf "$dir"
  log "scalegen ${factor}x (dims ${factor}x) -> $dir"
  $JAVA "-Xms$mem" "-Xmx$mem" -XX:+AlwaysPreTouch graft.ScaleGen /root/testdata/sf0.1 "$dir" "$factor" "$factor" \
    > "/root/scale/r15_gen_${factor}x.log" 2>&1
  local rc=$?
  if [ $rc -eq 0 ]; then echo "$want" > "$dir/_GEN_OK"; else
    log "scalegen ${factor}x FAILED rc=$rc — corpus NOT benchable"; return 1; fi
}

prebuild() { # dir mem extra_jvm...
  local dir="$1" mem="$2"; shift 2
  time_left || { log "SKIP prebuild: past deadline"; return 1; }
  log "prebuild stores for $dir (mem $mem)"
  SPARK_GRAFT_SF_DIR="$dir" SPARK_GRAFT_CPUS=32 SPARK_GRAFT_AQE=1 \
    $JAVA "-Xms$mem" "-Xmx$mem" -XX:+AlwaysPreTouch "$@" graft.Prebuild "$dir" \
    > "/root/scale/r15_prebuild_$(basename "$dir").log" 2>&1
  local rc=$?
  log "prebuild rc=$rc: $(grep '\[prebuild\]' "/root/scale/r15_prebuild_$(basename "$dir").log" | tail -2 | tr '\n' ' ')"
  return $rc
}

bench() { # dir label mem need_gib extra_jvm...
  local dir="$1" label="$2" mem="$3" need="$4"; shift 4
  time_left || { log "SKIP bench $label: past deadline"; return 1; }
  disk_ok "$need" || return 1
  prebuild "$dir" "$mem" "$@" || log "prebuild $label imperfect; bench will rebuild inline"
  time_left || { log "SKIP bench $label: past deadline"; return 1; }
  log "bench $label (mem $mem)"
  SPARK_GRAFT_SF_DIR="$dir" SPARK_GRAFT_CPUS=32 SPARK_GRAFT_AQE=1 \
  SPARK_GRAFT_BENCH_OUT="/root/scale/r15_bench_$label.json" \
    $JAVA "-Xms$mem" "-Xmx$mem" -XX:+AlwaysPreTouch "$@" graft.Bench > "/root/scale/r15_bench_$label.log" 2>&1
  log "bench $label rc=$? tail: $(tail -c 300 /root/scale/r15_bench_$label.json 2>/dev/null)"
  assemble_and_commit "$label"
}

# 1x: re-bench only if this launch doesn't already have a banked 1x
# result (the rung was banked earlier in the round; /root/scale is
# wiped between sessions, so the launcher seeds r15_bench_1x.json from
# docs/BENCH_SCALE.json to keep assemble_and_commit from dropping it).
[ -f /root/scale/r15_bench_1x.json ] || bench /root/testdata/sf0.1 1x 8g 10

# 300x first: the rung that owes medians (r14 banked -1 for dedup_exact,
# dedup_minhash_lsh, triangle_doulion_copurchase) and the one the q01/
# q08 gate + q07 collapse changes target.
gen 300 /root/scale/x300 48g 60 || true
if [ -f /root/scale/x300/_GEN_OK ]; then
  export SPARK_GRAFT_BENCH_SKIP_CLASS=listing
  bench /root/scale/x300 300x 100g 40 -Dspark.cleaner.periodicGC.interval=2min -Dspark.driver.maxResultSize=4g
  unset SPARK_GRAFT_BENCH_SKIP_CLASS
fi

gen 100 /root/scale/x100 24g 25 && bench /root/scale/x100 100x 48g 20
gen 30  /root/scale/x30  16g 10 && bench /root/scale/x30  30x  24g 10
gen 10  /root/scale/x10  12g  5 && bench /root/scale/x10  10x  16g  5

log "DONE"
