#!/usr/bin/env bash
# Round-12 measurement protocol: the refresh-scale decade table (verdict
# item 2, carried from rounds 10 and 11).
#
# Claim under test: merging a FIXED-SIZE ingest shard (20k docs) into a
# standing cluster index costs ~shard work, not corpus work, as the
# corpus grows 100x (sf0.1 -> sf10). RefreshScale's setup (corpus
# fingerprints / signatures / word sets + base index) is UNTIMED — those
# are stored columns in the lakehouse regime; the timed region is
# exactly the per-ingest-batch refresh, 3 in-JVM reps (rep 1 carries
# JIT; steady_median is over reps 2+).
#
# NEVER run sbt while this script runs (recompilation wipes
# target/scala-2.13/classes and the JVMs die mid-run).
set -euo pipefail
REPO="$(cd "$(dirname "$0")/.." && pwd)"
OUT="$REPO/target/soak_r12"
mkdir -p "$OUT"

export SPARK_GRAFT_SHARD=20000
export SPARK_GRAFT_BENCH_REPS=3

for algo in simhash minhash; do
  for sf in sf0.1 sf1 sf3 sf10; do
    dir=/root/testdata/sf0.1; [ "$sf" != sf0.1 ] && dir="$REPO/target/$sf"
    echo "[soak_r12] refresh_scale $algo @ $sf ..."
    SPARK_GRAFT_SF_DIR="$dir" SPARK_GRAFT_ALGO="$algo" \
      "$REPO/tools/runmain.sh" graft.RefreshScale \
      >"$OUT/refresh_${algo}_${sf}.json" 2>"$OUT/refresh_${algo}_${sf}.log" \
      || echo "[soak_r12] FAILED: $algo @ $sf (see log)"
  done
done

echo "[soak_r12] done"
grep -h . "$OUT"/refresh_*.json || true

# --- appended after the first pass ran: the rest of the round-12 protocol ---
# (kept here for reproducibility; raw results live in perf/soak_r12/)
#
# 2k-doc shard, 166x corpus decade incl. sf0.1:
#   SPARK_GRAFT_SHARD=2000 + the same algo/sf loops as above
#     -> refresh2k_<algo>_<sf>.json
# Streaming maintenance A/B (per-batch wall + retained storage):
#   SPARK_GRAFT_SF_DIR=target/sf1 SPARK_GRAFT_BATCHES=48 tools/runmain.sh graft.IndexMaintScale
#   SPARK_GRAFT_SF_DIR=target/sf1 SPARK_GRAFT_BATCHES=48 SPARK_GRAFT_MODE=maint \
#     SPARK_GRAFT_COMPACT_EVERY=8 tools/runmain.sh graft.IndexMaintScale
#   SPARK_GRAFT_SF_DIR=target/sf3 SPARK_GRAFT_BATCHES=24 tools/runmain.sh graft.IndexMaintScale
# Two-JVM durable-cache smoke:
#   tools/index_cache_smoke.sh
