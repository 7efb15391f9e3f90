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
