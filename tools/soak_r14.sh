#!/usr/bin/env bash
# Round-14 measurement protocol:
#  1. Span-family decade soak (r13 verdict #4): text_dup_spans /
#     text_span_cut isolated 3-rep walls at sf0.1 / sf1 / sf10 (one JVM
#     per cell) — the hash-keyed shapes' scaling slope, now with 128-bit
#     keys.
#  2. Greedy-packing shard scaling (r13 verdict #2): ShuffleProbe on
#     pack_greedy at sf10 with graft.pack.shards in {1, 8, 64} — the
#     streaming fold must hold per-task memory flat and keep working at
#     the degenerate one-shard extreme (whole corpus through one task).
#  3. ANN standing index, warm-serve vs rebuild (r13 verdict #1):
#     ShuffleProbe runs each query twice in one JVM — cold wall includes
#     the k-means build, warm wall serves from the session memo. A
#     second pass with a shared durable cache dir measures the
#     durable-load serve path in a FRESH JVM.
# NEVER run sbt while this runs (recompilation wipes target classes).
set -euo pipefail
REPO="$(cd "$(dirname "$0")/.." && pwd)"
OUT="$REPO/perf/soak_r14"
mkdir -p "$OUT"

dirfor() { case "$1" in sf0.1) echo /root/testdata/sf0.1;; *) echo "$REPO/target/$1";; esac; }

for q in text_dup_spans text_span_cut; do
  for sf in sf0.1 sf1 sf10; do
    echo "[soak_r14] span $q @ $sf ..."
    SPARK_GRAFT_SF_DIR="$(dirfor $sf)" SPARK_GRAFT_QUERIES="$q" \
      SPARK_GRAFT_BENCH_REPS=3 SPARK_GRAFT_BENCH_OUT="$OUT/span_${q}_${sf}.json" \
      "$REPO/tools/runmain.sh" graft.Bench >/dev/null 2>"$OUT/span_${q}_${sf}.log" \
      || echo "[soak_r14] FAILED: $q @ $sf"
  done
done

for sh in 1 8 64; do
  echo "[soak_r14] pack_greedy sf10 shards=$sh ..."
  SPARK_GRAFT_SF_DIR="$(dirfor sf10)" SPARK_GRAFT_QUERIES=pack_greedy \
    "$REPO/tools/runmain.sh" -Dgraft.pack.shards=$sh graft.ShuffleProbe \
    >"$OUT/pack_greedy_sf10_sh${sh}.json" 2>"$OUT/pack_greedy_sf10_sh${sh}.log" \
    || echo "[soak_r14] FAILED: pack shards=$sh"
done

for sf in sf0.1 sf1; do
  echo "[soak_r14] ann_topk_ivf cold/warm @ $sf ..."
  SPARK_GRAFT_SF_DIR="$(dirfor $sf)" SPARK_GRAFT_QUERIES=ann_topk_ivf \
    "$REPO/tools/runmain.sh" graft.ShuffleProbe \
    >"$OUT/ann_ivf_${sf}.json" 2>"$OUT/ann_ivf_${sf}.log" \
    || echo "[soak_r14] FAILED: ann @ $sf"
done

# durable layer: JVM 1 publishes, JVM 2's COLD run is load+serve
CACHE="$REPO/target/ann_cache_r14"
rm -rf "$CACHE"; mkdir -p "$CACHE"
echo "[soak_r14] ann durable publish @ sf1 ..."
SPARK_GRAFT_INDEX_CACHE="$CACHE" SPARK_GRAFT_SF_DIR="$(dirfor sf1)" \
  SPARK_GRAFT_QUERIES=ann_topk_ivf "$REPO/tools/runmain.sh" graft.ShuffleProbe \
  >"$OUT/ann_ivf_sf1_publish.json" 2>"$OUT/ann_ivf_sf1_publish.log" || true
echo "[soak_r14] ann durable load @ sf1 (fresh JVM) ..."
SPARK_GRAFT_INDEX_CACHE="$CACHE" SPARK_GRAFT_SF_DIR="$(dirfor sf1)" \
  SPARK_GRAFT_QUERIES=ann_topk_ivf "$REPO/tools/runmain.sh" graft.ShuffleProbe \
  >"$OUT/ann_ivf_sf1_durable.json" 2>"$OUT/ann_ivf_sf1_durable.log" || true

echo "[soak_r14] done"
