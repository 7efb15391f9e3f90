#!/usr/bin/env bash
# Round-10 measurement protocol:
#  (a) isolation re-measure of the four r9 drifted queries (verdict item 2)
#  (b) sf10 soak for the MinHash rep-graph family (verdict item 3)
#  (c) clean warmed-cache re-measure of dedup_minhash_lsh at sf3
#
# CC-backed queries now hit the DedupIndex memo, so within-JVM reps 2+
# measure a warm index scan, not the build. For those, cold cost = one
# JVM per rep (reps=1), median across COLD_JVMS JVMs; non-memoized
# queries keep the usual in-JVM 5-rep median.
set -euo pipefail
REPO="$(cd "$(dirname "$0")/.." && pwd)"
OUT="$REPO/target/soak_r10"
mkdir -p "$OUT"

run() { # run <query> <sfdir> <tag> <reps>
  local q="$1" dir="$2" tag="$3" reps="$4"
  echo "[soak_r10] $q @ $tag reps=$reps ..."
  SPARK_GRAFT_SF_DIR="$dir" SPARK_GRAFT_QUERIES="$q" \
    SPARK_GRAFT_BENCH_REPS="$reps" SPARK_GRAFT_BENCH_OUT="$OUT/${q}_${tag}.json" \
    "$REPO/tools/runmain.sh" graft.Bench >/dev/null 2>"$OUT/${q}_${tag}.log" \
    || echo "[soak_r10] FAILED: $q @ $tag (see log)"
}

SF01=/root/testdata/sf0.1

# (a) isolation: non-memoized drifted queries, in-JVM 5-rep medians
for q in dedup_simhash_eval graph_pagerank stream_stream_outer; do
  run "$q" "$SF01" sf0.1 5
done
# dedup_groups_cc is memoized: 3 cold JVMs, 1 rep each
for i in 1 2 3; do
  run dedup_groups_cc "$SF01" "sf0.1_cold$i" 1
done

# (b) MinHash rep-graph family soak: cold JVMs per scale
for q in dedup_minhash_groups dedup_source_overlap dedup_cluster_purity; do
  for sf in sf0.1 sf1 sf3 sf10; do
    dir="$SF01"; [ "$sf" != sf0.1 ] && dir="$REPO/target/$sf"
    for i in 1 2 3; do
      run "$q" "$dir" "${sf}_cold$i" 1
    done
  done
done

# (c) dedup_minhash_lsh sf3 on a warmed page cache (5-rep in-JVM median;
# not memoized, so reps measure the full operator)
run dedup_minhash_lsh "$REPO/target/sf3" sf3_warm 5

echo "[soak_r10] done"
