#!/usr/bin/env bash
# Round-15 measurement protocol:
#  1. ANN maintenance decade (r14 verdict #6): AnnMaintScale at
#     sf0.1 / sf1 / sf10, 24 batches, compact (every 8) AND nocompact,
#     one JVM per cell — per-batch wall must stay flat in the batch
#     index at every scale; meta/ marker count bounded under compaction.
#     (The 200-batch marker soak at sf0.1 ran separately:
#     perf/soak_r15/ann_maint_markers_200b.json.)
#  2. IVF refit cost vs serve (r14 verdict #3 done-condition): isolated
#     3-rep Bench on ann_index_refit / ann_topk_ivf / ann_index_refresh /
#     ann_recall_drift at sf0.1.
#  3. IVFADC serving-shape evidence (r14 verdict #2 done-condition):
#     ShuffleProbe on ann_topk_ivfpq + ann_topk_ivfpq_refreshed — the
#     cold run pays the build+stitch, the warm run must show the
#     broadcast-probe read (no corpus-sized code shuffle).
#  4. New-family cost: isolated 3-rep Bench on the SQ8 family and the
#     PQ-lifecycle wave at sf0.1.
# NEVER run sbt while this runs (recompilation wipes target classes).
set -euo pipefail
REPO="$(cd "$(dirname "$0")/.." && pwd)"
OUT="$REPO/perf/soak_r15"
mkdir -p "$OUT"

dirfor() { case "$1" in sf0.1) echo /root/testdata/sf0.1;; *) echo "$REPO/target/$1";; esac; }

for sf in sf0.1 sf1 sf10; do
  for mode in compact nocompact; do
    echo "[soak_r15] ann_maint decade @ $sf $mode ..."
    SPARK_GRAFT_SF_DIR="$(dirfor $sf)" SPARK_GRAFT_BATCHES=24 \
      SPARK_GRAFT_MODE=$mode SPARK_GRAFT_COMPACT_EVERY=8 \
      "$REPO/tools/runmain.sh" graft.AnnMaintScale \
      >"$OUT/ann_maint_${sf}_${mode}.json" 2>"$OUT/ann_maint_${sf}_${mode}.log" \
      || echo "[soak_r15] FAILED: ann_maint @ $sf $mode"
  done
done

echo "[soak_r15] refit vs serve (isolated 3-rep) ..."
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
  SPARK_GRAFT_QUERIES=ann_index_refit,ann_topk_ivf,ann_index_refresh,ann_recall_drift \
  SPARK_GRAFT_BENCH_REPS=3 SPARK_GRAFT_BENCH_OUT="$OUT/refit_vs_serve.json" \
  "$REPO/tools/runmain.sh" graft.Bench >/dev/null 2>"$OUT/refit_vs_serve.log" \
  || echo "[soak_r15] FAILED: refit_vs_serve"

echo "[soak_r15] IVFADC serving shape (ShuffleProbe) ..."
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
  SPARK_GRAFT_QUERIES=ann_topk_ivfpq,ann_topk_ivfpq_refreshed \
  "$REPO/tools/runmain.sh" graft.ShuffleProbe \
  >"$OUT/ivfadc_shape.json" 2>"$OUT/ivfadc_shape.log" \
  || echo "[soak_r15] FAILED: ivfadc_shape"

echo "[soak_r15] new-family isolated cost ..."
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
  SPARK_GRAFT_QUERIES=ann_sq_codes,ann_topk_sq,ann_sq_recall,ann_sq_refresh,ann_topk_sq_refreshed \
  SPARK_GRAFT_BENCH_REPS=3 SPARK_GRAFT_BENCH_OUT="$OUT/sq_family.json" \
  "$REPO/tools/runmain.sh" graft.Bench >/dev/null 2>"$OUT/sq_family.log" \
  || echo "[soak_r15] FAILED: sq_family"
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
  SPARK_GRAFT_QUERIES=ann_pq_refresh,ann_topk_pq_refreshed,ann_pq_recall_drift,ann_pq_refit,ann_topk_ivfpq_refreshed,stream_ivfpq_refresh \
  SPARK_GRAFT_BENCH_REPS=3 SPARK_GRAFT_BENCH_OUT="$OUT/pq_lifecycle.json" \
  "$REPO/tools/runmain.sh" graft.Bench >/dev/null 2>"$OUT/pq_lifecycle.log" \
  || echo "[soak_r15] FAILED: pq_lifecycle"

echo "[soak_r15] done."

# 5. IVFADC streaming maintenance decade (the round's new loop measured
#    under the same protocol; appended after the first soak run).
for sf in sf0.1 sf1 sf10; do
  echo "[soak_r15] ivfpq_maint decade @ $sf ..."
  SPARK_GRAFT_SF_DIR="$(dirfor $sf)" SPARK_GRAFT_BATCHES=24 \
    SPARK_GRAFT_COMPACT_EVERY=8 SPARK_GRAFT_KIND=ivfpq \
    "$REPO/tools/runmain.sh" graft.AnnMaintScale \
    >"$OUT/ivfpq_maint_${sf}.json" 2>"$OUT/ivfpq_maint_${sf}.log" \
    || echo "[soak_r15] FAILED: ivfpq_maint @ $sf"
done
