#!/usr/bin/env bash
# sf0.1 -> sf1 scaling soak (round-5 verdict item 7): isolated 5-rep
# medians for the slowest queries, one JVM per (query, scale) so suite
# contention can't pollute the numbers. Results land in target/soak/.
set -euo pipefail
REPO="$(cd "$(dirname "$0")/.." && pwd)"
QUERIES="${SOAK_QUERIES:-dedup_groups_cc,cooc_sampled_llr,dedup_minhash_lsh,dedup_simhash,stream_stream_join,stream_session_agg,approx_topk_cms,ann_ivf_sound,bpe_encode,graph_triangles,dedup_keep_best,stream_simhash_dedup,knn_classify_eval,join_bucketed,graph_pagerank}"
REPS="${SOAK_REPS:-5}"
mkdir -p "$REPO/target/soak"
for q in ${QUERIES//,/ }; do
  for sf in sf0.1 sf1; do
    dir="/root/testdata/sf0.1"
    [ "$sf" = sf1 ] && dir="$REPO/target/sf1"
    out="$REPO/target/soak/${q}_${sf}.json"
    echo "[soak] $q @ $sf ..."
    SPARK_GRAFT_SF_DIR="$dir" SPARK_GRAFT_QUERIES="$q" \
      SPARK_GRAFT_BENCH_REPS="$REPS" SPARK_GRAFT_BENCH_OUT="$out" \
      "$REPO/tools/runmain.sh" graft.Bench >/dev/null 2>"$REPO/target/soak/${q}_${sf}.log" \
      || echo "[soak] FAILED: $q @ $sf (see log)"
  done
done
python3 - <<'EOF'
import json, glob, os
rows = {}
for f in sorted(glob.glob(os.path.join(os.environ.get("REPO", "."), "target/soak/*.json"))):
    base = os.path.basename(f)[:-5]
    q, sf = base.rsplit("_sf", 1)
    d = json.load(open(f))
    rows.setdefault(q, {})["sf" + sf] = d["queries"].get(q)
print(f"{'query':<22} {'sf0.1':>8} {'sf1':>8} {'ratio':>6}")
for q, r in sorted(rows.items()):
    a, b = r.get("sf0.1"), r.get("sf1")
    ratio = f"{b/a:.2f}" if a and b else "-"
    print(f"{q:<22} {a or float('nan'):>8.2f} {b or float('nan'):>8.2f} {ratio:>6}")
EOF
