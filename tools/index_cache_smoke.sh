#!/usr/bin/env bash
# Two-JVM smoke for the durable cluster-index cache (DedupIndex durable
# layer): JVM 1 builds and publishes, JVM 2 must load with ZERO builds
# and identical row count. Complements DedupIndexSpec's in-process
# contract tests with real cross-process evidence.
set -euo pipefail
REPO="$(cd "$(dirname "$0")/.." && pwd)"
CACHE="$(mktemp -d /tmp/graft_index_cache_smoke.XXXXXX)"
trap 'rm -rf "$CACHE"' EXIT

run() {
  SPARK_GRAFT_INDEX_CACHE="$CACHE" SPARK_GRAFT_SF_DIR="${1:-/root/testdata/sf0.001}" \
    "$REPO/tools/runmain.sh" graft.IndexCacheProbe 2>/dev/null | grep index_cache_probe
}

out1="$(run)"; echo "jvm1: $out1"
out2="$(run)"; echo "jvm2: $out2"

b1="$(sed -E 's/.*"builds":([0-9]+).*/\1/' <<<"$out1")"
b2="$(sed -E 's/.*"builds":([0-9]+).*/\1/' <<<"$out2")"
r1="$(sed -E 's/.*"rows":([0-9]+).*/\1/' <<<"$out1")"
r2="$(sed -E 's/.*"rows":([0-9]+).*/\1/' <<<"$out2")"

[ "$b1" = 1 ] || { echo "FAIL: first JVM should build exactly once (got $b1)"; exit 1; }
[ "$b2" = 0 ] || { echo "FAIL: second JVM should load, not build (got $b2)"; exit 1; }
[ "$r1" = "$r2" ] || { echo "FAIL: row counts differ ($r1 vs $r2)"; exit 1; }
echo "PASS: durable index cache serves a second JVM with zero builds ($r1 rows)"
