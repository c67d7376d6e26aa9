#!/usr/bin/env bash
# Two-cluster-size scaling evidence: same input at local[N] and
# local[4N], each invocation a fresh JVM. The sandbox host has bursty
# CPU steal, so configs are run INTERLEAVED (N,4N x ROUNDS) and the
# best run per config is kept (steal only ever slows a run down).
# Host CPU steal is sampled around every run from /proc/stat and
# logged, so a failed efficiency gate can be attributed (or not) to
# the host rather than the engine.
set -euo pipefail
SF=${1:-/root/testdata/sf0.1}
N=${2:-8}
REP=${3:-80}
ROUNDS=${4:-3}
cd "$(dirname "$0")/.."
export SPARK_DRIVER_MEM=${SPARK_DRIVER_MEM:-24g}
export SPARK_GRAFT_CACHE_COMPRESSED=${SPARK_GRAFT_CACHE_COMPRESSED:-false}
cpu_totals() { awk '/^cpu /{print $9, $2+$3+$4+$5+$6+$7+$8+$9+$10+$11}' /proc/stat; }
run() {
  local before after
  before=($(cpu_totals))
  local out
  out=$(sbt -batch "runMain graft.ScalingBench $SF $1 $REP" 2>/dev/null \
    | grep -o '{"metric":"extract_throughput".*}')
  after=($(cpu_totals))
  local dsteal=$((after[0] - before[0])) dtotal=$((after[1] - before[1]))
  echo "[steal] cores=$1 steal_ticks=$dsteal total_ticks=$dtotal pct=$(python3 -c "print(f'{100.0*$dsteal/max(1,$dtotal):.2f}')")" >&2
  echo "$out"
}
RESULTS=()
for r in $(seq 1 "$ROUNDS"); do
  A=$(run "$N");     echo "$A"; RESULTS+=("$A")
  B=$(run $((4*N))); echo "$B"; RESULTS+=("$B")
done
python3 - "${RESULTS[@]}" <<'EOF'
import json, sys
runs = [json.loads(a) for a in sys.argv[1:]]
best = {}
for r in runs:
    c = r["cores"]
    if c not in best or r["sec"] < best[c]["sec"]:
        best[c] = r
a = best[min(best)]; b = best[max(best)]
eff = b["turns_per_sec"] / (4 * a["turns_per_sec"])
print(json.dumps({
    "metric": "scaling_efficiency", "value": eff, "unit": "ratio",
    "cores_n": a["cores"], "cores_4n": b["cores"], "rows": a["rows"],
    "sec_n": a["sec"], "sec_4n": b["sec"],
    "throughput_n": a["turns_per_sec"], "throughput_4n": b["turns_per_sec"],
    "outputs_identical": a["fingerprint"] == b["fingerprint"],
    "rounds": len(runs) // 2, "sf": a["sf"]}))
EOF
