#!/usr/bin/env bash
# Two-cluster-size scaling evidence: same input at local[N] and
# local[4N], each in a fresh JVM. Prints per-run JSON plus the
# efficiency line for BENCH/BASELINE.md.
set -euo pipefail
SF=${1:-/root/testdata/sf0.1}
N=${2:-8}
REP=${3:-80}
cd "$(dirname "$0")/.."
run() {
  sbt -batch "runMain graft.ScalingBench $SF $1 $REP" 2>/dev/null \
    | grep -o '{"metric":"extract_throughput".*}'
}
A=$(run "$N");      echo "$A"
B=$(run $((4*N)));  echo "$B"
python3 - "$A" "$B" <<'EOF'
import json, sys
a, b = json.loads(sys.argv[1]), json.loads(sys.argv[2])
eff = b["turns_per_sec"] / (4 * a["turns_per_sec"])
print(json.dumps({
    "metric": "scaling_efficiency", "value": eff, "unit": "ratio",
    "cores_n": a["cores"], "cores_4n": b["cores"], "rows": a["rows"],
    "throughput_n": a["turns_per_sec"], "throughput_4n": b["turns_per_sec"],
    "outputs_identical": a["fingerprint"] == b["fingerprint"], "sf": a["sf"]}))
EOF
