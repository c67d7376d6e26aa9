#!/usr/bin/env bash
# Two-cluster-size scaling evidence: same input at local[N] and
# local[4N], each invocation a fresh JVM. The sandbox host has bursty
# CPU steal, so each JVM RESAMPLES until a repetition lands in a clean
# window (steal <= 1%, utilization >= the cores-dependent floor —
# ScalingBench), and configs are additionally run INTERLEAVED
# (N,4N x up to ROUNDS) with an early exit once BOTH sides have a
# clean rep. The gate number is computed from CLEAN reps when both
# sides have one (basis "clean" — the reproducible single-invocation
# protocol round-3 VERDICT #4 asked for), falling back to
# best-of-all-reps otherwise (basis "best"). Every rep — accepted and
# rejected — carries steal + task-time + utilization in the record;
# this script appends one machine-readable evidence line per
# invocation to SCALING_EVIDENCE.jsonl at the repo root.
set -euo pipefail
SF=${1:-/root/testdata/sf0.1}
N=${2:-8}
REP=${3:-80}
ROUNDS=${4:-3}
cd "$(dirname "$0")/.."
export SPARK_DRIVER_MEM=${SPARK_DRIVER_MEM:-24g}
export SPARK_GRAFT_CACHE_COMPRESSED=${SPARK_GRAFT_CACHE_COMPRESSED:-false}
SIDEKICK=${SCALING_EVIDENCE:-SCALING_EVIDENCE.jsonl}
cpu_totals() { awk '/^cpu /{print $9, $2+$3+$4+$5+$6+$7+$8+$9+$10+$11}' /proc/stat; }
RESULTS=()
run() {
  local before after
  before=($(cpu_totals))
  local out
  out=$(sbt -batch "runMain graft.ScalingBench $SF $1 $REP" 2>/dev/null \
    | grep -o '{"metric":"extract_throughput".*}')
  after=($(cpu_totals))
  local dsteal=$((after[0] - before[0])) dtotal=$((after[1] - before[1]))
  local pct
  pct=$(python3 -c "print(f'{100.0*$dsteal/max(1,$dtotal):.2f}')")
  echo "[steal] cores=$1 jvm_steal_pct=$pct" >&2
  # wrap with the shell-level steal sample around the whole JVM
  echo "$(python3 -c "
import json,sys
r=json.loads(sys.argv[1]); r['jvm_steal_pct']=float(sys.argv[2]); print(json.dumps(r))
" "$out" "$pct")"
}
both_clean() { # early exit once each config has a clean rep on record
  python3 - "$@" <<'EOF'
import json, sys
clean = set()
for a in sys.argv[1:]:
    r = json.loads(a)
    if r.get("clean_sec") is not None:
        clean.add(r["cores"])
sys.exit(0 if len(clean) >= 2 else 1)
EOF
}
for r in $(seq 1 "$ROUNDS"); do
  A=$(run "$N");     echo "$A"; RESULTS+=("$A")
  B=$(run $((4*N))); echo "$B"; RESULTS+=("$B")
  if both_clean "${RESULTS[@]}"; then
    echo "[scaling.sh] both configs have clean reps after round $r — stopping" >&2
    break
  fi
done
python3 - "$SIDEKICK" "${RESULTS[@]}" <<'EOF'
import json, sys, datetime
sidecar = sys.argv[1]
runs = [json.loads(a) for a in sys.argv[2:]]
best, clean_best = {}, {}
for r in runs:
    c = r["cores"]
    if c not in best or r["sec"] < best[c]["sec"]:
        best[c] = r
    if r.get("clean_sec") is not None and (
            c not in clean_best or r["clean_sec"] < clean_best[c]["clean_sec"]):
        clean_best[c] = r
a = best[min(best)]; b = best[max(best)]
eff_best = b["turns_per_sec"] / (4 * a["turns_per_sec"])
if len(clean_best) >= 2:
    ca = clean_best[min(clean_best)]; cb = clean_best[max(clean_best)]
    eff = cb["clean_turns_per_sec"] / (4 * ca["clean_turns_per_sec"])
    basis = "clean"   # both sides measured inside a clean window
    sec_n, sec_4n = ca["clean_sec"], cb["clean_sec"]
    tp_n, tp_4n = ca["clean_turns_per_sec"], cb["clean_turns_per_sec"]
    def rep_of(r):  # the clean rep's own steal/util, for the record
        return min((x for x in r["reps"] if x.get("clean")), key=lambda x: x["sec"])
    steal_n, steal_4n = rep_of(ca)["steal_pct"], rep_of(cb)["steal_pct"]
    util_n, util_4n = rep_of(ca)["utilization"], rep_of(cb)["utilization"]
    task_n, task_4n = rep_of(ca)["task_sec"], rep_of(cb)["task_sec"]
else:
    eff, basis = eff_best, "best"
    sec_n, sec_4n = a["sec"], b["sec"]
    tp_n, tp_4n = a["turns_per_sec"], b["turns_per_sec"]
    steal_n, steal_4n = a.get("steal_pct"), b.get("steal_pct")
    util_n, util_4n = a.get("utilization"), b.get("utilization")
    task_n, task_4n = a.get("task_sec"), b.get("task_sec")
# ATTRIBUTION metric, not the gate: both configs run the IDENTICAL
# task set, so task_sec(4N)/task_sec(N) > 1 means the host delivered
# slower cycles at the higher thread count (shared-VM frequency /
# bandwidth cap — executors on a real cluster don't share one VM).
# eff_task_normalized = what the wall ratio would read at flat
# per-task cost. Published beside the wall-basis gate number.
eff_tasknorm = (eff * task_4n / task_n) if task_n and task_4n else None
# per-task time inflation going N -> 4N on the IDENTICAL task set
# (same fixed partition count): task_sec ratio of the best runs
inflation = (b.get("task_sec", 0) / a.get("task_sec", 1)
             if a.get("task_sec") else None)
summary = {
    "metric": "scaling_efficiency", "value": eff, "unit": "ratio",
    "basis": basis, "gate_pass": eff >= 0.8 and basis == "clean",
    "cores_n": a["cores"], "cores_4n": b["cores"], "rows": a["rows"],
    "sec_n": sec_n, "sec_4n": sec_4n,
    "throughput_n": tp_n, "throughput_4n": tp_4n,
    "steal_pct_n": steal_n, "steal_pct_4n": steal_4n,
    "utilization_n": util_n, "utilization_4n": util_4n,
    "task_sec_sel_n": task_n, "task_sec_sel_4n": task_4n,
    "efficiency_task_normalized": eff_tasknorm,
    "efficiency_best_of_all": eff_best,
    "outputs_identical": a["fingerprint"] == b["fingerprint"],
    "rounds": len(runs) // 2, "sf": a["sf"]}
print(json.dumps(summary))
evidence = dict(summary)
evidence.update({
    "ts_utc": datetime.datetime.utcnow().isoformat(timespec="seconds"),
    "parts": a.get("parts"),
    "task_sec_n": a.get("task_sec"), "task_sec_4n": b.get("task_sec"),
    "task_time_inflation_n_to_4n": inflation,
    "runs": runs})
with open(sidecar, "a") as f:
    f.write(json.dumps(evidence) + "\n")
EOF
