#!/usr/bin/env bash
# Two-cluster-size scaling evidence: same input at local[N] and
# local[4N], each invocation a fresh JVM. The sandbox host has bursty
# CPU steal, so each JVM RESAMPLES until a repetition lands in a clean
# window (steal <= 1%, utilization >= the cores-dependent floor —
# ScalingBench), and configs are additionally run INTERLEAVED
# (N,4N x up to ROUNDS) with an early exit once both sides have
# GLOBALLY clean reps. Two cross-JVM guards (round-4 VERDICT #2/#5 —
# a JVM living wholly inside a frequency plateau must not
# self-certify):
#  - the minimum task_sec observed so far across BOTH configs is
#    exported into every subsequent JVM (SPARK_GRAFT_EXT_TASK_FLOOR),
#    so its in-JVM clean predicate already carries the global floor
#    (the task sets are work-identical — fixed 64 partitions);
#  - the aggregation re-flags every rep against the FINAL global
#    floor (1.5x the global minimum task_sec) before selecting clean
#    reps, and the early exit demands one globally-clean rep on the
#    N side and TWO on the 4N side (the gate's numerator deserves the
#    extra hold-out: the a5e0659 0.715 reading was one plateau-bound
#    4N context).
# The gate number is computed from globally-clean reps when both
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
FLOOR=""
cpu_totals() { awk '/^cpu /{print $9, $2+$3+$4+$5+$6+$7+$8+$9+$10+$11}' /proc/stat; }
RESULTS=()
run() {
  local before after
  before=($(cpu_totals))
  local out
  if [ -n "$FLOOR" ]; then
    out=$(SPARK_GRAFT_EXT_TASK_FLOOR=$FLOOR sbt -batch "runMain graft.ScalingBench $SF $1 $REP" 2>/dev/null \
      | grep -o '{"metric":"extract_throughput".*}')
  else
    out=$(sbt -batch "runMain graft.ScalingBench $SF $1 $REP" 2>/dev/null \
      | grep -o '{"metric":"extract_throughput".*}')
  fi
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
update_floor() { # running global min task_sec across every rep so far
  FLOOR=$(python3 - "$@" <<'EOF'
import json, sys
m = None
for a in sys.argv[1:]:
    for x in json.loads(a).get("reps", []):
        t = x.get("task_sec", 0)
        if t and t > 0 and (m is None or t < m):
            m = t
print("" if m is None else m)
EOF
)
}
both_clean() { # early exit: 1 globally-clean rep on N, 2 on 4N
  python3 - "$@" <<'EOF'
import json, sys, os
# same factor as the in-JVM predicate (Bench.taskFloorFactor) — a
# desynchronized override would let a JVM certify reps this gate
# later rejects, or vice versa (round-5 ADVICE)
FACTOR = float(os.environ.get("SPARK_GRAFT_TASK_FLOOR_FACTOR", "1.5"))
runs = [json.loads(a) for a in sys.argv[1:]]
gmin = None
for r in runs:
    for x in r.get("reps", []):
        t = x.get("task_sec", 0)
        if t and t > 0 and (gmin is None or t < gmin):
            gmin = t
if gmin is None:
    sys.exit(1)
counts = {}
for r in runs:
    c = r["cores"]
    for x in r.get("reps", []):
        if x.get("clean") and x.get("task_sec", 0) <= FACTOR * gmin:
            counts[c] = counts.get(c, 0) + 1
if len(counts) < 2:
    sys.exit(1)
lo, hi = min(counts), max(counts)
sys.exit(0 if counts[lo] >= 1 and counts[hi] >= 2 else 1)
EOF
}
for r in $(seq 1 "$ROUNDS"); do
  A=$(run "$N");     echo "$A"; RESULTS+=("$A"); update_floor "${RESULTS[@]}"
  B=$(run $((4*N))); echo "$B"; RESULTS+=("$B"); update_floor "${RESULTS[@]}"
  if both_clean "${RESULTS[@]}"; then
    echo "[scaling.sh] both configs have globally-clean reps after round $r — stopping" >&2
    break
  fi
done
python3 - "$SIDEKICK" "${RESULTS[@]}" <<'EOF'
import json, sys, datetime, os
FACTOR = float(os.environ.get("SPARK_GRAFT_TASK_FLOOR_FACTOR", "1.5"))
sidecar = sys.argv[1]
runs = [json.loads(a) for a in sys.argv[2:]]
# FINAL global task floor over every rep of both configs: re-flag
# each rep before selecting clean ones (stricter than any in-JVM
# floor — floors only improve as more JVMs report)
gmin = None
for r in runs:
    for x in r.get("reps", []):
        t = x.get("task_sec", 0)
        if t and t > 0 and (gmin is None or t < gmin):
            gmin = t
def clean_reps(r):
    return [x for x in r.get("reps", [])
            if x.get("clean") and gmin and x.get("task_sec", 0) <= FACTOR * gmin]
best, clean_best = {}, {}
for r in runs:
    c = r["cores"]
    if c not in best or r["sec"] < best[c]["sec"]:
        best[c] = r
    cr = clean_reps(r)
    if cr:
        sec = min(x["sec"] for x in cr)
        if c not in clean_best or sec < clean_best[c][0]:
            clean_best[c] = (sec, r)
a = best[min(best)]; b = best[max(best)]
eff_best = b["turns_per_sec"] / (4 * a["turns_per_sec"])
rows = a["rows"]
if len(clean_best) >= 2:
    (sec_n, ra) = clean_best[min(clean_best)]
    (sec_4n, rb) = clean_best[max(clean_best)]
    tp_n, tp_4n = rows / sec_n, rows / sec_4n
    eff = tp_4n / (4 * tp_n)
    basis = "clean"   # both sides measured inside a globally-clean window
    def rep_of(r, sec):  # the selected clean rep's own accounting
        return next(x for x in clean_reps(r) if x["sec"] == sec)
    xa, xb = rep_of(ra, sec_n), rep_of(rb, sec_4n)
    steal_n, steal_4n = xa["steal_pct"], xb["steal_pct"]
    util_n, util_4n = xa["utilization"], xb["utilization"]
    task_n, task_4n = xa["task_sec"], xb["task_sec"]
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
    "cores_n": a["cores"], "cores_4n": b["cores"], "rows": rows,
    "sec_n": sec_n, "sec_4n": sec_4n,
    "throughput_n": tp_n, "throughput_4n": tp_4n,
    "steal_pct_n": steal_n, "steal_pct_4n": steal_4n,
    "utilization_n": util_n, "utilization_4n": util_4n,
    "task_sec_sel_n": task_n, "task_sec_sel_4n": task_4n,
    "global_task_floor": gmin,
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
