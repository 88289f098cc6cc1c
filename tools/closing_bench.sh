#!/bin/bash
# The SURVEY §3.0 closing-bench procedure, mechanized: check the machine
# is idle, clear per-process artifacts, run the bench TWICE back-to-back,
# and print both JSON lines plus the per-query head — the pair that the
# round's final recording commit must carry. Run from /root/repo.
#
# Usage: tools/closing_bench.sh [sfDir]   (default /root/testdata/sf0.1)
set -e
SF="${1:-/root/testdata/sf0.1}"
echo "== uptime (do not trust the pair if load_avg > ~1) =="
uptime
for run in A B; do
  rm -rf /tmp/graft_artifacts_*
  echo "== run $run =="
  SPARK_GRAFT_SF_DIR="$SF" tools/run_main.sh graft.Bench 2>/dev/null \
    | grep '"metric"' | tee "/tmp/closing_bench_$run.json" \
    | python3 -c '
import json, sys
d = json.loads(sys.stdin.readline())
print("warm", d["value"], "s cold", d["first_run_total"], "s load",
      d["load_avg_at_start"], "failed", d["failed_count"])
# exclude the folded "_others_*" bucket by NAME: index-skipping assumed
# it always sorts first, which fails when few queries are folded
head = [kv for kv in sorted(d["queries"].items(), key=lambda kv: -kv[1])
        if not kv[0].startswith("_others")][:7]
print("head:", [(k, round(v, 2)) for k, v in head])'
done
echo "== pair recorded at /tmp/closing_bench_{A,B}.json; per-query detail at target/bench_detail.json =="
# Artifact-ladder cold budget (r13 tripwire, ArtifactBudgetSpec control 3):
# cold includes every Materialize artifact build; 127 s (r11) -> 174 s (r12)
# with nothing gating the trend. Breaching the budget means either trim the
# ladder or consciously raise GRAFT_COLD_BUDGET with a note in BASELINE.md.
BUDGET="${GRAFT_COLD_BUDGET:-200}"
python3 - "$BUDGET" /tmp/closing_bench_A.json /tmp/closing_bench_B.json <<'EOF'
import json, sys
budget = float(sys.argv[1])
colds = [json.load(open(p))["first_run_total"] for p in sys.argv[2:]]
best = min(colds)
print(f"== cold budget: best first_run_total {best:.1f}s vs {budget:.0f}s "
      f"(per-artifact seconds in target/artifact_builds.json) ==")
if best > budget:
    print(f"COLD BUDGET BREACH: {best:.1f}s > {budget:.0f}s — trim the "
          "artifact ladder or raise GRAFT_COLD_BUDGET deliberately")
    sys.exit(2)
EOF
