#!/bin/bash
# Scaling-efficiency evidence (north_rule: N -> 4N executors >= 0.8),
# sandbox proxy per driver instruction: the same job at two parallelism
# levels on identical input. Each level runs in its OWN JVM pinned to
# that many physical cores (taskset) — the honest stand-in for a
# separate cluster size; a shared JVM lets the "8-core" run borrow all
# 32 cores for GC/JIT and contaminates the ratio.
set -euo pipefail
cd "$(dirname "$0")/.."
NCONVS=${1:-200000}
TURNS=${2:-5}

run() { # cores cpulist
  taskset -c "$2" env SPARK_DRIVER_MEM=40g \
    sbt -batch "runMain graft.BenchScaling $NCONVS $TURNS $1" 2>&1 \
    | grep -o '{"metric":"scaling_efficiency".*}' | tail -1
}

J8=$(run 8 0-7)
J32=$(run 32 0-31)
python3 - "$J8" "$J32" "$NCONVS" "$TURNS" <<'EOF'
import json, sys
j8, j32 = json.loads(sys.argv[1]), json.loads(sys.argv[2])
t8 = j8["turns_per_sec"]["8"]; t32 = j32["turns_per_sec"]["32"]
eff = (t32 / t8) / 4.0
n = j8["turns"]
out = {"metric": "scaling_efficiency", "turns": n,
       "turns_per_sec_8": t8, "turns_per_sec_32": t32,
       "efficiency_8_to_32": eff}
print(json.dumps(out))
with open("BENCH.md", "a") as f:
    f.write(f"\n| {n} | {t8:.0f} | {t32:.0f} | {eff:.3f} |\n")
EOF
