#!/usr/bin/env bash
# Two-parallelism-level scaling run: fresh JVM per core count (sequential
# SparkSessions in one JVM contaminate each other's timings).
# Usage: tools/scaling.sh [lo] [hi] [turns]
set -euo pipefail
cd "$(dirname "$0")/.."
LO="${1:-8}" HI="${2:-32}" TURNS="${3:-16000000}"
# 31g, NOT 40g: Xmx > ~32g disables CompressedOops and object-pointer-
# heavy operators (window sorts, explodes, checkpointed iteration) run
# 2.5-3x slower — measured on cc_components: 46s@8g / 58s@31g / 142s@40g
# at the same 8 cores. Keep the driver under the compressed-oops cliff.
export SPARK_DRIVER_MEM="${SPARK_DRIVER_MEM:-31g}"
export SPARK_GRAFT_TURNS="$TURNS"

ROUNDS="${SPARK_GRAFT_ROUNDS:-3}"
RAWLOG="${SPARK_GRAFT_RAWLOG:-/tmp/scaling_raw.log}"
sbt -batch "runMain graft.GenTurns" 2>&1 | grep -E "wrote|exists" || true
: > /tmp/scaling_lo.jsonl; : > /tmp/scaling_hi.jsonl; : > "$RAWLOG"
# interleave fresh-JVM runs of both configs to cancel host-noise windows;
# per-config best-of-ROUNDS taken below. Full sbt output is preserved in
# $RAWLOG (a failed JVM must be diagnosable, and one bad round must not
# kill the whole run — later rounds still contribute their best).
run_one() { # cores
  sbt -batch "runMain graft.ScalingBench $1" >> "$RAWLOG" 2>&1 \
    || echo "ROUND FAILED cores=$1 (see $RAWLOG)" >&2
}
for i in $(seq "$ROUNDS"); do
  run_one "$LO"
  run_one "$HI"
done
# split the raw stream back into lo/hi by the "cores" field
python3 - "$LO" "$HI" "$RAWLOG" <<'EOF'
import json, re, sys
lo_n, hi_n, raw = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
lo, hi = open("/tmp/scaling_lo.jsonl", "w"), open("/tmp/scaling_hi.jsonl", "w")
for line in open(raw, errors="replace"):
    m = re.search(r'\{"workload".*\}', line)
    if not m: continue
    r = json.loads(m.group(0))
    (lo if r["cores"] == lo_n else hi).write(m.group(0) + "\n")
lo.close(); hi.close()
EOF

python3 - "$LO" "$HI" <<'EOF'
import json, sys
lo_n, hi_n = int(sys.argv[1]), int(sys.argv[2])
def best(path):
    out = {}
    for l in open(path):
        r = json.loads(l)
        k = r["workload"]
        if k not in out or r["sec"] < out[k]["sec"]:
            out[k] = r
    return out
lo = best("/tmp/scaling_lo.jsonl")
hi = best("/tmp/scaling_hi.jsonl")
factor = hi_n / lo_n
print(f"| workload | turns | sec@{lo_n} | sec@{hi_n} | turns/s@{lo_n} | turns/s@{hi_n} | efficiency |")
print("|---|---|---|---|---|---|---|")
for k in sorted(lo):
    l, h = lo[k], hi[k]
    eff = (h["turns_per_sec"] / l["turns_per_sec"]) / factor
    print(f"| {k} | {l['turns']} | {l['sec']:.3f} | {h['sec']:.3f} | "
          f"{l['turns_per_sec']:.0f} | {h['turns_per_sec']:.0f} | {eff:.3f} |")
EOF
