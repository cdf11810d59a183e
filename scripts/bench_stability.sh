#!/usr/bin/env bash
# Bench stability gate: two consecutive full bench runs at the given SF
# (default sf0.01) must land within 20% of each other on the headline
# total. Exits nonzero on drift — run after perf-sensitive changes.
set -euo pipefail
cd "$(dirname "$0")/.."
SF="${1:-/root/testdata/sf0.01}"

run() {
  SPARK_GRAFT_SF_DIR="$SF" sbt -batch "runMain graft.Bench" 2>/dev/null \
    | grep -o '{"metric".*}' | tail -1
}

echo "run 1..." >&2
J1="$(run)"
echo "$J1"
echo "run 2..." >&2
J2="$(run)"
echo "$J2"

python3 - "$J1" "$J2" <<'PY'
import json, sys
a, b = (json.loads(x) for x in sys.argv[1:3])
t1, t2 = a["value"], b["value"]
drift = abs(t1 - t2) / max(min(t1, t2), 1e-9)
print(f"totals: {t1:.2f}s vs {t2:.2f}s, drift {drift*100:.1f}%")
assert drift <= 0.20, f"bench totals drifted more than 20%: {t1} vs {t2}"
print("STABLE")
PY
