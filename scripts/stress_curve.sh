#!/usr/bin/env bash
# Synthetic-decade stress gate: graft.tools.Stress times the
# shuffle-heavy text/ANN/temporal operators on the sf0.1 tables
# replicated FACTOR x (structure-preserving perturbations — constant
# duplicate rate, decorrelated cross-copy cosines, unchanged per-key
# event densities). Two isolated JVMs (factor 1, then FACTOR), then a
# ratio table; any op whose wall-clock grows faster than FACTOR x 1.25
# on FACTOR x data exits nonzero as superlinear.
set -euo pipefail
cd "$(dirname "$0")/.."
SF="${1:-/root/testdata/sf0.1}"
FACTOR="${2:-16}"

echo "phase 1: compile..." >&2
sbt -batch compile >/dev/null

run() {
  java -Xmx96g -cp "target/scala-2.13/classes:/opt/spark/jars/*" \
    graft.tools.Stress "$SF" "$1" 2>/dev/null
}

echo "phase 2: factor 1..." >&2
J1="$(run 1)"
echo "$J1"
echo "phase 2: factor $FACTOR..." >&2
J2="$(run "$FACTOR")"
echo "$J2"

python3 - "$J1" "$J2" "$FACTOR" <<'PY'
import json, sys
a = {j["op"]: j for j in map(json.loads, sys.argv[1].splitlines())}
b = {j["op"]: j for j in map(json.loads, sys.argv[2].splitlines())}
factor = int(sys.argv[3])
bad = []
print(f"{'op':<16}{'1x':>8}{'%dx' % factor:>9}{'ratio':>8}")
for op, j in a.items():
    if op.startswith("_"):
        continue
    r = b[op]["sec"] / j["sec"]
    flag = " SUPERLINEAR" if r > factor * 1.25 else ""
    if flag:
        bad.append(op)
    print(f"{op:<16}{j['sec']:>7.2f}s{b[op]['sec']:>8.2f}s{r:>7.2f}x{flag}")
if bad:
    sys.exit(f"superlinear on {factor}x data: {', '.join(bad)}")
print(f"all ops at or below {factor}x on {factor}x data")
PY
