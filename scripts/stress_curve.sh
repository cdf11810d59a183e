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
# Ops whose DOCUMENTED complexity is N^1.5, not linear: IVF at fixed
# recall (nlist ~ sqrt(N), nprobe const) scans nprobe*N/nlist ~ sqrt(N)
# candidates per query, so an all-queries sweep is Theta(N^1.5) by
# design — gate it against FACTOR^1.5, the bound its own contract
# states, instead of the linear ceiling.
SQRT_N_OPS = {"ivfpq_top3"}
bad = []
print(f"{'op':<16}{'1x':>8}{'%dx' % factor:>9}{'ratio':>8}")
for op, j in a.items():
    if op.startswith("_"):
        continue
    r = b[op]["sec"] / j["sec"]
    gate = (factor ** 1.5 if op in SQRT_N_OPS else factor) * 1.25
    flag = " SUPERLINEAR" if r > gate else ""
    if flag:
        bad.append(op)
    mark = " [N^1.5 gate]" if op in SQRT_N_OPS else ""
    print(f"{op:<16}{j['sec']:>7.2f}s{b[op]['sec']:>8.2f}s{r:>7.2f}x{flag}{mark}")
if bad:
    sys.exit(f"superlinear on {factor}x data: {', '.join(bad)}")
print(f"all ops within their complexity gates on {factor}x data")
PY
