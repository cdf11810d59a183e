#!/usr/bin/env bash
# Scale-curve record: one isolated session (compile first, then plain
# java — no concurrent sbt), full bench at sf0.001 / sf0.01 / sf0.1.
# Emits a per-query table of times and scaling ratios; any query whose
# sf0.01→sf0.1 ratio exceeds the superlinear threshold (default 12×,
# the data grows 10×) is flagged. With no sf1 data in the sandbox this
# is the best empirical 100×-proxy available.
set -euo pipefail
cd "$(dirname "$0")/.."
THRESH="${1:-12.0}"

echo "compile..." >&2
sbt -batch compile >/dev/null

declare -A OUT
for SF in sf0.001 sf0.01 sf0.1; do
  echo "bench $SF..." >&2
  OUT[$SF]="$(SPARK_GRAFT_SF_DIR="/root/testdata/$SF" java -Xmx96g \
    -cp "target/scala-2.13/classes:/opt/spark/jars/*" graft.Bench 2>/dev/null \
    | grep -o '{"metric".*}' | tail -1)"
done

python3 - "$THRESH" "${OUT[sf0.001]}" "${OUT[sf0.01]}" "${OUT[sf0.1]}" <<'PY'
import json, sys
thresh = float(sys.argv[1])
runs = [json.loads(x) for x in sys.argv[2:5]]
qs = [r["queries"] for r in runs]
names = [n for n in qs[2] if all(n in q for q in qs)]
print(f"| query | sf0.001 | sf0.01 | sf0.1 | 0.001→0.01 | 0.01→0.1 |")
print(f"|---|---|---|---|---|---|")
flagged = []
for n in sorted(names, key=lambda n: -qs[2][n]):
    a, b, c = qs[0][n], qs[1][n], qs[2][n]
    r1 = b / a if a > 0 else float("nan")
    r2 = c / b if b > 0 else float("nan")
    mark = ""
    if r2 > thresh:
        mark = " ⚠"
        flagged.append((n, b, c, r2))
    print(f"| {n} | {a:.2f} | {b:.2f} | {c:.2f} | {r1:.2f}× | {r2:.2f}×{mark} |")
t = [r["value"] for r in runs]
print(f"| **total** | **{t[0]:.1f} s** | **{t[1]:.1f} s** | **{t[2]:.1f} s** | "
      f"**{t[1]/t[0]:.2f}×** | **{t[2]/t[1]:.2f}×** |")
if flagged:
    print(f"\nSUPERLINEAR (> {thresh}x on a 10x data step):")
    for n, b, c, r in flagged:
        print(f"  {n}: {b:.2f}s -> {c:.2f}s ({r:.1f}x)")
    sys.exit(1)
print(f"\nNO SUPERLINEAR QUERIES (threshold {thresh}x on the 10x step)")
PY
