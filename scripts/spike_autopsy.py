#!/usr/bin/env python3
"""Spike autopsy over a bench_stability DIAG_DIR.

Correlates three evidence streams for every [spike] line the bench
emitted (a rep 5x over the best above 2s absolute):
  1. stderr_N.log     — the [spike]/[watchdog] lines with per-rep GC deltas
  2. jvm_N.log        — unified -Xlog:gc*,safepoint: pauses + safepoint stalls
  3. dumps_N/*.txt    — watchdog thread dumps captured DURING the slow rep

Usage: scripts/spike_autopsy.py [DIAG_DIR]
Prints: per-run GC/safepoint pause histograms, the worst pauses with
timestamps, and for each watchdog dump the states of the executor
threads (what the JVM was actually doing mid-spike).
"""
import os
import re
import sys
from collections import Counter


def pauses(jvm_log):
    """(kind, seconds, uptime) for every GC pause and safepoint."""
    out = []
    # e.g. [2026-08-16T07:20:01.123+0000][123.456s] GC(42) Pause Young (Normal) ... 12.345ms
    gc_re = re.compile(r"\[(\d+\.\d+)s\].*GC\(\d+\) (Pause [^)]*\)[^0-9]*|Pause Full[^0-9]*)(\d+\.\d+)ms")
    # Safepoint totals: "Total time for which application threads were stopped: 0.0123 seconds"
    sp_re = re.compile(r"\[(\d+\.\d+)s\].*Total time for which application threads were stopped: (\d+\.\d+) seconds")
    with open(jvm_log, errors="replace") as f:
        for line in f:
            m = gc_re.search(line)
            if m:
                out.append(("gc:" + m.group(2).strip().rstrip(")( "),
                            float(m.group(3)) / 1000.0, float(m.group(1))))
                continue
            m = sp_re.search(line)
            if m:
                out.append(("safepoint", float(m.group(2)), float(m.group(1))))
    return out


def main():
    diag = sys.argv[1] if len(sys.argv) > 1 else "/tmp/graft_bench_diag"
    for tag in ("1", "2"):
        stderr = os.path.join(diag, f"stderr_{tag}.log")
        jvm = os.path.join(diag, f"jvm_{tag}.log")
        dumps = os.path.join(diag, f"dumps_{tag}")
        print(f"=== run {tag} ===")
        if os.path.exists(stderr):
            for line in open(stderr, errors="replace"):
                if line.startswith("[spike]") or line.startswith("[watchdog]"):
                    print("  " + line.rstrip())
        if os.path.exists(jvm):
            ps = pauses(jvm)
            kinds = Counter(k for k, _, _ in ps)
            print(f"  jvm log: {dict(kinds)}")
            worst = sorted(ps, key=lambda p: -p[1])[:8]
            for k, sec, up in worst:
                if sec >= 0.05:
                    print(f"  pause {sec * 1000:8.1f} ms at uptime {up:9.1f}s  {k}")
            total_stopped = sum(sec for k, sec, _ in ps if k == "safepoint")
            print(f"  total stopped-the-world: {total_stopped:.1f}s")
        if os.path.isdir(dumps):
            for d in sorted(os.listdir(dumps)):
                txt = open(os.path.join(dumps, d), errors="replace").read()
                states = Counter(re.findall(r'state=(\w+)', txt))
                # what are the executor task threads doing?
                exe = re.findall(
                    r'"(Executor task launch worker[^"]*)" state=(\w+)\n((?:    at .*\n){0,3})',
                    txt)
                top = Counter(
                    (frames.splitlines()[0].strip() if frames else "?")
                    for _, _, frames in exe)
                print(f"  dump {d}: thread states {dict(states)}")
                for frame, cnt in top.most_common(5):
                    print(f"    {cnt:3d} executor threads {frame}")
    print("\ninterpretation guide: a multi-second 'Pause Full' or safepoint at "
          "the spike's uptime = GC/safepoint stall; executor threads parked in "
          "sun.misc.Unsafe.park or epoll = starvation/fetch wait; threads deep "
          "in codegen'd methods = genuine compute (look for interpreter frames "
          "= deoptimization).")


if __name__ == "__main__":
    main()
