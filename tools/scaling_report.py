#!/usr/bin/env python3
"""Aggregate ScalingBench pair runs into the BASELINE.md evidence table.

Reads BENCH/r2/pair*_c{N}.json (totals) and pair*_c{N}.err ([crawl] round
lines) and prints: per-pair efficiencies, per-round-index medians across
runs at each level, and the robust median-of-rounds efficiency
T_med(1) / (4 * T_med(4)). The per-round medians are the
environmental-stall-resistant estimator (one gVisor stall per run is the
documented norm; medians across runs drop it).
"""
import glob
import json
import re
import statistics
import sys

bench_dir = sys.argv[1] if len(sys.argv) > 1 else "BENCH/r2"
# optional 2nd arg: filename prefix filter, e.g. "cpair" for the concurrent
# barrier-synced protocol, "pair" for the sequential one (default: all).
prefix = sys.argv[2] if len(sys.argv) > 2 else ""
ROUND = re.compile(
    r"\[crawl\] round (\d+) compute=([0-9.]+)s commit-drain=([0-9.]+)s fetched=(\d+)")

runs = {}  # (pair, cpus) -> {"total": s, "rounds": {idx: secs}, "fetched": n}
for f in sorted(glob.glob(f"{bench_dir}/*pair*_c*.json")):
    base = f.split("/")[-1]
    if prefix and not base.startswith(prefix):
        continue
    if not prefix and not base.startswith("pair"):
        continue  # default: the sequential-protocol files only
    m = re.search(r"pair([A-Z]+)_c(\d+)\.json$", f)
    pair, cpus = m.group(1), int(m.group(2))
    try:
        j = json.load(open(f))
    except Exception:
        continue
    lvl = j.get(f"local[{cpus}]", {})
    rec = {"total": lvl.get("secs"), "fetched": lvl.get("fetched"), "rounds": {}}
    try:
        for line in open(f.replace(".json", ".err")):
            rm = ROUND.search(line)
            if rm:
                rec["rounds"][int(rm.group(1))] = float(rm.group(2)) + float(rm.group(3))
    except FileNotFoundError:
        pass
    runs[(pair, cpus)] = rec

pairs = sorted({p for (p, _) in runs})
print("== per-pair totals ==")
for p in pairs:
    a, b = runs.get((p, 1)), runs.get((p, 4))
    if a and b and a["total"] and b["total"]:
        eff = a["total"] / (4 * b["total"])
        print(f"pair {p}: T(1)={a['total']:.1f}s T(4)={b['total']:.1f}s "
              f"eff={eff:.2f} fetched={a['fetched']}")

print("\n== per-round times (compute+drain) ==")
for cpus in (1, 4):
    for p in pairs:
        r = runs.get((p, cpus))
        if r and r["rounds"]:
            rd = " ".join(f"r{i}={r['rounds'][i]:.1f}" for i in sorted(r["rounds"]))
            print(f"  {p} local[{cpus}]: {rd}")

print("\n== robust (median per round index across runs) ==")
med = {}
for cpus in (1, 4):
    per_round = {}
    for p in pairs:
        r = runs.get((p, cpus))
        if r:
            for i, s in r["rounds"].items():
                per_round.setdefault(i, []).append(s)
    med[cpus] = {i: statistics.median(v) for i, v in sorted(per_round.items())}
    tot = sum(med[cpus].values())
    rd = " ".join(f"r{i}={s:.1f}" for i, s in med[cpus].items())
    print(f"  local[{cpus}]: {rd}  total={tot:.1f}s")
if med.get(1) and med.get(4):
    t1, t4 = sum(med[1].values()), sum(med[4].values())
    print(f"\nmedian-of-rounds efficiency = {t1:.1f} / (4 x {t4:.1f}) = {t1/(4*t4):.2f}")

print("\n== stall-floor (min per round index across runs; stalls only add) ==")
mn = {}
for cpus in (1, 4):
    per_round = {}
    for p in pairs:
        r = runs.get((p, cpus))
        if r:
            for i, s in r["rounds"].items():
                per_round.setdefault(i, []).append(s)
    mn[cpus] = {i: min(v) for i, v in sorted(per_round.items())}
    tot = sum(mn[cpus].values())
    rd = " ".join(f"r{i}={s:.1f}" for i, s in mn[cpus].items())
    print(f"  local[{cpus}]: {rd}  total={tot:.1f}s")
if mn.get(1) and mn.get(4):
    t1, t4 = sum(mn[1].values()), sum(mn[4].values())
    print(f"\nmin-of-rounds efficiency = {t1:.1f} / (4 x {t4:.1f}) = {t1/(4*t4):.2f}")
