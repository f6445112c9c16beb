#!/usr/bin/env python3
"""Aggregate interleaved ScalingBench runs into the round-3 evidence table.

Reads <outDir>/ilv<seq><NN>_c<cpus>.json in sequence order and reports:
  - every ADJACENT c1/c4 pair (both orders), raw efficiency
    T(1)/(4*T(4)) and probe-normalized efficiency, where each run's wall
    time is first scaled by (its own bandwidth probe / the level's median
    probe) — a run that sat in a slow machine phase has a proportionally
    low probe, and the normalization removes exactly that factor;
  - medians over pairs (raw and normalized), split and combined by order;
  - per-level totals, throughputs, probe ranges.

The bar (BASELINE.json): efficiency >= 0.8 on the median over >= 6 pairs,
both orders represented.
"""
import glob
import json
import re
import statistics
import sys

out = sys.argv[1] if len(sys.argv) > 1 else "BENCH/r3"
seq = sys.argv[2] if len(sys.argv) > 2 else ""

runs = []  # in sequence order: dict(tag, idx, cpus, secs, tput, probe, fetched)
for f in sorted(glob.glob(f"{out}/ilv{seq}*_c*.json")):
    m = re.search(r"ilv(.+?)(\d+)_c(\d+)\.json$", f)
    if not m:
        continue
    try:
        j = json.load(open(f))
    except Exception:
        continue
    cpus = int(m.group(3))
    lvl = j.get(f"local[{cpus}]")
    if not lvl:
        continue
    runs.append({
        "tag": f"{m.group(1)}{m.group(2)}", "idx": int(m.group(2)), "cpus": cpus,
        "secs": lvl["secs"], "tput": lvl["urls_per_sec"],
        "probe": lvl.get("probe_gibs"), "fetched": lvl["fetched"],
    })
runs.sort(key=lambda r: r["idx"])
if not runs:
    sys.exit(f"no runs matching {out}/ilv{seq}*_c*.json")

fetched = {r["fetched"] for r in runs if r["cpus"] == runs[0]["cpus"]}
print(f"runs: {len(runs)}; fetched counts per level consistent: {len(fetched) == 1}")

med_probe = {}
for c in (1, 4):
    ps = [r["probe"] for r in runs if r["cpus"] == c and r["probe"]]
    if ps:
        med_probe[c] = statistics.median(ps)
        print(f"local[{c}]: {len(ps)} runs, median probe {med_probe[c]:.2f} GiB/s "
              f"(range {min(ps):.2f}-{max(ps):.2f}), "
              f"median T {statistics.median([r['secs'] for r in runs if r['cpus']==c]):.1f}s")

def norm_secs(r):
    """Wall time corrected to median machine speed for its level."""
    if r["probe"] and med_probe.get(r["cpus"]):
        return r["secs"] * r["probe"] / med_probe[r["cpus"]]
    return r["secs"]

pairs = []  # (order, raw_eff, norm_eff, tag_a, tag_b)
for a, b in zip(runs, runs[1:]):
    if {a["cpus"], b["cpus"]} != {1, 4}:
        continue
    one, four = (a, b) if a["cpus"] == 1 else (b, a)
    order = "c1->c4" if a["cpus"] == 1 else "c4->c1"
    raw = one["secs"] / (4 * four["secs"])
    norm = norm_secs(one) / (4 * norm_secs(four))
    pairs.append((order, raw, norm, a["tag"], b["tag"]))

print("\n== adjacent pairs ==")
for order, raw, norm, ta, tb in pairs:
    print(f"  {ta}->{tb} ({order}): raw={raw:.2f} norm={norm:.2f}")

def med(xs):
    return statistics.median(xs) if xs else float("nan")

raws = [p[1] for p in pairs]
norms = [p[2] for p in pairs]
by_order = {o: [p[2] for p in pairs if p[0] == o] for o in ("c1->c4", "c4->c1")}
print(f"\npairs: {len(pairs)} total "
      f"({len(by_order['c1->c4'])} c1->c4, {len(by_order['c4->c1'])} c4->c1)")
print(f"median raw efficiency        = {med(raws):.2f}")
print(f"median normalized efficiency = {med(norms):.2f}")
for o, xs in by_order.items():
    print(f"  median normalized, {o} pairs only = {med(xs):.2f}")

# level-median estimator: all c1 runs vs all c4 runs, normalized
t1 = med([norm_secs(r) for r in runs if r["cpus"] == 1])
t4 = med([norm_secs(r) for r in runs if r["cpus"] == 4])
print(f"\nlevel-median estimator: T1={t1:.1f}s T4={t4:.1f}s eff={t1/(4*t4):.2f}")
