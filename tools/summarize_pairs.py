#!/usr/bin/env python3
"""Aggregate two-level scaling pairs (ScalingBench JSON) into the
campaign table BENCH/BASELINE.md carries per round.

  tools/summarize_pairs.py BENCH/r5 seqM0 seqM1 seqM2 seqM3

Per pair: raw wall efficiency T(N)/(4*T(4N)), executor-work efficiency
task_secs(N)/task_secs(4N), floors, and probe-normalized efficiency
(each level's wall scaled by its own measured per-thread bandwidth
capacity — corrects the box's systematic multi-thread droop, NOT phase
noise; see r3 protocol notes). Prints medians over the pair set.
"""
import json
import statistics
import sys


def last_json(path):
    with open(path) as f:
        rows = [l for l in f if l.startswith("{")]
    return json.loads(rows[-1])


def level(path):
    d = last_json(path)
    key = next(k for k in d if k.startswith("local["))
    lv = d[key]
    lv["cores"] = int(key[6:-1])
    return lv


def main():
    out, names = sys.argv[1], sys.argv[2:]
    rows = []
    for p in names:
        n1 = level(f"{out}/{p}_n1.json")
        n4 = level(f"{out}/{p}_n4.json")
        assert n4["cores"] == 4 * n1["cores"], (p, n1["cores"], n4["cores"])
        assert n1["fetched"] == n4["fetched"], p
        eff = n1["secs"] / (4 * n4["secs"])
        weff = n1["task_secs"] / n4["task_secs"]
        # per-thread capacity from each level's own probe
        c1 = n1["probe_gibs"] / n1["cores"]
        c4 = n4["probe_gibs"] / n4["cores"]
        neff = eff * (c1 / c4)
        rows.append(dict(pair=p, t1=n1["secs"], t4=n4["secs"], eff=eff,
                         weff=weff, neff=neff, f1=n1.get("floor_secs"),
                         f4=n4.get("floor_secs"), p1=c1, p4=c4,
                         fetched=n1["fetched"]))
    for r in rows:
        print(f"{r['pair']}: T(N)={r['t1']:.1f}s T(4N)={r['t4']:.1f}s "
              f"raw={r['eff']:.2f} work={r['weff']:.2f} norm={r['neff']:.2f} "
              f"floor {r['f1']}/{r['f4']}s probe/thread {r['p1']:.2f}/{r['p4']:.2f} "
              f"fetched={r['fetched']}")
    med = lambda k: statistics.median(r[k] for r in rows)
    print(f"MEDIANS over {len(rows)} pairs: raw={med('eff'):.2f} "
          f"work={med('weff'):.2f} norm={med('neff'):.2f}")
    # level medians (the r3 robust estimator): median T(N) vs 4*median T(4N)
    lm = statistics.median(r["t1"] for r in rows) / (
        4 * statistics.median(r["t4"] for r in rows))
    print(f"LEVEL-MEDIAN: {lm:.2f}")


if __name__ == "__main__":
    main()
