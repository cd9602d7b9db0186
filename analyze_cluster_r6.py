"""Join the r6 definitive cluster-bench log with the parallel-capacity
trace and print the paired-rep table BENCH_cluster.md records.

Two instruments per arm:
- cal/during: single-thread sha256 probe (harness-built-in) — detects
  clock-speed/steal affecting ONE core.
- host_capacity_r6.log: a concurrent 60 s-cadence monitor measuring
  aggregate 8-thread sha256 throughput — detects PARALLEL capacity loss,
  which single-thread probes cannot see and which hits the 8-core arms
  ~4x harder than the 2-core arms.

Usage: python analyze_cluster_r6.py [cluster_r6.log] [host_capacity_r6.log]
"""

from __future__ import annotations

import json
import re
import sys


def parse_log(path: str):
    arms = []
    pat = re.compile(
        r"rep(\d+) (engine|pipeline|pipeline_native) (\d+)c/\d+exec: "
        r"([\d.]+)s \((?:cal ([\d.]+)/s, )?during ([\d.None]+)/s\)"
    )
    for line in open(path):
        m = pat.search(line)
        if m:
            rep, mode, cores, wall, cal, during = m.groups()
            arms.append(
                dict(rep=int(rep), mode=mode, cores=int(cores),
                     wall=float(wall),
                     cal=float(cal) if cal else None,
                     during=float(during) if during != "None" else None)
            )
    return arms


def main():
    log = sys.argv[1] if len(sys.argv) > 1 else "cluster_r6.log"
    arms = parse_log(log)
    # dedupe (log lines can repeat under tail concatenation)
    seen, uniq = set(), []
    for a in arms:
        k = (a["rep"], a["mode"], a["cores"])
        if k not in seen:
            seen.add(k)
            uniq.append(a)
    arms = uniq
    modes = sorted({a["mode"] for a in arms})
    levels = sorted({a["cores"] for a in arms})
    lo, hi = levels[0], levels[-1]
    factor = hi / lo
    out = {}
    for mode in modes:
        walls = {c: {a["rep"]: a for a in arms
                     if a["mode"] == mode and a["cores"] == c}
                 for c in levels}
        paired = []
        for rep in sorted(walls[lo]):
            if rep in walls[hi]:
                a, b = walls[lo][rep], walls[hi][rep]
                eff = round((a["wall"] / b["wall"]) / factor, 3)
                paired.append(
                    dict(rep=rep, lo=a["wall"], hi=b["wall"], eff=eff,
                         cal_lo=a["during"], cal_hi=b["during"])
                )
        effs = sorted(p["eff"] for p in paired)
        best = round(
            (min(a["wall"] for a in walls[lo].values())
             / min(b["wall"] for b in walls[hi].values())) / factor, 3
        ) if walls[lo] and walls[hi] else None
        out[mode] = dict(
            pairs=paired,
            median_eff=effs[len(effs) // 2] if effs else None,
            best_pair_eff=best,
        )
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
