"""Scaling-efficiency bench: the SAME pipeline job on the SAME input at two
parallelism levels (local[8] vs local[32] — the sandbox proxy for N vs 4N
executors per BASELINE.md). Each level runs in a fresh JVM; wall time
covers run_pipeline only (session startup excluded). Writes BENCH.md and
prints one JSON line.

Usage: python scale_bench.py [--docs 20000] [--levels 8,32]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import tempfile

RUNNER = r"""
import json, os, shutil, sys, time
sys.path.insert(0, {repo!r})
from inspectehr_spark.session import get_spark
from inspectehr_spark.pipeline.run import run_pipeline

cpus = int(sys.argv[1]); pages = sys.argv[2]; out = sys.argv[3]
spark = get_spark(app_name=f"scale-bench-{{cpus}}", master=f"local[{{cpus}}]",
                  shuffle_partitions=cpus)
spark.range(1000).selectExpr("sum(id)").collect()   # warm codegen path
if os.path.exists(out):
    shutil.rmtree(out)
t0 = time.perf_counter()
stats = run_pipeline(spark, pages, out, resume=False, salt_partitions=cpus * 8)
wall = time.perf_counter() - t0
print(json.dumps({{"cpus": cpus, "wall_sec": round(wall, 3),
                   "rows": stats["rows"],
                   "docs_per_sec": round(stats["rows"] / wall, 1),
                   "timings": stats.get("timings")}}))
spark.stop()
"""


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=20000)
    ap.add_argument("--levels", default="8,32")
    ap.add_argument("--reps", type=int, default=3,
                    help="repetitions per level, interleaved; best wall "
                         "kept (the sandbox VM has host-level CPU steal — "
                         "best-of-N approximates uncontended performance)")
    ap.add_argument("--pages", default=None, help="reuse an existing corpus")
    ap.add_argument("--no-pin", action="store_true",
                    help="skip taskset CPU pinning (pinning is REQUIRED for "
                         "honest core-scaling numbers: a pandas-UDF task slot "
                         "drives ~3 concurrent processes — JVM feeder, Python "
                         "worker, JVM reader — so an unpinned local[N] run "
                         "consumes ~3N cores)")
    ap.add_argument("--concurrent", action="store_true",
                    help="run BOTH levels at the same wall-clock time on "
                         "DISJOINT pinned core ranges, so a shared-hypervisor "
                         "throttle window hits both legs of a pair equally "
                         "(sequential legs can land in different windows: "
                         "identical 2-core runs measured 218-408 s across "
                         "windows, which makes sequential pair ratios "
                         "meaningless under contention)")
    ap.add_argument("--out-md", default="BENCH.md")
    args = ap.parse_args()
    levels = [int(x) for x in args.levels.split(",")]
    repo = os.path.dirname(os.path.abspath(__file__))

    workdir = tempfile.mkdtemp(prefix="scale_bench_")
    if args.pages:
        pages = args.pages
    else:
        pages = os.path.join(workdir, "pages.parquet")
        sys.path.insert(0, repo)
        from inspectehr_spark.pipeline import corpus

        print(f"generating {args.docs}-doc corpus …", file=sys.stderr)
        corpus.write_pages_parquet(pages, n=args.docs, seed=42)

    runner = RUNNER.format(repo=repo)
    all_runs: dict[int, list[dict]] = {c: [] for c in levels}

    def _parse(stdout: str, stderr: str, cpus: int) -> dict:
        line = [l for l in stdout.splitlines() if l.startswith("{")]
        if not line:
            print(stdout, stderr, file=sys.stderr)
            raise SystemExit(f"runner failed at local[{cpus}]")
        return json.loads(line[-1])

    for rep in range(args.reps):
        if args.concurrent:
            procs = []
            base = 0
            for cpus in levels:
                out = os.path.join(workdir, f"out_{cpus}_{rep}")
                cmd = [sys.executable, "-c", runner, str(cpus), pages, out]
                if not args.no_pin:
                    cmd = ["taskset", "-c", f"{base}-{base + cpus - 1}"] + cmd
                base += cpus
                procs.append(
                    (cpus, subprocess.Popen(
                        cmd, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
                        text=True))
                )
            for cpus, p in procs:
                so, se = p.communicate(timeout=3600)
                r = _parse(so, se, cpus)
                all_runs[cpus].append(r)
                print(f"rep{rep} local[{cpus}] (concurrent): {r}",
                      file=sys.stderr)
            continue
        for cpus in levels:
            out = os.path.join(workdir, f"out_{cpus}_{rep}")
            cmd = [sys.executable, "-c", runner, str(cpus), pages, out]
            if not args.no_pin:
                cmd = ["taskset", "-c", f"0-{cpus - 1}"] + cmd
            proc = subprocess.run(
                cmd, capture_output=True, text=True, timeout=3600,
            )
            r = _parse(proc.stdout, proc.stderr, cpus)
            all_runs[cpus].append(r)
            print(f"rep{rep} local[{cpus}]: {r}", file=sys.stderr)

    results = [
        min(all_runs[c], key=lambda r: r["wall_sec"]) for c in levels
    ]

    lo, hi = results[0], results[-1]
    factor = hi["cpus"] / lo["cpus"]
    # per-rep PAIR efficiencies: both legs of a pair shared a window
    # (exactly so in --concurrent mode); the median pair is the headline
    pair_effs = [
        round(
            (all_runs[levels[-1]][i]["docs_per_sec"]
             / all_runs[levels[0]][i]["docs_per_sec"]) / factor,
            3,
        )
        for i in range(args.reps)
    ]
    efficiency = sorted(pair_effs)[len(pair_effs) // 2]
    ratio = round(efficiency * factor, 3)

    summary = {
        "metric": "pipeline_scaling",
        "unit": "docs/sec",
        "docs": args.docs,
        "concurrent_pairs": bool(args.concurrent),
        "levels": results,
        "pair_efficiencies": pair_effs,
        "speedup": ratio,
        "core_factor": factor,
        "scaling_efficiency": efficiency,
        "passes_0.8": efficiency >= 0.8,
    }
    print(json.dumps(summary))

    with open(os.path.join(repo, args.out_md), "w") as f:
        f.write(
            "# BENCH — pipeline throughput & scaling efficiency\n\n"
            "Same job (`inspectehr_spark.pipeline.run.run_pipeline`), same "
            f"{args.docs}-doc corpus (seed=42, planted defects + multi-100kB "
            "skew docs), fresh JVM per level, wall time excludes session "
            f"startup; best of {args.reps} interleaved reps per level (the "
            "sandbox VM shows host-level CPU steal — see raw runs below). "
            "Sandbox proxy for N vs 4N executors per BASELINE.md.\n\n"
            "| master | shuffle partitions | wall (s) | docs/sec |\n"
            "|---|---|---|---|\n"
        )
        for r in results:
            f.write(
                f"| local[{r['cpus']}] | {r['cpus']} | {r['wall_sec']} | {r['docs_per_sec']} |\n"
            )
        f.write("\nRaw runs (wall s): ")
        f.write(
            "; ".join(
                f"local[{c}]: " + ", ".join(str(r["wall_sec"]) for r in all_runs[c])
                for c in levels
            )
            + "\n"
        )
        mode = (
            "CONCURRENT disjoint-pinned pairs — both legs share each host window"
            if args.concurrent
            else "sequential pairs"
        )
        f.write(f"\nPer-rep pair efficiencies: {pair_effs} ({mode})\n")
        f.write(
            f"\n**speedup {lo['cpus']}→{hi['cpus']} cores: {ratio:.2f}× "
            f"(ideal {factor:.0f}×) → scaling efficiency (median pair) "
            f"{efficiency:.3f}** (target ≥ 0.8)\n\n"
            "Conf: spark.sql.adaptive.enabled=true, AQE skew join on, "
            "salted repartition on xxhash64(url) into 8×cores partitions "
            "before the UDF stages, Arrow batch 2000, file committer v2, "
            "each level pinned to exactly N cores with taskset (a pandas-"
            "UDF task slot drives ~3 concurrent processes, so unpinned "
            "local[N] consumes ~3N cores and fakes the comparison).\n"
        )


if __name__ == "__main__":
    main()
