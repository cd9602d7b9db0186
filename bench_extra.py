"""Per-query isolation bench (guide §1.4): times individual registry
queries with the noop sink, N repetitions each, on the same session
configuration as bench.py (which is FROZEN for measurement — this file
exists so optimization work can be measured per query without touching
it). Optionally dumps .explain("formatted") per query.

Usage:
    python bench_extra.py [--reps N] [--plans DIR] [--suffix S] [name ...]

With no names, runs every registry query once (a full sweep). Prints one
JSON line per query: {"query": ..., "secs": [..], "min": ..}.
"""

from __future__ import annotations

import argparse
import json
import os
import time

from inspectehr_spark.queries import QUERIES
from inspectehr_spark.session import get_spark


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="*")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--plans", default=None, help="directory for explain dumps")
    ap.add_argument("--suffix", default="before")
    ap.add_argument("--out", default=None, help="JSON results file")
    ap.add_argument("--warm", action="store_true", help="warm the session first")
    args = ap.parse_args()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    try:
        shuffle = max(int(cpus), 8)
    except ValueError:
        shuffle = 32
    spark = get_spark(
        app_name="inspectehr-bench-extra",
        master=f"local[{cpus}]",
        shuffle_partitions=shuffle,
    )
    spark.range(1000).selectExpr("sum(id)").collect()
    if args.warm:
        # run a few cheap unrelated registry queries so the targets see a
        # warm session (scan footers, shuffle machinery, codegen infra) —
        # the position they occupy in the real bench.py sequence
        for wname in ("pricing_summary", "langid_heuristic", "url_normalize"):
            fn, _ = QUERIES[wname]
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()

    names = args.names or list(QUERIES)
    results = {}
    for name in names:
        if name not in QUERIES:
            print(json.dumps({"query": name, "error": "unknown"}))
            continue
        fn, _ = QUERIES[name]
        if args.plans:
            from inspectehr_spark.plans.inspect import formatted_plan

            os.makedirs(args.plans, exist_ok=True)
            plan = formatted_plan(fn(spark, sf_dir))
            with open(
                os.path.join(args.plans, f"{name}_{args.suffix}.txt"), "w"
            ) as fh:
                fh.write(plan)
        secs = []
        for rep in range(args.reps):
            spark.sparkContext.setJobDescription(f"{name} rep{rep}")
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            secs.append(round(time.perf_counter() - t0, 3))
            spark.sparkContext.setJobDescription(None)
        results[name] = secs
        print(
            json.dumps(
                {"query": name, "secs": secs, "min": min(secs) if secs else None}
            ),
            flush=True,
        )
    if args.out:
        with open(args.out, "w") as fh:
            json.dump(results, fh, indent=1)
    spark.stop()


if __name__ == "__main__":
    main()
