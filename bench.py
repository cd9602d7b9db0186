"""Benchmark harness: runs the registry's headline queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line.

Each query is forced end-to-end with a noop write (full computation, no
driver collect overhead). Reported value = total wall seconds across all
queries; per-query seconds in "queries".
"""

from __future__ import annotations

import json
import os
import sys
import time

from inspectehr_spark.queries import QUERIES
from inspectehr_spark.session import get_spark


def force(df) -> int:
    df.write.format("noop").mode("overwrite").save()
    return 0


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    try:
        shuffle = max(int(cpus), 8)
    except ValueError:
        shuffle = 32
    spark = get_spark(
        app_name="inspectehr-bench",
        master=f"local[{cpus}]",
        shuffle_partitions=shuffle,
    )
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]

    # Warm the JVM/codegen once with a trivial job so the first measured
    # query doesn't absorb session start-up cost.
    spark.range(1000).selectExpr("sum(id)").collect()

    timings: dict[str, float] = {}
    for name, (fn, _sql) in QUERIES.items():
        t0 = time.perf_counter()
        force(fn(spark, sf_dir))
        timings[name] = round(time.perf_counter() - t0, 3)

    total = round(sum(timings.values()), 3)
    # The driver captures only the TAIL of stdout; a ~76-entry per-query map
    # overflowed it in round 3 ("parsed": null).  Emit full detail to a file,
    # then a compact summary (slowest 5 only) as the FINAL stdout line.
    detail = {
        "metric": "registry_total_wall",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "master": f"local[{cpus}]",
        "shuffle_partitions": shuffle,
    }
    detail_path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH_full.json")
    with open(detail_path, "w") as fh:
        json.dump(detail, fh, indent=1)
    spark.stop()
    slowest = dict(sorted(timings.items(), key=lambda kv: -kv[1])[:5])
    print(
        json.dumps(
            {
                "metric": "registry_total_wall",
                "value": total,
                "unit": "sec",
                "queries": slowest,
                "n_queries": len(timings),
                "sf": detail["sf"],
                "detail_file": "BENCH_full.json",
            }
        )
    )


if __name__ == "__main__":
    sys.exit(main())
