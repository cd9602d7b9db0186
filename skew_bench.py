"""Skewed-domain stress for the r5 domain family (VERDICT r5 next-round
#6): `domain_profile` and `tfidf_top_terms` are benched in BENCH.md on
~20 balanced domains; this harness synthesises a corpus where ONE domain
holds 50% of all documents and a 5-term hot vocabulary dominates its
text, then measures wall time AND the per-task time distribution of the
heaviest stage (Spark REST status API) to show no single-task straggler.

Why these shapes survive the skew (what the numbers evidence):
- `domain_profile`: the wide exchange is keyed by md5(text) — document
  TEXT, not domain — so a 50%-of-rows domain spreads over the full hash
  space; the domain-keyed groupBy behind it sees rows AFTER map-side
  partial aggregation (algebraic count/avg/sum), so the hot key crosses
  the wire as one partial row per map task, not 300k rows.
- `tfidf_top_terms`: explode → groupBy(domain, term) also partial-aggs
  map-side (hot (d0, hotterm) pairs collapse per task); the final top-k
  window is over VOCABULARY-sized rows.

A straggler would show up as max-task-time >> median in the heaviest
stage; the gate in tests/test_domains.py asserts the structural property
(partial HashAggregate below the exchange), this harness records the
measured distribution. Seed-fixed, no external data.

Usage: python skew_bench.py [--docs 600000] [--out /tmp/skew_sf1]
"""

from __future__ import annotations

import argparse
import json
import os
import time
import urllib.request

import numpy as np


def stage_skewed(out: str, n_docs: int, seed: int = 11,
                 hot_frac: float = 0.5) -> str:
    """Write documents.parquet: domain d0 holds `hot_frac` of docs and its
    text is 80% drawn from a 5-term hot vocabulary; the rest spread
    uniformly over 200 domains with a 5000-term uniform vocabulary.
    hot_frac=0 is the balanced control corpus."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    path = os.path.join(out, "documents.parquet")
    if os.path.exists(path):
        return out
    os.makedirs(out, exist_ok=True)
    rng = np.random.default_rng(seed)
    n_hot = int(n_docs * hot_frac)
    domains = np.concatenate(
        [
            np.zeros(n_hot, dtype=np.int64),
            rng.integers(1, 201, size=n_docs - n_hot),
        ]
    )
    hot_vocab = np.array([f"hot{i}" for i in range(5)])
    cold_vocab = np.array([f"w{i}" for i in range(5000)])
    toks_per_doc = 30
    texts = []
    # vectorised draw: one (n_docs, toks) index matrix per vocab
    hot_idx = rng.integers(0, 5, size=(n_docs, toks_per_doc))
    cold_idx = rng.integers(0, 5000, size=(n_docs, toks_per_doc))
    use_hot = rng.random((n_docs, toks_per_doc)) < 0.8
    is_hot_doc = domains == 0
    for i in range(n_docs):
        if is_hot_doc[i]:
            words = np.where(
                use_hot[i], hot_vocab[hot_idx[i]], cold_vocab[cold_idx[i]]
            )
        else:
            words = cold_vocab[cold_idx[i]]
        texts.append(" ".join(words))
    langs = np.where(rng.random(n_docs) < 0.7, "en", "de")
    tbl = pa.table(
        {
            "doc_id": pa.array(np.arange(n_docs, dtype=np.int64)),
            "text": pa.array(texts),
            "lang": pa.array(langs),
            "source": pa.array([f"d{d}" for d in domains]),
            "n_chars": pa.array(
                np.array([len(t) for t in texts], dtype=np.int64)
            ),
        }
    )
    pq.write_table(tbl, path)
    return out


def _stage_task_skew(seen: set[int], ui_port: int = 4040) -> dict:
    """Max/median task time of the heaviest stage COMPLETED SINCE the
    last call (stage ids accumulate in `seen`) via the REST status API —
    the straggler instrument, scoped per query."""
    base = f"http://localhost:{ui_port}/api/v1/applications"
    apps = json.load(urllib.request.urlopen(base))
    app_id = apps[0]["id"]
    stages = json.load(
        urllib.request.urlopen(f"{base}/{app_id}/stages?status=complete")
    )
    fresh = [s for s in stages if s["stageId"] not in seen]
    seen.update(s["stageId"] for s in stages)
    if not fresh:
        return {"n_tasks": 0}
    heaviest = max(fresh, key=lambda s: s.get("executorRunTime", 0))
    sid, att = heaviest["stageId"], heaviest["attemptId"]
    detail = json.load(
        urllib.request.urlopen(
            f"{base}/{app_id}/stages/{sid}/{att}?details=true&taskStatus=SUCCESS"
        )
    )
    tasks = list(detail.get("tasks", {}).values())
    times = sorted(
        t["taskMetrics"]["executorRunTime"] for t in tasks if "taskMetrics" in t
    )
    if not times:
        return {"stage": sid, "n_tasks": 0}
    med = times[len(times) // 2]
    return {
        "stage": sid,
        "name": heaviest.get("name", "")[:60],
        "n_tasks": len(times),
        "task_ms_median": med,
        "task_ms_max": times[-1],
        "max_over_median": round(times[-1] / max(med, 1), 2),
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=600_000)
    ap.add_argument("--out", default="/tmp/skew_sf1")
    ap.add_argument("--cpus", type=int, default=32)
    ap.add_argument("--hot-frac", type=float, default=0.5)
    args = ap.parse_args()

    print(f"staging {args.docs} skewed docs at {args.out} ...", flush=True)
    stage_skewed(args.out, args.docs, hot_frac=args.hot_frac)

    from inspectehr_spark.operators.domains import domain_profile, tfidf_top_terms
    from inspectehr_spark.session import get_spark

    spark = get_spark(
        app_name="skew-bench",
        master=f"local[{args.cpus}]",
        shuffle_partitions=args.cpus,
        extra_conf={"spark.ui.enabled": "true"},  # REST status API is the
        # straggler instrument; the session default keeps it off
    )
    spark.range(1000).selectExpr("sum(id)").collect()
    docs = spark.read.parquet(os.path.join(args.out, "documents.parquet"))

    results = {}
    seen: set[int] = set()
    _stage_task_skew(seen)        # absorb warm-up stages out of the window
    for name, frame in (
        ("domain_profile", domain_profile(docs)),
        ("tfidf_top_terms", tfidf_top_terms(docs)),
    ):
        t0 = time.perf_counter()
        frame.write.format("noop").mode("overwrite").save()
        wall = round(time.perf_counter() - t0, 2)
        skew = _stage_task_skew(seen)
        results[name] = {"wall_sec": wall, "heaviest_stage": skew}
        print(json.dumps({name: results[name]}), flush=True)

    print(json.dumps({"metric": "skewed_domain_stress", "docs": args.docs,
                      "hot_frac": args.hot_frac, "results": results}))


if __name__ == "__main__":
    main()
