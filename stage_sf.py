"""Stage an sf1-scale test directory by deterministic extrapolation of the
driver's sf0.1 parquet (VERDICT r2 #9: a scale datapoint beyond sf0.1 for
the pair-heavy queries).

Only the web-scale tables grow (x10): documents (word-shuffled replicas so
replicas are NOT near-duplicates of their source — the pair structure
scales with n, not with a replication artifact), embeddings (perturbed
replicas, cluster labels kept so cell sizes grow 10x — exactly the
within-cell quadratic the bucket caps must bound), events (user/event id
offsets so entity counts grow 10x). The TPC-H tables are copied unscaled —
they exist so `bench.py` runs end-to-end; the growth curve reads only the
scaled-table queries.

Everything is seed-fixed; no external data. Usage:
    python stage_sf.py [--src /root/testdata/sf0.1] [--dst /tmp/sf1] [--mult 10]
"""

from __future__ import annotations

import argparse
import os
import random
import shutil

import duckdb
import numpy as np

UNSCALED = ["region", "nation", "customer", "supplier", "part", "orders", "lineitem"]


def stage(src: str, dst: str, mult: int = 10, seed: int = 7) -> None:
    os.makedirs(dst, exist_ok=True)
    con = duckdb.connect()

    docs = con.sql(f"SELECT * FROM '{src}/documents.parquet'").df()
    out = []
    for r in range(mult):
        d = docs.copy()
        d["doc_id"] = d["doc_id"] + r * 10_000_000
        if r:
            rng = random.Random(seed * 1000 + r)
            d["text"] = [
                " ".join(rng.sample(ws, len(ws))) if (ws := t.split()) else t
                for t in d["text"]
            ]
            d["n_chars"] = d["text"].str.len()
        out.append(d)
    import pandas as pd

    con.register("docs_big", pd.concat(out, ignore_index=True))
    con.sql(f"COPY docs_big TO '{dst}/documents.parquet' (FORMAT PARQUET)")

    emb = con.sql(f"SELECT * FROM '{src}/embeddings.parquet'").df()
    out = []
    for r in range(mult):
        e = emb.copy()
        e["vec_id"] = e["vec_id"] + r * 10_000_000
        if r:
            rng = np.random.default_rng(seed * 1000 + r)
            e["embedding"] = [
                (np.asarray(v, dtype=np.float32)
                 + rng.uniform(-0.01, 0.01, len(v)).astype(np.float32))
                for v in e["embedding"]
            ]
        out.append(e)
    con.register("emb_big", pd.concat(out, ignore_index=True))
    con.sql(f"COPY emb_big TO '{dst}/embeddings.parquet' (FORMAT PARQUET)")

    con.sql(
        f"""
        COPY (
          SELECT event_id + r.r * 100_000_000 AS event_id, ts,
                 user_id + r.r * 100_000 AS user_id, event_type, value, props
          FROM '{src}/events.parquet', (SELECT unnest(range({mult})) AS r) r
        ) TO '{dst}/events.parquet' (FORMAT PARQUET)
        """
    )

    for t in UNSCALED:
        shutil.copyfile(f"{src}/{t}.parquet", f"{dst}/{t}.parquet")

    for t in ["documents", "embeddings", "events"]:
        n = con.sql(f"SELECT count(*) FROM '{dst}/{t}.parquet'").fetchone()[0]
        print(f"{t}: {n}")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--dst", default="/tmp/sf1")
    ap.add_argument("--mult", type=int, default=10)
    args = ap.parse_args()
    stage(args.src, args.dst, args.mult)
