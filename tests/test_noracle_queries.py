"""Rows-only queries: stable schema + deterministic re-execution (these
have no DuckDB oracle — hash functions / UDF models are engine-specific)."""

from __future__ import annotations

import pytest

from inspectehr_spark.queries_noracle import NO_ORACLE_QUERIES

NAMES = sorted(NO_ORACLE_QUERIES)


@pytest.mark.parametrize("name", NAMES)
def test_runs_and_is_deterministic(spark, sf_dir, name):
    fn, _ = NO_ORACLE_QUERIES[name]
    df1 = fn(spark, sf_dir)
    rows1 = sorted(tuple(map(str, r)) for r in df1.collect())
    df2 = fn(spark, sf_dir)
    rows2 = sorted(tuple(map(str, r)) for r in df2.collect())
    assert rows1 == rows2, f"{name} nondeterministic"
    assert df1.columns == df2.columns


def test_pipeline_decisions_sane(spark, sf_dir):
    fn, _ = NO_ORACLE_QUERIES["pipeline_decisions"]
    rows = fn(spark, sf_dir).collect()
    assert len(rows) == 500
    kept = [r for r in rows if r["keep"]]
    dropped = [r for r in rows if not r["keep"]]
    assert kept and dropped  # corpus has both passing and failing docs
    for r in dropped[:20]:
        assert r["first_fail_code"] is not None


def test_ann_lsh_recall_on_clustered_vectors(spark):
    """On clustered data (where ANN is meaningful) multi-probe LSH recall@10
    vs brute force must be high. 20 clusters × 25 vectors, deterministic."""
    import random

    from inspectehr_spark import ann

    rng = random.Random(7)
    rows = []
    vid = 0
    for c in range(20):
        center = [rng.gauss(0, 1) for _ in range(32)]
        for _ in range(25):
            vec = [x + rng.gauss(0, 0.05) for x in center]
            rows.append((vid, vec))
            vid += 1
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    qv = rows[0][1]
    brute = {r["vec_id"] for r in ann.brute_force_topk(emb, qv, k=10).collect()}
    approx = {
        r["vec_id"]
        for r in ann.lsh_topk(emb, qv, k=10, bits=8, probe_radius=1).collect()
    }
    recall = len(brute & approx) / 10
    assert recall >= 0.8, (recall, brute, approx)


def test_ann_ivf_recall_on_clustered_vectors(spark):
    """IVF with a good quantizer (true cluster labels) must recover the
    brute-force top-10 exactly when the probed cells cover the query's
    cluster — 20 clusters × 25 vectors, deterministic."""
    import random

    from inspectehr_spark import ann

    rng = random.Random(11)
    rows = []
    vid = 0
    for c in range(20):
        center = [rng.gauss(0, 1) for _ in range(32)]
        for _ in range(25):
            vec = [x + rng.gauss(0, 0.05) for x in center]
            rows.append((vid, c, vec))
            vid += 1
    emb = spark.createDataFrame(rows, "vec_id long, label int, embedding array<double>")
    qv = rows[0][2]
    cents = ann.label_centroids(emb)
    brute = {r["vec_id"] for r in ann.brute_force_topk(emb, qv, k=10).collect()}
    approx = {
        r["vec_id"]
        for r in ann.ivf_topk(emb, cents, qv, k=10, nprobe=2).collect()
    }
    recall = len(brute & approx) / 10
    assert recall >= 0.9, (recall, brute, approx)
