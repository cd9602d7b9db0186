"""Similarity search over embedding columns.

* `brute_force_topk` — exact cosine top-k against a query vector: one scan,
  JVM-side zip_with/aggregate arithmetic, no shuffle (top-k via
  orderBy+limit → Spark's TakeOrderedAndProject, partial per partition).
* `with_hyperplane_buckets` / `lsh_topk` — random-hyperplane LSH: b sign
  bits from deterministic ±1 hyperplanes (seeded, reproducible across
  runs/executors), candidates share the bucket; exact re-rank inside. The
  scale path: the bucket join is an equi-join on a small int key, the
  brute-force cosine only touches candidates.

At 10^9+ vectors the bucketed variant is the only viable plan; the
brute-force is the correctness baseline the recall test compares against.
"""

from __future__ import annotations

import random

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def _as_double(col):
    return F.transform(col, lambda x: x.cast("double"))


def brute_force_topk(
    emb: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k: (id, cos_sim) ordered desc with deterministic
    id tie-break."""
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    staged = emb.select(
        F.col(id_col).alias("vec_id"), _as_double(F.col(vec_col)).alias("_v")
    ).withColumn("_q", q)
    v, qq = F.col("_v"), F.col("_q")
    sim = _dot(v, qq) / (F.sqrt(_dot(v, v)) * F.sqrt(_dot(qq, qq)))
    return (
        staged.select("vec_id", F.round(sim, 6).alias("cos_sim"))
        .orderBy(F.col("cos_sim").desc(), "vec_id")
        .limit(k)
    )


def hyperplanes(dim: int, bits: int = 12, seed: int = 42) -> list[list[int]]:
    """Deterministic ±1 hyperplanes (seeded PRNG, reproducible anywhere)."""
    rng = random.Random(seed)
    return [[rng.choice((-1, 1)) for _ in range(dim)] for _ in range(bits)]


def bucket_expr(vec_col, planes: list[list[int]]):
    """Pack sign(dot(v, h_b)) bits into one integer bucket id (native SQL)."""
    v = vec_col
    out = F.lit(0).cast("long")
    for b, plane in enumerate(planes):
        h = F.array(*[F.lit(float(x)) for x in plane])
        bit = F.when(_dot(v, h) >= 0, F.lit(2**b).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
        out = out + bit
    return out


def with_hyperplane_buckets(
    emb: DataFrame,
    bits: int = 12,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = None,
) -> DataFrame:
    if dim is None:
        dim = len(emb.select(vec_col).first()[0])
    planes = hyperplanes(dim, bits, seed)
    staged = emb.select(
        F.col(id_col).alias("vec_id"), _as_double(F.col(vec_col)).alias("_v")
    )
    return staged.withColumn("bucket", bucket_expr(F.col("_v"), planes))


def lsh_topk(
    emb: DataFrame,
    query_vec: list[float],
    k: int = 10,
    bits: int = 8,
    seed: int = 42,
    probe_radius: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k with multi-probe: candidates = vectors whose
    bucket is within `probe_radius` Hamming distance of the query's bucket
    (standard multi-probe LSH — recovers recall lost to near-boundary
    hyperplane flips); exact cosine re-rank inside the candidate set.
    Returns (vec_id, cos_sim)."""
    dim = len(query_vec)
    planes = hyperplanes(dim, bits, seed)
    qbucket = 0
    for b, plane in enumerate(planes):
        if sum(q * h for q, h in zip(query_vec, plane)) >= 0:
            qbucket += 2**b
    probes = {qbucket}
    frontier = {qbucket}
    for _ in range(probe_radius):
        frontier = {bkt ^ (1 << b) for bkt in frontier for b in range(bits)}
        probes |= frontier
    bucketed = with_hyperplane_buckets(
        emb, bits=bits, seed=seed, id_col=id_col, vec_col=vec_col, dim=dim
    )
    cands = bucketed.filter(F.col("bucket").isin(*sorted(probes)))
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    staged = cands.withColumn("_q", q)
    v, qq = F.col("_v"), F.col("_q")
    sim = _dot(v, qq) / (F.sqrt(_dot(v, v)) * F.sqrt(_dot(qq, qq)))
    return (
        staged.select("vec_id", F.round(sim, 6).alias("cos_sim"))
        .orderBy(F.col("cos_sim").desc(), "vec_id")
        .limit(k)
    )


def label_centroids(
    emb: DataFrame,
    label_col: str = "label",
    vec_col: str = "embedding",
    round_dp: int = 6,
) -> DataFrame:
    """Per-label mean vector — the IVF coarse quantizer's centroid table
    (cid, centroid: array<double>). Components round to `round_dp` so the
    downstream argmax assignment is stable across summation orders
    (distributed partial aggregation is order-nondeterministic in the last
    ulp; rounding collapses that before any comparison)."""
    dims = emb.select(
        F.col(label_col).alias("cid"),
        F.posexplode(_as_double(F.col(vec_col))).alias("pos", "x"),
    )
    cent0 = dims.groupBy("cid", "pos").agg(F.round(F.avg("x"), round_dp).alias("m"))
    return cent0.groupBy("cid").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "m"))), lambda s: s["m"]
        ).alias("centroid")
    )


def ivf_topk(
    emb: DataFrame,
    centroids: DataFrame,
    query_vec: list[float],
    k: int = 10,
    nprobe: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF approximate top-k: assign every vector to its nearest centroid
    (coarse quantization), probe the `nprobe` centroids nearest the query,
    exact cosine re-rank inside the probed cells only.

    The second bucketed ANN scale path beside hyperplane LSH (`lsh_topk`).
    Scale shape: the centroid table is tiny (≤ thousands of cells) →
    broadcast nested-loop against the vectors for assignment (one scan, no
    fact shuffle — at 10^9+ vectors persist `assigned` bucketed by cid so
    queries touch only probed cells); the probe list is nprobe rows →
    broadcast semi join; the re-rank is TakeOrderedAndProject over
    candidates. Cosines round to 6dp BEFORE every ranking so verdicts are
    ulp-stable (deterministic ties break on cid / vec_id)."""
    from pyspark.sql import Window

    e = emb.select(
        F.col(id_col).alias("vec_id"), _as_double(F.col(vec_col)).alias("_v")
    )
    c = F.col("centroid")
    v = F.col("_v")
    cos_vc = F.round(
        _dot(v, c) / (F.sqrt(_dot(v, v)) * F.sqrt(_dot(c, c))), 6
    )
    w = Window.partitionBy("vec_id").orderBy(F.col("_cos").desc(), "cid")
    assigned = (
        e.crossJoin(F.broadcast(centroids))
        .withColumn("_cos", cos_vc)
        .withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") == 1)
        .select("vec_id", "_v", "cid")
    )

    q = F.array(*[F.lit(float(x)) for x in query_vec])
    cos_qc = F.round(
        _dot(F.col("_q"), c) / (F.sqrt(_dot(F.col("_q"), F.col("_q"))) * F.sqrt(_dot(c, c))), 6
    )
    probes = (
        centroids.withColumn("_q", q)
        .select("cid", cos_qc.alias("_qcos"))
        .orderBy(F.col("_qcos").desc(), "cid")
        .limit(nprobe)
        .select("cid")
    )
    cands = assigned.join(F.broadcast(probes), "cid", "leftsemi")
    staged = cands.withColumn("_q", q)
    sim = _dot(v, F.col("_q")) / (
        F.sqrt(_dot(v, v)) * F.sqrt(_dot(F.col("_q"), F.col("_q")))
    )
    return (
        staged.select("vec_id", F.round(sim, 6).alias("cos_sim"))
        .orderBy(F.col("cos_sim").desc(), "vec_id")
        .limit(k)
    )


def embedding_near_dup_pairs(
    emb: DataFrame,
    threshold: float = 0.35,
    bucket_col: str = "label",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs, BUCKETED: candidate pairs
    share a bucket (an IVF cell from `label_centroids`+assignment, an LSH
    bucket from `with_hyperplane_buckets`, or any precomputed cluster
    column) — a keyed equi self-join, never the O(n²) cross product; the
    exact cosine verifies inside the bucket only. The embedding analog of
    the MinHash/SimHash band joins in operators/dedup.py.

    Returns (vec_id_a, vec_id_b, cos_sim), a < b, cosine rounded to 6dp
    BEFORE the threshold comparison (ulp-stable verdicts). Recall is the
    quantizer's: pairs split across buckets are missed — probe multiple
    cells (multi-assign) when the threshold is loose relative to cell
    diameter. Within-cell work is O(cell²): size the quantizer so cells
    stay bounded (more centroids / more hyperplane bits at higher corpus
    scale); no silent row cap is applied here."""
    staged = emb.select(
        F.col(id_col).alias("vec_id"),
        F.col(bucket_col).alias("_bkt"),
        _as_double(F.col(vec_col)).alias("_v"),
    )
    # norms precompute ONCE per vector (before the self-join) — the pair
    # side then evaluates a single dot instead of three
    e = staged.withColumn("_n", F.sqrt(_dot(F.col("_v"), F.col("_v"))))
    a, b = e.alias("a"), e.alias("b")
    va, vb = F.col("a._v"), F.col("b._v")
    cos = F.round(_dot(va, vb) / (F.col("a._n") * F.col("b._n")), 6)
    return (
        a.join(
            b,
            (F.col("a._bkt") == F.col("b._bkt"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .select(
            F.col("a.vec_id").alias("vec_id_a"),
            F.col("b.vec_id").alias("vec_id_b"),
            cos.alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= threshold)
    )
