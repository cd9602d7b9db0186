"""Registry entries WITHOUT a SQL oracle (rows-only driver checks): hash-
based near-dup sketches (engine-specific hash functions can't be replayed
in DuckDB) and the full UDF-gated pipeline. Each still returns a stable
schema and deterministic rows."""

from __future__ import annotations

from pyspark.sql import functions as F

from inspectehr_spark import ann
from inspectehr_spark.operators import dedup
from inspectehr_spark.tables import table as _t


def q_minhash_lsh_pairs(spark, sf_dir):
    """MinHash+LSH near-duplicate candidate pairs over documents (threshold
    lowered — the corpus has no planted near-dups; the operator's exactness
    is unit-tested in tests/test_operators.py with constructed near-dups)."""
    docs = _t(spark, sf_dir, "documents")
    return dedup.minhash_lsh_duplicates(
        docs, text_col="text", id_col="doc_id",
        num_hashes=32, bands=16, jaccard_threshold=0.5,
    )


def q_simhash_fingerprints(spark, sf_dir):
    """64-bit SimHash + bottom-k fingerprint per document."""
    from inspectehr_spark.functions.textfns import fingerprint

    docs = _t(spark, sf_dir, "documents")
    out = dedup.with_simhash(docs, text_col="text", out_col="simhash")
    return out.select(
        "doc_id", "simhash", fingerprint("text").alias("fingerprint")
    )


def q_simhash_hamming_pairs(spark, sf_dir):
    """SimHash banded near-dup pairs (pigeonhole banding + exact
    bit_count verify); threshold loosened — the corpus has no planted
    near-dups; exactness is unit-tested in tests/test_operators.py."""
    docs = _t(spark, sf_dir, "documents")
    return dedup.simhash_hamming_pairs(docs, max_hamming=14, chunks=16)


def q_ann_lsh_topk(spark, sf_dir):
    """Hyperplane-LSH approximate nearest neighbours for the vec_id=0
    query vector (recall vs brute force asserted in tests/test_noracle_queries.py)."""
    emb = _t(spark, sf_dir, "embeddings")
    qv = emb.filter(F.col("vec_id") == 0).select("embedding").first()[0]
    return ann.lsh_topk(emb, [float(x) for x in qv], k=10, bits=6)


def q_pipeline_decisions(spark, sf_dir):
    """The full quality-filter pipeline (extract → UDF models → battery →
    scrub → decisions) over pages synthesized deterministically from the
    documents table (url/warc_ts/html derived from doc_id)."""
    from inspectehr_spark.pipeline.run import (
        decide, enrich, failure_flags, flag_exact_duplicates,
    )

    docs = _t(spark, sf_dir, "documents")
    body = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(F.col("text"), "&", "&amp;"), "<", "&lt;"
        ),
        ">",
        "&gt;",
    )
    pages = docs.select(
        F.concat(F.lit("https://"), "source", F.lit("/"), F.col("doc_id").cast("string")).alias("url"),
        (F.lit("2025-03-01 00:00:00").cast("timestamp") + F.make_interval(mins=F.col("doc_id").cast("int"))).alias("warc_ts"),
        F.encode(
            F.concat(F.lit("<html><head><title>d</title></head><body><p>"), body, F.lit("</p></body></html>")),
            "utf-8",
        ).alias("html"),
        "text",
        "lang",
    ).withColumn("p_date", F.to_date("warc_ts").cast("string"))
    # model-vocabulary checks (langid_agree, perplexity) are calibrated for
    # the pipeline's own corpus generator; on this external table run the
    # heuristic subset (the reference likewise selects checks per class)
    from inspectehr_spark.pipeline import spec

    checks = tuple(
        c for c in spec.CHECKS if c not in ("langid_agree", "perplexity")
    )
    return decide(
        failure_flags(flag_exact_duplicates(enrich(pages))), checks=checks
    ).drop("p_date")


def q_embedding_near_dup_arrow(spark, sf_dir):
    """The arrow-engine (per-cell numpy GEMM) near-dup pairs — the scale
    path beside the oracle-checked sql engine (`embedding_near_dup`). Same
    parameters, same pair semantics; rows-only driver check here because
    BLAS summation order can differ from SQL left-fold arithmetic in the
    last ulp (engines compared pair-for-pair in tests/test_operators.py;
    measured on the 20M-pair sf1 staging, local[32]: sql engine 84 s,
    arrow 13 s — and the arrow run is bounded by the fixture's 10-cell
    parallelism, not by the pair arithmetic)."""
    emb = _t(spark, sf_dir, "embeddings")
    return ann.embedding_near_dup_pairs(
        emb, threshold=0.35, bucket_col="label", bucket_cap=2000, engine="arrow"
    )


NO_ORACLE_QUERIES = {
    "embedding_near_dup_arrow": (q_embedding_near_dup_arrow, None),
    "minhash_lsh_pairs": (q_minhash_lsh_pairs, None),
    "simhash_fingerprints": (q_simhash_fingerprints, None),
    "simhash_hamming_pairs": (q_simhash_hamming_pairs, None),
    "ann_lsh_topk": (q_ann_lsh_topk, None),
    "pipeline_decisions": (q_pipeline_decisions, None),
}
