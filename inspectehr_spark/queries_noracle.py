"""Registry entries WITHOUT a SQL oracle (rows-only driver checks).

Down to ONE as of r5: the full UDF-gated pipeline (model UDFs — langid /
perplexity — cannot be replayed in SQL). The four sketch queries that
lived here through r4 (minhash_lsh_pairs, simhash_fingerprints,
simhash_hamming_pairs, ann_lsh_topk) moved to queries_r5.py with full
DuckDB value oracles via the md5 / literal-hyperplane replay technique;
the xxhash64 operators they wrapped remain the scale path, unit-tested
in tests/test_operators.py."""

from __future__ import annotations

from pyspark.sql import functions as F

from inspectehr_spark.tables import table as _t


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
    # Drop the raw crawl text BEFORE the mapInArrow boundary (run_pipeline
    # does the same): it is a dead-weight passthrough there — serialized to
    # Python and echoed back per row for data nothing downstream reads
    # (decide/flags consume the re-extracted text_x).
    return decide(
        failure_flags(flag_exact_duplicates(enrich(pages.drop("text")))),
        checks=checks,
    ).drop("p_date")


# q_embedding_near_dup_arrow retired (r5): the arrow engine IS the
# registry's `embedding_near_dup` now (queries_episodes.py) — value-checked
# against the DuckDB oracle — so a separate rows-only arrow entry would be
# a duplicate. The sql HOF engine survives as the parity baseline in
# tests/test_operators.py::test_near_dup_engines_agree only.

NO_ORACLE_QUERIES = {
    "pipeline_decisions": (q_pipeline_decisions, None),
}
