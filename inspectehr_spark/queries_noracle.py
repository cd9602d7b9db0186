"""Formerly the rows-only registry — EMPTY of rows-only entries as of r6.

`pipeline_decisions` (the last rows-only entry, r1-r5) now carries a FULL
DuckDB value oracle. The unlock: this registry variant of the pipeline
runs the heuristic check subset (langid_agree / perplexity excluded —
they are calibrated for the pipeline's own corpus generator, see
q_pipeline_decisions), and decide() projects only (url, keep,
first_fail_code, scrubbed_text) — so although the Spark path still
executes the fused mapInArrow model stage, no MODEL OUTPUT reaches the
compared columns. Everything that does — extraction (regexp + unescape
chain), the Gopher/C4 heuristic battery, the exact-dup window, the
lexicographic-min first_fail_code, and the ordered PII/toxicity scrub —
is deterministic native expression work both engines can replay. The SQL
is GENERATED at import from pipeline/spec.py (thresholds, scrub chain,
stopwords), so spec changes cannot silently diverge the oracle.

Replay notes: the exact-dup verdict partitions by text_x itself where
Spark partitions by the salt-first double-xxhash64 of text_x — identical
semantics modulo ~2^-128 collisions; dup_ngram_frac distincts trigram
STRINGS where Spark distincts xxhash64 values — identical modulo ~2^-64
within-doc collisions (both replay choices documented at the Spark call
sites). The full model path (langid + perplexity COLUMNS) remains
value-checked in pytest against the serial labeler (F1 = 1.0) and the
mapInArrow/pandas-UDF equivalence test."""

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

def _pipeline_decisions_sql() -> str:
    """DuckDB replay of the heuristic-subset pipeline, generated from
    pipeline/spec.py so the oracle cannot drift from the spec."""
    from inspectehr_spark.functions.textfns import ALL_STOPWORDS
    from inspectehr_spark.pipeline import spec

    sw = ", ".join(f"'{w}'" for w in ALL_STOPWORDS)
    checks = [c for c in spec.CHECKS if c not in ("langid_agree", "perplexity")]
    langs = ", ".join(f"'{l}'" for l in spec.ALLOWED_LANGS)
    flag_expr = {
        "doc_length":
            f"NOT (n_chars::DOUBLE BETWEEN {spec.LEN_LO} AND {spec.LEN_HI})",
        "word_count":
            f"NOT (n_tokens::DOUBLE BETWEEN {spec.TOK_LO} AND {spec.TOK_HI})",
        "mean_word_length":
            f"(mean_wl IS NOT NULL AND NOT (mean_wl BETWEEN {spec.MWL_LO} "
            f"AND {spec.MWL_HI}))",
        "symbol_ratio":
            f"(sym_ratio IS NOT NULL AND sym_ratio > {spec.SYM_HI})",
        "stopword_ratio":
            f"(sw_ratio IS NOT NULL AND sw_ratio < {spec.SW_LO})",
        "dup_ngram_frac": f"(dupng > {spec.DUPNG_HI})",
        "lang_allowed": f"(lang NOT IN ({langs}))",
        "warc_ts_bounds":
            "NOT (warc_ts BETWEEN TIMESTAMP "
            f"'{spec.TS_LO_ISO.replace('T', ' ')}' AND TIMESTAMP "
            f"'{spec.TS_HI_ISO.replace('T', ' ')}')",
        "exact_duplicate": "is_dup",
    }
    fails = ", ".join(
        f"CASE WHEN {flag_expr[c]} THEN '{c}' END" for c in checks
    )
    scrub = "text_x"
    for pat, repl in spec.SCRUB_CHAIN:
        p = pat.replace("'", "''")
        scrub = f"regexp_replace({scrub}, '{p}', '{repl}', 'g')"
    return f"""
WITH pages AS (
  SELECT 'https://' || source || '/' || CAST(doc_id AS VARCHAR) AS url,
         TIMESTAMP '2025-03-01 00:00:00'
           + CAST(doc_id AS INT) * INTERVAL 1 MINUTE AS warc_ts,
         '<html><head><title>d</title></head><body><p>'
           || replace(replace(replace(text, '&', '&amp;'),
                              '<', '&lt;'), '>', '&gt;')
           || '</p></body></html>' AS h,
         lang
  FROM documents
),
ext AS (
  SELECT url, warc_ts, lang,
         replace(replace(replace(
             coalesce(regexp_extract(h, '(?s)<p>(.*?)</p>', 1), ''),
             '&lt;', '<'), '&gt;', '>'), '&amp;', '&') AS text_x
  FROM pages
),
tok AS (
  SELECT *, length(text_x) AS n_chars,
         list_filter(string_split(text_x, ' '), t -> t <> '') AS toks,
         len(string_split(text_x, ' ')) - 1 AS n_spaces
  FROM ext
),
feat AS (
  SELECT *, len(toks) AS n_tokens,
         CASE WHEN len(toks) > 0
              THEN (n_chars - n_spaces)::DOUBLE / len(toks) END AS mean_wl,
         CASE WHEN n_chars > 0
              THEN (n_chars - length(regexp_replace(text_x,
                        '[^A-Za-z0-9 ]', '', 'g')))::DOUBLE / n_chars
              END AS sym_ratio,
         CASE WHEN len(toks) > 0
              THEN len(list_filter(toks,
                        t -> list_contains([{sw}], lower(t))))::DOUBLE
                   / len(toks) END AS sw_ratio,
         CASE WHEN len(toks) >= 3
              THEN list_transform(generate_series(1, len(toks) - 2),
                     i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])
              ELSE CAST([] AS VARCHAR[]) END AS tris
  FROM tok
),
feat2 AS (
  SELECT *, CASE WHEN len(tris) > 0
                 THEN 1.0 - len(list_distinct(tris)) / len(tris)
                 ELSE 0.0 END AS dupng,
         (ROW_NUMBER() OVER (PARTITION BY text_x ORDER BY url) > 1) AS is_dup
  FROM feat
),
decided AS (
  SELECT *, list_aggregate(
              list_filter([{fails}], x -> x IS NOT NULL), 'min') AS fc
  FROM feat2
)
SELECT url, fc IS NULL AS keep, fc AS first_fail_code,
       {scrub} AS scrubbed_text
FROM decided
"""


SQL_PIPELINE_DECISIONS = _pipeline_decisions_sql()

NO_ORACLE_QUERIES = {
    "pipeline_decisions": (q_pipeline_decisions, SQL_PIPELINE_DECISIONS),
}
