"""Round-6c extension registry: PII detector profile + tokenizer
fertility, both pure native-expression projections/aggregations (zero
UDF, zero corpus shuffle beyond one bounded agg).

* `pii_profile` — the DETECTOR side of the scrub family: typed PII
  counts (email / IPv4 / SSN-pattern / phone-pattern) per document via
  `regexp_count`. pipeline/spec.py scrubs PII byte-identically; a real
  curation run also needs the audit report of what WAS found, per type
  (the reference's create_failure_log shape, R/evaluate.R — a log row
  per violation type, not just the cleaned value). The documents fixture
  is synthetic prose with no planted PII, so the query appends
  deterministic doc_id-derived snippets on BOTH engines first (the PSL
  host-synthesis pattern, queries_r6.py) — every detector sees real
  positives and real zeros.
* `lang_token_fertility` — chars-per-token by language over the BPE-ish
  pre-tokenizer (functions/textfns.BPE_ISH_RE, the Java+RE2-compatible
  GPT-2 pattern): the standard multilingual tokenizer-budget statistic
  (fertility differences drive per-language token budgeting in
  multilingual corpus prep). Integer sums (exact, order-invariant) with
  one final rounded division.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from inspectehr_spark.functions.textfns import BPE_ISH_RE, bpe_ish_token_count
from inspectehr_spark.tables import table as _t

_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
_IPV4 = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
_SSN = r"\b\d{3}-\d{2}-\d{4}\b"
_PHONE = r"\+\d{1,2} \d{3}-\d{3}-\d{4}"


def _with_planted_pii(docs):
    """Deterministic PII planting — identical expression in the oracle.
    Moduli are coprime-ish so docs carry 0..4 snippet types."""
    did = F.col("doc_id")
    parts = [
        F.col("text"),
        F.when(
            did % 7 == 0,
            F.concat(
                F.lit(" contact user"), did.cast("string"), F.lit("@example.com now")
            ),
        ).otherwise(F.lit("")),
        F.when(
            did % 11 == 3,
            F.concat(
                F.lit(" server at 10.0."),
                (did % 256).cast("string"),
                F.lit("."),
                ((did * 7) % 256).cast("string"),
                F.lit(" up"),
            ),
        ).otherwise(F.lit("")),
        F.when(did % 13 == 5, F.lit(" ssn 123-45-6789 leaked")).otherwise(F.lit("")),
        F.when(did % 17 == 2, F.lit(" call +1 415-555-0199 today")).otherwise(
            F.lit("")
        ),
    ]
    return docs.withColumn("_t", F.concat(*parts))


def q_pii_profile(spark, sf_dir):
    """Typed PII counts per document — all regexp_count, whole-stage
    codegen, no shuffle at all (pure projection)."""
    docs = _with_planted_pii(_t(spark, sf_dir, "documents"))
    cnt = lambda pat: F.regexp_count(F.col("_t"), F.lit(pat)).cast("long")  # noqa: E731
    return docs.select(
        "doc_id",
        cnt(_EMAIL).alias("n_emails"),
        cnt(_IPV4).alias("n_ipv4"),
        cnt(_SSN).alias("n_ssn"),
        cnt(_PHONE).alias("n_phone"),
        (
            cnt(_EMAIL) + cnt(_IPV4) + cnt(_SSN) + cnt(_PHONE) > 0
        ).alias("has_pii"),
    )


SQL_PII_PROFILE = rf"""
WITH planted AS (
  SELECT doc_id,
         text
         || CASE WHEN doc_id % 7 = 0
                 THEN ' contact user' || CAST(doc_id AS VARCHAR)
                      || '@example.com now' ELSE '' END
         || CASE WHEN doc_id % 11 = 3
                 THEN ' server at 10.0.' || CAST(doc_id % 256 AS VARCHAR)
                      || '.' || CAST((doc_id * 7) % 256 AS VARCHAR) || ' up'
                 ELSE '' END
         || CASE WHEN doc_id % 13 = 5 THEN ' ssn 123-45-6789 leaked'
                 ELSE '' END
         || CASE WHEN doc_id % 17 = 2 THEN ' call +1 415-555-0199 today'
                 ELSE '' END AS t
  FROM documents
)
SELECT doc_id,
       CAST(len(regexp_extract_all(t, '{_EMAIL}')) AS BIGINT) AS n_emails,
       CAST(len(regexp_extract_all(t, '{_IPV4}')) AS BIGINT) AS n_ipv4,
       CAST(len(regexp_extract_all(t, '{_SSN}')) AS BIGINT) AS n_ssn,
       CAST(len(regexp_extract_all(t, '{_PHONE}')) AS BIGINT) AS n_phone,
       (len(regexp_extract_all(t, '{_EMAIL}'))
        + len(regexp_extract_all(t, '{_IPV4}'))
        + len(regexp_extract_all(t, '{_SSN}'))
        + len(regexp_extract_all(t, '{_PHONE}'))) > 0 AS has_pii
FROM planted
"""


def q_lang_token_fertility(spark, sf_dir):
    """Per-language tokenizer-budget stats: docs, chars, BPE-ish tokens,
    fertility = chars/token (rounded 6dp). One bounded agg (5 langs)."""
    docs = _t(spark, sf_dir, "documents")
    per = docs.select(
        "lang",
        F.length("text").cast("long").alias("_chars"),
        bpe_ish_token_count("text").alias("_toks"),
    )
    return per.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("_chars").alias("total_chars"),
        F.sum("_toks").alias("total_tokens"),
        F.round(F.sum("_chars") / F.sum("_toks"), 6).alias("chars_per_token"),
    )


SQL_LANG_TOKEN_FERTILITY = rf"""
WITH per AS (
  SELECT lang, CAST(length(text) AS BIGINT) AS c,
         CAST(len(regexp_extract_all(text,
              '{BPE_ISH_RE.replace("'", "''")}')) AS BIGINT) AS t
  FROM documents
)
SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(c) AS BIGINT) AS total_chars,
       CAST(sum(t) AS BIGINT) AS total_tokens,
       round(sum(c) / sum(t), 6) AS chars_per_token
FROM per GROUP BY lang
"""


R6C_QUERIES = {
    "pii_profile": (q_pii_profile, SQL_PII_PROFILE),
    "lang_token_fertility": (q_lang_token_fertility, SQL_LANG_TOKEN_FERTILITY),
}
