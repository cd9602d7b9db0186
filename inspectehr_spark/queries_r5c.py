"""Round-5 extension registry (c): domain/URL-level provenance curation,
each with a full DuckDB value oracle.

Five queries over `documents` (`source` is the domain key — the fixture
has no URL column, so url_normalize synthesises URLs DETERMINISTICALLY
from (doc_id, source, lang) with the same expression on both engines;
no external data):

- domain_quality_profile — per-domain doc counts, language spread, length
  stats, corpus-wide exact-dup attribution, and a drop flag (the
  FineWeb/C4 host-blocklisting shape).
- url_normalize          — scheme/host/registered-domain/path extraction +
  utm-strip canonicalisation, all native expressions (functions/urlfns).
- domain_tfidf_terms     — top-3 discriminative terms per domain by
  smoothed tf-idf, ranked on the ROUNDED score (total order).
- blocked_domain_audit   — host-blocklist verdict per doc with subdomain
  (dot-suffix) semantics, zero-shuffle (operators/domains).
- url_canonical_dedup    — C4-style URL-keyed exact dedup on the
  canonical form (utm/fragment variants collapse), one partial agg.

Reference analog: the per-site rollup R/report.R:40-77; URL/tf-idf are
the beyond-reference web-pipeline set (SURVEY §8).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from inspectehr_spark.tables import table as _t


def q_domain_quality_profile(spark, sf_dir):
    """operators/domains.domain_profile over documents: window keyed by
    md5(text) (one exchange, exact corpus-wide dup count), then a small
    domain-keyed groupBy. Flag thresholds compare the ROUNDED values so
    the oracle decides boundary ties identically."""
    from inspectehr_spark.operators.domains import domain_profile

    return domain_profile(_t(spark, sf_dir, "documents"))


SQL_DOMAIN_QUALITY_PROFILE = """
WITH d AS (
  SELECT source, lang, n_chars, count(*) OVER (PARTITION BY text) AS c
  FROM documents
),
p AS (
  SELECT source AS domain,
         CAST(count(*) AS BIGINT) AS n_docs,
         CAST(count(DISTINCT lang) AS BIGINT) AS n_langs,
         ROUND(avg(n_chars), 4) AS avg_chars,
         ROUND(sum(CASE WHEN n_chars < 280 THEN 1 ELSE 0 END)
               / CAST(count(*) AS DOUBLE), 6) AS short_frac,
         CAST(sum(CASE WHEN c >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS dup_docs,
         ROUND(sum(CASE WHEN c >= 2 THEN 1 ELSE 0 END)
               / CAST(count(*) AS DOUBLE), 6) AS dup_rate
  FROM d
  GROUP BY source
)
SELECT *, (avg_chars < 290.0 OR dup_rate > 0.2) AS flagged FROM p
"""


def _with_urls(spark, sf_dir):
    """Deterministic URL synthesis — mixed-case scheme/host, optional utm
    and non-utm queries, optional fragment — so every normalisation rule
    is exercised. Mirrored verbatim in the oracle CTE."""
    d = _t(spark, sf_dir, "documents")
    sid = F.col("doc_id").cast("string")
    url = F.concat(
        F.when(F.col("doc_id") % 3 == 0, F.lit("HTTP://WWW.")).otherwise(
            F.lit("https://")
        ),
        F.col("source"),
        F.lit(".Example.COM/"),
        F.col("lang"),
        F.lit("/page-"),
        sid,
        F.when(
            F.col("doc_id") % 2 == 0,
            F.concat(F.lit("?utm_source=rss&ref="), sid, F.lit("&utm_campaign=news")),
        )
        .when(F.col("doc_id") % 5 == 1, F.concat(F.lit("?id="), sid))
        .otherwise(F.lit("")),
        F.when(F.col("doc_id") % 7 == 0, F.lit("#section-2")).otherwise(F.lit("")),
    )
    return d.select("doc_id", url.alias("url"))


_URL_CTE = """
u AS (
  SELECT doc_id,
         (CASE WHEN doc_id % 3 = 0 THEN 'HTTP://WWW.' ELSE 'https://' END)
         || source || '.Example.COM/' || lang || '/page-'
         || CAST(doc_id AS VARCHAR)
         || (CASE WHEN doc_id % 2 = 0
                  THEN '?utm_source=rss&ref=' || CAST(doc_id AS VARCHAR)
                       || '&utm_campaign=news'
                  WHEN doc_id % 5 = 1 THEN '?id=' || CAST(doc_id AS VARCHAR)
                  ELSE '' END)
         || (CASE WHEN doc_id % 7 = 0 THEN '#section-2' ELSE '' END) AS url
  FROM documents
)
"""


def q_url_normalize(spark, sf_dir):
    """functions/urlfns over the synthesised URL column: pure projection,
    zero shuffle, whole-stage codegen end to end (parse_url + regexp
    chain). The canonical column is the URL-dedup key."""
    from inspectehr_spark.functions import urlfns as U

    d = _with_urls(spark, sf_dir)
    return d.select(
        "doc_id",
        "url",
        U.url_scheme("url").alias("scheme"),
        U.url_host("url").alias("host"),
        U.url_registered_domain("url").alias("registered_domain"),
        U.url_path("url").alias("path"),
        U.url_query_clean("url").alias("query_clean"),
        U.url_canonical("url").alias("clean_url"),
    )


SQL_URL_NORMALIZE = rf"""
WITH {_URL_CTE},
parts AS (
  SELECT doc_id, url,
         lower(regexp_extract(url, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1)) AS scheme,
         lower(regexp_extract(url, '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)', 1)) AS host,
         regexp_extract(url, '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]+([^?#]*)', 1) AS path,
         regexp_extract(url, '\?([^#]*)', 1) AS qraw
  FROM u
),
cleaned AS (
  SELECT *,
         regexp_replace(
           regexp_replace(qraw, '(^|&)utm_[a-z]+=[^&]*', '', 'g'),
           '^&+', '', 'g') AS query_clean
  FROM parts
)
SELECT doc_id, url, scheme, host,
       regexp_replace(host, '^www\.', '') AS registered_domain,
       path, query_clean,
       scheme || '://' || host || path
         || (CASE WHEN query_clean <> '' THEN '?' || query_clean ELSE '' END)
         AS clean_url
FROM cleaned
"""


def q_domain_tfidf_terms(spark, sf_dir):
    """operators/domains.tfidf_top_terms: explode → (domain, term) partial
    agg → term-keyed df join → broadcast 1-row domain count (never a
    window-over-() collapse) → per-domain row_number top-3 on the rounded
    score."""
    from inspectehr_spark.operators.domains import tfidf_top_terms

    return tfidf_top_terms(_t(spark, sf_dir, "documents"), k=3)


SQL_DOMAIN_TFIDF_TERMS = r"""
WITH toks AS (
  SELECT source AS domain, unnest(string_split_regex(text, '\s+')) AS term
  FROM documents
),
tc AS (
  SELECT domain, term, count(*) AS tf_cnt
  FROM toks WHERE term <> '' GROUP BY domain, term
),
tot AS (SELECT domain, sum(tf_cnt) AS tok_total FROM tc GROUP BY domain),
dfreq AS (SELECT term, count(*) AS term_df FROM tc GROUP BY term),
nd AS (SELECT count(DISTINCT source) AS n_domains FROM documents),
scored AS (
  SELECT tc.domain, tc.term,
         ROUND((tf_cnt / CAST(tok_total AS DOUBLE))
               * (ln((1.0 + n_domains) / (1.0 + term_df)) + 1.0), 6) AS score
  FROM tc
  JOIN tot USING (domain)
  JOIN dfreq USING (term)
  CROSS JOIN nd
),
r AS (
  SELECT domain, term, score,
         row_number() OVER (PARTITION BY domain
                            ORDER BY score DESC, term ASC) AS rank
  FROM scored
)
SELECT domain, term, score, CAST(rank AS BIGINT) AS rank FROM r WHERE rank <= 3
"""


_BLOCKLIST = (
    # exact + subdomain semantics: blocks both srcN.example.com and
    # www.srcN.example.com for N in {3, 7}
    "src3.example.com",
    "src7.example.com",
    # exact-only on the www host: bare src11.example.com must survive
    "www.src11.example.com",
    # string-tail of src4.example.com but NOT a dot-suffix: must block nothing
    "rc4.example.com",
)


def q_blocked_domain_audit(spark, sf_dir):
    """operators/domains.filter_blocked_domains (audit variant) over the
    synthesised URL hosts: dot-suffix set built per row with
    transform/slice, tested against the LITERAL blocklist via
    arrays_overlap — a pure zero-shuffle projection, no join; the
    100-TB-safe shape for any blocklist small enough to inline."""
    from inspectehr_spark.functions import urlfns as U
    from inspectehr_spark.operators.domains import filter_blocked_domains

    d = _with_urls(spark, sf_dir).select(
        "doc_id", U.url_host("url").alias("host")
    )
    return filter_blocked_domains(d, "host", _BLOCKLIST, keep_col="blocked")


# DuckDB replay: dot-suffix membership is exact-equality OR a '%.'-anchored
# LIKE per entry ('.' and '%' in entries are literal here; hosts contain no
# LIKE metacharacters by construction).
_BLOCK_PRED = " OR ".join(
    f"host = '{b}' OR host LIKE '%.{b}'" for b in _BLOCKLIST
)

SQL_BLOCKED_DOMAIN_AUDIT = rf"""
WITH {_URL_CTE},
h AS (
  SELECT doc_id,
         lower(regexp_extract(url, '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)', 1))
           AS host
  FROM u
)
SELECT doc_id, host, ({_BLOCK_PRED}) AS blocked FROM h
"""


def _with_colliding_urls(spark, sf_dir):
    """URL synthesis with DELIBERATE canonical collisions: the page id is
    doc_id % 10, and utm decoration + fragments vary by doc_id — so utm/
    fragment variants of one logical page share a canonical form (the C4
    motivation for URL-keyed dedup). Mirrored verbatim in the oracle CTE."""
    d = _t(spark, sf_dir, "documents")
    pid = (F.col("doc_id") % 10).cast("string")
    url = F.concat(
        F.when(F.col("doc_id") % 3 == 0, F.lit("HTTP://WWW.")).otherwise(
            F.lit("https://")
        ),
        F.col("source"),
        F.lit(".Example.COM/"),
        F.col("lang"),
        F.lit("/page-"),
        pid,
        F.when(
            F.col("doc_id") % 2 == 0,
            F.lit("?utm_source=rss&utm_campaign=news"),
        )
        .when(F.col("doc_id") % 5 == 1, F.concat(F.lit("?id="), pid))
        .otherwise(F.lit("")),
        F.when(F.col("doc_id") % 7 == 0, F.lit("#section-2")).otherwise(F.lit("")),
    )
    return d.select("doc_id", url.alias("url"))


_COLLIDING_URL_CTE = """
u AS (
  SELECT doc_id,
         (CASE WHEN doc_id % 3 = 0 THEN 'HTTP://WWW.' ELSE 'https://' END)
         || source || '.Example.COM/' || lang || '/page-'
         || CAST(doc_id % 10 AS VARCHAR)
         || (CASE WHEN doc_id % 2 = 0
                  THEN '?utm_source=rss&utm_campaign=news'
                  WHEN doc_id % 5 = 1 THEN '?id=' || CAST(doc_id % 10 AS VARCHAR)
                  ELSE '' END)
         || (CASE WHEN doc_id % 7 = 0 THEN '#section-2' ELSE '' END) AS url
  FROM u0
),
"""


def q_url_canonical_dedup(spark, sf_dir):
    """URL-keyed exact dedup on the CANONICAL form (Raffel et al. 2020
    §2.2: C4 dedups on URL; utm/fragment variants of one page are one
    key): canonicalise (pure projection, functions/urlfns) then ONE
    partial-aggregated groupBy on the canonical key — min-doc_id
    survivor + variant count. No window, no full-row sort, no join:
    at 10^12 rows the single exchange carries (canon, doc_id) pairs
    already combined map-side. Compare flag_duplicates
    (operators/windows.py:19) for the keep-first row-recovery variant
    when survivor PAYLOAD rows must be kept — here the key + count is
    the deliverable, so the agg shape is strictly cheaper."""
    from inspectehr_spark.functions import urlfns as U

    d = _with_colliding_urls(spark, sf_dir)
    return (
        d.select("doc_id", U.url_canonical("url").alias("canonical_url"))
        .groupBy("canonical_url")
        .agg(
            F.min("doc_id").alias("first_doc_id"),
            F.count(F.lit(1)).alias("n_variants"),
        )
    )


SQL_URL_CANONICAL_DEDUP = rf"""
WITH u0 AS (SELECT doc_id, source, lang FROM documents),
{_COLLIDING_URL_CTE}
parts AS (
  SELECT doc_id,
         lower(regexp_extract(url, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1)) AS scheme,
         lower(regexp_extract(url, '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)', 1)) AS host,
         regexp_extract(url, '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]+([^?#]*)', 1) AS path,
         regexp_replace(
           regexp_replace(regexp_extract(url, '\?([^#]*)', 1),
                          '(^|&)utm_[a-z]+=[^&]*', '', 'g'),
           '^&+', '', 'g') AS query_clean
  FROM u
)
SELECT scheme || '://' || host || path
         || (CASE WHEN query_clean <> '' THEN '?' || query_clean ELSE '' END)
         AS canonical_url,
       CAST(min(doc_id) AS BIGINT) AS first_doc_id,
       CAST(count(*) AS BIGINT) AS n_variants
FROM parts
GROUP BY 1
"""


R5C_QUERIES = {
    "domain_quality_profile": (q_domain_quality_profile, SQL_DOMAIN_QUALITY_PROFILE),
    "url_normalize": (q_url_normalize, SQL_URL_NORMALIZE),
    "domain_tfidf_terms": (q_domain_tfidf_terms, SQL_DOMAIN_TFIDF_TERMS),
    "blocked_domain_audit": (q_blocked_domain_audit, SQL_BLOCKED_DOMAIN_AUDIT),
    "url_canonical_dedup": (q_url_canonical_dedup, SQL_URL_CANONICAL_DEDUP),
}
