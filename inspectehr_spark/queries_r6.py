"""Round-6 extension registry: public-suffix-list (PSL) registered-domain
extraction with a full DuckDB value oracle.

`url_registered_domain` grew proper eTLD+1 semantics this round (ADVICE
r5 / VERDICT next-round #3): the registered domain is the LONGEST listed
public suffix plus one preceding label — `a.b.co.uk` → `b.co.uk`, never
the suffix-naive `co.uk` — with publicsuffix2's contract for the edge
cases (host IS a suffix → NULL; unlisted TLD → default rule `*`, last two
labels). The documents fixture has no URL column, so hosts are
synthesised DETERMINISTICALLY from (doc_id, source) with the same
expression on both engines, covering every rule branch:

- doc_id % 11 == 0            → host IS the listed suffix 'github.io'
                                 (NULL registered domain);
- doc_id % 5 picks the suffix → 'co.uk' / 'com' / 'github.io' / 'zz'
                                 (unlisted → default rule) / 'ac.uk';
- doc_id % 3 == 0             → extra 'www.' label (must strip to
                                 eTLD+1, not survive into the key).

Both engines evaluate the identical longest-suffix algorithm over the
same literal PSL fixture (`functions.urlfns.psl_fixture`): dot-suffix
array → first listed position → slice. Reference analog: none
(inspectEHR sites are flat codes, R/report.R:40); this is the
beyond-reference web-pipeline set (SURVEY §8).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from inspectehr_spark.functions import urlfns as U
from inspectehr_spark.tables import table as _t


def _with_psl_urls(spark, sf_dir):
    """Deterministic URL synthesis with multi-label public suffixes."""
    d = _t(spark, sf_dir, "documents")
    suffix = (
        F.when(F.col("doc_id") % 5 == 0, F.lit("co.uk"))
        .when(F.col("doc_id") % 5 == 1, F.lit("com"))
        .when(F.col("doc_id") % 5 == 2, F.lit("github.io"))
        .when(F.col("doc_id") % 5 == 3, F.lit("zz"))
        .otherwise(F.lit("ac.uk"))
    )
    host = F.when(F.col("doc_id") % 11 == 0, F.lit("github.io")).otherwise(
        F.concat(
            F.when(F.col("doc_id") % 3 == 0, F.lit("www.")).otherwise(F.lit("")),
            F.col("source"),
            F.lit("."),
            suffix,
        )
    )
    url = F.concat(
        F.lit("https://"), host, F.lit("/page-"), F.col("doc_id").cast("string")
    )
    return d.select("doc_id", url.alias("url"))


_PSL_URL_CTE = """
u AS (
  SELECT doc_id,
         'https://'
         || (CASE WHEN doc_id % 11 = 0 THEN 'github.io'
                  ELSE (CASE WHEN doc_id % 3 = 0 THEN 'www.' ELSE '' END)
                       || source || '.'
                       || (CASE WHEN doc_id % 5 = 0 THEN 'co.uk'
                                WHEN doc_id % 5 = 1 THEN 'com'
                                WHEN doc_id % 5 = 2 THEN 'github.io'
                                WHEN doc_id % 5 = 3 THEN 'zz'
                                ELSE 'ac.uk' END) END)
         || '/page-' || CAST(doc_id AS VARCHAR) AS url
  FROM documents
)
"""


def _psl_sql_literal() -> str:
    return "[" + ", ".join(f"'{s}'" for s in U.psl_fixture()) + "]"


def q_psl_registered_domain(spark, sf_dir):
    """eTLD+1 per host against the PSL fixture, aggregated per
    (host, registered_domain) — full value verification of every rule
    branch with dimension-sized output. Pure projection + ONE partial
    agg on a short key; the PSL is a plan literal (zero shuffle before
    the groupBy)."""
    d = _with_psl_urls(spark, sf_dir)
    return (
        d.select(
            U.url_host("url").alias("host"),
            U.url_registered_domain("url", psl=U.psl_fixture()).alias(
                "registered_domain"
            ),
        )
        .groupBy("host", "registered_domain")
        .agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
    )


SQL_PSL_REGISTERED_DOMAIN = f"""
WITH {_PSL_URL_CTE.strip()},
h AS (
  SELECT lower(regexp_extract(url, '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)', 1))
           AS host
  FROM u
),
x AS (
  SELECT host,
         string_split(host, '.') AS labels,
         len(string_split(host, '.')) AS n,
         list_position(
           list_transform(
             range(1, len(string_split(host, '.')) + 1),
             i -> list_contains({_psl_sql_literal()},
                                array_to_string(string_split(host, '.')[i:], '.'))),
           true) AS first
  FROM h
),
r AS (
  SELECT host,
         CASE WHEN first = 1 THEN NULL
              WHEN first > 1 THEN array_to_string(labels[first - 1:], '.')
              WHEN n >= 2 THEN array_to_string(labels[n - 1:], '.')
              ELSE host END AS registered_domain
  FROM x
)
SELECT host, registered_domain, CAST(count(*) AS BIGINT) AS n_docs
FROM r
GROUP BY host, registered_domain
"""


def q_minhash_lsh_pairs_fast(spark, sf_dir):
    """The xxhash64 MinHash scale path, re-registered so BENCH tracks the
    plan a 100x deployment actually runs (VERDICT r5 next-round #5): the
    registry's `minhash_lsh_pairs` is the md5 oracle-replay variant (~2x
    the hash work - md5 + hex-slice per gram vs one 64-bit xxhash64).
    Same query semantics and 32-hash/16-band sketch geometry, same
    threshold and hot-bucket cap; operators/dedup.minhash_lsh_duplicates
    end to end. Rows-only driver check (xxhash64 has no DuckDB replay);
    pair-set parity vs the md5 variant is asserted in
    tests/test_operators.py::test_minhash_fast_path_matches_md5_variant."""
    from inspectehr_spark.operators import dedup

    docs = _t(spark, sf_dir, "documents")
    return dedup.minhash_lsh_duplicates(
        docs, num_hashes=32, bands=16, jaccard_threshold=0.5
    )


R6_QUERIES = {
    "psl_registered_domain": (q_psl_registered_domain, SQL_PSL_REGISTERED_DOMAIN),
    "minhash_lsh_pairs_fast": (q_minhash_lsh_pairs_fast, None),
}
