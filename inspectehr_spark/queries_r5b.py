"""Round-5 extension registry: corpus-level segment curation + corpus
profiling, each with a full DuckDB value oracle.

Four queries over `documents` (the single-line webtext fixture; segments
derived deterministically by breaking on ' the ', the same convention
q_line_scrub proved on both engines):

- dedup_across_docs   — dedup_segments(scope="corpus"): keep the FIRST
                        occurrence of every segment corpus-wide, rebuild.
- boilerplate_scrub   — scrub_frequent_segments: remove ALL occurrences of
                        segments present in >= 2 distinct docs (CCNet line
                        dedup / boilerplate semantic).
- shingle_dup_coverage — per-doc fraction of distinct word 8-grams shared
                        with any other doc (RefinedWeb coverage metric).
- corpus_top_ngrams   — top-25 word trigrams by (occurrences desc, gram
                        asc), with document frequency.

Reference analog: none (beyond-reference web-pipeline set, SURVEY §8);
the nearest reference op is coincident-key duplicate flagging,
/root/reference/R/evaluate_duplication.R.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from inspectehr_spark.tables import table as _t

_SEG_DOCS = """
d AS (
  SELECT doc_id,
         string_split(regexp_replace(text, ' the ', chr(10), 'g'), chr(10)) AS segs
  FROM documents
),
e AS (
  SELECT doc_id, u.pos AS pos, u.seg AS seg
  FROM (
    SELECT doc_id,
           unnest(list_transform(segs, (x, i) -> struct_pack(pos := i, seg := x))) AS u
    FROM d
  )
)
"""


def _seg_view(spark, sf_dir):
    return _t(spark, sf_dir, "documents").select(
        "doc_id", F.regexp_replace("text", " the ", "\n").alias("text")
    )


def q_dedup_across_docs(spark, sf_dir):
    """Corpus-scope segment dedup with document rebuild
    (operators/webrules.dedup_segments, scope="corpus"): survivor = lowest
    (doc_id, pos) per segment, exchange keyed by the salt-first 128-bit
    hash pair of the segment — two shuffles total (survivorship window +
    rebuild). Empty rebuilds ('' text) are documents whose every segment
    lost."""
    from inspectehr_spark.operators.webrules import dedup_segments

    return dedup_segments(
        _seg_view(spark, sf_dir), "doc_id", "text", sep="\n", scope="corpus"
    ).select("doc_id", "lines_total", "lines_kept", "text_deduped")


SQL_DEDUP_ACROSS_DOCS = f"""
WITH {_SEG_DOCS},
r AS (
  SELECT doc_id, pos, seg,
         row_number() OVER (PARTITION BY seg ORDER BY doc_id, pos) AS rn
  FROM e
)
SELECT doc_id,
       CAST(count(*) AS BIGINT) AS lines_total,
       CAST(sum(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT) AS lines_kept,
       COALESCE(string_agg(CASE WHEN rn = 1 THEN seg END, chr(10) ORDER BY pos),
                '') AS text_deduped
FROM r
GROUP BY doc_id
"""


def q_boilerplate_scrub(spark, sf_dir):
    """Corpus-frequency boilerplate removal
    (operators/webrules.scrub_frequent_segments): segments in >= 2
    distinct documents are dropped from every document; the aggregated
    frequent set broadcasts (bounded by total_segments/min_docs), so the
    corpus side sees ZERO join exchange — wide shuffles are the frequency
    agg and the rebuild only."""
    from inspectehr_spark.operators.webrules import scrub_frequent_segments

    return scrub_frequent_segments(
        _seg_view(spark, sf_dir), "doc_id", "text", sep="\n", min_docs=2
    ).select("doc_id", "lines_total", "lines_kept", "scrubbed")


SQL_BOILERPLATE_SCRUB = f"""
WITH {_SEG_DOCS},
f AS (
  SELECT seg, TRUE AS boiler
  FROM (SELECT seg, count(DISTINCT doc_id) AS seg_df FROM e GROUP BY seg)
  WHERE seg_df >= 2
)
SELECT e.doc_id,
       CAST(count(*) AS BIGINT) AS lines_total,
       CAST(sum(CASE WHEN f.boiler IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS lines_kept,
       COALESCE(string_agg(CASE WHEN f.boiler IS NULL THEN e.seg END, chr(10)
                           ORDER BY e.pos), '') AS scrubbed
FROM e LEFT JOIN f ON f.seg = e.seg
GROUP BY e.doc_id
"""


def q_shingle_dup_coverage(spark, sf_dir):
    """Per-doc duplicate-coverage metric
    (operators/dedup.shingle_dup_coverage): fraction of each document's
    distinct word 8-grams present in at least one other document. All
    exchanges keyed by the 8-byte gram hash; per-doc distinct runs on the
    primitive long array (the string array_distinct O(n^2) trap stays
    out of the plan)."""
    from inspectehr_spark.operators.dedup import shingle_dup_coverage

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    return shingle_dup_coverage(docs, "doc_id", "text", n=8)


SQL_SHINGLE_DUP_COVERAGE = r"""
WITH toks AS (
  SELECT doc_id, string_split_regex(text, '\s+') AS l FROM documents
),
g AS (
  SELECT DISTINCT doc_id, g FROM (
    SELECT doc_id,
           unnest(list_filter(
             list_transform(l, (x, i) -> CASE WHEN i <= len(l) - 7
               THEN x || ' ' || l[i+1] || ' ' || l[i+2] || ' ' || l[i+3]
                      || ' ' || l[i+4] || ' ' || l[i+5] || ' ' || l[i+6]
                      || ' ' || l[i+7] END),
             y -> y IS NOT NULL)) AS g
    FROM toks
  )
),
f AS (SELECT g, count(*) AS gdf FROM g GROUP BY g),
cov AS (
  SELECT g.doc_id,
         count(*) AS shingles_distinct,
         sum(CASE WHEN f.gdf >= 2 THEN 1 ELSE 0 END) AS shingles_shared
  FROM g JOIN f ON f.g = g.g
  GROUP BY g.doc_id
)
SELECT d.doc_id,
       CAST(COALESCE(cov.shingles_distinct, 0) AS BIGINT) AS shingles_distinct,
       CAST(COALESCE(cov.shingles_shared, 0) AS BIGINT) AS shingles_shared,
       CASE WHEN COALESCE(cov.shingles_distinct, 0) > 0
            THEN ROUND(cov.shingles_shared / CAST(cov.shingles_distinct AS DOUBLE), 6)
            ELSE 0.0 END AS dup_coverage
FROM documents d LEFT JOIN cov ON cov.doc_id = d.doc_id
"""


def q_corpus_top_ngrams(spark, sf_dir):
    """Corpus n-gram profile: top-25 word trigrams by occurrence count
    (ties broken by gram text ascending — a total order, so the limit is
    deterministic), with distinct-document frequency. Spark shape: staged
    gram projection -> two-phase partial agg on the gram string (short,
    bounded keys) -> TakeOrdered(25) — no full sort, no driver loop."""
    from inspectehr_spark.functions.textfns import word_ngrams
    from inspectehr_spark.tables import parallel_scan

    # r7: parallelize the one-file scan before the trigram explosion
    docs = parallel_scan(_t(spark, sf_dir, "documents").select("doc_id", "text"))
    staged = docs.withColumn("_toks", F.split("text", r"\s+"))
    staged = staged.withColumn("_grams", word_ngrams(F.col("_toks"), 3))
    g = staged.select("doc_id", F.explode("_grams").alias("gram"))
    # r7: two-stage aggregation — (gram, doc) partial counts, then per-gram
    # sum/count — instead of count + countDistinct in one agg, whose
    # distinct rewrite EXPANDs every row twice before the exchange.
    # sum(per-doc counts) == total occurrences and count of (gram, doc)
    # groups == distinct docs, exactly. Measured ~25% at sf0.1, ~8% at
    # staged sf1.
    per_doc = g.groupBy("gram", "doc_id").agg(F.count(F.lit(1)).alias("_c"))
    return (
        per_doc.groupBy("gram")
        .agg(
            F.sum("_c").alias("n_occurrences"),
            F.count(F.lit(1)).alias("n_docs"),
        )
        .orderBy(F.col("n_occurrences").desc(), F.col("gram").asc())
        .limit(25)
    )


SQL_CORPUS_TOP_NGRAMS = r"""
WITH toks AS (
  SELECT doc_id, string_split_regex(text, '\s+') AS l FROM documents
),
g AS (
  SELECT doc_id,
         unnest(list_filter(
           list_transform(l, (x, i) -> CASE WHEN i <= len(l) - 2
             THEN x || ' ' || l[i+1] || ' ' || l[i+2] END),
           y -> y IS NOT NULL)) AS gram
  FROM toks
)
SELECT gram,
       CAST(count(*) AS BIGINT) AS n_occurrences,
       CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs
FROM g
GROUP BY gram
ORDER BY n_occurrences DESC, gram ASC
LIMIT 25
"""


R5B_QUERIES = {
    "dedup_across_docs": (q_dedup_across_docs, SQL_DEDUP_ACROSS_DOCS),
    "boilerplate_scrub": (q_boilerplate_scrub, SQL_BOILERPLATE_SCRUB),
    "shingle_dup_coverage": (q_shingle_dup_coverage, SQL_SHINGLE_DUP_COVERAGE),
    "corpus_top_ngrams": (q_corpus_top_ngrams, SQL_CORPUS_TOP_NGRAMS),
}
