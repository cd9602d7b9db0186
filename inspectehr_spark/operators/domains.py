"""Domain-level corpus curation: per-domain quality profiles and
discriminative-term (tf-idf) summaries.

Web-scale pipelines act on DOMAINS, not just documents: a domain whose
pages are short, repetitive, or near-identical is dropped wholesale
(the FineWeb / C4 practice of blocklisting whole hosts). Both operators
here aggregate a document table keyed by a `domain` column.

Scale shapes (10^12 docs, ~10^8 domains):
- `domain_profile`: one exchange keyed by md5(text) (128-bit — collision
  odds negligible, so the corpus-wide duplicate count is exact) for the
  window, then one ordinary partial-aggregated groupBy on the domain key.
  Domains are ~4 orders of magnitude fewer than docs, so the second
  shuffle is small; per-domain row counts are bounded by the biggest
  host, which AQE skew-split handles.
- `tfidf_top_terms`: explode → partial-agg on (domain, term) — the big
  shuffle, on short bounded keys — then a term-keyed document-frequency
  join and a broadcast 1-row scalar for the domain count (never a
  window-over-() single-partition collapse). Final top-k is a
  row_number window partitioned by domain over vocabulary-sized rows.

Reference analog: none (inspectEHR aggregates per-site via
R/report.R:40-77 `total_unit_admissions`; the tf-idf summary is the
beyond-reference web-pipeline set, SURVEY §8).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def filter_blocked_domains(
    df: DataFrame,
    domain_col: str = "domain",
    blocklist: tuple[str, ...] = (),
    keep_col: str | None = None,
) -> DataFrame:
    """Host-blocklist filter with subdomain semantics: a row is blocked
    when its domain equals a blocked entry OR is a dot-subdomain of one
    ('ads.tracker.example' matches blocked 'tracker.example').

    Scale shape: the domain's dot-suffix set (bounded by label count,
    ~5) is built per row and tested with `arrays_overlap` against the
    LITERAL blocklist array — a pure zero-shuffle projection + filter,
    no join at all; at 10^12 rows this is scan-speed. For a blocklist
    too large to inline (>~10^4 entries) use
    `filter_blocked_domains_df` — same suffix semantics, broadcast
    join shape, corpus still never shuffled.

    With `keep_col` set, rows are kept and annotated (True = blocked)
    instead of filtered — the audit variant.
    """
    labels = F.split(F.col(domain_col), r"\.")
    n = F.size(labels)
    suffixes = F.transform(
        F.sequence(F.lit(1), n),
        lambda i: F.array_join(F.slice(labels, i, n), "."),
    )
    # NULL domain → arrays_overlap is NULL, which a bare filter would
    # silently drop; a blocklist must never be the thing that discards
    # domain-less rows, so NULL coalesces to not-blocked (matching the
    # df variant, where an unmatched left join means kept).
    blocked = F.coalesce(
        F.arrays_overlap(suffixes, F.array(*[F.lit(b) for b in blocklist])),
        F.lit(False),
    ) if blocklist else F.lit(False)
    if keep_col is not None:
        return df.withColumn(keep_col, blocked)
    return df.filter(~blocked)


def filter_blocked_domains_df(
    df: DataFrame,
    blocklist_df: DataFrame,
    domain_col: str = "domain",
    keep_col: str | None = None,
    broadcast_hits: bool = True,
) -> DataFrame:
    """The large-blocklist variant of `filter_blocked_domains`: the
    blocklist is a one-column DataFrame (first column = blocked host)
    too big to inline as a literal array (real host blocklists run to
    millions of entries) but far smaller than the corpus.

    Same dot-suffix semantics, shaped so the CORPUS is never shuffled
    (the strategy `pipeline/run.py` uses for its broadcast dup-verdict):

    1. distinct domains — the only shuffle, on a single short column
       with map-side combine (~10^8 rows from 10^12 docs);
    2. explode each domain's bounded suffix set (~5/host) and
       left-semi equi-join against the BROADCAST blocklist → the HIT
       domain set, bounded by (corpus domains ∩ blocklist subtrees),
       in practice ≲ blocklist size;
    3. join the hit set back on `domain_col`. With `broadcast_hits`
       (default) the verdict join carries an explicit broadcast hint —
       zero wide exchange on the corpus; the hit set is bounded by the
       blocklist, which by this function's contract fits a broadcast.
       Pass `broadcast_hits=False` for a blocklist near executor-memory
       size: the hint is dropped and AQE picks the strategy at runtime.

    The whole operator is LAZY — no action runs at construction time,
    so it composes into lineage replay and streaming foreachBatch plans
    without re-executing the distinct+explode join per call.

    With `keep_col` set, rows are annotated (True = blocked) instead of
    filtered.
    """
    dom = F.col("_bd_dom")
    labels = F.split(dom, r"\.")
    n = F.size(labels)
    suffixes = F.transform(
        F.sequence(F.lit(1), n),
        lambda i: F.array_join(F.slice(labels, i, n), "."),
    )
    bl = F.broadcast(
        blocklist_df.select(F.col(blocklist_df.columns[0]).alias("_bd_entry"))
    )
    hits = (
        df.select(F.col(domain_col).alias("_bd_dom"))
        .distinct()
        .select(dom, F.explode(suffixes).alias("_bd_sfx"))
        .join(bl, F.col("_bd_sfx") == F.col("_bd_entry"), "left_semi")
        .select(dom)
        .distinct()
    )
    if broadcast_hits:
        hits = F.broadcast(hits)
    out = df.join(hits, F.col(domain_col) == dom, "left")
    blocked = dom.isNotNull()
    if keep_col is not None:
        return out.withColumn(keep_col, blocked).drop("_bd_dom")
    return out.filter(~blocked).drop("_bd_dom")


def domain_profile(
    df: DataFrame,
    domain_col: str = "source",
    text_col: str = "text",
    lang_col: str = "lang",
    chars_col: str = "n_chars",
    short_chars: int = 280,
    flag_avg_chars: float = 290.0,
    flag_dup_rate: float = 0.2,
) -> DataFrame:
    """Per-domain quality profile with a drop-flag.

    Columns: n_docs, n_langs, avg_chars (round 4), short_frac (docs below
    `short_chars`, round 6), dup_docs / dup_rate (corpus-wide EXACT-text
    duplicates attributed to the domain, round 6), flagged (avg_chars
    below threshold OR dup_rate above threshold — both compared on the
    ROUNDED value so the oracle decides ties identically).
    """
    w = Window.partitionBy(F.md5(F.col(text_col)))
    d = df.withColumn("_dup", (F.count(F.lit(1)).over(w) >= 2).cast("int"))
    avg_chars = F.round(F.avg(chars_col), 4)
    dup_rate = F.round(F.sum("_dup") / F.count(F.lit(1)), 6)
    prof = d.groupBy(F.col(domain_col).alias("domain")).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct(lang_col).alias("n_langs"),
        avg_chars.alias("avg_chars"),
        F.round(
            F.sum((F.col(chars_col) < short_chars).cast("int")) / F.count(F.lit(1)), 6
        ).alias("short_frac"),
        F.sum("_dup").cast("long").alias("dup_docs"),
        dup_rate.alias("dup_rate"),
    )
    return prof.withColumn(
        "flagged",
        (F.col("avg_chars") < flag_avg_chars) | (F.col("dup_rate") > flag_dup_rate),
    )


def tfidf_top_terms(
    df: DataFrame,
    domain_col: str = "source",
    text_col: str = "text",
    k: int = 3,
) -> DataFrame:
    """Top-k discriminative whitespace terms per domain by tf-idf.

    tf = term occurrences / domain token total; idf = ln((1+N)/(1+df))+1
    (smoothed, sklearn convention) over N = distinct domains, df =
    domains containing the term. Score rounded to 6 dp BEFORE ranking so
    row_number's (score desc, term asc) order is a total order the
    DuckDB oracle reproduces bit-for-bit.
    """
    toks = df.select(
        F.col(domain_col).alias("domain"),
        F.explode(F.split(F.col(text_col), r"\s+")).alias("term"),
    ).filter(F.col("term") != "")
    tc = toks.groupBy("domain", "term").agg(F.count(F.lit(1)).alias("tf_cnt"))
    tot = tc.groupBy("domain").agg(F.sum("tf_cnt").alias("tok_total"))
    dfreq = tc.groupBy("term").agg(F.count(F.lit(1)).alias("term_df"))
    n_dom = df.agg(F.countDistinct(domain_col).alias("n_domains"))

    scored = (
        tc.join(tot, "domain")
        .join(dfreq, "term")
        .crossJoin(F.broadcast(n_dom))
        .withColumn(
            "score",
            F.round(
                (F.col("tf_cnt") / F.col("tok_total"))
                * (
                    F.log(
                        (1.0 + F.col("n_domains")) / (1.0 + F.col("term_df"))
                    )
                    + 1.0
                ),
                6,
            ),
        )
    )
    w = Window.partitionBy("domain").orderBy(
        F.col("score").desc(), F.col("term").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("domain", "term", "score", F.col("rank").cast("long").alias("rank"))
    )


def registered_domain_df(
    df: DataFrame,
    psl_df: DataFrame,
    host_col: str = "host",
    out_col: str = "registered_domain",
    max_suffix_labels: int = 5,
) -> DataFrame:
    """PSL eTLD+1 annotation against a public-suffix TABLE — the
    large-list sibling of `functions.urlfns.url_registered_domain(psl=)`
    for the full publicsuffix.org list (~10^4 exact entries after
    wildcard expansion), where a plan-literal array would put 10^4
    interpreted string compares inside a per-element HOF.

    Scale shape: ONE broadcast left join per candidate suffix LENGTH
    (1..max_suffix_labels); the corpus is the STREAM side of every join,
    so it is never shuffled and never exploded, and the identical psl
    broadcast is reused across the joins (ReusedExchange). Longest match
    wins. Same contract as the literal variant:

    - host IS a listed suffix            -> NULL (no registered domain);
    - longest listed suffix + one label  -> eTLD+1;
    - no listed suffix (default rule '*')-> last two labels
                                            (whole host when single-label).

    Suffixes longer than `max_suffix_labels` labels are not matched
    (the real PSL's longest entries are 4-5 labels).
    """
    host = F.col(host_col)
    labels = F.split(host, r"\.")
    n = F.size(labels)
    entry = F.col(psl_df.columns[0])
    out = df
    hits: list[tuple[int, F.Column]] = []
    for ln in range(1, max_suffix_labels + 1):
        sfx, hit = f"_rd_sfx{ln}", f"_rd_hit{ln}"
        p = F.broadcast(
            psl_df.select(entry.alias(sfx), F.lit(True).alias(hit))
        )
        out = out.withColumn(
            sfx,
            F.when(n >= ln, F.array_join(F.slice(labels, n - ln + 1, ln), ".")),
        ).join(p, on=sfx, how="left")
        hits.append((ln, F.col(hit)))
    best = F.lit(0)
    for ln, hit in hits:                    # later (longer) match overrides
        best = F.when(hit, F.lit(ln)).otherwise(best)
    reg = (
        F.when(best == n, F.lit(None).cast("string"))
        .when(best > 0, F.array_join(F.slice(labels, n - best, best + 1), "."))
        .when(n >= 2, F.array_join(F.slice(labels, n - 1, F.lit(2)), "."))
        .otherwise(host)
    )
    out = out.withColumn(out_col, reg)
    return out.drop(*[c for ln in range(1, max_suffix_labels + 1)
                      for c in (f"_rd_sfx{ln}", f"_rd_hit{ln}")])
