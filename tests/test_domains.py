"""Unit + plan tests for the domain/URL provenance-curation family
(operators/domains.py, functions/urlfns.py, queries_r5c.py)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from inspectehr_spark.functions import urlfns as U
from inspectehr_spark.operators.domains import domain_profile, tfidf_top_terms


def _url_rows(spark, urls):
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    return {
        r["url"]: r
        for r in df.select(
            "url",
            U.url_scheme("url").alias("scheme"),
            U.url_host("url").alias("host"),
            U.url_registered_domain("url").alias("regdom"),
            U.url_path("url").alias("path"),
            U.url_query_clean("url").alias("q"),
            U.url_canonical("url").alias("canon"),
        ).collect()
    }


def test_url_normalisation_known_answers(spark):
    rows = _url_rows(
        spark,
        [
            "HTTP://WWW.News.Example.COM/en/page-1?utm_source=rss&ref=1&utm_campaign=x#top",
            "https://blog.example.com/a/b?id=7",
            "https://example.com/plain",
            "https://example.com/only-utm?utm_medium=mail",
        ],
    )
    r = rows["HTTP://WWW.News.Example.COM/en/page-1?utm_source=rss&ref=1&utm_campaign=x#top"]
    assert r["scheme"] == "http"
    assert r["host"] == "www.news.example.com"
    assert r["regdom"] == "news.example.com"
    assert r["path"] == "/en/page-1"
    assert r["q"] == "ref=1"  # both utm params stripped, separators healed
    assert r["canon"] == "http://www.news.example.com/en/page-1?ref=1"

    r = rows["https://blog.example.com/a/b?id=7"]
    assert r["q"] == "id=7"
    assert r["canon"] == "https://blog.example.com/a/b?id=7"

    r = rows["https://example.com/plain"]
    assert r["q"] == ""
    assert r["canon"] == "https://example.com/plain"

    # utm-only query collapses to no query at all in the canonical form
    r = rows["https://example.com/only-utm?utm_medium=mail"]
    assert r["q"] == ""
    assert r["canon"] == "https://example.com/only-utm"


def test_domain_profile_flags_and_dups(spark):
    # d1: two exact-dup docs (same text) + one short doc -> dup_rate 2/3,
    # flagged. d2: three distinct long docs -> clean.
    rows = [
        (1, "same text here", "en", "d1", 100),
        (2, "same text here", "en", "d1", 100),
        (3, "short", "de", "d1", 50),
        (4, "alpha beta gamma", "en", "d2", 400),
        (5, "delta epsilon zeta", "fr", "d2", 420),
        (6, "eta theta iota", "en", "d2", 380),
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    out = {r["domain"]: r for r in domain_profile(df).collect()}
    d1 = out["d1"]
    assert d1["n_docs"] == 3 and d1["n_langs"] == 2
    assert d1["dup_docs"] == 2
    assert math.isclose(d1["dup_rate"], round(2 / 3, 6))
    assert d1["flagged"] is True  # avg_chars 83.33 < 290 and dup_rate > 0.2
    d2 = out["d2"]
    assert d2["dup_docs"] == 0 and d2["flagged"] is False
    assert math.isclose(d2["avg_chars"], 400.0)


def test_tfidf_top_terms_known_answer(spark):
    # equal tf (1/2 each) inside d1: 'rare' (df=1, idf=ln(3/2)+1) must
    # outrank 'common' (df=2, idf=1).
    rows = [
        (1, "rare common", "d1"),
        (2, "common filler", "d2"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    out = tfidf_top_terms(df, k=2).collect()
    by_dom = {}
    for r in out:
        by_dom.setdefault(r["domain"], []).append(r)
    d1 = sorted(by_dom["d1"], key=lambda r: r["rank"])
    assert d1[0]["term"] == "rare"  # unique term outranks the shared one
    assert d1[1]["term"] == "common"
    assert all(r["rank"] <= 2 for r in out)
    assert math.isclose(d1[0]["score"], round(0.5 * (math.log(1.5) + 1.0), 6))
    # idf of a both-domain term: ln((1+2)/(1+2))+1 = 1 -> score == tf
    common_d1 = [r for r in by_dom["d1"] if r["term"] == "common"][0]
    assert math.isclose(common_d1["score"], 0.5)


def test_url_normalize_plan_zero_shuffle(spark, sf_dir):
    from inspectehr_spark.queries import QUERIES

    plan = (
        QUERIES["url_normalize"][0](spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan  # pure projection end to end


def test_tfidf_domain_count_is_broadcast(spark, sf_dir):
    from inspectehr_spark.queries import QUERIES

    plan = (
        QUERIES["domain_tfidf_terms"][0](spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # the 1-row domain-count scalar joins via broadcast, never a
    # shuffled/sort-merge cross join
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan
    assert "CartesianProduct" not in plan
