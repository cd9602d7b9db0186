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
            "https://example.com/p?xutm_source=1&utm_source=rss",
            "https://example.com/p?utm_a=1&utm_b=2&keep=3",
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

    # ADVICE r5 #3: a non-utm name ENDING in "utm_…" survives whole — the
    # strip is anchored to a separator, no "x" residue corruption.
    r = rows["https://example.com/p?xutm_source=1&utm_source=rss"]
    assert r["q"] == "xutm_source=1"
    assert r["canon"] == "https://example.com/p?xutm_source=1"

    # consecutive leading utm params heal to the surviving tail param
    r = rows["https://example.com/p?utm_a=1&utm_b=2&keep=3"]
    assert r["q"] == "keep=3"
    assert r["canon"] == "https://example.com/p?keep=3"


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


def test_filter_blocked_domains(spark):
    from inspectehr_spark.operators.domains import filter_blocked_domains

    rows = [
        (1, "tracker.example"),          # exact block
        (2, "ads.tracker.example"),      # subdomain of a blocked entry
        (3, "example"),                  # suffix label of a blocked entry — NOT blocked
        (4, "nottracker.example"),       # string suffix but not a dot-suffix
        (5, "news.site"),                # clean
    ]
    df = spark.createDataFrame(rows, "doc_id long, domain string")
    bl = ("tracker.example", "spam.net")
    kept = {r["doc_id"] for r in filter_blocked_domains(df, "domain", bl).collect()}
    assert kept == {3, 4, 5}
    ann = {
        r["doc_id"]: r["blocked"]
        for r in filter_blocked_domains(df, "domain", bl, keep_col="blocked").collect()
    }
    assert ann == {1: True, 2: True, 3: False, 4: False, 5: False}
    # pure projection: no exchange in the plan
    plan = (
        filter_blocked_domains(df, "domain", bl)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan


def test_filter_blocked_domains_df_matches_literal(spark):
    """The DataFrame-blocklist variant is semantics-identical to the
    literal variant, and its corpus-side verdict join is a broadcast
    (no sort-merge join anywhere in the plan)."""
    from inspectehr_spark.operators.domains import (
        filter_blocked_domains,
        filter_blocked_domains_df,
    )

    rows = [
        (i, d)
        for i, d in enumerate(
            [
                "tracker.example",
                "ads.tracker.example",
                "deep.ads.tracker.example",
                "example",
                "nottracker.example",
                "news.site",
                "spam.net",
                "a.spam.net",
                None,  # domain-less row: both variants must KEEP it
            ]
            * 3
        )
    ]
    df = spark.createDataFrame(rows, "doc_id long, domain string")
    bl = ("tracker.example", "spam.net")
    bl_df = spark.createDataFrame([(b,) for b in bl], "entry string")

    lit_kept = sorted(
        (r["doc_id"], r["domain"])
        for r in filter_blocked_domains(df, "domain", bl).collect()
    )
    df_kept_frame = filter_blocked_domains_df(df, bl_df, "domain")
    df_kept = sorted(
        (r["doc_id"], r["domain"]) for r in df_kept_frame.collect()
    )
    assert lit_kept == df_kept and len(lit_kept) > 0

    lit_ann = {
        r["doc_id"]: r["b"]
        for r in filter_blocked_domains(df, "domain", bl, keep_col="b").collect()
    }
    df_ann = {
        r["doc_id"]: r["b"]
        for r in filter_blocked_domains_df(df, bl_df, "domain", keep_col="b").collect()
    }
    assert lit_ann == df_ann

    plan = df_kept_frame._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan

    # AQE-decides path (no broadcast hint on the verdict join) stays correct
    fb = sorted(
        (r["doc_id"], r["domain"])
        for r in filter_blocked_domains_df(
            df, bl_df, "domain", broadcast_hits=False
        ).collect()
    )
    assert fb == lit_kept


def _ref_url_parts(url):
    """Serial reference for the urlfns contract, built on urllib.parse."""
    import re
    from urllib.parse import urlsplit

    sp = urlsplit(url)
    scheme = sp.scheme.lower()
    host = sp.hostname or ""
    path = sp.path
    q = sp.query
    q = re.sub(r"(?:^|&)utm_[a-z]+=[^&]*", "", q)
    q = re.sub(r"^&+", "", q)
    return {
        "scheme": scheme,
        "host": host,
        "regdom": re.sub(r"^www\.", "", host),
        "path": path,
        "q": q,
        "canon": f"{scheme}://{host}{path}" + (f"?{q}" if q else ""),
    }


def test_urlfns_property_vs_urllib(spark):
    """parse_url-based extraction agrees with urllib.parse on generated
    scheme://host[/path][?query][#fragment] URLs (the corpus shapes)."""
    import itertools

    from hypothesis import given, settings, strategies as st

    label = st.text(alphabet="abcdefgzXYZ0129", min_size=1, max_size=6)
    # Final host label must start with a letter: java.net.URI (behind
    # Spark's parse_url) rejects hostnames whose rightmost label leads
    # with a digit (returns NULL host), while urllib accepts them. Real
    # DNS names satisfy this, so the contract is scoped to them.
    last_label = st.tuples(
        st.sampled_from("abcdefgzXYZ"), st.text(alphabet="abcdefgzXYZ0129", max_size=5)
    ).map("".join)
    pval = st.text(alphabet="abc012", min_size=0, max_size=5)
    params = st.lists(
        st.tuples(
            st.sampled_from(
                # "xutm_source" is the ADVICE r5 #3 adversarial shape: a
                # non-utm name that merely ENDS in "utm_…" must survive
                # the anchored strip intact, not leave an "x" residue.
                ["utm_source", "utm_medium", "utm_campaign", "ref", "id",
                 "xutm_source"]
            ),
            pval,
        ),
        min_size=0,
        max_size=4,
    )
    urls_strategy = st.tuples(
        st.sampled_from(["http", "HTTP", "https", "HtTpS"]),
        st.lists(label, max_size=3),  # leading host labels (any shape)
        last_label,  # rightmost label: letter-first (DNS shape)
        st.lists(label, min_size=0, max_size=3),  # path segments
        params,
        st.sampled_from(["", "#frag", "#s-2"]),
    )

    @settings(max_examples=5, deadline=None)
    @given(st.lists(urls_strategy, min_size=1, max_size=60))
    def run(batch):
        urls = []
        for scheme, hlabels, hlast, psegs, ps, frag in batch:
            host = ".".join([*hlabels, hlast])
            path = "".join(f"/{s}" for s in psegs)
            query = "&".join(f"{k}={v}" for k, v in ps)
            urls.append(
                f"{scheme}://{host}{path}" + (f"?{query}" if query else "") + frag
            )
        urls = sorted(set(urls))
        got = _url_rows(spark, urls)
        for u in urls:
            want = _ref_url_parts(u)
            r = got[u]
            for k in ("scheme", "host", "regdom", "path", "q", "canon"):
                assert r[k] == want[k], (u, k, r[k], want[k])

    run()


def test_url_canonical_dedup_collapses_variants(spark, sf_dir):
    """The colliding synthesis really produces utm/fragment variants that
    collapse (else the query degenerates to a no-op dedup), and the plan
    is agg-shaped: no window, no sort-merge join."""
    from inspectehr_spark.queries import QUERIES

    df = QUERIES["url_canonical_dedup"][0](spark, sf_dir)
    rows = df.collect()
    assert sum(r["n_variants"] for r in rows) > len(rows)  # real collapses
    assert all("utm_" not in r["canonical_url"] for r in rows)
    assert all("#" not in r["canonical_url"] for r in rows)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan and "SortMergeJoin" not in plan


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


def _ref_registered_domain(host, psl):
    """Serial PSL reference: longest listed suffix + one label; host IS a
    suffix -> None; unlisted -> default rule (last two labels)."""
    labels = host.split(".")
    n = len(labels)
    for i in range(n):                       # i=0 is the whole host
        if ".".join(labels[i:]) in psl:
            if i == 0:
                return None
            return ".".join(labels[i - 1:])
    return ".".join(labels[-2:]) if n >= 2 else host


def test_psl_registered_domain_known_answers(spark):
    """VERDICT r5 #3: proper eTLD+1 — longest match wins (a.co.uk stays
    a.co.uk, never the suffix-naive co.uk), suffix-hosts have no
    registered domain, unlisted TLDs fall back to the default rule."""
    from inspectehr_spark.functions import urlfns as U

    psl = U.psl_fixture()
    cases = {
        "https://a.co.uk/x": "a.co.uk",          # eTLD+1 under co.uk
        "https://x.a.co.uk/x": "a.co.uk",        # subdomain strips to eTLD+1
        "https://www.news.example.com/x": "example.com",
        "https://co.uk/x": None,                 # host IS a public suffix
        "https://github.io/x": None,             # private-registry suffix
        "https://user.github.io/x": "user.github.io",
        "https://deep.user.github.io/x": "user.github.io",
        "https://foo.zz/x": "foo.zz",            # unlisted TLD: default rule
        "https://a.b.foo.zz/x": "foo.zz",
        "https://localhost/x": "localhost",      # single label, unlisted
    }
    df = spark.createDataFrame([(u,) for u in cases], "url string")
    got = {
        r["url"]: r["rd"]
        for r in df.select(
            "url", U.url_registered_domain("url", psl=psl).alias("rd")
        ).collect()
    }
    for u, want in cases.items():
        assert got[u] == want, (u, got[u], want)
        host = u.split("//")[1].split("/")[0]
        assert _ref_registered_domain(host, set(psl)) == want, (u, "ref")
    # psl=None keeps the r5 www-strip contract unchanged
    got_none = {
        r["url"]: r["rd"]
        for r in df.select(
            "url", U.url_registered_domain("url").alias("rd")
        ).collect()
    }
    assert got_none["https://www.news.example.com/x"] == "news.example.com"


def test_psl_registered_domain_property(spark):
    """Hypothesis: generated multi-label hosts agree with the serial PSL
    reference on every rule branch (longest-match, suffix-is-host,
    default rule)."""
    from hypothesis import given, settings, strategies as st

    from inspectehr_spark.functions import urlfns as U

    psl = U.psl_fixture()
    label = st.sampled_from(["a", "bb", "www", "user", "x9"])
    suffix = st.sampled_from(list(psl) + ["zz", "qq.zz"])
    hosts_strategy = st.tuples(st.lists(label, min_size=0, max_size=3), suffix)

    @settings(max_examples=5, deadline=None)
    @given(st.lists(hosts_strategy, min_size=1, max_size=50))
    def run(batch):
        hosts = sorted({".".join([*ls, sfx]) for ls, sfx in batch})
        df = spark.createDataFrame(
            [(f"https://{h}/p",) for h in hosts], "url string"
        )
        got = {
            r["url"]: r["rd"]
            for r in df.select(
                "url", U.url_registered_domain("url", psl=psl).alias("rd")
            ).collect()
        }
        for h in hosts:
            assert got[f"https://{h}/p"] == _ref_registered_domain(h, set(psl))

    run()


def test_registered_domain_df_matches_literal_and_plan(spark):
    """The broadcast-join variant (full-PSL scale path) agrees with the
    literal variant row-for-row, and its plan never shuffles the corpus:
    broadcast joins only, no Exchange on the stream side."""
    from inspectehr_spark.functions import urlfns as U
    from inspectehr_spark.operators.domains import registered_domain_df

    psl = U.psl_fixture()
    hosts = [
        "a.co.uk", "x.a.co.uk", "www.news.example.com", "co.uk",
        "github.io", "user.github.io", "deep.user.github.io",
        "foo.zz", "a.b.foo.zz", "localhost", "",
    ]
    df = spark.createDataFrame([(h,) for h in hosts], "host string")
    psl_df = spark.createDataFrame([(s,) for s in psl], "suffix string")
    got = {
        r["host"]: r["registered_domain"]
        for r in registered_domain_df(df, psl_df, "host").collect()
    }
    for h in hosts:
        want = _ref_registered_domain(h, set(psl)) if h else ""
        assert got[h] == want, (h, got[h], want)

    plan = (
        registered_domain_df(df, psl_df, "host")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    # the only exchanges are the psl broadcasts, never a corpus shuffle
    import re

    assert not re.search(r"Exchange (hash|range)partitioning", plan), plan


def test_domain_family_partial_agg_skew_gate(spark):
    """VERDICT r5 #6 structural gate: what makes domain_profile /
    tfidf_top_terms straggler-free under a 50%-of-rows hot domain is
    map-side partial aggregation — the hot key crosses the exchange as
    one partial row per map task. Assert partial_ aggregates are present
    below every grouped exchange (the measured counterpart — max/median
    task time ~1.0 at 600k docs — lives in skew_bench.py / BENCH.md)."""
    rows = [
        (
            i,
            "hot0 hot1 w%d w%d" % (i % 7, i % 11),
            "en",
            "d0" if i < 50 else f"d{1 + i % 10}",
            40,
        )
        for i in range(100)
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    prof_plan = domain_profile(df)._jdf.queryExecution().executedPlan().toString()
    # two-level distinct rewrite: partial on (source, lang), merge above
    assert "partial_" in prof_plan and "merge_" in prof_plan
    tfidf_plan = (
        tfidf_top_terms(df)._jdf.queryExecution().executedPlan().toString()
    )
    # every counting agg in the tf-idf chain partial-aggregates map-side
    assert tfidf_plan.count("partial_count") >= 3
    assert "partial_sum" in tfidf_plan
