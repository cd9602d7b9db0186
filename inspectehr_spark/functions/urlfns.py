"""URL parsing + canonicalisation column expressions for web-corpus
provenance curation.

A web-scale training pipeline filters and deduplicates by URL long before
it ever reads document bytes: host-level blocklists, registered-domain
aggregation, and tracking-parameter stripping (so `?utm_source=rss`
variants of one page hash-dedup to the same key). Everything here is a
native Column expression — `parse_url` (Hive-compatible JVM builtin) for
structural parts, `regexp_replace` for the canonicalisation chain — so
the whole family stays inside whole-stage codegen: a pure projection,
zero shuffle, pushdown-transparent.

Reference analog: none in inspectEHR (clinical events carry site codes,
not URLs); this is the beyond-reference web-pipeline set (SURVEY §8).
The canonicalisation rules are the public CommonCrawl/C4 conventions
(Raffel et al. 2020 §2.2 dedups on URL).

Parity note (oracle_sql): DuckDB has no parse_url; the oracles replicate
HOST/PATH/QUERY with anchored regexps. The contracts below are chosen so
the two extraction strategies agree byte-for-byte on any
`scheme://host[/path][?query][#fragment]` URL without userinfo or port —
the shapes this repo's corpus synthesises.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col) -> Column:
    return F.col(col) if isinstance(col, str) else col


def url_scheme(url) -> Column:
    """Lower-cased scheme ('' when the URL has none)."""
    return F.lower(F.regexp_extract(_c(url), r"^([A-Za-z][A-Za-z0-9+.-]*)://", 1))


def url_host(url) -> Column:
    """Lower-cased host. parse_url(HOST) keeps source case; normalisation
    is ours. NULL-host (relative URL) → ''."""
    return F.lower(F.coalesce(F.parse_url(_c(url), F.lit("HOST")), F.lit("")))


def url_registered_domain(url, psl: tuple[str, ...] | None = None) -> Column:
    """The grouping key for domain-level quality aggregation.

    Without `psl` (default): host with a single leading 'www.' label
    stripped — the deterministic no-dependency core.

    With `psl` (a sequence of public-suffix strings): proper PSL
    semantics — the registered domain (eTLD+1) is the longest listed
    public suffix plus ONE preceding label, so `a.b.co.uk` → `b.co.uk`
    (with 'co.uk' listed), never the suffix-naive `co.uk`. Rules:

    - longest match wins: the host's dot-suffix set (bounded by label
      count, ~5) is tested against the LITERAL psl array; the smallest
      start index that matches is the longest suffix;
    - a host that IS a public suffix has no registered domain → NULL
      (publicsuffix2's get_sld contract);
    - no listed suffix → the PSL default rule '*': the bare TLD is the
      suffix, registered domain = last two labels (host itself when it
      has a single label, '' for an empty host).

    Scale shape: still a pure zero-shuffle projection — the psl array is
    a plan literal, fine to ~10^4 entries. For the full ~10^4-entry PSL
    file in a long-lived job, or blocklist-sized tables, use
    `operators.domains.registered_domain_df` (same longest-suffix
    semantics, broadcast-join shape, corpus never shuffled).

    Simplification (documented): exact-match entries only — the PSL
    file's wildcard (`*.ck`) and exception (`!www.ck`) rules must be
    expanded/resolved by whatever loads the file; `psl_fixture()` below
    ships a deterministic exact-entry sample for tests and oracles.
    """
    host = url_host(url)
    if psl is None:
        return F.regexp_replace(host, r"^www\.", "")
    labels = F.split(host, r"\.")
    n = F.size(labels)
    psl_arr = F.array(*[F.lit(s) for s in dict.fromkeys(psl)])
    # matches[i] = (dot-suffix starting at label i) ∈ psl; first True
    # position = longest listed suffix. `labels` re-evaluates per lambda
    # element (HOFs interpret their bodies) — bounded by the ~5-label
    # host shape, same budget as operators/domains.py's suffix explode.
    first = F.array_position(
        F.transform(
            F.sequence(F.lit(1), n),
            lambda i: F.array_contains(
                psl_arr, F.array_join(F.slice(labels, i, n), ".")
            ),
        ),
        F.lit(True),
    )
    return (
        F.when(first == 1, F.lit(None).cast("string"))
        .when(
            first > 1,
            F.array_join(F.slice(labels, first - 1, n), "."),
        )
        .when(n >= 2, F.array_join(F.slice(labels, n - 1, F.lit(2)), "."))
        .otherwise(host)
    )


def psl_fixture() -> tuple[str, ...]:
    """Deterministic public-suffix sample for tests/oracles: enough
    multi-label entries to exercise longest-match (`co.uk` vs `uk`),
    private-registry suffixes (`github.io`), and the default rule
    (TLDs deliberately absent, e.g. `.zz`). Production loads the real
    publicsuffix.org list instead; the lookup machinery is identical."""
    return (
        "com", "org", "net", "edu", "gov", "io", "de", "fr", "jp", "uk",
        "co.uk", "org.uk", "ac.uk", "gov.uk", "co.jp", "ne.jp",
        "com.au", "net.au", "org.au", "com.br", "co.in",
        "github.io", "blogspot.com",
    )


def url_path(url) -> Column:
    """Path including its leading '/'; '' when absent."""
    return F.coalesce(F.parse_url(_c(url), F.lit("PATH")), F.lit(""))


def url_query_clean(url) -> Column:
    """Query string with every utm_* tracking parameter removed and
    separators healed; '' when nothing (or nothing non-utm) remains.

    Two-step regexp chain (order matters, mirrored verbatim in the DuckDB
    oracle): the parameter NAME is anchored to a separator — `(?:^|&)` —
    so only whole `utm_*` parameters are removed; a non-utm parameter
    whose name merely ENDS in `utm_…` (e.g. `?xutm_source=1`) survives
    intact. Removing a `&utm_…=…` match consumes its leading '&', which
    splices the neighbours back together; a leading-position match can
    leave the NEXT param's '&' at position 0, healed by the second step.
    """
    q = F.coalesce(F.parse_url(_c(url), F.lit("QUERY")), F.lit(""))
    q = F.regexp_replace(q, r"(?:^|&)utm_[a-z]+=[^&]*", "")
    return F.regexp_replace(q, r"^&+", "")


def url_canonical(url) -> Column:
    """Canonical form: lower scheme + lower host + path + cleaned query;
    fragment always dropped. This is the exact-dedup key for URL-keyed
    pipelines."""
    q = url_query_clean(url)
    return F.concat(
        url_scheme(url),
        F.lit("://"),
        url_host(url),
        url_path(url),
        F.when(q != "", F.concat(F.lit("?"), q)).otherwise(F.lit("")),
    )
