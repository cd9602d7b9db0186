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


def url_registered_domain(url) -> Column:
    """Host with a single leading 'www.' label stripped — the grouping key
    for domain-level quality aggregation. (A public-suffix-list lookup is
    the production refinement; the www-strip is the deterministic core.)"""
    return F.regexp_replace(url_host(url), r"^www\.", "")


def url_path(url) -> Column:
    """Path including its leading '/'; '' when absent."""
    return F.coalesce(F.parse_url(_c(url), F.lit("PATH")), F.lit(""))


def url_query_clean(url) -> Column:
    """Query string with every utm_* tracking parameter removed and
    separators healed; '' when nothing (or nothing non-utm) remains.

    Two-step regexp chain (order matters, mirrored verbatim in the DuckDB
    oracle): first drop any utm param that is FOLLOWED by another param
    (consuming its trailing '&'), then drop a trailing/lone utm param with
    its LEADING '&' if present.
    """
    q = F.coalesce(F.parse_url(_c(url), F.lit("QUERY")), F.lit(""))
    q = F.regexp_replace(q, r"utm_[a-z]+=[^&]*&", "")
    return F.regexp_replace(q, r"&?utm_[a-z]+=[^&]*", "")


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
