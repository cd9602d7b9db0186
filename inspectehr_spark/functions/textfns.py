"""Text-analysis column expressions: token counts, quality ratios,
language-ID heuristic, document fingerprinting.

Everything is a native Column expression (JVM-side, whole-stage codegen).
These are the Gopher/C4-style heuristic features that feed the rule battery;
the reference analog is the per-value vector arithmetic in
R/evaluate_ranges.R and the model scorer R/analyse_bg.R:15-34.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# A small multilingual stopword inventory; per-language lists drive the
# n-gram language-ID heuristic below. Public-knowledge word lists.
STOPWORDS = {
    "en": ("the", "a", "of", "and", "to", "in", "is", "that", "it", "for", "on", "with", "as", "was", "at"),
    "de": ("der", "die", "das", "und", "ist", "von", "mit", "den", "ein", "eine", "zu", "im", "für", "auf", "nicht"),
    "fr": ("le", "la", "les", "de", "et", "un", "une", "est", "dans", "que", "pour", "qui", "sur", "pas", "au"),
    "es": ("el", "la", "los", "las", "de", "y", "un", "una", "es", "en", "que", "por", "para", "con", "no"),
}
ALL_STOPWORDS = tuple(sorted({w for ws in STOPWORDS.values() for w in ws}))

_WS = r"\s+"


def tokens(text_col) -> Column:
    """Whitespace tokens; empty string → empty array (not [''])."""
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    return F.filter(F.split(c, _WS), lambda t: t != "")


def token_count(text_col) -> Column:
    return F.size(tokens(text_col))


def mean_word_length(text_col) -> Column:
    """Mean token length = total non-space chars / token count."""
    toks = tokens(text_col)
    n = F.size(toks)
    total = F.aggregate(toks, F.lit(0), lambda acc, t: acc + F.length(t))
    return F.when(n > 0, F.round(total.cast("double") / n, 6)).otherwise(F.lit(None))


def stopword_ratio(text_col, stopwords: tuple[str, ...] = ALL_STOPWORDS) -> Column:
    """Fraction of tokens that are stopwords (lowercased)."""
    toks = tokens(text_col)
    n = F.size(toks)
    sw = F.size(
        F.filter(toks, lambda t: F.lower(t).isin(*stopwords))
    )
    return F.when(n > 0, F.round(sw.cast("double") / n, 6)).otherwise(F.lit(None))


def symbol_ratio(text_col) -> Column:
    """Fraction of characters that are not alphanumeric/space."""
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    total = F.length(c)
    clean = F.length(F.regexp_replace(c, r"[^A-Za-z0-9\s]", ""))
    return F.when(
        total > 0, F.round((total - clean).cast("double") / total, 6)
    ).otherwise(F.lit(None))


def langid_heuristic(text_col) -> Column:
    """Stopword-vote language ID: the language whose stopword list matches
    the most tokens wins; ties break lexicographically; no hits → 'und'.

    This is the native-SQL stand-in for a fastText model (the model-scoring
    path is the pandas UDF in pipeline/models.py; this one is pure codegen
    and is used where an approximate id suffices).
    """
    toks = F.transform(tokens(text_col), lambda t: F.lower(t))

    def hits_for(ws):
        return F.size(F.filter(toks, lambda t: t.isin(*ws)))

    scored = F.array(
        *[
            F.struct(hits_for(ws).alias("hits"), F.lit(lang).alias("lang"))
            for lang, ws in sorted(STOPWORDS.items())
        ]
    )
    best = F.array_max(F.filter(scored, lambda s: s["hits"] > 0))
    return F.when(best.isNull(), F.lit("und")).otherwise(best["lang"])


def word_ngrams(toks: Column, n: int = 3) -> Column:
    """Word n-grams of a token-array column as array<string>, built from
    zip_with over shifted slices.

    WHY not transform(sequence(1, sz-n+1), i -> slice(toks, i, n)): any
    expression placed inside a higher-order-function lambda body is
    re-evaluated PER ELEMENT (Catalyst inlines aliases into lambdas —
    observed as a quadratic hang on 100k-token documents). zip_with's
    inputs are ordinary children evaluated once per row; its lambda only
    touches the bound element variables, so this composition is linear
    regardless of how the optimizer collapses projections.
    """
    if n < 1:
        raise ValueError("n must be >= 1")
    out = toks
    for k in range(1, n):
        shifted = F.slice(
            toks, k + 1, F.greatest(F.size(toks) - k, F.lit(0))
        )
        out = F.zip_with(out, shifted, lambda acc, nxt: F.concat_ws(" ", acc, nxt))
    # zip_with pads with nulls → trailing entries are short grams; clip.
    return F.when(
        F.size(toks) >= n, F.slice(out, 1, F.greatest(F.size(toks) - (n - 1), F.lit(0)))
    ).otherwise(F.array().cast("array<string>"))


def fingerprint(text_col, k: int = 8) -> Column:
    """Deterministic 64-bit document fingerprint: xxhash64 of the document's
    k lexicographically-smallest token hashes (a bottom-k sketch — robust to
    token order, cheap to compare)."""
    hashes = F.transform(tokens(text_col), lambda t: F.xxhash64(t))
    bottom = F.slice(F.array_sort(hashes), 1, k)
    return F.xxhash64(F.concat_ws(",", F.transform(bottom, lambda h: h.cast("string"))))


# GPT-2-style pre-tokenizer pattern, restricted to syntax valid in BOTH
# Java regex (Spark) and RE2 (DuckDB): no lookarounds, no possessives.
# Pieces: common English contractions | space?+letters | space?+digits |
# space?+other-symbol runs | whitespace runs.
BPE_ISH_RE = r"'(?:[sdmt]|ll|ve|re)| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+"


def bpe_ish_token_count(text_col) -> Column:
    """Subword-ish token count via a GPT-2-style pre-tokenizer regex —
    the 'BPE-ish regex' counter beside the whitespace `token_count`
    (training-data token budgeting). Native `regexp_count`: JVM-side,
    no UDF."""
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    return F.regexp_count(c, F.lit(BPE_ISH_RE)).cast("long")
