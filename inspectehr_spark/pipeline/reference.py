"""Serial reference labeler — the pipeline's ground truth.

A deliberately independent, plain-Python implementation of pipeline/spec.py
(no Spark, no pandas): per-document checks, keep/drop decision, and
scrubbed text. The Spark pipeline is graded against THIS labeler exactly
the way the build is graded against the reference's labels: keep/drop F1
and byte-identical scrubbed text per url (BASELINE.json "metric").

Mirrors the role of the reference's fixture expectations
(/root/reference/tests/testthat/test_evaluate_duplicate.R:29-36 — exact
planted counts known in advance).
"""

from __future__ import annotations

import datetime as dt
import re

from inspectehr_spark.pipeline import spec
from inspectehr_spark.functions.textfns import ALL_STOPWORDS

_TS_LO = dt.datetime.fromisoformat(spec.TS_LO_ISO)
_TS_HI = dt.datetime.fromisoformat(spec.TS_HI_ISO)

# Default (Unicode) compile matches Java/Spark behavior: Java's \b is
# Unicode-aware (empirically 'é1234567890' does NOT match \b\d{10}\b in
# either engine), same as Python's default — re.ASCII would DIVERGE.
# Case-insensitivity is therefore expressed with explicit [cC] classes
# in the spec, never (?i), whose case folding IS engine-dependent
# (Python folds ſ→s, Java does not without UNICODE_CASE).
_SCRUB = [(re.compile(p), r) for p, r in spec.SCRUB_CHAIN]


def scrub_serial_chain(text: str, chain) -> str:
    """scrub_serial over an INJECTED chain (spec.build_scrub_chain(...)) —
    the serial ground truth for the parameterized byte-identity property
    test; compiled per call, so only tests use it."""
    for pat, repl in ((re.compile(p), r) for p, r in chain):
        text = pat.sub(repl, text)
    return text
_VOCAB, _PROFILES = spec.build_profiles()
_VOCAB_SET = frozenset(_VOCAB)
_SW = frozenset(ALL_STOPWORDS)


def langid_serial(text: str) -> str:
    padded = f" {text} "
    counts: dict[str, int] = {}
    for i in range(len(padded) - 1):
        b = padded[i : i + 2]
        counts[b] = counts.get(b, 0) + 1
    vocab_hits = sum(c for b, c in counts.items() if b in _VOCAB_SET)
    if vocab_hits == 0:
        return "und"
    best_lang, best_score = "und", None
    for lang in spec.LANGS:  # sorted → first max wins = smaller code
        prof = _PROFILES[lang]
        score = 0
        for b, c in counts.items():
            w = prof.get(b)
            if w:
                score += c * w
        if best_score is None or score > best_score:
            best_score, best_lang = score, lang
    return best_lang


def perplexity_serial(tokens: list[str]) -> float:
    if not tokens:
        return 0.0
    total = 0
    for t in tokens:
        total += spec.token_cost(t)
    return total / len(tokens)


def scrub_serial(text: str) -> str:
    out = text
    for pat, repl in _SCRUB:
        out = pat.sub(repl, out)
    return out


def label_pages(rows: list[tuple]) -> dict[str, dict]:
    """rows = (url, warc_ts, html, text, lang). Returns
    {url: {keep, first_fail_code, scrubbed_text, checks:{code:bool}, text}}.
    """
    # pass 1: exact-duplicate detection — duplicate iff same extracted text
    # as a doc with a smaller url (keep-first by url, explicit stable order)
    extracted = {}
    for url, _ts, html, _text, _lang in rows:
        extracted[url] = spec.extract_text_py(html)
    first_url_for_text: dict[str, str] = {}
    for url in sorted(extracted):
        t = extracted[url]
        if t not in first_url_for_text:
            first_url_for_text[t] = url

    out: dict[str, dict] = {}
    for url, ts, html, _text, lang in rows:
        text = extracted[url]
        toks = spec.tokenize_py(text)
        n_chars = len(text)
        n_tokens = len(toks)
        no_space = n_chars - text.count(" ")
        mean_wl = (no_space / n_tokens) if n_tokens else None
        clean = len(re.sub(r"[^A-Za-z0-9 ]", "", text))
        sym_ratio = ((n_chars - clean) / n_chars) if n_chars else None
        sw = sum(1 for t in toks if t.lower() in _SW)
        sw_ratio = (sw / n_tokens) if n_tokens else None
        tris = [" ".join(toks[i : i + 3]) for i in range(max(0, n_tokens - 2))]
        dupng = (1.0 - len(set(tris)) / len(tris)) if tris else 0.0
        pred = langid_serial(text)
        ppl = perplexity_serial(toks)

        fails = {}
        fails["doc_length"] = not (spec.LEN_LO <= n_chars <= spec.LEN_HI)
        fails["word_count"] = not (spec.TOK_LO <= n_tokens <= spec.TOK_HI)
        fails["mean_word_length"] = (
            mean_wl is not None and not (spec.MWL_LO <= mean_wl <= spec.MWL_HI)
        )
        fails["symbol_ratio"] = sym_ratio is not None and sym_ratio > spec.SYM_HI
        fails["stopword_ratio"] = sw_ratio is not None and sw_ratio < spec.SW_LO
        fails["dup_ngram_frac"] = dupng > spec.DUPNG_HI
        fails["lang_allowed"] = lang not in spec.ALLOWED_LANGS
        fails["langid_agree"] = pred != lang
        fails["perplexity"] = ppl > spec.PPL_HI
        fails["warc_ts_bounds"] = not (_TS_LO <= ts <= _TS_HI)
        fails["exact_duplicate"] = first_url_for_text[text] != url

        failing = sorted(c for c, bad in fails.items() if bad)
        out[url] = {
            "keep": not failing,
            "first_fail_code": failing[0] if failing else None,
            "scrubbed_text": scrub_serial(text),
            "checks": fails,
            "text": text,
        }
    return out
