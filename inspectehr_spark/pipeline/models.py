"""Arrow-batched model-scoring stages: text extraction, language ID,
perplexity. The pandas-UDF surface of the pipeline (the reference analog is
the analyze_bg model scorer, /root/reference/R/analyse_bg.R:15-34).

All three UDFs are vectorized over Arrow batches: extraction uses pandas
str ops; langid is a doc×bigram count matrix times an integer weight
matrix (numpy, exact int64); perplexity dictionary-encodes tokens and
loops only over the UNIQUE-token dictionary, never over rows.

A real deployment swaps `langid_udf`/`perplexity_udf` internals for
fastText / KenLM model calls with the same batch shape; the models here
are deterministic stand-ins defined by pipeline/spec.py (the container has
no fastText/KenLM — see SURVEY §7).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import DoubleType, StringType

from inspectehr_spark.pipeline import spec

# Build model tables once at import; shipped to executors in the UDF closure
# (small: ~300 bigrams × 6 langs of int32).
_VOCAB, _PROFILES = spec.build_profiles()
_W = np.zeros((len(_VOCAB), len(spec.LANGS)), dtype=np.int64)
for j, lang in enumerate(spec.LANGS):
    prof = _PROFILES[lang]
    for i, b in enumerate(_VOCAB):
        _W[i, j] = prof.get(b, 0)


@pandas_udf(StringType())
def extract_text_udf(html: pd.Series) -> pd.Series:
    """bytes → text per spec.extract_text_py, batched with pandas str ops
    (byte-identical to the serial labeler by construction)."""
    s = html.apply(lambda b: b.decode("utf-8", errors="strict"))
    # find <p>…</p> span
    i = s.str.find(spec.P_OPEN)
    out = []
    for txt, start in zip(s, i):
        if start < 0:
            out.append("")
            continue
        j = txt.find(spec.P_CLOSE, start + len(spec.P_OPEN))
        if j < 0:
            out.append("")
            continue
        out.append(txt[start + len(spec.P_OPEN) : j])
    res = pd.Series(out, index=s.index, dtype="object")
    for a, b in spec.UNESCAPES:
        res = res.str.replace(a, b, regex=False)
    return res


@pandas_udf(StringType())
def langid_udf(text: pd.Series) -> pd.Series:
    """Char-bigram integer-weight classifier (spec §langid): counts matrix
    via str.count per vocab bigram (C loops across the batch), int64 matmul,
    argmax with smaller-code tie-break."""
    n = len(text)
    counts = np.zeros((n, len(_VOCAB)), dtype=np.int64)
    padded = (" " + text.fillna("") + " ")
    for i, b in enumerate(_VOCAB):
        # non-overlapping count is fine: profile bigrams are 2 chars and
        # the serial side uses the same sliding-window definition below.
        counts[:, i] = _count_overlapping(padded, b)
    scores = counts @ _W  # (n, L) exact int64
    total = counts.sum(axis=1)
    # argmax returns the FIRST max index; LANGS is sorted → smaller code wins
    best = np.asarray(spec.LANGS)[np.argmax(scores, axis=1)]
    best = np.where(total == 0, "und", best)
    return pd.Series(best, index=text.index)


def _count_overlapping(padded: pd.Series, bigram: str) -> np.ndarray:
    """Overlapping bigram occurrences per row. For 2-char patterns with
    distinct chars str.count (non-overlapping) equals overlapping count;
    for doubled chars ('aa') overlapping needs the shifted pass too."""
    import re as _re

    pat = _re.escape(bigram)
    base = padded.str.count(pat).to_numpy(dtype=np.int64)
    if bigram[0] == bigram[1]:
        # count occurrences starting at odd offsets missed by re.count
        shifted = padded.str[1:].str.count(pat).to_numpy(dtype=np.int64)
        # overlapping count of "aa" in runs: total positions = (run_len - 1)
        # non-overlap count in full = floor(run/2), in shifted = floor((run-1)/2)
        # sum = run - 1 → exactly the overlapping count.
        return base + shifted
    return base


@pandas_udf(DoubleType())
def perplexity_udf(text: pd.Series) -> pd.Series:
    """Mean integer token cost (spec.token_cost) per doc — the KenLM-query
    batch shape: explode → dictionary-encode → per-unique cost → segment
    mean. Python touches only the unique-token dictionary."""
    toks = text.fillna("").str.split(" ")
    lengths = toks.apply(len)
    flat = [t for row in toks for t in row if t != ""]
    n_tok = np.fromiter(
        (sum(1 for t in row if t != "") for row in toks), dtype=np.int64, count=len(toks)
    )
    if not flat:
        return pd.Series(np.zeros(len(text)), index=text.index)
    arr = pd.Series(flat)
    cats = arr.astype("category")
    uniq = cats.cat.categories
    cost_table = np.fromiter((spec.token_cost(u) for u in uniq), dtype=np.int64, count=len(uniq))
    costs = cost_table[cats.cat.codes.to_numpy()]
    doc_ids = np.repeat(np.arange(len(toks)), n_tok)
    sums = np.bincount(doc_ids, weights=costs, minlength=len(toks))
    with np.errstate(divide="ignore", invalid="ignore"):
        ppl = np.where(n_tok > 0, sums / np.maximum(n_tok, 1), 0.0)
    _ = lengths
    return pd.Series(ppl, index=text.index)
