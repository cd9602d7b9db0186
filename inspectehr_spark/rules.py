"""Rules table — the qref analog.

The reference drives its battery from a 255-row DQ-reference CSV with a
`ranges` string column like "[0, 100]" / "(0, Inf)" parsed per call
(`parse_range`, reference R/utils.R:377-433) plus a `possible_values`
list-column (R/evaluate_ranges.R:105-187). We parse ranges ONCE on the
driver into (lo, hi, lo_incl, hi_incl) and ship the whole rules table to
executors as a broadcast DataFrame / plain dict — it is tiny, the fact
table never shuffles for it.
"""

from __future__ import annotations

import math
import re
from dataclasses import dataclass, field

from pyspark.sql import SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType, BooleanType, DoubleType, StringType, StructField, StructType,
)

_RANGE_RE = re.compile(
    r"^\s*([\[\(])\s*(-?(?:\d+\.?\d*|Inf|inf))\s*,\s*(-?(?:\d+\.?\d*|Inf|inf))\s*([\]\)])\s*$"
)


def parse_range(ranges: str) -> tuple[float, float, bool, bool]:
    """Parse an interval string "[0, 100]" / "(0, Inf)" into
    (lo, hi, lo_inclusive, hi_inclusive). Reference: R/utils.R:377-433."""
    m = _RANGE_RE.match(ranges)
    if not m:
        raise ValueError(f"unparseable range: {ranges!r}")
    lo_br, lo_s, hi_s, hi_br = m.groups()
    lo = float(lo_s.replace("Inf", "inf"))
    hi = float(hi_s.replace("Inf", "inf"))
    return lo, hi, lo_br == "[", hi_br == "]"


@dataclass(frozen=True)
class Rule:
    """One row of the rules table (qref analog, reference R/datasets.R:5-25)."""

    check_code: str
    eval_code: str
    description: str
    column: str = "value"
    lo: float = -math.inf
    hi: float = math.inf
    lo_incl: bool = True
    hi_incl: bool = True
    possible_values: tuple[str, ...] = field(default_factory=tuple)
    pattern: str = ""          # regex-conformance checks
    periodicity_lo: float = -math.inf
    periodicity_hi: float = math.inf

    @classmethod
    def from_range_string(cls, check_code, eval_code, description, ranges, **kw):
        lo, hi, li, hi_i = parse_range(ranges)
        return cls(check_code, eval_code, description,
                   lo=lo, hi=hi, lo_incl=li, hi_incl=hi_i, **kw)


RULES_SCHEMA = StructType([
    StructField("check_code", StringType()),
    StructField("eval_code", StringType()),
    StructField("description", StringType()),
    StructField("column", StringType()),
    StructField("lo", DoubleType()),
    StructField("hi", DoubleType()),
    StructField("lo_incl", BooleanType()),
    StructField("hi_incl", BooleanType()),
    StructField("possible_values", ArrayType(StringType())),
    StructField("pattern", StringType()),
    StructField("periodicity_lo", DoubleType()),
    StructField("periodicity_hi", DoubleType()),
])


def rules_df(spark: SparkSession, rules: list[Rule]):
    """Materialize rules as a broadcast-hinted DataFrame (dimension side of
    every rules join)."""
    rows = [
        (
            r.check_code, r.eval_code, r.description, r.column,
            float(r.lo), float(r.hi), r.lo_incl, r.hi_incl,
            list(r.possible_values), r.pattern,
            float(r.periodicity_lo), float(r.periodicity_hi),
        )
        for r in rules
    ]
    return F.broadcast(spark.createDataFrame(rows, RULES_SCHEMA))


# ---------------------------------------------------------------------------
# Default web-text rule battery (Gopher/C4-style heuristics recast from the
# reference's evaluate_range battery, R/evaluate_ranges.R).
# ---------------------------------------------------------------------------

ALLOWED_LANGS = ("en", "de", "fr", "es")

WEB_RULES: list[Rule] = [
    Rule.from_range_string(
        "doc_length", "VE_VC_03",
        "document length (chars) outside allowed interval",
        "[100, 100000]", column="n_chars"),
    Rule.from_range_string(
        "word_count", "VE_VC_03",
        "token count outside allowed interval",
        "[10, 50000]", column="n_tokens"),
    Rule.from_range_string(
        "mean_word_length", "VE_VC_03",
        "mean word length outside [2, 12] (Gopher)",
        "[2, 12]", column="mean_word_len"),
    Rule.from_range_string(
        "symbol_ratio", "VE_VC_03",
        "symbol-to-character ratio above 0.20",
        "[0, 0.2]", column="symbol_ratio"),
    Rule.from_range_string(
        "stopword_ratio", "VE_VC_03",
        "stopword density below 0.02",
        "[0.02, 1]", column="stopword_ratio"),
    Rule.from_range_string(
        "dup_ngram_frac", "VE_UP_02",
        "fraction of duplicated 3-grams above 0.30",
        "[0, 0.3]", column="dup_ngram_frac"),
    Rule(
        "lang_allowed", "VE_VC_04",
        "language not in allowed set",
        column="lang", possible_values=ALLOWED_LANGS),
    Rule(
        "langid_agree", "VA_AP_02",
        "model language id disagrees with declared lang",
        column="lang_pred"),
    Rule.from_range_string(
        "perplexity", "VA_AP_03",
        "LM perplexity above threshold (low-quality text)",
        "[0, 1500]", column="perplexity"),
]
