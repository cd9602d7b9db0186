"""PII/toxicity scrub: ordered regexp_replace chain, JVM-native.

The chain is spec.SCRUB_CHAIN applied strictly in order — one nested
regexp_replace expression, fully inside whole-stage codegen (no UDF). The
patterns are ASCII-safe so Java regex (this path) and Python re (the serial
labeler) produce byte-identical output; tests/test_pipeline.py asserts
byte equality across the whole fixture corpus.

Reference analog: the postcode/NHS conformance+scrub generators,
/root/reference/R/verify_codes.R:20-54,127-139,156-201.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from inspectehr_spark.pipeline import spec


def scrub_text(
    col: Column | str,
    chain: tuple[tuple[str, str], ...] | None = None,
) -> Column:
    """Apply the ordered scrub chain (default spec.SCRUB_CHAIN; pass
    spec.build_scrub_chain(tox_terms=...) to inject a custom moderation
    list — run_pipeline's --tox-terms threads a file through here)."""
    out = F.col(col) if isinstance(col, str) else col
    for pattern, repl in (spec.SCRUB_CHAIN if chain is None else chain):
        out = F.regexp_replace(out, pattern, repl)
    return out
