"""inspectehr_spark — a PySpark-native data-quality / quality-filter engine.

A from-scratch re-instantiation of the capabilities of
alan-turing-institute/inspectEHR (an R data-quality evaluation engine over
clinical event tables) as an idiomatic PySpark pipeline: a battery of
row-level and aggregate-level checks producing a standardized failure log,
keep/drop decisions via anti-join, per-partition metrics, and a web-scale
langid + quality-filter + scrub pipeline over Common-Crawl-style pages.

Nothing here is ported code: the reference (R, dplyr) tells us WHAT each
check computes; every implementation is declarative DataFrame/SQL so that
Catalyst + Tungsten choose the physical plan.
"""

__version__ = "0.1.0"

from inspectehr_spark.session import get_spark  # noqa: F401
