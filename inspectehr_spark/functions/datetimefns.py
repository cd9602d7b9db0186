"""Date/time scalar expressions (SURVEY §2.7).

All reference scalar helpers re-expressed as native Column expressions:
merge_datetime (R/utils.R:460-462), resolve_date_time (NULL-safe pairing,
R/characterise_episodes.R:460-482), round_any / inv_logit
(R/utils.R:259-268), jitter_dates (R/utils.R:440-444).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(x) -> Column:
    return F.col(x) if isinstance(x, str) else x


def merge_datetime(date_col, time_col) -> Column:
    """date + 'HH:mm:ss' string → timestamp."""
    return F.to_timestamp(F.concat_ws(" ", _c(date_col).cast("string"), _c(time_col)))


def resolve_date_time(date_col, time_col) -> Column:
    """NULL-safe pairing: only merge when BOTH parts are present."""
    d, t = _c(date_col), _c(time_col)
    return F.when(d.isNotNull() & t.isNotNull(), merge_datetime(d, t))


def seconds_of_day(ts_col) -> Column:
    """Seconds since midnight (int). The repo's time-of-day convention
    (SURVEY §1.3): R's hms type has no Spark analog, so `time_1d` values
    travel as seconds-of-day ints — range rules (evaluate_range.time_1d,
    reference R/evaluate_ranges.R:315-334) and time-of-day distribution
    checks (R/evaluate_distribution.R:163-221) operate on this column."""
    c = _c(ts_col)
    return (
        F.hour(c) * 3600 + F.minute(c) * 60 + F.second(c)
    ).cast("int")


def week_of_month(ts_col) -> Column:
    """ceil(dayofmonth/7) — the reference's week-of-month stratum
    (R/characterise_episodes.R:303-308)."""
    return F.ceil(F.dayofmonth(_c(ts_col)) / 7).cast("int")


def difftime_hours(a, b) -> Column:
    """Exact (microsecond) hour difference a - b."""
    return (
        F.unix_micros(_c(a).cast("timestamp")) - F.unix_micros(_c(b).cast("timestamp"))
    ) / 3.6e9


def round_any(x, accuracy: float) -> Column:
    """Round to an arbitrary multiple (plyr::round_any analog)."""
    return F.round(_c(x) / accuracy) * accuracy


def inv_logit(x) -> Column:
    return 1.0 / (1.0 + F.exp(-_c(x)))


def jitter_dates(date_col, sd_days: float = 5.0, seed: int | None = None) -> Column:
    """±N(0, sd) day jitter (presentation-only de-identification helper).
    Seeded randn for reproducibility across retries."""
    rnd = F.randn(seed) if seed is not None else F.randn()
    return F.date_add(_c(date_col), (rnd * sd_days).cast("int"))
