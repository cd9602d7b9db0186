"""Structured-code validators, re-expressed as pure SQL expressions.

The reference validates these with per-entry R loops (validate_nhs,
R/verify_codes.R:20-54; verify_icnarc :228-253; verify_post_code :127-139).
Per-row loops are exactly what the scale contract forbids — each validator
here is a single Column expression (codegen'd, no Python), usable directly
as a scrub predicate or conformance check. Generators for planted test
fixtures live beside them (analog of generate_nhs :73-106).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# UK postcode, full form (public spec; reference regex R/verify_codes.R:127-139)
UK_POSTCODE_RE = (
    r"^([Gg][Ii][Rr] 0[Aa]{2})|((([A-Za-z][0-9]{1,2})|(([A-Za-z][A-Ha-hJ-Yj-y]"
    r"[0-9]{1,2})|(([A-Za-z][0-9][A-Za-z])|([A-Za-z][A-Ha-hJ-Yj-y][0-9][A-Za-z]?))))"
    r"\s?[0-9][A-Za-z]{2})$"
)

EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_RE = r"\b(?:\+?44\s?\d{4}|\(?0\d{4}\)?)\s?\d{3}\s?\d{3}\b"


def is_postcode(col: Column) -> Column:
    return col.rlike(UK_POSTCODE_RE)


def nhs_checksum_valid(col: Column) -> Column:
    """Mod-11 checksum for 10-digit NHS-style identifiers, as one SQL
    expression — no per-row Python.

    Algorithm (public NHS spec; reference loop R/verify_codes.R:36-49):
    weighted sum of digits 1..9 with weights 11-i, remainder r = sum % 11,
    check digit c = 11 - r (11→0, 10→invalid); valid iff c == digit 10.
    """
    digits = F.transform(
        F.sequence(F.lit(1), F.lit(9)),
        lambda i: F.substring(col, 1, 10).substr(i, F.lit(1)).cast("int") * (11 - i),
    )
    total = F.aggregate(digits, F.lit(0), lambda acc, x: acc + x)
    rem = total % 11
    check = (11 - rem) % 11
    last = F.substring(col, 10, 1).cast("int")
    return (
        col.rlike(r"^\d{10}$")
        & (F.lit(11) - rem != 10)
        & (check == last)
    )


def icnarc_valid(col: Column) -> Column:
    """ICNARC diagnostic code: 3-5 dot/slash/hyphen-separated integer levels
    with per-level ranges 1-2 / 1-12 / 1-13 / 1-54 / 1-17
    (reference R/verify_codes.R:228-253). split + element-wise range checks.
    """
    parts = F.split(col, r"[./-]")
    n = F.size(parts)
    ranges = [(1, 2), (1, 12), (1, 13), (1, 54), (1, 17)]

    def level_ok(i: int) -> Column:
        v = F.element_at(parts, i + 1).cast("int")
        lo, hi = ranges[i]
        present = n > i
        return F.when(present, v.isNotNull() & v.between(lo, hi)).otherwise(F.lit(True))

    ok = (n >= 3) & (n <= 5)
    for i in range(5):
        ok = ok & level_ok(i)
    return ok


# ---------------------------------------------------------------------------
# Deterministic generators for fixtures (analog of generate_nhs,
# R/verify_codes.R:73-106): plain Python, driver-side only.
# ---------------------------------------------------------------------------

def gen_nhs_number(seed_digits: str) -> str:
    """Complete a 9-digit prefix into a valid mod-11 NHS-style number, or
    raise if the prefix yields check digit 10 (invalid by spec)."""
    assert len(seed_digits) == 9 and seed_digits.isdigit()
    total = sum(int(d) * (11 - i) for i, d in enumerate(seed_digits, start=1))
    check = 11 - (total % 11)
    if check == 11:
        check = 0
    if check == 10:
        raise ValueError("prefix yields invalid check digit 10")
    return seed_digits + str(check)


def gen_valid_nhs_numbers(n: int, start: int = 100000000) -> list[str]:
    out: list[str] = []
    x = start
    while len(out) < n:
        try:
            out.append(gen_nhs_number(str(x).zfill(9)))
        except ValueError:
            pass
        x += 1
    return out
