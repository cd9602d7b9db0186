"""Deterministic synthetic pages corpus with planted failures.

Mirrors the reference's seeded fixture strategy
(/root/reference/data-raw/write_internal_data.R: set.seed(1001) at :6,
planted chronology violations :75-79, HR ~ N(0,100) range failures :139,
exactly-counted duplicates tests/testthat/test_evaluate_duplicate.R:29-36):
every error class is planted with an exact, seed-fixed count so tests can
assert exact failure sets.

Schema = BASELINE.json input_hint:
  pages(url string, warc_ts timestamp, html binary, text string, lang string)
"""

from __future__ import annotations

import datetime as dt
import random
from dataclasses import dataclass, field

# Per-language word pools: stopwords + filler vocabulary. Text is built
# from these so the langid stages have real signal.
WORDS = {
    "en": ["the", "a", "of", "and", "to", "in", "is", "that", "it", "for",
           "house", "water", "light", "market", "garden", "street", "number",
           "people", "world", "about", "report", "value"],
    "de": ["der", "die", "das", "und", "ist", "von", "mit", "den", "ein",
           "eine", "haus", "wasser", "licht", "markt", "garten", "bericht",
           "welt", "leute", "nummer", "wert", "über", "nicht"],
    "fr": ["le", "la", "les", "de", "et", "un", "une", "est", "dans", "que",
           "maison", "eau", "marché", "jardin", "rue", "monde", "gens",
           "rapport", "valeur", "nombre", "pour", "pas"],
    "es": ["el", "la", "los", "las", "de", "y", "un", "una", "es", "en",
           "casa", "agua", "luz", "mercado", "calle", "mundo", "gente",
           "informe", "valor", "número", "para", "no"],
}
PLANT_LANGS = ["it", "nl"]  # declared langs outside the allowed set
WORDS_EXTRA = {
    "it": ["il", "la", "di", "e", "che", "casa", "acqua", "mondo", "gente",
           "numero", "per", "non", "valore", "mercato"],
    "nl": ["de", "het", "een", "van", "en", "is", "huis", "water", "wereld",
           "mensen", "nummer", "waarde", "markt", "straat"],
}

N_SOURCES = 8
EPOCH = dt.datetime(2025, 3, 1, 0, 0, 0)


@dataclass
class PlantedCounts:
    """Exact planted-error bookkeeping (what tests assert against)."""

    too_short: list[str] = field(default_factory=list)
    too_long: list[str] = field(default_factory=list)
    bad_lang: list[str] = field(default_factory=list)
    pii: list[str] = field(default_factory=list)
    toxic: list[str] = field(default_factory=list)
    high_symbol: list[str] = field(default_factory=list)
    repeated_ngram: list[str] = field(default_factory=list)
    exact_dup: list[str] = field(default_factory=list)
    future_ts: list[str] = field(default_factory=list)
    giant: list[str] = field(default_factory=list)


def _text(rng: random.Random, lang: str, n_words: int) -> str:
    pool = WORDS.get(lang) or WORDS_EXTRA[lang]
    return " ".join(rng.choice(pool) for _ in range(n_words))


def _html(text: str, title: str) -> bytes:
    # Deterministic page shell; extraction must recover `text` byte-exactly.
    body = text.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
    return (
        f"<html><head><title>{title}</title>"
        f'<meta charset="utf-8"/></head>'
        f"<body><nav>menu home about</nav><p>{body}</p>"
        f"<footer>generated fixture</footer></body></html>"
    ).encode("utf-8")


def generate_pages(
    n: int = 2000, seed: int = 42
) -> tuple[list[tuple], PlantedCounts]:
    """Return (rows, planted) where rows are
    (url, warc_ts, html, text, lang) tuples, deterministic in (n, seed).

    ~8% of docs carry exactly one planted defect; the rest are clean
    in-distribution pages. A handful of multi-MB docs are planted for the
    skew/salting path, and source 'src7' contributes nothing on the last
    calendar day (missing-partition fixture).
    """
    rng = random.Random(seed)
    planted = PlantedCounts()
    rows: list[tuple] = []
    langs = list(WORDS)

    pii_bits = [
        "contact me at john.doe@example.com for details",
        "call 01632 960 983 now",
        "postcode SW1A 1AA near the palace",
        "nhs number 9434765919 on record",
        "email admin@test.org or phone 01632 960123",
    ]

    last_clean_text: str | None = None
    last_clean_url: str | None = None
    for i in range(n):
        url = f"https://src{i % N_SOURCES}.example/page/{i}"
        lang = langs[i % len(langs)]
        day = (i * 7) % 28
        # src7 never posts on day 27 → planted missing partition
        if i % N_SOURCES == 7 and day == 27:
            day = 26
        ts = EPOCH + dt.timedelta(days=day, seconds=(i * 977) % 86400)
        kind = i % 25
        n_words = 80 + (i * 13) % 200

        if kind == 0 and i > 0:
            text = _text(rng, lang, 4)  # ~20 chars, below min length
            planted.too_short.append(url)
        elif kind == 1:
            text = _text(rng, lang, 5000)
            planted.too_long.append(url)
        elif kind == 2:
            lang = PLANT_LANGS[i % len(PLANT_LANGS)]
            text = _text(rng, lang, n_words)
            planted.bad_lang.append(url)
        elif kind == 3:
            base = _text(rng, lang, n_words)
            text = base + " " + pii_bits[i % len(pii_bits)]
            planted.pii.append(url)
        elif kind == 4:
            base = _text(rng, lang, n_words // 2)
            text = base + " " + " ".join("#$%@!*" for _ in range(n_words // 2))
            planted.high_symbol.append(url)
        elif kind == 5:
            phrase = _text(rng, lang, 3)
            text = " ".join(phrase for _ in range(max(10, n_words // 3)))
            planted.repeated_ngram.append(url)
        elif kind == 6 and last_clean_text is not None:
            # exact duplicate of an earlier CLEAN doc, new url. Keep-first
            # is by url string order, so the LOSER of the pair (max url)
            # is the planted expected-drop.
            text = last_clean_text
            planted.exact_dup.append(max(url, last_clean_url))
            last_clean_text = None  # never duplicate the same doc twice
        elif kind == 7:
            ts = dt.datetime(2031, 1, 1) + dt.timedelta(days=i % 30)
            text = _text(rng, lang, n_words)
            planted.future_ts.append(url)
        elif kind == 8 and i % 200 == 8:
            text = _text(rng, lang, 30000)  # ~175 kB doc → skew bucket
            planted.giant.append(url)
        elif kind == 9:
            base = _text(rng, lang, n_words)
            tox_bits = [
                "that crudword remark",
                "such a VulgWord here",
                "total SLURX content",
            ]
            text = base + " " + tox_bits[i % len(tox_bits)]
            planted.toxic.append(url)
        else:
            text = _text(rng, lang, n_words)
            last_clean_text = text
            last_clean_url = url

        rows.append((url, ts, _html(text, f"page {i}"), text, lang))
    return rows, planted


def write_pages_parquet(
    path: str, n: int = 2000, seed: int = 42, n_files: int = 16
) -> PlantedCounts:
    """Write the fixture corpus with pyarrow (no Spark needed — usable from
    plain pytest before a session exists).

    Written as a DIRECTORY of `n_files` shards (like real crawl dumps —
    one WARC per file): a single parquet file is one row group, i.e. ONE
    scan task, which serializes the read side of every downstream job no
    matter how many cores run it."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    rows, planted = generate_pages(n, seed)
    os.makedirs(path, exist_ok=True)
    n_files = max(1, min(n_files, len(rows)))
    for k in range(n_files):
        chunk = rows[k::n_files]
        cols = list(zip(*chunk))
        table = pa.table(
            {
                "url": pa.array(cols[0], pa.string()),
                "warc_ts": pa.array(cols[1], pa.timestamp("us")),
                "html": pa.array(cols[2], pa.binary()),
                "text": pa.array(cols[3], pa.string()),
                "lang": pa.array(cols[4], pa.string()),
            }
        )
        pq.write_table(table, os.path.join(path, f"part-{k:05d}.parquet"))
    return planted
