"""EAV extraction operators — the reference's core working-table builders.

make_core:      episodes ⟕ provenance ⨝ events (lazy 3-way join,
                reference R/utils.R:179-193)
make_reference: episodes ⟕ provenance → 4-col dim table
                (R/utils.R:112-154) — kept distributed + broadcast-hinted
                instead of collected
extract:        filter core to one concept, rename its primary typed value
                column to `value`, carry datetime/meta columns for 2d
                classes (R/extract_data.R:32-77,95-137,156-189)

The concept dictionary (`variables` / qref analog) is a plain Python dict
{code_name: (primary_column, class, meta_columns)} broadcast in the
closure — dimension metadata never shuffles the fact table.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Concept:
    """One dictionary row (reference variables.csv / qref)."""

    code_name: str
    primary_column: str          # which typed EAV column holds the value
    data_class: str              # e.g. real_2d, string_1d, datetime_1d
    meta_columns: tuple[str, ...] = field(default_factory=tuple)

    @property
    def is_2d(self) -> bool:
        return self.data_class.endswith("_2d")


def make_core(
    events: DataFrame, episodes: DataFrame, provenance: DataFrame
) -> DataFrame:
    """episodes ⟕ provenance (tiny dim → broadcast) ⨝ events on episode_id.
    Stays lazy; Catalyst pushes any later code_name filter down to the
    events scan through the join."""
    epi = episodes.join(
        F.broadcast(provenance),
        episodes["provenance"] == provenance["file_id"],
        "left",
    )
    return epi.join(events, "episode_id", "inner")


def lookup_concepts(
    concepts: list[Concept],
    code_name: str | None = None,
    name_pattern: str | None = None,
) -> list[Concept]:
    """Driver-side concept-dictionary lookup (reference lookup_hic,
    R/utils.R:228-250 — filter by exact code or name regex). Dimension
    metadata only; never touches the data plane."""
    import re

    out = concepts
    if code_name is not None:
        out = [c for c in out if c.code_name == code_name]
    if name_pattern is not None:
        rx = re.compile(name_pattern)
        out = [c for c in out if rx.search(c.code_name)]
    return out


def translate_sites(
    df: DataFrame,
    lookup: DataFrame,
    site_col: str = "site",
    from_col: str = "site",
    to_col: str = "translated",
) -> DataFrame:
    """1:1 site-label rename via a lookup table, untranslated labels pass
    through (reference site translation, R/extract_data.R:49-71 +
    R/utils.R:125-147 — a lookup join with coalesce fallback).

    The lookup is dimension-sized → broadcast; the fact side never
    shuffles."""
    lk = F.broadcast(
        lookup.select(
            F.col(from_col).alias("_site_from"), F.col(to_col).alias("_site_to")
        )
    )
    return (
        df.join(lk, df[site_col] == lk["_site_from"], "left")
        .withColumn(site_col, F.coalesce("_site_to", site_col))
        .drop("_site_from", "_site_to")
    )


def make_reference(episodes: DataFrame, provenance: DataFrame) -> DataFrame:
    """(episode_id, nhs_number, start_date, site) dim table — broadcast
    hint instead of the reference's collect()."""
    return F.broadcast(
        episodes.join(
            F.broadcast(provenance),
            episodes["provenance"] == provenance["file_id"],
            "left",
        ).select("episode_id", "nhs_number", "start_date", "site")
    )


def extract(core: DataFrame, concept: Concept) -> DataFrame:
    """One concept's events with its typed column as `value`.

    1d → (site, episode_id, event_id, value)
    2d → + datetime + meta_* columns
    The code_name equality filter sits directly over the scan →
    partition/row-group pruning on a code_name-partitioned table.
    """
    out = core.filter(F.col("code_name") == concept.code_name)
    cols = [
        F.col("site"),
        F.col("episode_id"),
        F.col("event_id"),
        F.col(concept.primary_column).alias("value"),
    ]
    if concept.is_2d:
        cols.append(F.col("datetime"))
        for i, m in enumerate(concept.meta_columns, start=1):
            cols.append(F.col(m).alias(f"meta_{i}"))
    return out.select(*cols)


def extract_demographics(
    core: DataFrame, concepts: list[Concept]
) -> DataFrame:
    """Wide pivot: one row per episode, one column per 1d concept
    (reference wranglEHR::extract_demographics used at
    R/characterise_episodes.R:231-235). Single groupBy().pivot() pass over
    a pre-filtered core — not one scan per concept."""
    names = [c.code_name for c in concepts]
    by_code = {c.code_name: c for c in concepts}
    value = F.coalesce(
        *[
            F.when(
                F.col("code_name") == n,
                F.col(by_code[n].primary_column).cast("string"),
            )
            for n in names
        ]
    )
    return (
        core.filter(F.col("code_name").isin(names))
        .select("episode_id", "code_name", value.alias("_v"))
        .groupBy("episode_id")
        .pivot("code_name", names)
        .agg(F.first("_v", ignorenulls=True))
    )


def combine(a: DataFrame, b: DataFrame) -> DataFrame:
    """Union two extracts; when value types differ, degrade both to
    missingness booleans first (reference combine, R/extract_data.R:207-215)."""
    ta = dict(a.dtypes)["value"]
    tb = dict(b.dtypes)["value"]
    if ta != tb:
        a = a.withColumn("value", F.col("value").isNotNull())
        b = b.withColumn("value", F.col("value").isNotNull())
    common = [c for c in a.columns if c in set(b.columns)]
    return a.select(*common).unionByName(b.select(*common))
