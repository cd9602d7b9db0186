"""Dataset-curation operators for training pipelines: deterministic
splits, stratified samples, and greedy sequence packing.

All three are built on engine-replayable determinism (md5 hex, window
rank over a total order) so a DuckDB oracle can value-check them — the
same replayability contract as the MinHash signature oracle
(queries_episodes.py). None of them shuffle more than once, and the
split assignment shuffles ZERO times (pure projection).

Reference analog: none (inspectEHR consumes data, it doesn't curate
training sets); part of the beyond-reference training-data operator set
(SURVEY §8)."""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def assign_split(
    df: DataFrame,
    id_col: str = "doc_id",
    weights: dict[str, float] | None = None,
    salt: str = "split",
    out_col: str = "split",
) -> DataFrame:
    """Deterministic train/val/test assignment — a pure PROJECTION, no
    shuffle, stable across engines, runs and partitionings: bucket =
    first two hex chars of md5('<salt>|<id>') (256 uniform buckets),
    split = the interval the bucket falls in. Weights quantize to
    1/256 granularity (documented in the output contract); an id keeps
    its split under any re-partitioning or incremental re-run — the
    property that matters when 10^12 docs are split incrementally."""
    weights = weights or {"train": 0.8, "val": 0.1, "test": 0.1}
    if abs(sum(weights.values()) - 1.0) > 1e-9:
        raise ValueError(f"weights must sum to 1, got {weights}")
    bucket = F.substring(
        F.md5(F.concat(F.lit(f"{salt}|"), F.col(id_col).cast("string"))), 1, 2
    )
    expr = None
    cum = 0.0
    names = list(weights)
    for name in names[:-1]:
        cum += weights[name]
        # +1e-6 absorbs float accumulation (0.9 + 0.1 = 0.999...9 must be
        # edge 256, not 255 — a zero-weight FINAL split would otherwise
        # steal bucket 0xff from the last real split); the epsilon is far
        # below the 1/256 bucket granularity, so real edges are unmoved.
        edge_int = int(cum * 256 + 1e-6)
        # A non-final split of cumulative weight 1.0 yields edge 256, which
        # formats as the 3-char '100' — lexicographically BELOW most 2-char
        # buckets, misrouting ~15/16 of rows. Every bucket is below it, so
        # the condition is simply TRUE.
        cond = (
            F.lit(True)
            if edge_int >= 256
            else bucket < F.lit(format(edge_int, "02x"))
        )
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    expr = (
        F.lit(names[-1]) if expr is None else expr.otherwise(names[-1])
    )
    return df.withColumn(out_col, expr)


def stratified_sample(
    df: DataFrame,
    group_col: str,
    k: int,
    id_col: str = "doc_id",
    out_col: str = "sample_rank",
) -> DataFrame:
    """Exactly k rows per group, chosen by a deterministic pseudo-random
    total order (md5 of the id — uniform, engine-replayable, independent
    of physical row order). ONE shuffle, keyed by the group. For
    approximate sampling at extreme scale prefer df.sampleBy (no window);
    this is the exact-k variant whose output is reproducible enough to
    value-check."""
    w = Window.partitionBy(group_col).orderBy(
        F.md5(F.col(id_col).cast("string")), id_col
    )
    return (
        df.withColumn(out_col, F.row_number().over(w))
        .filter(F.col(out_col) <= k)
    )


def pack_sequences(
    df: DataFrame,
    token_col: str,
    group_col: str,
    order_col: str,
    target_tokens: int,
    bin_col: str = "bin_id",
) -> DataFrame:
    """Contiguous greedy sequence packing (the training-prep step that
    turns documents into ~fixed-token-budget bins): within each group,
    docs are taken in `order_col` order and doc d lands in bin
    floor(tokens_before_d / target). ONE shuffle (the group window);
    bins are contiguous ranges of the order, so a bin's docs co-locate
    for the downstream concat. A doc longer than `target_tokens` gets a
    bin of its own (the standard overflow rule of contiguous packing —
    no doc is split).

    CONTRACT: `order_col` must be a TOTAL order within each group (a
    unique id). With ties, the window's cumulative sum order — and
    therefore the bin assignment of tied rows — is engine- and
    run-dependent."""
    w = (
        Window.partitionBy(group_col)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    before = F.sum(F.col(token_col)).over(w) - F.col(token_col)
    return df.withColumn(
        bin_col, F.floor(before / target_tokens).cast("long")
    )


def temperature_sample(
    df: DataFrame,
    group_col: str,
    target_total: int,
    alpha: float = 0.7,
    id_col: str = "doc_id",
    salt: str = "temp",
    rate_col: str = "keep_rate",
    out_col: str = "keep",
) -> DataFrame:
    """Temperature-rebalanced sampling across groups — the multilingual
    rebalancing step of LLM corpus prep (Conneau & Lample 2019 §3.1;
    T5/mC4, Raffel et al. 2020: sample group g with probability
    proportional to n_g^alpha, alpha<1 UP-weighting tail languages).
    Given per-group counts n_g, the expected kept total is
    `target_total`, apportioned w_g = n_g^alpha / sum(n^alpha); each
    row keeps independently and DETERMINISTICALLY with
    rate_g = min(1, target_total * w_g / n_g) via the md5-uniform trick:
    keep iff the first 8 hex chars of md5('<salt>|<id>') — a uniform
    32-bit value — fall below floor(rate_g * 16^8), compared as
    fixed-width hex STRINGS (lexicographic == numeric), the same
    engine-replayable contract as `assign_split`.

    Rates round to 6dp before quantization so the two engines' pow/sum
    ulp differences collapse before any comparison (the cosine-rounding
    contract of ann.py). Rate granularity is 1/2^32 — exact for any
    realistic rate.

    Plan shape: ONE small partial agg for the counts (groups ≪ corpus:
    languages, sources), a scalar cross of the normalizer onto that
    GROUP table (not the corpus), and a BROADCAST join of the per-group
    rate back onto the corpus — the corpus itself is never shuffled, so
    the op is scan-speed at 10^12 docs. A kept-row count per group is
    one extra partial agg if the run logs realized vs expected rates.

    Reference analog: none (inspectEHR consumes a fixed cohort);
    beyond-reference training-data curation set, SURVEY §8."""
    n = df.groupBy(group_col).agg(F.count(F.lit(1)).alias("group_n"))
    z = n.agg(
        F.sum(F.pow(F.col("group_n").cast("double"), F.lit(alpha))).alias("_z")
    )
    rates = (
        n.crossJoin(F.broadcast(z))
        .withColumn(
            "_w",
            F.pow(F.col("group_n").cast("double"), F.lit(alpha)) / F.col("_z"),
        )
        .withColumn(
            rate_col,
            F.round(
                F.least(
                    F.lit(1.0),
                    F.lit(float(target_total)) * F.col("_w") / F.col("group_n"),
                ),
                6,
            ),
        )
        .select(group_col, "group_n", rate_col)
    )
    u = F.substring(
        F.md5(F.concat(F.lit(f"{salt}|"), F.col(id_col).cast("string"))), 1, 8
    )
    # rate < 1 ⇒ floor(rate·16^8) ≤ 0xffffffff ⇒ ≤ 8 hex chars (lpad pads,
    # never truncates); rate == 1 would hex to 9 chars, so it short-circuits
    # to TRUE instead of entering the string compare.
    thr = F.lpad(
        F.lower(
            F.hex(F.floor(F.col(rate_col) * F.lit(float(16**8))).cast("long"))
        ),
        8,
        "0",
    )
    return df.join(F.broadcast(rates), on=group_col).withColumn(
        out_col, (F.col(rate_col) >= 1.0) | (u < thr)
    )
