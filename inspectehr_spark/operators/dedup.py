"""Corpus-level deduplication: exact, MinHash+LSH, SimHash, n-gram Jaccard.

The reference only has coincident-key duplicate flagging
(R/evaluate_duplication.R); web-scale training-data pipelines need near-dup
too. Everything here is expression-level (hash/xxhash64/transform over
arrays) — no Python in the hot path. The LSH band join is an equi-join on
(band_id, band_hash), which Spark shuffles by the band key: candidate pairs
only, never the O(n²) cross product.

IMPORTANT evaluation-cost rule observed throughout: any expression used
inside a higher-order-function lambda is first MATERIALIZED as a column
(staged select/withColumn). Catalyst inlines non-attribute expressions into
lambda bodies, re-evaluating them per array element — quadratic on big
documents. Staging makes them once-per-row bound references.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def exact_duplicates(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """All but the first doc per identical text (keep-first by lowest id —
    explicit stable ordering).

    The window keys on a PAIR of 64-bit hashes so the shuffle carries 16
    bytes of key instead of the full document text (the text still rides in
    the row payload, but never in the partitioning/sort key; VERDICT r1 #3).
    The second hash puts the salt FIRST — xxhash64(1, text) — because
    Spark's multi-arg xxhash64 chains left-to-right using the running hash
    as the next seed: xxhash64(text, 1) is a pure function of
    xxhash64(text), so salting on the RIGHT adds zero independent bits and
    any 64-bit collision on the text would collide the whole key (~27k
    expected colliding pairs at 10^12 docs). With the salt first, the text
    is hashed under a different effective seed, giving a genuinely
    independent second 64 bits; the composite birthday bound at 10^12 docs
    is ~1e-15, so within-group full-text equality verification (a full-text
    sort) buys no measurable gain."""
    key = F.col(text_col)
    w = Window.partitionBy(F.xxhash64(key), F.xxhash64(F.lit(1), key)).orderBy(
        F.col(id_col).asc()
    )
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") > 1)
        .drop("_rn")
    )


def with_shingles(
    df: DataFrame,
    text_col: str = "text",
    out_col: str = "shingles",
    n: int = 3,
) -> DataFrame:
    """Add an array<long> column of word n-gram shingle hashes.

    Two staged projections: tokens materialize first, then the sliding
    window references them as a bound attribute (see module docstring)."""
    from inspectehr_spark.functions.textfns import word_ngrams

    staged = df.withColumn("_toks", F.split(F.col(text_col), r"\s+"))
    grams = word_ngrams(F.col("_toks"), n)
    staged = staged.withColumn("_grams", grams)
    sh = F.transform(F.col("_grams"), lambda g: F.xxhash64(g))
    return staged.withColumn(out_col, sh).drop("_toks", "_grams")


def with_minhash_signature(
    df: DataFrame,
    shingle_col: str = "shingles",
    out_col: str = "sig",
    num_hashes: int = 64,
) -> DataFrame:
    """Add an array<long> MinHash signature: h_i(x) = xxhash64(x, seed=i),
    signature[i] = min over shingles. array_min(transform(...)) per hash,
    over a materialized shingle column — JVM-side only."""
    sh = F.col(shingle_col)

    def perm_min(i: int):
        return F.array_min(F.transform(sh, lambda s: F.xxhash64(s, F.lit(i))))

    return df.withColumn(
        out_col, F.array(*[perm_min(i) for i in range(num_hashes)])
    )


def minhash_lsh_duplicates(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 64,
    bands: int = 16,
    ngram: int = 3,
    jaccard_threshold: float = 0.8,
    bucket_cap: int = 64,
) -> DataFrame:
    """Near-duplicate pairs via MinHash + banded LSH.

    shingle → signature → `bands` band hashes → candidate pairs share
    (band_id, band_hash) → verify estimated Jaccard (signature agreement
    fraction) ≥ threshold. Returns (doc_id_a, doc_id_b, est_jaccard), a < b.

    Scale: the only shuffles are the band-key self-join and the final
    dedup; both keyed equi-ops. Hot buckets (boilerplate) are capped at
    `bucket_cap` docs via row_number — the cap is logged at the metrics
    layer in a real run, never silent-dropped without trace.
    """
    rows_per_band = num_hashes // bands
    from inspectehr_spark.tables import parallel_scan

    # NOTE r7: the md5 twin's PERSIST was also tried here and measured ~2x
    # SLOWER at sf0.1 (the xxhash64 sketch is cheap enough that the cache
    # build costs more than the double-compute it avoids) — only the scan
    # parallelization is kept (at staged sf1 the single-core sketch was
    # the dominant cost: 12.7 s of the query's 12.7 s).
    sigs = with_minhash_signature(
        with_shingles(
            parallel_scan(df.select(F.col(id_col).alias("doc_id"), text_col)),
            text_col=text_col, n=ngram,
        ),
        num_hashes=num_hashes,
    ).select("doc_id", "sig")

    banded = sigs.select(
        "doc_id",
        "sig",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band_id"),
                        F.xxhash64(
                            F.slice(F.col("sig"), b * rows_per_band + 1, rows_per_band)
                        ).alias("band_hash"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("band"),
    ).select("doc_id", "sig", "band.band_id", "band.band_hash")

    wb = Window.partitionBy("band_id", "band_hash").orderBy("doc_id")
    banded = banded.withColumn("_rn", F.row_number().over(wb)).filter(
        F.col("_rn") <= bucket_cap
    )

    a = banded.alias("a")
    b = banded.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_id_a"),
            F.col("b.doc_id").alias("doc_id_b"),
            F.col("a.sig").alias("sig_a"),
            F.col("b.sig").alias("sig_b"),
        )
        .dropDuplicates(["doc_id_a", "doc_id_b"])
    )
    est = (
        F.size(
            F.filter(
                F.zip_with("sig_a", "sig_b", lambda x, y: x == y),
                lambda eq: eq,
            )
        )
        / F.lit(num_hashes)
    ).alias("est_jaccard")
    return (
        pairs.select("doc_id_a", "doc_id_b", est)
        .filter(F.col("est_jaccard") >= jaccard_threshold)
    )


def with_simhash(
    df: DataFrame,
    text_col: str = "text",
    out_col: str = "simhash",
    bits: int = 64,
) -> DataFrame:
    """Add a 64-bit SimHash over word tokens, pure SQL, in ONE aggregate
    pass: the accumulator is an array<int>(bits) of per-bit ±1 vote tallies
    updated via zip_with, then the bit votes fold into the fingerprint long.

    Round-1 shape evaluated `bits` independent aggregates (O(bits·n_tokens)
    array traversals per row and a 64-term codegen giant — the slowest
    bench query); this traverses the token hashes once (VERDICT r1 #5).
    Fingerprints are bit-identical to the old formulation (majority vote
    ties → bit 0, null/empty token lists → 0)."""
    staged = df.withColumn("_toks", F.split(F.col(text_col), r"\s+")).withColumn(
        "_th", F.transform(F.col("_toks"), lambda t: F.xxhash64(t))
    )
    bit_positions = F.sequence(F.lit(0), F.lit(bits - 1))
    votes = F.aggregate(
        F.col("_th"),
        F.array_repeat(F.lit(0), bits),
        lambda acc, h: F.zip_with(
            acc,
            F.transform(
                bit_positions,
                lambda b: F.when(F.getbit(h, b) == 1, 1).otherwise(-1),
            ),
            lambda a, d: a + d,
        ),
    )
    staged = staged.withColumn("_votes", votes)

    def signed_pow2(b: int) -> int:
        v = 1 << b
        return v - (1 << 64) if v >= (1 << 63) else v

    pow2 = F.array(*[F.lit(signed_pow2(b)).cast("long") for b in range(bits)])
    fp = F.aggregate(
        F.zip_with(
            F.col("_votes"),
            pow2,
            lambda v, p: F.when(v > 0, p).otherwise(F.lit(0).cast("long")),
        ),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    return staged.withColumn(
        out_col, F.coalesce(fp, F.lit(0).cast("long"))
    ).drop("_toks", "_th", "_votes")


def with_simhash_replayable(
    df: DataFrame,
    text_col: str = "text",
    hi_col: str = "fp_hi",
    lo_col: str = "fp_lo",
) -> DataFrame:
    """64-bit SimHash with ENGINE-REPLAYABLE token hashes: the token hash
    is the first 16 hex chars of md5(token), carried as two 32-bit halves
    (`hi_col` bits 63..32, `lo_col` bits 31..0) so every value fits a
    signed BIGINT in any engine — DuckDB replays it verbatim via
    ``('0x'||substring(md5(t),1,8))::BIGINT`` (cross-checked against
    Spark's conv(substring(md5),16,10) on fixtures).

    Same single-pass vote shape as `with_simhash` (one traversal of the
    token hashes, zip_with accumulator — the VERDICT r1 #5 form), same
    tie/empty semantics (vote ties → bit 0, null token lists → 0/0).
    `with_simhash` (xxhash64) stays the scale path: one 64-bit hash per
    token instead of an md5 + two string-slice conversions. This variant
    exists so the simhash REGISTRY queries get full DuckDB value oracles
    (the md5-minhash treatment, queries_episodes.q_minhash_band_signature)."""
    staged = df.withColumn("_toks", F.split(F.col(text_col), r"\s+"))
    staged = staged.withColumn(
        "_md5", F.transform(F.col("_toks"), lambda t: F.md5(t))
    )
    staged = staged.withColumn(
        "_th",
        F.transform(
            F.col("_md5"),
            lambda m: F.struct(
                F.conv(F.substring(m, 1, 8), 16, 10).cast("long").alias("hi"),
                F.conv(F.substring(m, 9, 8), 16, 10).cast("long").alias("lo"),
            ),
        ),
    )
    bit_positions = F.sequence(F.lit(0), F.lit(63))
    votes = F.aggregate(
        F.col("_th"),
        F.array_repeat(F.lit(0), 64),
        lambda acc, h: F.zip_with(
            acc,
            F.transform(
                bit_positions,
                lambda b: F.when(
                    F.when(b < 32, F.getbit(h["lo"], b))
                    .otherwise(F.getbit(h["hi"], b - 32)) == 1,
                    1,
                ).otherwise(-1),
            ),
            lambda a, d: a + d,
        ),
    )
    staged = staged.withColumn("_votes", votes)

    def _fold(offset: int):
        pow2 = F.array(*[F.lit(1 << b).cast("long") for b in range(32)])
        return F.aggregate(
            F.zip_with(
                F.slice(F.col("_votes"), offset + 1, 32),
                pow2,
                lambda v, p: F.when(v > 0, p).otherwise(F.lit(0).cast("long")),
            ),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        )

    return (
        staged.withColumn(lo_col, F.coalesce(_fold(0), F.lit(0).cast("long")))
        .withColumn(hi_col, F.coalesce(_fold(32), F.lit(0).cast("long")))
        .drop("_toks", "_md5", "_th", "_votes")
    )


def simhash_hamming_pairs_replayable(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
    chunks: int = 4,
    bucket_cap: int = 64,
) -> DataFrame:
    """`simhash_hamming_pairs` over the REPLAYABLE (md5 split-half)
    simhash: identical banding/pigeonhole/cap/verify structure, fingerprint
    carried as (hi, lo) 32-bit halves so DuckDB replays every step —
    hamming = bit_count(xor(hi)) + bit_count(xor(lo)). See
    `simhash_hamming_pairs` for the scheme; this backs the value-checked
    registry query."""
    if not 0 < chunks <= 64 or 64 % chunks:
        raise ValueError("chunks must divide 64")
    if max_hamming >= chunks:
        raise ValueError(
            "pigeonhole guarantee needs max_hamming < chunks "
            f"(got {max_hamming} >= {chunks})"
        )
    bandw = 64 // chunks
    if bandw > 32 or 32 % bandw:
        raise ValueError("band width must divide the 32-bit halves")
    mask = (1 << bandw) - 1
    per_half = 32 // bandw
    from inspectehr_spark.tables import parallel_scan

    # r7: parallelize the one-file scan before the per-row vote math, and
    # persist the (two-longs-per-doc) fingerprint table because the banded
    # self-join consumes it on both sides — the broadcast side defeats
    # exchange reuse, so without the persist the sketch computed twice
    sh = with_simhash_replayable(
        parallel_scan(df.select(id_col, text_col)), text_col=text_col
    ).select(F.col(id_col).alias("doc_id"), "fp_hi", "fp_lo").persist()

    def _band(b: int):
        half = F.col("fp_lo") if b < per_half else F.col("fp_hi")
        shift = (b % per_half) * bandw
        return F.struct(
            F.lit(b).alias("band_id"),
            F.shiftrightunsigned(half, shift).bitwiseAND(F.lit(mask)).alias(
                "band_val"
            ),
        )

    banded = sh.select(
        "doc_id",
        "fp_hi",
        "fp_lo",
        F.explode(F.array(*[_band(b) for b in range(chunks)])).alias("band"),
    ).select("doc_id", "fp_hi", "fp_lo", "band.band_id", "band.band_val")

    wb = Window.partitionBy("band_id", "band_val").orderBy("doc_id")
    banded = banded.withColumn("_rn", F.row_number().over(wb)).filter(
        F.col("_rn") <= bucket_cap
    )
    a, b = banded.alias("a"), banded.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_val") == F.col("b.band_val"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_id_a"),
            F.col("b.doc_id").alias("doc_id_b"),
            (
                F.bit_count(F.col("a.fp_hi").bitwiseXOR(F.col("b.fp_hi")))
                + F.bit_count(F.col("a.fp_lo").bitwiseXOR(F.col("b.fp_lo")))
            ).alias("hamming"),
        )
        .dropDuplicates(["doc_id_a", "doc_id_b"])
    )
    return pairs.filter(F.col("hamming") <= max_hamming)


def ngram_jaccard_pairs(
    df: DataFrame,
    candidate_pairs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    ngram: int = 3,
) -> DataFrame:
    """Exact n-gram Jaccard for candidate (doc_id_a, doc_id_b) pairs:
    |A∩B| / |A∪B| over distinct shingle sets via array_intersect/union.
    r7: shingle construction runs over a parallelized scan (a one-file
    input otherwise hashes every gram on a single core; tables.parallel_scan)
    and the shingle table is persisted — both joins consume it, and the
    broadcast side would otherwise recompute the gram pass."""
    from inspectehr_spark.tables import parallel_scan

    sh = with_shingles(
        parallel_scan(df.select(F.col(id_col).alias("doc_id"), text_col)),
        text_col=text_col,
        n=ngram,
    ).select("doc_id", F.array_distinct("shingles").alias("sh")).persist()
    return (
        candidate_pairs
        .join(sh.select(F.col("doc_id").alias("doc_id_a"), F.col("sh").alias("sh_a")), "doc_id_a")
        .join(sh.select(F.col("doc_id").alias("doc_id_b"), F.col("sh").alias("sh_b")), "doc_id_b")
        .select(
            "doc_id_a",
            "doc_id_b",
            # empty ∪ empty (docs under n tokens) defines Jaccard as 0.0 —
            # guarded so 0/0 can't surface as NULL (or error under ANSI)
            F.when(
                F.size(F.array_union("sh_a", "sh_b")) > 0,
                F.size(F.array_intersect("sh_a", "sh_b"))
                / F.size(F.array_union("sh_a", "sh_b")),
            )
            .otherwise(F.lit(0.0))
            .alias("jaccard"),
        )
    )


def with_dup_ngram_fraction(
    df: DataFrame,
    text_col: str = "text",
    out_col: str = "dup_ngram_frac",
    n: int = 3,
) -> DataFrame:
    """Add the within-document duplicated n-gram fraction (Gopher
    repetition rule): 1 - distinct/total over word n-grams."""
    staged = with_shingles(df, text_col=text_col, out_col="_sh", n=n)
    total = F.size(F.col("_sh"))
    frac = F.when(
        total > 0,
        F.round(1.0 - F.size(F.array_distinct(F.col("_sh"))) / total, 6),
    ).otherwise(F.lit(0.0))
    return staged.withColumn(out_col, frac).drop("_sh")


def simhash_hamming_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
    chunks: int = 4,
    bucket_cap: int = 64,
) -> DataFrame:
    """Near-duplicate pairs by SimHash banding: the 64-bit fingerprint
    splits into `chunks` equal bands; by pigeonhole any pair within
    `max_hamming` < `chunks` bit flips agrees on at least one band, so
    candidates = pairs sharing (band_id, band_value) — a keyed equi
    self-join, never the O(n²) cross product (same banding scheme as the
    MinHash LSH join above). Verification is exact:
    bit_count(a XOR b) <= max_hamming, JVM-side.

    Returns (doc_id_a, doc_id_b, hamming), a < b. Hot bands (boilerplate
    fingerprints) are capped at `bucket_cap` docs via row_number, as in
    minhash_lsh_duplicates.
    """
    if not 0 < chunks <= 64 or 64 % chunks:
        raise ValueError("chunks must divide 64")
    if max_hamming >= chunks:
        raise ValueError(
            "pigeonhole guarantee needs max_hamming < chunks "
            f"(got {max_hamming} >= {chunks})"
        )
    bandw = 64 // chunks
    mask = (1 << bandw) - 1
    sh = with_simhash(df.select(id_col, text_col), text_col=text_col).select(
        F.col(id_col).alias("doc_id"), "simhash"
    )
    banded = sh.select(
        "doc_id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band_id"),
                        F.shiftrightunsigned("simhash", b * bandw)
                        .bitwiseAND(F.lit(mask))
                        .alias("band_val"),
                    )
                    for b in range(chunks)
                ]
            )
        ).alias("band"),
    ).select("doc_id", "simhash", "band.band_id", "band.band_val")

    wb = Window.partitionBy("band_id", "band_val").orderBy("doc_id")
    banded = banded.withColumn("_rn", F.row_number().over(wb)).filter(
        F.col("_rn") <= bucket_cap
    )
    a, b = banded.alias("a"), banded.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_val") == F.col("b.band_val"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_id_a"),
            F.col("b.doc_id").alias("doc_id_b"),
            F.bit_count(
                F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))
            ).alias("hamming"),
        )
        .dropDuplicates(["doc_id_a", "doc_id_b"])
    )
    return pairs.filter(F.col("hamming") <= max_hamming)


def contamination_flags(
    corpus: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    ngram: int = 8,
    min_hits: int = 1,
) -> DataFrame:
    """Benchmark DECONTAMINATION (the eval-set n-gram overlap check every
    training pipeline runs before a data release): flag corpus documents
    sharing at least `min_hits` distinct word `ngram`-grams with any
    benchmark document.

    Scale shape: the benchmark gram set is tiny next to the corpus (eval
    suites are MBs against TBs), so it BROADCASTS — the corpus side is a
    scan → explode → broadcast-semi-join → re-aggregate on the doc id,
    and only HIT rows (rare) enter the one aggregation shuffle. No
    corpus self-join, no exchange keyed on text. Grams are xxhash64 of
    the raw n-gram (the with_shingles path): a 64-bit collision flags a
    clean doc with p ≈ n_corpus_grams × n_bench_grams / 2^64 — at 10^12
    × 10^7 grams that is ~5×10^-1 FALSE POSITIVES per corpus, i.e. ~one
    doc over-flagged in the worst case, the safe direction for
    decontamination.

    Returns (id_col, n_hits, contaminated) for EVERY corpus doc."""
    from inspectehr_spark.tables import parallel_scan

    # r7: parallelize both one-file scans before the 8-gram construction
    # (the corpus side is the dominant cost; guide §2.5 input skew)
    bench_grams = (
        with_shingles(
            parallel_scan(benchmark.select(text_col)), text_col=text_col, n=ngram
        )
        .select(F.explode("shingles").alias("g"))
        .distinct()
    )
    corpus_grams = (
        with_shingles(
            parallel_scan(corpus.select(F.col(id_col), text_col)),
            text_col=text_col,
            n=ngram,
        )
        .select(id_col, F.explode(F.array_distinct("shingles")).alias("g"))
    )
    hits = (
        corpus_grams.join(F.broadcast(bench_grams), "g")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_hits"))
    )
    return (
        corpus.select(id_col)
        .join(hits, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_hits", F.lit(0)).cast("long").alias("n_hits"),
            (F.coalesce("n_hits", F.lit(0)) >= min_hits).alias("contaminated"),
        )
    )


def md5_minhash_signature(
    df: DataFrame,
    num_hashes: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    ngram: int = 3,
) -> DataFrame:
    """(id_col, _sig array<string>[num_hashes]) — MinHash signature with
    ENGINE-REPLAYABLE hashes: h_i(gram) = md5(gram || '|i'), element =
    lexicographic min over the doc's word n-grams. Docs with < `ngram`
    tokens have no shingles and are absent (same in the DuckDB replay).
    Requires `id_col` to be unique per document (it keys the aggregation).

    This is the shared construction behind the `minhash_band_signature`
    and `minhash_lsh_pairs` value oracles (the xxhash64 operators above
    stay the scale path — one 64-bit hash per gram beats an md5 +
    hex-slice).

    Shape (r7): same ONE-aggregate-pass accumulator as r5/r6 (num_hashes
    running minima folded via zip_with/least; 'g' sorts after every hex
    digit so it is the identity; the nested-lambda form avoids the
    `lambda g, i=i:` two-parameter HOF capture trap) — but the input scan
    is now PARALLELIZED first (tables.parallel_scan): a small table is one
    file split, so the grams x num_hashes interpreted md5 calls all ran on
    a single core. Alternatives measured at sf0.1/local[32] and rejected:
    a 32-column codegen min() aggregation (explode + flat md5 projections)
    pays ~4 s of agg codegen+exec and a doc-keyed exchange (7.7 s cold vs
    3.5 s here); a fully-exploded (gram, salt) min pays a 48M-row explode
    (34 s). The zero-shuffle projection stays the best shape — it just
    needed the scan width fixed."""
    from inspectehr_spark.functions.textfns import word_ngrams
    from inspectehr_spark.tables import parallel_scan

    staged = parallel_scan(df.select(id_col, text_col)).withColumn(
        "_toks", F.filter(F.split(F.col(text_col), " "), lambda t: t != "")
    )
    staged = staged.withColumn(
        "_grams", word_ngrams(F.col("_toks"), ngram)
    ).filter(F.size("_grams") > 0)

    def _md5s(g):
        return F.transform(
            F.sequence(F.lit(0), F.lit(num_hashes - 1)),
            lambda i: F.md5(F.concat(g, F.lit("|"), i.cast("string"))),
        )

    sig_arr = F.aggregate(
        F.col("_grams"),
        F.array_repeat(F.lit("g"), num_hashes),
        lambda acc, g: F.zip_with(acc, _md5s(g), lambda a, m: F.least(a, m)),
    )
    return staged.withColumn("_sig", sig_arr).select(id_col, "_sig")


def shingle_dup_coverage(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 8,
) -> DataFrame:
    """Per-document duplicate-coverage metric (the RefinedWeb §5 "exact
    substring" coverage shape at shingle granularity): the fraction of
    each document's DISTINCT word n-gram shingles that also occur in at
    least one OTHER document. Returns (id_col, shingles_distinct,
    shingles_shared, dup_coverage) with one row per input document —
    documents too short to form a single n-gram report (0, 0, 0.0).

    Scale shape (10^12 docs): tokens and grams are staged projections
    (module HOF rule), the per-doc distinct runs on an array<long> of
    xxhash64 gram hashes (primitive-type array_distinct fast path — the
    string variant is the documented O(n^2) trap), and every exchange is
    keyed by the 8-byte gram hash: explode -> groupBy(gh) doc-frequency
    (two-phase partial agg) -> join back on gh (reuses the agg's
    partitioning) -> groupBy(id). No document text ever enters a shuffle
    key.

    64-bit key note: this is a METRIC, not survivorship — a hash merge
    biases coverage by at most birthday(#distinct grams)/2^64 and needs no
    128-bit pair; the survivorship paths (exact_duplicates,
    dedup_segments) keep the salt-first pair rule.

    Reference analog: none (R/evaluate_duplication.R flags coincident
    keys only); beyond-reference web-pipeline set, SURVEY §8."""
    from inspectehr_spark.functions.textfns import word_ngrams
    from inspectehr_spark.tables import parallel_scan

    # r7: parallelize the one-file scan — the 8-gram construction and
    # xxhash64 pass otherwise run on the single scan core (guide §2.5)
    staged = parallel_scan(df.select(id_col, text_col)).select(
        F.col(id_col), F.split(F.col(text_col), r"\s+").alias("_toks")
    )
    staged = staged.withColumn("_grams", word_ngrams(F.col("_toks"), n))
    staged = staged.withColumn(
        "_gh", F.array_distinct(F.transform("_grams", lambda g: F.xxhash64(g)))
    )
    g = staged.select(F.col(id_col), F.explode("_gh").alias("gh"))
    freq = g.groupBy("gh").agg(F.count(F.lit(1)).alias("gdf"))
    cov = (
        g.join(freq, "gh")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("shingles_distinct"),
            F.sum((F.col("gdf") >= 2).cast("long")).alias("shingles_shared"),
        )
    )
    return (
        df.select(id_col)
        .join(cov, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce("shingles_distinct", F.lit(0)).alias("shingles_distinct"),
            F.coalesce("shingles_shared", F.lit(0)).alias("shingles_shared"),
            F.when(
                F.coalesce("shingles_distinct", F.lit(0)) > 0,
                F.round(
                    F.col("shingles_shared") / F.col("shingles_distinct"), 6
                ),
            )
            .otherwise(F.lit(0.0))
            .alias("dup_coverage"),
        )
    )


def substring_dup_stats(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    window: int = 64,
    hop: int = 32,
    hash_fn: str = "md5",
) -> DataFrame:
    """ExactSubstr-style duplicate detection (Lee et al. 2021,
    arXiv:2107.06499 §4.1): flag documents that share a long verbatim
    character span with ANOTHER document. The paper's suffix array finds
    every >= 50-token overlap; the distributed approximation hashes
    fixed-width character windows at a fixed hop — two documents sharing
    a span of >= window+hop chars are guaranteed to share at least one
    ALIGNED window start in one of them... not in general for arbitrary
    offsets, so this detector is exact for copy-paste/mirror duplication
    (spans copied with the surrounding text, the dominant web case — the
    fixture's word-shuffled near-dups share 170 aligned windows at
    sf0.01) and probabilistic for re-flowed text; tighten `hop` toward 1
    to approach offset-exactness at linearly more hashes per doc.

    Per doc: n_windows (distinct window hashes), n_shared (of those, how
    many appear in >= 2 distinct docs), has_shared_span. Docs shorter
    than `window` have zero windows and FALSE — out of the detector's
    scope by construction (min-length rules catch them first).

    Plan shape: sequence/explode to (doc_id, h) → dropDuplicates (a doc
    repeating ITS OWN span is within-doc repetition, webrules' job, not
    cross-doc dup) → hash-keyed count agg → join back on the SAME hash
    key (exchange reused) → doc-keyed agg. The shuffle key is the window
    hash, never the text. `hash_fn="md5"` is the oracle-replay contract;
    "xxhash64" halves shuffle width (BIGINT key) for deployments — the
    same twin pattern as minhash_lsh_pairs_fast.

    Reference analog: R/evaluate_duplication.R flags only coincident-key
    duplicates; cross-document verbatim spans are the web-corpus
    generalization (SURVEY §8)."""
    if hash_fn not in ("md5", "xxhash64"):
        raise ValueError(f"hash_fn must be 'md5' or 'xxhash64', got {hash_fn!r}")
    L = F.length(F.col(text_col))
    pos = F.when(
        L >= window, F.sequence(F.lit(1), L - (window - 1), F.lit(hop))
    ).otherwise(F.array().cast("array<int>"))
    # Column-API substring keeps an exotic text column name (dots, spaces)
    # parseable — F.expr string interpolation was not backtick-safe.
    # NOTE r7: a parallel_scan guard here measured a consistent ~0.5 s
    # LOSS at sf0.1 (one md5 per `hop` chars is light per-row work; the
    # extra exchange costs more than the width buys) — unlike the
    # gram-explosion operators, this one stays on the raw scan.
    win = F.col(text_col).substr(F.col("_p"), F.lit(window))
    h = F.md5(win) if hash_fn == "md5" else F.xxhash64(win)
    wins = (
        df.select(id_col, text_col)
        .withColumn("_pos", pos)
        .select(id_col, text_col, F.explode("_pos").alias("_p"))
        .select(id_col, h.alias("_h"))
        .dropDuplicates([id_col, "_h"])
    )
    per_hash = wins.groupBy("_h").agg(F.count(F.lit(1)).alias("_docs"))
    per_doc = (
        wins.join(per_hash, on="_h")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_windows"),
            F.sum((F.col("_docs") >= 2).cast("long")).alias("n_shared"),
        )
    )
    return (
        df.select(id_col)
        .join(per_doc, on=id_col, how="left")
        .na.fill({"n_windows": 0, "n_shared": 0})
        .withColumn("has_shared_span", F.col("n_shared") > 0)
    )
