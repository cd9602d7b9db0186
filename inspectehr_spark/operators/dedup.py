"""Corpus-level deduplication: exact, MinHash+LSH, SimHash, n-gram Jaccard.

The reference only has coincident-key duplicate flagging
(R/evaluate_duplication.R); web-scale training-data pipelines need near-dup
too. Everything here is expression-level (hash/xxhash64/transform over
arrays) — no Python in the hot path. The LSH band join is an equi-join on
(band_id, band_hash), which Spark shuffles by the band key: candidate pairs
only, never the O(n²) cross product.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def exact_duplicates(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """All but the first doc per identical text (keep-first by lowest id —
    explicit stable ordering). Hash-groupBy on a 64-bit fingerprint instead
    of the raw text so the shuffle carries 8 bytes, not the document."""
    w = Window.partitionBy(F.xxhash64(F.col(text_col))).orderBy(F.col(id_col).asc())
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") > 1)
        .drop("_rn")
    )


def shingles(text_col: str, n: int = 3) -> F.Column:
    """Word n-gram shingle hashes as array<long>: split → sliding window via
    transform over an index sequence → xxhash64 per shingle. Pure SQL."""
    toks = F.split(F.col(text_col), r"\s+")
    idx = F.sequence(F.lit(0), F.greatest(F.size(toks) - n, F.lit(0)))
    return F.transform(
        idx, lambda i: F.xxhash64(F.concat_ws(" ", F.slice(toks, i + 1, n)))
    )


def minhash_signature(shingle_col: F.Column, num_hashes: int = 64) -> F.Column:
    """MinHash signature as array<long>: for each of `num_hashes` seeded
    permutations h_i(x) = xxhash64(x, seed=i), take the min over shingles.
    array_min(transform(...)) stays JVM-side."""
    def perm_min(i: int):
        return F.array_min(F.transform(shingle_col, lambda s: F.xxhash64(s, F.lit(i))))

    return F.array(*[perm_min(i).alias(f"mh{i}") for i in range(num_hashes)])


def minhash_lsh_duplicates(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 64,
    bands: int = 16,
    ngram: int = 3,
    jaccard_threshold: float = 0.8,
) -> DataFrame:
    """Near-duplicate pairs via MinHash + banded LSH.

    shingle → signature → split signature into `bands` bands → candidate
    pairs share (band_id, band_hash) → verify estimated Jaccard (signature
    agreement fraction) ≥ threshold. Returns (doc_id_a, doc_id_b,
    est_jaccard) with a < b.

    Scale: the only shuffles are (1) the band-key groupBy and (2) the
    pair-verification join on ids; both are keyed equi-ops. Band buckets
    with a single member never produce pairs. Skew guard: very hot buckets
    (boilerplate pages) are capped via a row_number cutoff.
    """
    rows_per_band = num_hashes // bands
    sigs = df.select(
        F.col(id_col).alias("doc_id"),
        minhash_signature(shingles(text_col, ngram), num_hashes).alias("sig"),
    )
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

    # Cap pathological buckets (boilerplate): keep at most 64 docs/bucket.
    wb = Window.partitionBy("band_id", "band_hash").orderBy("doc_id")
    banded = banded.withColumn("_rn", F.row_number().over(wb)).filter(F.col("_rn") <= 64)

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


def simhash(text_col: str = "text", bits: int = 64) -> F.Column:
    """64-bit SimHash over word tokens, pure SQL: for each bit b, sum over
    tokens of (+1 if bit set in xxhash64(token) else -1); bit = sign.

    Implemented as: per-bit majority via aggregate over the token array.
    """
    toks = F.split(F.col(text_col), r"\s+")
    hashes = F.transform(toks, lambda t: F.xxhash64(t))
    def vote_for(b: int):
        return F.aggregate(
            hashes,
            F.lit(0),
            lambda acc, h: acc
            + F.when(F.shiftright(h, b).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1),
        )

    bit_exprs = []
    for b in range(bits):
        vote = vote_for(b)
        bit_exprs.append(
            F.when(vote > 0, F.lit(1).cast("long") * F.lit(2**b).cast("long")).otherwise(
                F.lit(0).cast("long")
            )
        )
    out = bit_exprs[0]
    for e in bit_exprs[1:]:
        out = out + e
    return out


def ngram_jaccard_pairs(
    df: DataFrame,
    candidate_pairs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    ngram: int = 3,
) -> DataFrame:
    """Exact n-gram Jaccard for given candidate (doc_id_a, doc_id_b) pairs:
    join texts in, compute |A∩B| / |A∪B| over distinct shingle-hash arrays
    with array_intersect/array_union — JVM-side set ops."""
    sh = df.select(
        F.col(id_col).alias("doc_id"),
        F.array_distinct(shingles(text_col, ngram)).alias("sh"),
    )
    return (
        candidate_pairs.join(sh.withColumnRenamed("doc_id", "doc_id_a").withColumnRenamed("sh", "sh_a"), "doc_id_a")
        .join(sh.withColumnRenamed("doc_id", "doc_id_b").withColumnRenamed("sh", "sh_b"), "doc_id_b")
        .select(
            "doc_id_a",
            "doc_id_b",
            (
                F.size(F.array_intersect("sh_a", "sh_b"))
                / F.size(F.array_union("sh_a", "sh_b"))
            ).alias("jaccard"),
        )
    )


def dup_ngram_fraction(text_col: str = "text", n: int = 3) -> F.Column:
    """Within-document duplicated n-gram fraction (Gopher repetition rule):
    1 - distinct_ngrams / total_ngrams. Pure array SQL."""
    sh = shingles(text_col, n)
    total = F.size(sh)
    return F.when(
        total > 0,
        F.round(1.0 - F.size(F.array_distinct(sh)) / total, 6),
    ).otherwise(F.lit(0.0))
