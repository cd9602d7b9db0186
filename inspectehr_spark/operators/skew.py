"""Size-aware salted repartitioning — the giant-document skew guard.

The quality-filter pipeline's default salt (pipeline/run.py) spreads rows
uniformly by ``xxhash64(url)``: giants land uniformly **in expectation**,
which is the right default because it costs exactly one exchange and no
extra scan. Its failure mode is the tail event where several giant pages
hash into the same partition — at 10^12 documents even a 10^-6 tail is a
daily straggler. This module adds the deterministic variant the north
rule names ("salted repartitioning on size buckets"): documents above a
byte threshold are round-robined across ALL partitions by a rank over the
giant subset, so no partition carries more than ``ceil(G / n)`` giants —
a hard bound, not an expectation.

The subtlety: ``df.repartition(n, expr)`` routes rows by
``pmod(murmur3(expr), n)``, NOT by the expression value — so a
round-robin pid column would be re-hashed and giants could collide
again. Exact placement without touching RDD partitioners: precompute, in
plain Python at plan-build time, one representative long ``K[p]`` per
partition with ``pmod(murmur3_long(K[p], 42), n) == p`` (replicating
Spark's ``Murmur3_x86_32.hashLong``, the hash HashPartitioning applies
to a single long expression), and give giant #i the literal key
``K[i mod n]``. Normal rows keep ``xxhash64(url)`` (uniform through the
same murmur-mod routing). No eager Spark action, no extra shuffle.

Scale shape:
- The giant subset is identified on a NARROW projection (url + the size
  expression); its global rank is a single-task window over urls only —
  sound because giants are by definition a vanishing fraction (a corpus
  where most docs exceed ``giant_bytes`` needs a bigger threshold).
- The rank table is BROADCAST back; the wide rows shuffle exactly once
  (the same one exchange the uniform salt pays).
- Cost disclosure: ``octet_length(html)`` on the rank branch re-reads
  the html column for the giant filter. A production crawl table carries
  a content-length column (WARC does); pass it as ``size_expr`` and the
  rank branch becomes a metadata-only scan.

Reference analog: inspectEHR partitions its event batches by site/table
(R/perform_evaluation.R) — load balance there comes from the site
cardinality; here the unit is bytes, so balance needs the size signal.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_M32 = 0xFFFFFFFF


def _mm3_long(value: int, seed: int = 42) -> int:
    """Spark's Murmur3_x86_32.hashLong (the hash HashPartitioning applies
    to a long column): two 4-byte blocks, standard c1/c2 mix, fmix over
    length 8. Returns a SIGNED 32-bit int, matching the JVM."""

    def rotl(x: int, r: int) -> int:
        return ((x << r) | (x >> (32 - r))) & _M32

    def mix_k1(k1: int) -> int:
        k1 = (k1 * 0xCC9E2D51) & _M32
        k1 = rotl(k1, 15)
        return (k1 * 0x1B873593) & _M32

    def mix_h1(h1: int, k1: int) -> int:
        h1 ^= k1
        h1 = rotl(h1, 13)
        return (h1 * 5 + 0xE6546B64) & _M32

    v = value & 0xFFFFFFFFFFFFFFFF
    h1 = mix_h1(seed & _M32, mix_k1(v & _M32))
    h1 = mix_h1(h1, mix_k1((v >> 32) & _M32))
    h1 ^= 8
    h1 ^= h1 >> 16
    h1 = (h1 * 0x85EBCA6B) & _M32
    h1 ^= h1 >> 13
    h1 = (h1 * 0xC2B2AE35) & _M32
    h1 ^= h1 >> 16
    return h1 - (1 << 32) if h1 >= (1 << 31) else h1


def _partition_keys(n: int) -> list[int]:
    """K[p] = smallest non-negative long routed to partition p by
    pmod(murmur3_long(K, 42), n). A few×n probes; plan-build-time only."""
    keys: dict[int, int] = {}
    v = 0
    while len(keys) < n:
        p = _mm3_long(v) % n
        if p not in keys:
            keys[p] = v
        v += 1
    return [keys[p] for p in range(n)]


def salt_partitions_by_size(
    df: DataFrame,
    n_partitions: int,
    key_col: str = "url",
    size_expr: Column | None = None,
    giant_bytes: int = 1 << 20,
) -> DataFrame:
    """Repartition ``df`` into ``n_partitions`` with a hard giant-balance
    guarantee: rows whose ``size_expr`` (default ``octet_length(html)``)
    is ≥ ``giant_bytes`` are round-robined by rank-over-``key_col`` so
    each partition holds at most ``ceil(G / n_partitions)`` of them;
    everything else spreads by the uniform url-hash salt. Deterministic
    for a fixed input (rank ties are impossible on a key column), so
    resume/lineage replay reproduce the same placement."""
    if size_expr is None:
        size_expr = F.octet_length("html")
    n = n_partitions
    # distinct() before the rank: a key repeated among giant rows would
    # otherwise fan out the left join below and silently duplicate input
    # rows through the pipeline (and make the row_number tie order — and
    # so the placement — nondeterministic)
    ranks = (
        df.filter(size_expr >= F.lit(giant_bytes))
        .select(key_col)
        .distinct()
        .withColumn(
            "_rr", F.row_number().over(Window.orderBy(key_col)) - F.lit(1)
        )
    )
    keyring = F.array(
        *[F.lit(k).cast("long") for k in _partition_keys(n)]
    )
    route = F.coalesce(
        F.element_at(keyring, (F.pmod(F.col("_rr"), F.lit(n)) + 1).cast("int")),
        F.xxhash64(key_col),
    )
    return (
        df.join(F.broadcast(ranks), key_col, "left")
        .repartition(n, route)
        .drop("_rr")
    )
